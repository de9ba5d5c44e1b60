"""Device-side scalar decompositions for endomorphism-accelerated exps.

TPU-native counterpart of the reference's GLV/GS scalar splitting
(glv: pair_BLS12381.cpp:759-810, gs: pair_BLS12381.cpp:814-874).  The
reference divides by host bignums with data-dependent loops; here the
divisors are *fixed public constants* (lambda = x^2-1 and |x|), so each
division becomes a branchless Barrett reduction on 16-bit limb arrays:
one constant multiply, a limb shift, and two conditional corrections —
fully batched and jit-compatible.

All arrays are int32 limbs base 2^16 (the framework-wide limb scheme),
standard (non-Montgomery) domain, least-significant limb first.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields.fp import LIMB_BITS, LIMB_MASK, borrow_sub, carry_fix
from ..params import R, X_ABS

#: GLV endomorphism eigenvalue on G1: lambda = x^2 - 1 satisfies
#: lambda^2 + lambda + 1 = r exactly (so phi(P) = [lambda]P for
#: phi(x,y) = (beta x, y)).  128 bits.
GLV_LAMBDA = X_ABS * X_ABS - 1
assert GLV_LAMBDA**2 + GLV_LAMBDA + 1 == R

#: Shamir ladder lengths (bits of the decomposed half-scalars).
GLV_BITS = max(GLV_LAMBDA.bit_length(), ((R - 1) // GLV_LAMBDA).bit_length())
GS_BITS = X_ABS.bit_length()  # 64


def _to_limbs(v: int, n: int) -> np.ndarray:
    assert v >= 0 and v < 1 << (LIMB_BITS * n)
    return np.array(
        [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)], np.int32
    )


def mul_const(a: jnp.ndarray, m_limbs: np.ndarray) -> jnp.ndarray:
    """Exact product of normalized limbs a (..., La) with a host constant
    (Lm,) -> (..., La+Lm) normalized limbs.  Column sums stay < 2^27."""
    La = a.shape[-1]
    Lm = m_limbs.shape[0]
    au = a.astype(jnp.uint32)
    cols = jnp.zeros(a.shape[:-1] + (La + Lm,), jnp.int32)
    for j in range(Lm):
        mj = int(m_limbs[j])
        if mj == 0:
            continue
        p = au * jnp.uint32(mj)
        lo = jnp.bitwise_and(p, jnp.uint32(LIMB_MASK)).astype(jnp.int32)
        hi = jnp.right_shift(p, jnp.uint32(LIMB_BITS)).astype(jnp.int32)
        cols = cols.at[..., j : j + La].add(lo)
        cols = cols.at[..., j + 1 : j + 1 + La].add(hi)
    out, _ = carry_fix(cols)
    return out


@functools.lru_cache(maxsize=None)
def _barrett_consts(d: int, s_limbs: int, lq: int, lr: int):
    m = (1 << (LIMB_BITS * s_limbs)) // d
    lm = -(-m.bit_length() // LIMB_BITS)
    return (
        _to_limbs(m, lm),
        _to_limbs(d, lr),
    )


def divmod_const(
    k: jnp.ndarray, d: int, lq: int, lr: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(k // d, k mod d) for normalized limbs k (..., Lk) and a host
    constant divisor d.  Caller guarantees the true quotient fits lq limbs
    and d fits lr limbs.  Branchless Barrett: qhat in {q-2, q-1, q}."""
    Lk = k.shape[-1]
    s_limbs = Lk  # 2^(16*Lk) > k always
    m_limbs, d_limbs = _barrett_consts(d, s_limbs, lq, lr)
    prod = mul_const(k, m_limbs)
    q = prod[..., s_limbs :]
    q = q[..., :lq] if q.shape[-1] >= lq else jnp.pad(
        q, [(0, 0)] * (q.ndim - 1) + [(0, lq - q.shape[-1])]
    )
    qd = mul_const(q, d_limbs)[..., :Lk]
    if qd.shape[-1] < Lk:
        qd = jnp.pad(qd, [(0, 0)] * (qd.ndim - 1) + [(0, Lk - qd.shape[-1])])
    r, _ = borrow_sub(k, qd)  # exact: q <= true quotient, so k - q*d >= 0
    d_wide = jnp.broadcast_to(
        jnp.asarray(np.pad(d_limbs, (0, Lk - lr))), r.shape
    )
    one = jnp.zeros_like(q).at[..., 0].set(1)
    for _ in range(2):
        diff, borrow = borrow_sub(r, d_wide)
        ge = borrow == 0
        r = jnp.where(ge[..., None], diff, r)
        qp, _ = carry_fix(q + one)
        q = jnp.where(ge[..., None], qp, q)
    return q, r[..., :lr]


# ---------------------------------------------------------------------------
# GLV (G1): k = k1 + lambda * k2, both halves < 2^128, non-negative
# ---------------------------------------------------------------------------


def glv_split(e_std: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., L>=16) Fr std limbs -> (k1, k2) of (..., 8) limbs each with
    e = k1 + GLV_LAMBDA * k2 exactly (no mod-r wrap: e < r = L^2+L+1)."""
    k2, k1 = divmod_const(e_std, GLV_LAMBDA, lq=8, lr=8)
    return k1, k2[..., :8]


# ---------------------------------------------------------------------------
# GS (G2 / GT): k = sum_i d_i * |x|^i, digits < |x| (64 bits each)
# ---------------------------------------------------------------------------


def gs_split(e_std: jnp.ndarray) -> jnp.ndarray:
    """(..., L) Fr std limbs -> (..., 4, 4) digit limbs: e = sum d_i |x|^i.

    Because psi acts as multiplication by x = -|x| on G2 (and Frobenius
    does on the GT r-torsion), [e]Q = sum_i [d_i] ((-1)^i psi^i(Q))."""
    digits = []
    k = e_std
    for i in range(3):
        lq = max(4, k.shape[-1] - 3)
        k, d = divmod_const(k, X_ABS, lq=lq, lr=4)
        digits.append(d)
    digits.append(k[..., :4])  # k3 = e // |x|^3 < r/|x|^3 < |x|
    return jnp.stack(digits, axis=-2)


# ---------------------------------------------------------------------------
# Ladder digit extraction
# ---------------------------------------------------------------------------


def bits_msb_first(d: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """Normalized limbs (..., L) -> (n_bits, ...) bit array, MSB first."""
    idx = np.arange(n_bits)
    limb = d[..., idx // LIMB_BITS]
    bits = jnp.bitwise_and(jnp.right_shift(limb, idx % LIMB_BITS), 1)
    return jnp.moveaxis(bits[..., ::-1], -1, 0)
