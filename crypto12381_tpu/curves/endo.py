"""Endomorphism-accelerated scalar multiplication (GLV on G1, GS on G2).

TPU-native counterpart of the reference's PAIR_G1mul / PAIR_G2mul
(pair_BLS12381.cpp:876-984): the same 2-dim GLV and 4-dim
Galbraith-Scott decompositions, re-designed branchless — scalars split on
device with fixed-constant Barrett divisions (ops/scalar_decomp.py), and the
half-scalars walk ONE shared Shamir ladder with a batched table gather per
step.  Ladder cost: 128 doubles + 128 adds for G1 (vs 255+255 plain), 64 +
64 for G2 — all with the complete RCB15 formulas, so identity table entries
and digit collisions need no branches.

Endomorphisms (validated against pyref in tests/test_endo.py):
  G1: phi(x, y) = (beta x, y) = [lambda]P,  lambda = x^2-1, beta = cube
      root of 1 in Fp (the reference keeps beta in ROM CURVE_Cru).
  G2: psi(x, y) = (c_x conj(x), c_y conj(y)) = [x]Q (untwist-Frobenius-
      twist; the reference's ECP2_frob with Fra/Frb constants), so
      [e]Q = sum_i [d_i] ((-1)^i psi^i Q) for e = sum d_i |x|^i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import active as FP
from ..fields import tower as TW
from ..ops import scalar_decomp as SD
from ..params import P
from ..pyref import field as PF
from . import weierstrass as W

CTX = FP.FP_CTX


# ---------------------------------------------------------------------------
# Endomorphism constants (host-computed exactly, stored as Montgomery limbs)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _beta_limbs() -> np.ndarray:
    """Cube root of unity with phi(P) = [lambda]P (the square of
    2^((p-1)/3); picked by the eigenvalue test in tests/test_endo.py)."""
    beta = pow(pow(2, (P - 1) // 3, P), 2, P)
    return FP.mont_const(CTX, beta)


def _fp2_mont(v: tuple[int, int]) -> np.ndarray:
    return np.stack([FP.mont_const(CTX, c) for c in v])


@functools.lru_cache(maxsize=1)
def _psi_consts() -> tuple[np.ndarray, np.ndarray]:
    """(c_x, c_y) = (xi^-((p-1)/3), xi^-((p-1)/2)) as Fp2 Montgomery limbs."""
    xi = (1, 1)

    def fp2_pow(x, k):
        r = (1, 0)
        while k:
            if k & 1:
                r = PF.fp2_mul(r, x)
            x = PF.fp2_sqr(x)
            k >>= 1
        return r

    cx = PF.fp2_inv(fp2_pow(xi, (P - 1) // 3))
    cy = PF.fp2_inv(fp2_pow(xi, (P - 1) // 2))
    return _fp2_mont(cx), _fp2_mont(cy)


def phi_g1(p):
    """(X, Y, Z) -> (beta X, Y, Z): the GLV endomorphism, one Fp mul."""
    X, Y, Z = p
    b = jnp.asarray(_beta_limbs())
    return (FP.mont_mul(CTX, X, jnp.broadcast_to(b, X.shape)), Y, Z)


def psi_g2(q):
    """Projective psi: (c_x conj(X), c_y conj(Y), conj(Z))."""
    X, Y, Z = q
    cx, cy = _psi_consts()
    Xc = TW.fp2_mul(TW.fp2_conj(X), jnp.broadcast_to(jnp.asarray(cx), X.shape))
    Yc = TW.fp2_mul(TW.fp2_conj(Y), jnp.broadcast_to(jnp.asarray(cy), Y.shape))
    return (Xc, Yc, TW.fp2_conj(Z))


# ---------------------------------------------------------------------------
# Shared Shamir ladder over a point table
# ---------------------------------------------------------------------------


def _subset_table(ops: W.FieldOps, bases):
    """All 2^n subset sums of `bases` as one stacked array
    (2^n, ...batch, 3, *elem): T[m] = sum_{i: m>>i & 1} bases[i]."""
    e_ndim = ops.elem_ndim
    batch = None
    table = [W.identity(ops, bases[0][0].shape[: -e_ndim])]
    for i, b in enumerate(bases):
        table += [W.add(ops, t, b) for t in table[: 1 << i]]
    stacked = [
        jnp.stack([t[c] for t in table], axis=0) for c in range(3)
    ]  # 3 x (2^n, ...batch, *elem)
    return jnp.stack(stacked, axis=-(e_ndim + 1))  # (2^n, ...batch, 3, *e)


def _gather(T, idx):
    """T: (S, ...batch, rest...), idx: (...batch) -> (...batch, rest...)."""
    rest = T.ndim - 1 - idx.ndim
    idxe = idx.reshape((1,) + idx.shape + (1,) * rest)
    idxe = jnp.broadcast_to(idxe, (1,) + T.shape[1:])
    return jnp.take_along_axis(T, idxe, axis=0)[0]


def _shamir(ops: W.FieldOps, bases, digit_limbs, n_bits: int):
    """sum_i [d_i] bases[i] with one shared double-and-add ladder.

    digit_limbs: (...batch, n_bases, Ld) normalized std-domain limbs.
    """
    e_ndim = ops.elem_ndim
    n_bases = len(bases)
    T = _subset_table(ops, bases)
    bits = SD.bits_msb_first(digit_limbs, n_bits)  # (n_bits, ...batch, n_bases)
    weights = jnp.asarray([1 << i for i in range(n_bases)], jnp.int32)
    idxs = jnp.sum(bits * weights, axis=-1)        # (n_bits, ...batch)

    def step(acc, idx):
        acc = W.double(ops, acc)
        entry = _gather(T, idx)
        ent = tuple(
            jnp.take(entry, c, axis=entry.ndim - 1 - e_ndim) for c in range(3)
        )
        return W.add(ops, acc, ent)

    # scan in unrolled groups (this backend's large per-iteration cost)
    U = 4
    ng = n_bits // U

    def group(acc, idx_u):
        for j in range(U):
            acc = step(acc, idx_u[j])
        return acc, None

    batch = digit_limbs.shape[:-2]
    acc = W.identity(ops, batch)
    if ng:
        main = idxs[: ng * U].reshape((ng, U) + idxs.shape[1:])
        acc, _ = jax.lax.scan(group, acc, main)
    for i in range(ng * U, n_bits):
        acc = step(acc, idxs[i])
    return acc


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def glv_mul_g1(ops: W.FieldOps, p, e_std: jnp.ndarray):
    """[e]P via 2-dim GLV (ref PAIR_G1mul, pair_BLS12381.cpp:876-925)."""
    k1, k2 = SD.glv_split(e_std)
    digits = jnp.stack([k1, k2], axis=-2)
    return _shamir(ops, [p, phi_g1(p)], digits, SD.GLV_BITS)


def gs_mul_g2(ops: W.FieldOps, q, e_std: jnp.ndarray):
    """[e]Q via 4-dim GS (ref PAIR_G2mul, pair_BLS12381.cpp:927-984)."""
    digits = SD.gs_split(e_std)  # (..., 4, 4)
    q0 = q
    q1 = W.negate(ops, psi_g2(q0))
    q2 = psi_g2(psi_g2(q0))
    q3 = W.negate(ops, psi_g2(q2))
    return _shamir(ops, [q0, q1, q2, q3], digits, SD.GS_BITS)
