"""Batched multi-limb Montgomery arithmetic on TPU-friendly int32 lanes.

TPU-native replacement for the reference's BIG/FP units
(3rd-party/miracl-core/big_B384_58.cpp, fp_BLS12381.cpp).  The reference
multiplies 7x58-bit int64 limbs with int128 comba accumulation — impossible
on TPU vector units.  Here a field element is (..., L) int32 limbs in base
2^16 (Fp: L=24, Fr: L=16) and a batch of field multiplications becomes:

  1. outer products in uint32 (exact: 16b x 16b products fit 32 bits),
  2. lo/hi 16-bit split, then *column reduction as one fp32 matmul* with a
     constant 0/1 scatter matrix — column sums < 2^22 are exact in fp32 and
     the contraction rides the MXU,
  3. an exact parallel carry-propagation pass (two split rounds + a
     Kogge-Stone generate/propagate prefix — no sequential scan),
  4. Montgomery REDC with the full-width constant n' = -p^-1 mod R,
     R = 2^(16L).

Range discipline (static analysis replacing the reference's runtime XES
excess tracking, fp_BLS12381.h:40-44, and compile-time ChunkRange budgets,
chunk_range.hpp:13-86 — jit traces cannot branch on data):

  * Fp (L=24, R=2^384 > 4p): values live in the lazy range [0, 2p).
    REDC output < 1.5p; add/sub re-establish < 2p with one conditional
    subtraction of 2p.  ("Montgomery without final subtraction".)
  * Fr (L=16, R=2^256 < 4r): values are kept < r; every mul/add ends with a
    conditional subtraction of r (REDC output < 1.46r when inputs < r).

All subtraction goes through an exact borrow-parallel `borrow_sub`, so the
carry fixer only ever sees non-negative columns.  All functions are pure and
shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FP_PARAMS, FR_PARAMS, LIMB_BITS, LIMB_MASK, MontgomeryParams

_MASK = LIMB_MASK


# ---------------------------------------------------------------------------
# Field context: precomputed constant arrays for one modulus
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FieldCtx:
    """Frozen per-modulus constants (host ints + device constant arrays)."""

    params: MontgomeryParams
    #: lazy bound multiplier: values live in [0, lazy*modulus)
    lazy: int

    @property
    def L(self) -> int:
        return self.params.n_limbs

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return np.array(self.params.to_limbs(self.params.modulus), np.int32)

    @functools.cached_property
    def red_limbs(self) -> np.ndarray:
        """Limbs of lazy*modulus — the working upper bound."""
        return np.array(self.params.to_limbs(self.lazy * self.params.modulus), np.int32)

    @functools.cached_property
    def np_limbs(self) -> np.ndarray:
        return np.array(self.params.to_limbs(self.params.n_prime), np.int32)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return np.array(self.params.to_limbs(self.params.R2_mod), np.int32)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        return np.array(self.params.to_limbs(self.params.R_mod), np.int32)

    @functools.cached_property
    def one_plain(self) -> np.ndarray:
        return np.array(self.params.to_limbs(1), np.int32)

    @functools.cached_property
    def scatter_lohi(self) -> np.ndarray:
        """(2*L*L, 2L) 0/1 matrix: row i*L+j -> col i+j (lo half), row
        L*L + i*L+j -> col i+j+1 (hi half)."""
        L = self.L
        m = np.zeros((2 * L * L, 2 * L), np.float32)
        for i in range(L):
            for j in range(L):
                m[i * L + j, i + j] = 1.0
                m[L * L + i * L + j, i + j + 1] = 1.0
        return m

    @functools.cached_property
    def scatter_low(self) -> np.ndarray:
        """As scatter_lohi but keeping only columns < L (products mod R)."""
        return self.scatter_lohi[:, : self.L].copy()


FP_CTX = FieldCtx(FP_PARAMS, lazy=2)   # R = 2^384 > 4p
FR_CTX = FieldCtx(FR_PARAMS, lazy=1)   # R = 2^256 < 4r -> keep canonical

_FP = FP_CTX  # convenience aliases for tower code
_FR = FR_CTX


def _shift_up(x: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """Shift limbs one position up (towards higher significance), zero fill."""
    return jnp.concatenate([jnp.zeros_like(x[..., :k]), x[..., :-k]], -1)


# ---------------------------------------------------------------------------
# Carry propagation (non-negative columns only)
# ---------------------------------------------------------------------------


def carry_fix(cols: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact carry propagation of non-negative int32 columns (< 2^31) into
    base-2^16 limbs.  Returns (limbs in [0, 2^16), carry out of the top).

    Two parallel split rounds bound residual carries to {0,1}; a Kogge-Stone
    generate/propagate prefix resolves the remaining ripple in log2(L)
    doubling steps — fully parallel across batch and limbs.
    """
    n = cols.shape[-1]
    lo = jnp.bitwise_and(cols, _MASK)
    hi = jnp.right_shift(cols, LIMB_BITS)              # < 2^15
    carry_out = hi[..., -1]
    x = lo + _shift_up(hi)                             # < 2^16 + 2^15
    lo = jnp.bitwise_and(x, _MASK)
    hi = jnp.right_shift(x, LIMB_BITS)                 # in {0, 1}
    carry_out = carry_out + hi[..., -1]
    s = lo + _shift_up(hi)                             # <= 2^16
    g = (s > _MASK).astype(jnp.int32)
    p = (s == _MASK).astype(jnp.int32)
    shift = 1
    while shift < n:
        g = jnp.bitwise_or(g, jnp.bitwise_and(p, _shift_up(g, shift)))
        p = jnp.bitwise_and(p, _shift_up(p, shift))
        shift *= 2
    total = s + _shift_up(g)
    carry_out = carry_out + g[..., -1]
    return jnp.bitwise_and(total, _MASK), carry_out


def borrow_sub(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact x - y for normalized limb arrays (limbs in [0, 2^16)).

    Returns (diff mod 2^(16L) as normalized limbs, borrow flag 0/1).
    Borrow resolution is the same Kogge-Stone prefix with generate = (x<y)
    and propagate = (x==y) per limb.
    """
    d = x - y                                           # in (-2^16, 2^16)
    g = (d < 0).astype(jnp.int32)
    p = (d == 0).astype(jnp.int32)
    n = d.shape[-1]
    shift = 1
    while shift < n:
        g = jnp.bitwise_or(g, jnp.bitwise_and(p, _shift_up(g, shift)))
        p = jnp.bitwise_and(p, _shift_up(p, shift))
        shift *= 2
    borrow_out = g[..., -1]
    bin_ = _shift_up(g)
    t = d - bin_
    out = jnp.where(t < 0, t + (1 << LIMB_BITS), t)
    return out, borrow_out


# ---------------------------------------------------------------------------
# Wide multiplication via outer product + MXU scatter matmul
# ---------------------------------------------------------------------------


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray, scatter: np.ndarray) -> jnp.ndarray:
    """Column sums of the product a*b through the given scatter matrix.

    a, b: (..., L) int32 limbs < 2^16.  Column values < 2*L*2^16 < 2^22 —
    exact in fp32 accumulation."""
    a, b = jnp.broadcast_arrays(a, b)
    L = a.shape[-1]
    batch = a.shape[:-1]
    prod = a[..., :, None].astype(jnp.uint32) * b[..., None, :].astype(jnp.uint32)
    lo = jnp.bitwise_and(prod, jnp.uint32(_MASK)).astype(jnp.float32)
    hi = jnp.right_shift(prod, jnp.uint32(LIMB_BITS)).astype(jnp.float32)
    flat = jnp.concatenate([lo.reshape(*batch, L * L), hi.reshape(*batch, L * L)], -1)
    cols = jax.lax.dot_general(
        flat,
        jnp.asarray(scatter),
        (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return cols.astype(jnp.int32)


def mul_wide(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 2L-limb product, carry-fixed to base 2^16."""
    limbs, _ = carry_fix(_mul_cols(a, b, ctx.scatter_lohi))
    return limbs


def _mul_mod_R(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a*b) mod R as L limbs (top-column carry discarded = mod 2^(16L))."""
    limbs, _ = carry_fix(_mul_cols(a, b, ctx.scatter_low))
    return limbs


def _const(arr: np.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    c = jnp.asarray(arr)
    return jnp.broadcast_to(c, like.shape[:-1] + c.shape)


# ---------------------------------------------------------------------------
# Conditional subtraction / add / sub / neg
# ---------------------------------------------------------------------------


def cond_sub(ctx: FieldCtx, x: jnp.ndarray, m_limbs: np.ndarray) -> jnp.ndarray:
    """x - m if x >= m else x (branchless)."""
    diff, borrow = borrow_sub(x, _const(m_limbs, x))
    return jnp.where((borrow != 0)[..., None], x, diff)


def add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b), inputs < lazy*p, result < lazy*p."""
    s, _ = carry_fix(a + b)
    return cond_sub(ctx, s, ctx.red_limbs)


def sub(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b): a + (lazy*p - b), then conditional subtract."""
    nb, _ = borrow_sub(_const(ctx.red_limbs, b), b)      # lazy*p - b, >= 0
    return add(ctx, a, nb)


def neg(ctx: FieldCtx, b: jnp.ndarray) -> jnp.ndarray:
    nb, _ = borrow_sub(_const(ctx.red_limbs, b), b)
    return cond_sub(ctx, nb, ctx.red_limbs)             # b=0 -> lazy*p -> 0


def double(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return add(ctx, a, a)


@functools.lru_cache(maxsize=None)
def _small_const(ctx: FieldCtx, k: int) -> np.ndarray:
    p = ctx.params
    return np.array(p.to_limbs(k * p.R_mod % p.modulus), np.int32)


def mul_small(ctx: FieldCtx, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by a small non-negative host int.

    Fast limb-scale path only while k*lazy*p < R (the intermediate must not
    overflow the L-limb width); otherwise one mont_mul with the Montgomery
    image of k.
    """
    assert k >= 0
    if k == 0:
        return jnp.zeros_like(a)
    if k == 1:
        return a
    if k * ctx.lazy * ctx.params.modulus < ctx.params.R:
        s, _ = carry_fix(a * jnp.int32(k))
        bound = k * ctx.lazy  # value < bound * p, bound*p < R
        while bound > ctx.lazy:
            m = max(bound // 2, ctx.lazy)
            s = cond_sub(
                ctx, s, np.array(ctx.params.to_limbs(m * ctx.params.modulus), np.int32)
            )
            bound = max(bound - m, m)
        return s
    return mont_mul(ctx, a, _const(_small_const(ctx, k), a))


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------


def mont_mul(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """REDC(a*b): Montgomery product (TPU analogue of FP_mul,
    fp_BLS12381.cpp:396-483).  Inputs < lazy*p, output < lazy*p."""
    L = ctx.L
    t = mul_wide(ctx, a, b)
    t_lo, t_hi = t[..., :L], t[..., L:]
    m = _mul_mod_R(ctx, t_lo, _const(ctx.np_limbs, t_lo))
    mp = mul_wide(ctx, m, _const(ctx.p_limbs, m))
    # (T + m*p)/R: low halves sum to 0 mod R; carry into the high half is 1
    # unless T_lo == 0 (then m == 0 and both low halves are zero).
    carry = jnp.any(t_lo != 0, axis=-1).astype(jnp.int32)
    hi_cols = t_hi + mp[..., L:]
    hi_cols = hi_cols.at[..., 0].add(carry)
    out, _ = carry_fix(hi_cols)
    if ctx.lazy == 1:
        out = cond_sub(ctx, out, ctx.p_limbs)
    return out


def mont_sqr(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


# ---------------------------------------------------------------------------
# Canonicalisation / comparisons
# ---------------------------------------------------------------------------


def reduce_full(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Map from [0, lazy*p) to canonical [0, p) — lazy <= 2 so one
    conditional subtraction suffices."""
    assert ctx.lazy <= 2
    return cond_sub(ctx, a, ctx.p_limbs)


def is_zero(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(reduce_full(ctx, a) == 0, axis=-1)


def eq(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(reduce_full(ctx, a) == reduce_full(ctx, b), axis=-1)


# ---------------------------------------------------------------------------
# Montgomery domain conversion
# ---------------------------------------------------------------------------


def to_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, _const(ctx.r2_limbs, a))


def from_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> canonical standard-domain limbs in [0, p)."""
    return reduce_full(ctx, mont_mul(ctx, a, _const(ctx.one_plain, a)))


def one(ctx: FieldCtx, batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(ctx.one_mont), batch_shape + (ctx.L,))


def zero(ctx: FieldCtx, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros(batch_shape + (ctx.L,), jnp.int32)


def parity_std(a: jnp.ndarray) -> jnp.ndarray:
    """Parity of canonical standard-domain limbs (FP_sign convention,
    fp_BLS12381.cpp:928-934)."""
    return jnp.bitwise_and(a[..., 0], 1)


# ---------------------------------------------------------------------------
# Exponentiation by fixed public exponents — inversion / sqrt / qr
# ---------------------------------------------------------------------------


def pow_fixed(ctx: FieldCtx, x: jnp.ndarray, e: int) -> jnp.ndarray:
    """x^e (Montgomery domain) for a host-known exponent; lax.scan over the
    bit string keeps the compiled graph to one square+select-mul body."""
    if e == 0:
        return one(ctx, x.shape[:-1])
    bits = np.array([int(b) for b in bin(e)[2:]], np.int32)

    def body(acc, bit):
        acc = mont_sqr(ctx, acc)
        acc_m = mont_mul(ctx, acc, x)
        return jnp.where(bit != 0, acc_m, acc), None

    acc, _ = jax.lax.scan(body, x, jnp.asarray(bits[1:]))
    return acc


def inv(ctx: FieldCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion x^(p-2) — constant-time, batched (TPU analogue of
    the addition-chain FP_inv, fp_BLS12381.cpp:674-900).  inv(0) = 0."""
    return pow_fixed(ctx, x, ctx.params.modulus - 2)


def sqrt(ctx: FieldCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Principal root x^((p+1)/4), p = 3 mod 4.  Caller checks is_qr."""
    assert ctx.params.modulus % 4 == 3
    return pow_fixed(ctx, x, (ctx.params.modulus + 1) // 4)


def is_qr(ctx: FieldCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Euler criterion; True for 0."""
    t = pow_fixed(ctx, x, (ctx.params.modulus - 1) // 2)
    return jnp.logical_or(eq(ctx, t, one(ctx, x.shape[:-1])), is_zero(ctx, x))


# ---------------------------------------------------------------------------
# Batch inversion (Montgomery's trick): 1 inversion + 3(n-1) muls
# ---------------------------------------------------------------------------


def batch_inv(ctx: FieldCtx, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Invert many elements with a single Fermat inversion via prefix
    products along `axis`.  Zeros map to zero (and do not poison others).

    SURVEY hard-part #5: needed for Jacobian->affine conversions and
    protocol steps like inverse(gamma+x) at batch.
    """
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    safe = jnp.where(is_zero(ctx, x)[..., None], one(ctx, x.shape[:-1]), x)

    def fwd(carry, xi):
        nxt = mont_mul(ctx, carry, xi)
        return nxt, carry  # prefix products, exclusive

    total, prefix = jax.lax.scan(fwd, one(ctx, x.shape[1:-1]), safe)
    tinv = inv(ctx, total)

    def bwd(carry, args):
        xi, pre = args
        out = mont_mul(ctx, carry, pre)
        nxt = mont_mul(ctx, carry, xi)
        return nxt, out

    _, outs = jax.lax.scan(bwd, tinv, (safe, prefix), reverse=True)
    outs = jnp.where(is_zero(ctx, x)[..., None], jnp.zeros_like(outs), outs)
    return jnp.moveaxis(outs, 0, axis)


# ---------------------------------------------------------------------------
# Host conversion helpers
# ---------------------------------------------------------------------------


def from_int(ctx: FieldCtx, values, mont: bool = True) -> jnp.ndarray:
    """ints (scalars / nested lists) -> limb array; Montgomery by default."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((flat.shape[0], ctx.L), np.int32)
    for i, v in enumerate(flat):
        out[i] = ctx.params.to_limbs(int(v) % ctx.params.modulus)
    out = out.reshape(arr.shape + (ctx.L,))
    dev = jnp.asarray(out)
    return to_mont(ctx, dev) if mont else dev


def to_int(ctx: FieldCtx, limbs, mont: bool = True):
    """limb array -> python ints (canonical [0,p)); scalar or object array."""
    limbs = from_mont(ctx, limbs) if mont else reduce_full(ctx, limbs)
    arr = np.asarray(limbs)
    shape = arr.shape[:-1]
    if shape == ():
        return ctx.params.from_limbs(arr)
    flat = arr.reshape(-1, ctx.L)
    out = np.empty(flat.shape[0], object)
    for i in range(flat.shape[0]):
        out[i] = ctx.params.from_limbs(flat[i])
    return out.reshape(shape)
