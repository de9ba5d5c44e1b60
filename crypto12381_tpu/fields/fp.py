"""Batched multi-limb Montgomery arithmetic on TPU-friendly int32 lanes.

TPU-native replacement for the reference's BIG/FP units
(3rd-party/miracl-core/big_B384_58.cpp, fp_BLS12381.cpp).  The reference
multiplies 7x58-bit int64 limbs with int128 comba accumulation — impossible
on TPU vector units.  Here a field element is (..., L) int32 limbs in base
2^16 and a batch of field multiplications becomes:

  1. streaming shift-add schoolbook columns: L broadcast uint32 multiplies
     (exact: 16b x 16b products fit 32 bits), lo/hi split and accumulated
     at offset j under a lax.scan (no (batch, L, L) outer product is ever
     materialized; see _mul_cols),
  2. an exact parallel carry-propagation pass (two split rounds + a
     Kogge-Stone generate/propagate prefix — no sequential scan),
  3. Montgomery REDC with the full-width constant n' = -p^-1 mod R.

This integer engine is the differential-testing oracle and CPU fallback;
the performance engine on TPU is fields/fp32.py (fp32 FMAs + bf16 MXU REDC
in a fused Pallas kernel), selected via fields/active.py.

Range discipline ("loose limbs", the static analogue of the reference's
runtime XES excess tracking fp_BLS12381.h:40-44 and compile-time ChunkRange
budgets chunk_range.hpp:13-86 — jit traces cannot branch on data):

  * L carries one limb of headroom past the modulus (Fp: L=25, R=2^400,
    R/p = 2^19; Fr: L=18, R=2^288, R/r = 2^33).
  * Elements are "loose": limbs may exceed 16 bits (up to ~2^26) and the
    value may be any representative < 2^19-ish multiples of the modulus.
  * add/sub/neg/mul_small are RAW limb ops (1-2 XLA ops, no carries, no
    comparisons).  Subtraction stays non-negative by adding a precomputed
    multiple of the modulus whose limb representation dominates the
    subtrahend's static limb bound (the K-constant family).
  * mont_mul carry-normalizes its operands internally; because R/modulus is
    huge, REDC output is < modulus*(1 + 2^-18) regardless of how loose the
    inputs were — multiplication is globally self-reducing and *no
    conditional subtraction ever appears in hot paths*.
  * Only canonicalisation (serialize/compare) pays for an exact reduction.

Static safety budget (callers obey by construction, see module audits):
value < 2^12 * modulus and limbs < 2^26 at every sub/neg; both hold with
huge margin in the tower/curve/pairing code where a Montgomery mul
re-tightens everything every few operations.
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


def _loose_multiple(params: MontgomeryParams, floor_bits: int) -> np.ndarray:
    """Limbs of some multiple K of the modulus with every limb in
    [2^floor_bits, 2^floor_bits + 2^16) except a zero top limb — so that
    K - b is limb-wise non-negative for any b with limbs < 2^floor_bits
    and zero top limb.  Greedy change-making; exact by construction."""
    L = params.n_limbs
    lo = 1 << floor_bits
    hi = lo + (1 << LIMB_BITS) - 1
    # minimal total with all limbs at the floor (top limb zero)
    base = sum(lo << (LIMB_BITS * i) for i in range(L - 1))
    k = -(-base // params.modulus) + 1
    K = k * params.modulus
    assert K < (1 << (LIMB_BITS * (L - 1))) * hi, "K too large to represent"
    limbs = np.zeros(L, np.int64)
    rem = K
    for i in range(L - 2, -1, -1):
        min_low = sum(lo << (LIMB_BITS * j) for j in range(i))
        c = min(hi, (rem - min_low) >> (LIMB_BITS * i))
        assert c >= lo, f"cannot place limb {i}"
        limbs[i] = c
        rem -= c << (LIMB_BITS * i)
    assert rem == 0
    assert limbs.max() < (1 << 31)
    return limbs.astype(np.int32)


@dataclass(frozen=True)
class FieldCtx:
    """Frozen per-modulus constants (host ints + device constant arrays)."""

    params: MontgomeryParams

    @property
    def L(self) -> int:
        return self.params.n_limbs

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return np.array(self.params.to_limbs(self.params.modulus), np.int32)

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
    def k_subs(self) -> dict[int, np.ndarray]:
        """K-constant family for raw subtraction, keyed by subtrahend limb
        bound (log2)."""
        return {b: _loose_multiple(self.params, b) for b in (17, 22, 26, 28)}

    @functools.cached_property
    def fold_limbs(self) -> np.ndarray:
        """2^(16*(L-1)) mod modulus as L limbs (top zero) — used by tighten()
        to fold a value's top limb back into the low limbs."""
        v = (1 << (LIMB_BITS * (self.L - 1))) % self.params.modulus
        return np.array(self.params.to_limbs(v), np.int32)

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


FP_CTX = FieldCtx(FP_PARAMS)
FR_CTX = FieldCtx(FR_PARAMS)


def _shift_up(x: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """Shift limbs towards higher significance, zero fill."""
    return jnp.concatenate([jnp.zeros_like(x[..., :k]), x[..., :-k]], -1)


def _const(arr: np.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    c = jnp.asarray(arr)
    return jnp.broadcast_to(c, jnp.broadcast_shapes(like.shape, c.shape))


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


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Loose limbs -> limbs in [0, 2^16) (value preserved; requires value
    < R, which the static budget guarantees).  NOTE: a normalized value
    >= 2^(16(L-1)) has a nonzero top limb and must NOT be used as a raw
    subtrahend — use tighten() for values that keep circulating."""
    limbs, _ = carry_fix(a)
    return limbs


def tighten(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Re-tighten a loose value to limbs < 2^18 with a ZERO top limb.

    Two passes of carry-normalize + fold-top-limb (t -> t * (2^(16(L-1))
    mod p)): the first pass may leave limbs up to ~top*2^16, the second
    collapses them to < 2^16 + 2*2^16.  Valid while the value stays
    < 2^14 * 2^(16(L-1)) (static budget).  Results are safe raw subtrahends
    at bmax >= 22."""
    x = a
    for _ in range(2):
        limbs, _ = carry_fix(x)
        top = limbs[..., -1:]
        low = jnp.concatenate([limbs[..., :-1], jnp.zeros_like(top)], -1)
        x = low + top * _const(ctx.fold_limbs, low)
    return x


def borrow_sub(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact x - y for *normalized* limb arrays.  Returns (diff mod R,
    borrow flag).  Kogge-Stone borrow prefix."""
    d = x - y
    g = (d < 0).astype(jnp.int32)
    p = (d == 0).astype(jnp.int32)
    n = d.shape[-1]
    shift = 1
    while shift < n:
        g = jnp.bitwise_or(g, jnp.bitwise_and(p, _shift_up(g, shift)))
        p = jnp.bitwise_and(p, _shift_up(p, shift))
        shift *= 2
    borrow_out = g[..., -1]
    t = d - _shift_up(g)
    out = jnp.where(t < 0, t + (1 << LIMB_BITS), t)
    return out, borrow_out


def cond_sub(ctx: FieldCtx, x: jnp.ndarray, m_limbs: np.ndarray) -> jnp.ndarray:
    """x - m if x >= m else x; x must be normalized (canonical paths only)."""
    diff, borrow = borrow_sub(x, _const(m_limbs, x))
    return jnp.where((borrow != 0)[..., None], x, diff)


# ---------------------------------------------------------------------------
# Raw (loose) ring operations — 1-2 XLA ops each
# ---------------------------------------------------------------------------


def add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a + b


def sub(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, bmax: int = 26) -> jnp.ndarray:
    """a - b + K where K = ctx.k_subs[bmax] dominates b limb-wise.

    Contract: b's limbs < 2^bmax and b's top limb < 2^16.  The default 26
    covers mul outputs, sums of a few of them, and one nested sub/neg/xi
    level; pass bmax=28 for two levels.  Tower/curve modules keep circulating
    values normalized so depth never exceeds two (see tower.py)."""
    return (a + _const(ctx.k_subs[bmax], a)) - b


def neg(ctx: FieldCtx, b: jnp.ndarray, bmax: int = 26) -> jnp.ndarray:
    return _const(ctx.k_subs[bmax], b) - b


def double(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return a + a


def mul_small(ctx: FieldCtx, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by a small host int 0 <= k; raw limb scale (keep the
    product of k with the operand's limb bound under 2^31 — fine for the
    k <= 12 used by curve/pairing formulas on mul outputs)."""
    assert 0 <= k < (1 << 14)
    if k == 0:
        return jnp.zeros_like(a)
    return a * jnp.int32(k)


# ---------------------------------------------------------------------------
# Wide multiplication via outer product + MXU scatter matmul
# ---------------------------------------------------------------------------


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook column sums of a*b as 2L int32 columns (< 2^22).

    Streaming shift-add formulation: L broadcast multiplies, each split
    into 16-bit halves and accumulated at offset j.  Never materializes an
    (batch, L, L) outer product (a 25x memory/bandwidth blow-up that XLA
    does not reliably fuse away), and keeps everything in integer lanes.
    The j-loop is a lax.scan (one dynamic-update-slice body) so the HLO
    stays ~L-times smaller than an unrolled loop — graph size is what
    bounds XLA compile time for the pairing/MSM super-graphs built on top.
    Requires normalized operands (limbs < 2^16)."""
    a, b = jnp.broadcast_arrays(a, b)
    L = a.shape[-1]
    batch = a.shape[:-1]
    au = a.astype(jnp.uint32)
    bu = b.astype(jnp.uint32)

    def body(c, j):
        bj = jax.lax.dynamic_slice_in_dim(bu, j, 1, axis=-1)
        p = au * bj                                       # exact, < 2^32
        lo = jnp.bitwise_and(p, jnp.uint32(_MASK)).astype(jnp.int32)
        hi = jnp.right_shift(p, jnp.uint32(LIMB_BITS)).astype(jnp.int32)
        pad = jnp.zeros_like(lo[..., :1])
        seg = jnp.concatenate([lo, pad], -1) + jnp.concatenate([pad, hi], -1)
        cur = jax.lax.dynamic_slice_in_dim(c, j, L + 1, axis=-1)
        return (
            jax.lax.dynamic_update_slice_in_dim(c, cur + seg, j, axis=-1),
            None,
        )

    c0 = jnp.zeros(batch + (2 * L,), jnp.int32)
    c, _ = jax.lax.scan(body, c0, jnp.arange(L))
    return c


def mul_wide(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 2L-limb product of normalized operands, carry-fixed."""
    limbs, _ = carry_fix(_mul_cols(a, b))
    return limbs


def _mul_mod_R(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a*b) mod R as L limbs (top-column carry discarded)."""
    L = ctx.L
    limbs, _ = carry_fix(_mul_cols(a, b)[..., :L])
    return limbs


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------


def mont_mul(
    ctx: FieldCtx,
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_norm: bool = False,
    b_norm: bool = False,
) -> jnp.ndarray:
    """REDC(a*b): Montgomery product of loose inputs.

    Output is normalized limbs with value < modulus * (1 + 2^-18): the
    large R/modulus ratio makes REDC globally self-reducing (TPU analogue of
    FP_mul + FP_mod, fp_BLS12381.cpp:396-483, without any final
    subtraction)."""
    L = ctx.L
    an = a if a_norm else normalize(a)
    bn = b if b_norm else normalize(b)
    t = mul_wide(ctx, an, bn)
    t_lo, t_hi = t[..., :L], t[..., L:]
    m = _mul_mod_R(ctx, t_lo, _const(ctx.np_limbs, t_lo))
    mp = mul_wide(ctx, m, _const(ctx.p_limbs, m))
    # (T + m*p)/R: low halves sum to 0 mod R; carry into the high half is 1
    # unless T_lo == 0 (then m == 0 and both low halves are zero).
    carry = jnp.any(t_lo != 0, axis=-1).astype(jnp.int32)
    hi_cols = t_hi + mp[..., L:]
    hi_cols = hi_cols.at[..., 0].add(carry)
    out, _ = carry_fix(hi_cols)
    return out


def mont_sqr(ctx: FieldCtx, a: jnp.ndarray, a_norm: bool = False) -> jnp.ndarray:
    an = a if a_norm else normalize(a)
    return mont_mul(ctx, an, an, a_norm=True, b_norm=True)


# ---------------------------------------------------------------------------
# Canonicalisation / comparisons (cold paths)
# ---------------------------------------------------------------------------


def reduce_full(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Any loose representative -> canonical [0, p) in the same Montgomery
    domain: REDC against (R mod p) re-tightens, one conditional subtraction
    finishes."""
    t = mont_mul(ctx, a, _const(ctx.one_mont, a))
    return cond_sub(ctx, t, ctx.p_limbs)


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
    t = mont_mul(ctx, a, _const(ctx.one_plain, a))
    return cond_sub(ctx, t, ctx.p_limbs)


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
    xn = normalize(x)
    bits = np.array([int(b) for b in bin(e)[2:]], np.int32)

    def body(acc, bit):
        acc = mont_sqr(ctx, acc, a_norm=True)
        acc_m = mont_mul(ctx, acc, xn, a_norm=True, b_norm=True)
        return jnp.where(bit != 0, acc_m, acc), None

    acc, _ = jax.lax.scan(body, xn, jnp.asarray(bits[1:]))
    return acc


def inv(ctx: FieldCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion x^(p-2) — constant-time, batched (TPU analogue of
    the addition-chain FP_inv, fp_BLS12381.cpp:674-900).  inv(0) = 0."""
    return pow_fixed(ctx, x, ctx.params.modulus - 2)


def sqrt(ctx: FieldCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Principal root x^((p+1)/4), p = 3 mod 4.  Caller checks is_qr."""
    assert ctx.params.modulus % 4 == 3
    return pow_fixed(ctx, x, (ctx.params.modulus + 1) // 4)


def invsqrt(ctx: FieldCtx, x: jnp.ndarray):
    """(inverse, sqrt-candidate) via one shared progenitor chain
    t = x^((p-3)/4): sqrt = x*t, inv = t^4*x (ref FP_invsqrt,
    fp_BLS12381.cpp:674-900)."""
    assert ctx.params.modulus % 4 == 3
    t = pow_fixed(ctx, x, (ctx.params.modulus - 3) // 4)
    s = mont_mul(ctx, t, x)
    inv_ = mont_mul(ctx, mont_sqr(ctx, mont_sqr(ctx, t)), x)
    return inv_, s


def is_qr(ctx: FieldCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Euler criterion; True for 0."""
    t = pow_fixed(ctx, x, (ctx.params.modulus - 1) // 2)
    return jnp.logical_or(eq(ctx, t, one(ctx, x.shape[:-1])), is_zero(ctx, x))


# ---------------------------------------------------------------------------
# Batch inversion (Montgomery's trick) for short chains
# ---------------------------------------------------------------------------


def batch_inv(ctx: FieldCtx, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Invert along `axis` with one Fermat inversion via prefix products.
    Zeros map to zero without poisoning the rest.  Best for short axes; for
    wide batches plain inv() is already fully parallel."""
    x = jnp.moveaxis(x, axis, 0)
    zeros = is_zero(ctx, x)
    safe = jnp.where(zeros[..., None], one(ctx, x.shape[:-1]), normalize(x))

    def fwd(carry, xi):
        nxt = mont_mul(ctx, carry, xi, a_norm=True, b_norm=True)
        return nxt, carry

    total, prefix = jax.lax.scan(fwd, one(ctx, x.shape[1:-1]), safe)
    tinv = inv(ctx, total)

    def bwd(carry, args):
        xi, pre = args
        out = mont_mul(ctx, carry, pre, a_norm=True, b_norm=True)
        nxt = mont_mul(ctx, carry, xi, a_norm=True, b_norm=True)
        return nxt, out

    _, outs = jax.lax.scan(bwd, normalize(tinv), (safe, prefix), reverse=True)
    outs = jnp.where(zeros[..., None], jnp.zeros_like(outs), outs)
    return jnp.moveaxis(outs, 0, axis)


# ---------------------------------------------------------------------------
# Host conversion helpers
# ---------------------------------------------------------------------------


def const_limbs(ctx: FieldCtx, v: int) -> np.ndarray:
    """Host int -> engine-dtype limb array (no domain conversion)."""
    return np.array(ctx.params.to_limbs(v % ctx.params.modulus), np.int32)


def mont_const(ctx: FieldCtx, v: int) -> np.ndarray:
    """Host int -> Montgomery-domain limb constant."""
    m = ctx.params.modulus
    return np.array(ctx.params.to_limbs(v % m * ctx.params.R_mod % m), np.int32)


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
    limbs = from_mont(ctx, limbs) if mont else reduce_full_std(ctx, limbs)
    arr = np.asarray(limbs)
    shape = arr.shape[:-1]
    if shape == ():
        return ctx.params.from_limbs(arr)
    flat = arr.reshape(-1, ctx.L)
    out = np.empty(flat.shape[0], object)
    for i in range(flat.shape[0]):
        out[i] = ctx.params.from_limbs(flat[i])
    return out.reshape(shape)


def reduce_full_std(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize standard-domain (non-Montgomery) loose limbs: value must
    already be < ~2p (e.g. fresh from host or from_mont)."""
    return cond_sub(ctx, normalize(a), ctx.p_limbs)
