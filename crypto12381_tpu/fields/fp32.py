"""Signed 8-bit-limb Montgomery arithmetic in float32 — the TPU hot path.

TPU-native replacement for the reference's BIG/FP units
(ref: 3rd-party/miracl-core/big_B384_58.cpp, fp_BLS12381.cpp:396-483).
The reference multiplies 7x58-bit int64 limbs with int128 comba
accumulation; TPUs have no wide integer units, but their fp32 vector lanes
and bf16 MXU matmuls are *exact* on small integers.  A field element here
is (..., L) float32 limbs in base 2^8:

  * 8x8-bit products are <= 255^2 and column sums of L <= 50 of them stay
    under 2^24 — exactly representable in fp32, so the schoolbook product
    is a chain of fp32 FMAs (VPU) with no masking or splitting.
  * Montgomery REDC needs two *constant* multiplies (by n' = -p^-1 mod R
    and by p).  A constant multiply is a matmul against a banded Toeplitz
    matrix of the constant's limbs: inputs are 8-bit limbs (exact in
    bfloat16), so both run on the MXU as bf16 x bf16 -> f32 matmuls at
    full systolic-array rate, contributing ~0 to the critical path.
  * Limbs are SIGNED: a - b is one vector subtract, negation is one flip.
    There is no K-constant family and no bmax tier bookkeeping (the int16
    engine's discipline, fields/fp.py) — the static budget is simply
    |value| <= 2^12 * modulus and |limb| < 2^23 at every mont_mul input,
    restored by each mont_mul (REDC output < 2^7 * modulus, fresh limbs in
    [-1, 256]).  Chains that would compound the bound faster than their
    mont_muls reset it (the doubling terms of cyclotomic squaring ladders)
    call tighten(), a REDC-free top-limb fold contracting any budget-range
    value below ~2^11 * modulus.
  * Carry propagation is 4 rounds of exact quotient-propagation
    (q = floor(c/256); c' = (c - 256 q) + (q << limb)): starting from
    |column| < 2^24 the digits land in [-1, 256] — every value on the
    bf16/MXU path is exactly representable.  No Kogge-Stone prefix needed.

Montgomery domain: R = 2^400 for Fp (50 limbs) — the SAME R as the int16
engine (fields/fp.py, 25 x 16-bit limbs), so representations convert by
pure re-limbing (no domain shift).

Two execution paths with identical arithmetic (identical digits out):
  * XLA path: lax.scan over the 50 partial products (CPU tests, fallback);
  * Pallas path (TPU): one fused kernel per batched mont_mul — the general
    product as 50 unrolled lane-shifted FMAs on (tile, 128) f32 registers,
    the two REDC multiplies as in-kernel MXU dots.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..params import P, R as R_ORDER, MontgomeryParams

LIMB_BITS = 8
BASE = 256.0
INV_BASE = 1.0 / 256.0

#: static value budget: |value| <= 2^BUDGET * modulus at mont_mul inputs.
BUDGET_BITS = 12

FP_PARAMS8 = MontgomeryParams("fp8", P, 50, limb_bits=8)    # R = 2^400
FR_PARAMS8 = MontgomeryParams("fr8", R_ORDER, 36, limb_bits=8)  # R = 2^288


# ---------------------------------------------------------------------------
# Field context
# ---------------------------------------------------------------------------


def _f32(limbs) -> np.ndarray:
    return np.asarray(limbs, np.float32)


@dataclass(frozen=True)
class FieldCtx8:
    """Frozen per-modulus constants (host ints + device constant arrays)."""

    params: MontgomeryParams

    @property
    def L(self) -> int:
        return self.params.n_limbs

    # -- plain limb constants ------------------------------------------------

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return _f32(self.params.to_limbs(self.params.modulus))

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        return _f32(self.params.to_limbs(self.params.R_mod))

    @functools.cached_property
    def one_plain(self) -> np.ndarray:
        return _f32(self.params.to_limbs(1))

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return _f32(self.params.to_limbs(self.params.R2_mod))

    @functools.cached_property
    def off_limbs(self) -> np.ndarray:
        """C_OFF = 2^BUDGET * modulus: the signed->nonnegative offset added
        (then removed by REDC, being a multiple of p) before each carry
        normalization of a possibly-negative loose input."""
        return _f32(self.params.to_limbs((1 << BUDGET_BITS) * self.params.modulus))

    # -- REDC Toeplitz matrices (constant multiplies on the MXU) -------------

    @property
    def pad_in(self) -> int:
        """Lane padding of the L input limbs for matmuls (multiple of 8)."""
        return 64

    @functools.cached_property
    def toep_np(self) -> np.ndarray:
        """(pad_in, pad_in) f32: T[j, k] = n'_{k-j} for 0 <= k-j < L, k < L
        — (x @ T) = (x * n') mod R as raw columns."""
        L, Lp = self.L, self.pad_in
        npl = self.params.to_limbs(self.params.n_prime)
        m = np.zeros((Lp, Lp), np.float32)
        for j in range(L):
            for k in range(j, L):
                m[j, k] = npl[k - j]
        return m

    @functools.cached_property
    def toep_p(self) -> np.ndarray:
        """(pad_in, 128) f32: T[j, k] = p_{k-j} — (m @ T) = m * p as raw
        (2L-1 <= 128) columns."""
        L, Lp = self.L, self.pad_in
        pl = self.params.to_limbs(self.params.modulus)
        m = np.zeros((Lp, 128), np.float32)
        for j in range(L):
            for k in range(j, j + L):
                m[j, k] = pl[k - j]
        return m

    # -- top-limb fold (tighten) ---------------------------------------------

    @property
    def fold_i0(self) -> int:
        """First limb index folded by tighten: smallest i0 with
        8*i0 >= bits(modulus), so value(digits[:i0]) < 512 * modulus."""
        return -(-self.params.modulus.bit_length() // 8)

    @functools.cached_property
    def fold_rows(self) -> np.ndarray:
        """(L - i0, L) f32: row j = limbs(2^(8*(i0+j)) mod modulus) — folding
        digit d at limb i0+j into d * row_j preserves the value mod m."""
        i0, L = self.fold_i0, self.L
        m = self.params.modulus
        return np.stack(
            [_f32(self.params.to_limbs(pow(2, 8 * (i0 + j), m))) for j in range(L - i0)]
        )

    @functools.cached_property
    def carry_w(self) -> np.ndarray:
        """(128,) f32 weights 2^(8(i-L)) on the top few low-half columns:
        the low half of t + m*p is ~0 mod R, so its exact carry into the
        high half is round(sum cols_i * 2^(8(i-L))) — terms below i = L-8
        are < 2^-30 and are dropped (they cannot move the rounding)."""
        w = np.zeros(128, np.float32)
        for i in range(max(0, self.L - 8), self.L):
            w[i] = 2.0 ** (8 * (i - self.L))
        return w


FP_CTX = FieldCtx8(FP_PARAMS8)
FR_CTX = FieldCtx8(FR_PARAMS8)


# ---------------------------------------------------------------------------
# Carry propagation (exact quotient rounds; signed-safe)
# ---------------------------------------------------------------------------


def _shift_up(x: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    return jnp.concatenate([jnp.zeros_like(x[..., :k]), x[..., :-k]], -1)


def carry_rounds(cols: jnp.ndarray, rounds: int = 4) -> jnp.ndarray:
    """Exact base-2^8 digit normalization of f32 columns with |col| < 2^24:
    after 4 quotient rounds every digit is in [-1, 256] (value preserved as
    long as the array is wide enough that the top column's quotient is 0 —
    callers allocate 2 spare columns)."""
    c = cols
    for _ in range(rounds):
        q = jnp.floor(c * INV_BASE)
        c = (c - q * BASE) + _shift_up(q)
    return c


def _norm_in(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    """Loose signed input -> digits in [-1, 256], value in [0, R), equal to
    a + C_OFF == a (mod p).  Requires |value(a)| <= 2^BUDGET_BITS * p and
    |limbs| < 2^23 (static budget).  Carries run 2 limbs wide so transient
    top-limb quotients are never dropped (they cancel back to zero because
    the value is < R)."""
    c = a + jnp.asarray(ctx.off_limbs)
    c = jnp.concatenate([c, jnp.zeros_like(c[..., :2])], -1)
    return carry_rounds(c)[..., : ctx.L]


def normalize(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    """Public re-normalization: digits -> [-1, 256] (mod-p preserving; adds
    a multiple of p when the input was negative)."""
    return _norm_in(ctx, a)


def tighten(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    """Contract a loose signed value (|value| <= 2^BUDGET * m, |limb| < 2^23)
    to |value| < ~2^10 * m with |limb| < 2^17 — WITHOUT a REDC.

    Needed wherever op chains would otherwise compound the static value
    bound faster than mont_mul resets it (the chained-usqr ladders of the
    final exponentiation double their input bound per step: fp12_usqr has
    2*input terms).  Two steps: digit-normalize the offset value (digits in
    [-1, 256], value v + 2^BUDGET m in [0, 2^(BUDGET+1) m]), then fold every
    digit at limb index >= fold_i0 back in as digit * (2^(8i) mod m).  The
    fold terms stay < 2^19 per limb, so no carry pass is needed afterwards.
    (Explicit per-row FMAs, not a dot: f32 adds/muls are exact here, while a
    TPU f32 matmul may be lowered through lower-precision MXU passes.)
    """
    an = _norm_in(ctx, a)
    i0 = ctx.fold_i0
    lo = an[..., :i0]
    out = jnp.concatenate(
        [lo, jnp.zeros(an.shape[:-1] + (ctx.L - i0,), jnp.float32)], -1
    )
    rows = ctx.fold_rows
    for j in range(ctx.L - i0):
        out = out + an[..., i0 + j : i0 + j + 1] * jnp.asarray(rows[j])
    return out


# ---------------------------------------------------------------------------
# Raw (loose) ring operations — one XLA op each
# ---------------------------------------------------------------------------


def add(ctx: FieldCtx8, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a + b


def sub(ctx: FieldCtx8, a: jnp.ndarray, b: jnp.ndarray, bmax: int = 0) -> jnp.ndarray:
    """Signed limbs: plain subtract (bmax accepted for API compatibility
    with the int16 engine's K-constant tiers; unused here)."""
    return a - b


def neg(ctx: FieldCtx8, b: jnp.ndarray, bmax: int = 0) -> jnp.ndarray:
    return -b


def double(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    return a + a


def mul_small(ctx: FieldCtx8, a: jnp.ndarray, k: int) -> jnp.ndarray:
    assert 0 <= k < (1 << 10)
    if k == 0:
        return jnp.zeros_like(a)
    return a * np.float32(k)


# ---------------------------------------------------------------------------
# Montgomery multiplication — XLA path
# ---------------------------------------------------------------------------


def _mul_cols_scan(a: jnp.ndarray, b: jnp.ndarray, out_w: int) -> jnp.ndarray:
    """Schoolbook columns sum_{i+j=k} a_i b_j as (..., out_w) f32, via a
    lax.scan over the L partial products (compact graph; the Pallas kernel
    unrolls the same loop in-register on TPU)."""
    a, b = jnp.broadcast_arrays(a, b)
    L = a.shape[-1]
    batch = a.shape[:-1]

    def body(c, j):
        bj = jax.lax.dynamic_slice_in_dim(b, j, 1, axis=-1)
        seg = a * bj
        cur = jax.lax.dynamic_slice_in_dim(c, j, L, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(c, cur + seg, j, axis=-1), None

    c0 = jnp.zeros(batch + (out_w,), jnp.float32)
    c, _ = jax.lax.scan(body, c0, jnp.arange(L))
    return c


def _bf16_dot(x: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """Exact integer matmul: x digits in [-1, 256] (bf16-exact), m 8-bit
    constant limbs (bf16-exact), f32 accumulation."""
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        jnp.asarray(m, jnp.bfloat16),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _redc(ctx: FieldCtx8, t: jnp.ndarray) -> jnp.ndarray:
    """REDC of carried digits t (width >= 2L+2, digits [-1, 256]):
    out = (t + m*p)/R with m = (t mod R) * n' mod R.  Output digits in
    [-1, 256], |value| < 2^(2*BUDGET+2) * p^2 / R + p."""
    L, Lp = ctx.L, ctx.pad_in
    t_lo = t[..., :L]
    tl = jnp.concatenate(
        [t_lo, jnp.zeros(t.shape[:-1] + (Lp - L,), jnp.float32)], -1
    )
    m_raw = _bf16_dot(tl, ctx.toep_np)                     # (..., Lp) cols
    lane = np.arange(Lp)
    m = carry_rounds(m_raw) * _f32(lane < L)               # mod R: drop >= L
    mp = _bf16_dot(m, ctx.toep_p)                          # (..., 128) cols
    s_lo = t_lo + mp[..., :L]
    carry = jnp.round(jnp.sum(s_lo * jnp.asarray(ctx.carry_w[:L]), axis=-1))
    width = t.shape[-1] - L                                 # >= L + 2
    mp_hi = mp[..., L : 2 * L]
    mp_hi = jnp.concatenate(
        [mp_hi, jnp.zeros(mp_hi.shape[:-1] + (width - L,), jnp.float32)], -1
    )
    hi = t[..., L:] + mp_hi
    hi = hi.at[..., 0].add(carry)
    return carry_rounds(hi)[..., :L]


def _mont_mul_xla(ctx: FieldCtx8, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    L = ctx.L
    an = _norm_in(ctx, a)
    bn = _norm_in(ctx, b)
    t = carry_rounds(_mul_cols_scan(an, bn, 2 * L + 2))
    return _redc(ctx, t)


# ---------------------------------------------------------------------------
# Montgomery multiplication — Pallas TPU kernel
# ---------------------------------------------------------------------------

_TILE = 512  # batch rows per kernel program (VMEM-bound; 1024 OOMs)
#: product-loop grouping (pre-shifted copies of `a` shared per G digits of
#: b).  Tuned on the v5e 2026-08-21: G=8 > 10 > 13 > 16; TILE 512 is the
#: largest that compiles (768 slower, 1024 fails remote compile).
_PROD_G = 8
#: carry rounds inside the kernel for columns bounded by 50*2^16 < 2^22:
#: q1 <= 2^14 -> digit <= 255+2^14; q2 <= 64 -> digit <= 319; q3 in [-1,1]
#: -> digit in [-1, 256].  (norm_in keeps 4 rounds: its |limb| bound is 2^23.)
_COL_ROUNDS = 3
#: ablation switches for tools/tune_fp32.py profiling ONLY (wrong results)
_ABL_NORM = _ABL_PROD = _ABL_REDC = False


def _mm_kernel(ctx: FieldCtx8):
    """Build the fused mont_mul kernel body for one modulus."""
    L, Lp = ctx.L, ctx.pad_in

    def kernel(a_ref, b_ref, tn_ref, tp_ref, off_ref, w_ref, o_ref):
        T = a_ref.shape[0]
        zpad = jnp.zeros((T, 128 - L), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        maskL = (lane < L).astype(jnp.float32)
        onehot0 = (lane == 0).astype(jnp.float32)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (T, Lp), 1)
        maskLp = (lane_p < L).astype(jnp.float32)

        def norm_in(x):
            if _ABL_NORM:
                return jnp.concatenate([x, zpad], axis=1)
            c = jnp.concatenate([x + off_ref[:], zpad], axis=1)
            return carry_rounds(c)          # (T, 128); digits [-1, 256]

        an = norm_in(a_ref[:])
        bn = norm_in(b_ref[:])
        # ---- general product: grouped lane-shifted FMAs (VPU) ----
        # an has zeros at lanes >= L so shifted copies need no masks; the
        # G pre-shifted copies of an let each group of G digits of b share
        # one output shift (op count L*(2 + 1/G) instead of 3L).
        G = _PROD_G
        shifts = [an]
        for _ in range(1, G):
            shifts.append(
                jnp.concatenate(
                    [jnp.zeros((T, 1), jnp.float32), shifts[-1][:, :-1]], 1
                )
            )
        cols = jnp.zeros((T, 128), jnp.float32)
        for j0 in range(0, 1 if _ABL_PROD else L, G):
            tacc = shifts[0] * bn[:, j0 : j0 + 1]
            for g in range(1, min(G, L - j0)):
                tacc = tacc + shifts[g] * bn[:, j0 + g : j0 + g + 1]
            if j0:
                tacc = jnp.concatenate(
                    [jnp.zeros((T, j0), jnp.float32), tacc[:, : 128 - j0]], 1
                )
            cols = cols + tacc
        t = carry_rounds(cols, _COL_ROUNDS)  # digits [-1, 256], cols < 2L+2
        if _ABL_REDC:
            o_ref[:] = t[:, :L]
            return
        # ---- REDC: two constant multiplies on the MXU ----
        tl = t * maskL
        m_raw = jax.lax.dot_general(
            tl[:, :Lp].astype(jnp.bfloat16),
            tn_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                   # (T, Lp)
        m = carry_rounds(m_raw, _COL_ROUNDS) * maskLp
        mp = jax.lax.dot_general(
            m.astype(jnp.bfloat16),
            tp_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                   # (T, 128)
        s_lo = tl + mp * maskL
        carry = jnp.sum(s_lo * w_ref[:], axis=1, keepdims=True)
        carry = jnp.round(carry)
        hi = (
            jnp.concatenate([t[:, L:], jnp.zeros((T, L), jnp.float32)], 1)
            + jnp.concatenate([mp[:, L:], jnp.zeros((T, L), jnp.float32)], 1)
            + carry * onehot0
        )
        out = carry_rounds(hi, _COL_ROUNDS)
        o_ref[:] = out[:, :L]

    return kernel


@functools.lru_cache(maxsize=None)
def _mm_pallas(L: int, Lp: int, name: str):
    """jitted pallas_call wrapper for (rows, L) f32 x (rows, L) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ctx = FP_CTX if name == "fp8" else FR_CTX
    kernel = _mm_kernel(ctx)

    @jax.jit
    def run(a2, b2):
        n = a2.shape[0]
        grid = (n // _TILE,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, L), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TILE, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Lp, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Lp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_TILE, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(
            a2,
            b2,
            jnp.asarray(ctx.toep_np),
            jnp.asarray(ctx.toep_p),
            jnp.asarray(ctx.off_limbs)[None, :],
            jnp.asarray(ctx.carry_w)[None, :],
        )

    return run


def _use_pallas() -> bool:
    if os.environ.get("CRYPTO12381_NO_PALLAS"):
        return False
    try:
        # the tunneled TPU backend registers as "axon"; both are real TPUs
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _mont_mul_pallas(ctx: FieldCtx8, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    pad = (-n) % _TILE
    a2 = a.reshape(n, ctx.L)
    b2 = b.reshape(n, ctx.L)
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((pad, ctx.L), jnp.float32)], 0)
        b2 = jnp.concatenate([b2, jnp.zeros((pad, ctx.L), jnp.float32)], 0)
    out = _mm_pallas(ctx.L, ctx.pad_in, ctx.params.name)(a2, b2)
    if pad:
        out = out[:n]
    return out.reshape(batch + (ctx.L,))


def mont_mul(
    ctx: FieldCtx8,
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_norm: bool = False,
    b_norm: bool = False,
) -> jnp.ndarray:
    """REDC(a*b) for loose signed inputs (|value| <= 2^12 p, |limb| < 2^23).

    Output digits in [-1, 256]; |value| < 2^7 * p — globally self-reducing,
    no conditional subtraction anywhere (TPU analogue of FP_mul + FP_mod,
    ref fp_BLS12381.cpp:396-483).  The *_norm flags are accepted for parity
    with the int16 engine; normalization here is cheap and always applied.
    """
    if _use_pallas():
        return _mont_mul_pallas(ctx, a, b)
    return _mont_mul_xla(ctx, a, b)


def mont_sqr(ctx: FieldCtx8, a: jnp.ndarray, a_norm: bool = False) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


# ---------------------------------------------------------------------------
# Canonicalisation / comparisons (cold paths)
# ---------------------------------------------------------------------------


def _digits_i32(a: jnp.ndarray) -> jnp.ndarray:
    return a.astype(jnp.int32)


def borrow_sub(x: jnp.ndarray, y: jnp.ndarray):
    """Exact x - y on canonical-ish digit arrays (int32 domain, base 2^8).
    Returns (diff digits, borrow flag).  Kogge-Stone borrow prefix."""
    xi, yi = _digits_i32(x), _digits_i32(y)
    d = xi - yi
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
    out = jnp.where(t < 0, t + 256, t)
    return out.astype(jnp.float32), borrow_out


def cond_sub(ctx: FieldCtx8, x: jnp.ndarray, m_limbs: np.ndarray) -> jnp.ndarray:
    diff, borrow = borrow_sub(x, jnp.asarray(m_limbs))
    return jnp.where((borrow != 0)[..., None], x, diff)


# ---------------------------------------------------------------------------
# Exact arithmetic on CANONICAL digit arrays (value in [0, p), digits in
# [0, 255]).  No multiplies — borrow/carry machinery only.  On canonical
# digits equality of VALUES is equality of DIGITS, so group-law edge-case
# detection (x1 == x2, y1 == -y2) in the sorted-MSM batched-affine pass is
# a free integer compare instead of a reduce_full round-trip.
#
# CRITICAL invariant subtlety: carry_rounds with a FIXED round count can
# leave a digit at exactly 256 when a carry ripples into a run of
# 255-digits (the run absorbs one position per round).  Such a
# digits-in-[0,256] array is value-correct but NOT canonical — it breaks
# digit-equality compares, borrow_sub (whose generate/propagate algebra
# assumes digits < 256, so a wrong borrow adds 2^400 == ~2^19 p to the
# value) and byte serialization.  exact_carry below finishes the job with
# a Kogge-Stone carry prefix, which handles arbitrarily long ripples in
# log2(L) steps.
# ---------------------------------------------------------------------------


def exact_carry(x: jnp.ndarray) -> jnp.ndarray:
    """Exact canonical digit normalization of NONNEGATIVE integer-valued
    digits < 512: one quotient round + a Kogge-Stone carry prefix ->
    digits in [0, 255] (value preserved mod 2^(8 L))."""
    d = x.astype(jnp.int32)
    q = jnp.right_shift(d, 8)
    rem = jnp.bitwise_and(d, 255)
    s = rem + _shift_up(q)
    g = (s >= 256).astype(jnp.int32)
    p = (s == 255).astype(jnp.int32)
    n = s.shape[-1]
    shift = 1
    while shift < n:
        g = jnp.bitwise_or(g, jnp.bitwise_and(p, _shift_up(g, shift)))
        p = jnp.bitwise_and(p, _shift_up(p, shift))
        shift *= 2
    out = s + _shift_up(g)
    out = jnp.where(out >= 256, out - 256, out)
    return out.astype(jnp.float32)


def canon_sub(ctx: FieldCtx8, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for canonical a, b -> canonical digits."""
    d, borrow = borrow_sub(a, b)
    # borrow: d holds a - b + 2^(8L); adding p and dropping the top carry
    # (exact_carry keeps width L) yields a - b + p exactly.
    dp = exact_carry(d + jnp.asarray(ctx.p_limbs))
    return jnp.where((borrow != 0)[..., None], dp, d)


def canon_add(ctx: FieldCtx8, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for canonical a, b -> canonical digits."""
    return cond_sub(ctx, exact_carry(a + b), ctx.p_limbs)


def canon_neg(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p for canonical a -> canonical digits (0 stays 0)."""
    d, _ = borrow_sub(jnp.broadcast_to(jnp.asarray(ctx.p_limbs), a.shape), a)
    return cond_sub(ctx, d, ctx.p_limbs)


def canon_is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Free zero test on canonical digits."""
    return jnp.all(a == 0, axis=-1)


def canon_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Free equality test on canonical digits."""
    return jnp.all(a == b, axis=-1)


@functools.lru_cache(maxsize=None)
def _const_toep(name: str, c_key: bytes, L: int, Lp: int) -> np.ndarray:
    """(Lp, 128) f32 banded Toeplitz of the 8-bit constant limbs c:
    (an @ T) = raw product columns of an * c (width 2L-1 <= 128)."""
    c = np.frombuffer(c_key, np.float32)
    m = np.zeros((Lp, 128), np.float32)
    for j in range(L):
        for k in range(j, j + L):
            m[j, k] = c[k - j]
    return m


def _mont_mul_small(ctx: FieldCtx8, an: jnp.ndarray, c_limbs: np.ndarray) -> jnp.ndarray:
    """REDC(an * c) with NO input offset: an must already be carried digits
    in [-1, 256] with |value| < ~2^13 p (e.g. a fresh mont_mul output, or a
    _norm_in result) and c a canonical constant < p.  Then t/R < 2^-6 p, so
    the output is in (-eps*p, (1+eps) p) — fully contracted.

    c is a host constant, so the product is a banded-Toeplitz bf16 MXU
    matmul (digits in [-1, 256] and 8-bit constant limbs are bf16-exact;
    column sums of <= L 16-bit products stay under 2^22, f32-exact) — the
    same discipline as _redc's two constant multiplies.  No scan: this is
    on the batch-canonicalization hot path (reduce_full, canon1, the
    sorted-MSM merge passes), and a lax.scan would cost ~1.2 ms per
    iteration through the tunneled backend."""
    L, Lp = ctx.L, ctx.pad_in
    toep = _const_toep(
        ctx.params.name, np.asarray(c_limbs, np.float32).tobytes(), L, Lp
    )
    pad = jnp.zeros(an.shape[:-1] + (Lp - L,), jnp.float32)
    t_raw = _bf16_dot(jnp.concatenate([an, pad], -1), toep)    # (..., 128)
    t = carry_rounds(t_raw)[..., : 2 * L + 2]
    return _redc(ctx, t)


def canon1(ctx: FieldCtx8, x: jnp.ndarray) -> jnp.ndarray:
    """Any budget-legal loose signed value (|value| <= 2^BUDGET p,
    |limb| < 2^23) -> canonical [0, p) digits in the same Montgomery
    domain, with ONE multiply (reduce_full spends two): digit-normalize
    (value in [0, ~2^13 p), digits [-1, 256]), one offset-free REDC
    against R mod p (== x * R / R == x mod p; t/R < 2^-6 p so the result
    lands in (-p, 2p)), canonicalize.  The sorted-MSM merge passes call
    this once per output coordinate."""
    return _canon(ctx, _mont_mul_small(ctx, _norm_in(ctx, x), ctx.one_mont))


def _canon(ctx: FieldCtx8, t: jnp.ndarray) -> jnp.ndarray:
    """Digits with value in (-p, 2p) -> canonical [0, p): add p (covers the
    epsilon-negative case) then two conditional subtractions.

    The digit normalization must be EXACT (fixed-round carry_rounds can
    leave a 256 digit behind a 255-run — see exact_carry): the positive
    part normalizes through the Kogge-Stone carry prefix and the isolated
    -1 digits (mont outputs) subtract out through the exact borrow pass.
    """
    d = (t + jnp.asarray(ctx.p_limbs)).astype(jnp.int32)
    pos = jnp.maximum(d, 0)                    # digits <= 511
    neg = jnp.maximum(-d, 0).astype(jnp.float32)   # digits in {0, 1}
    a = exact_carry(pos.astype(jnp.float32))
    t, _ = borrow_sub(a, neg)                  # value(t + p) > 0: no borrow
    t = cond_sub(ctx, t, ctx.p_limbs)
    return cond_sub(ctx, t, ctx.p_limbs)


def reduce_full(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    """Any loose signed representative -> canonical [0, p) digits in the
    same Montgomery domain.  Two steps: a full (offset) mont_mul by R mod p
    re-tightens to < 2^7 p, then an offset-free REDC against the same small
    constant contracts below ~p, and +p / cond_sub canonicalizes."""
    y = mont_mul(ctx, a, jnp.asarray(ctx.one_mont))
    z = _mont_mul_small(ctx, y, ctx.one_mont)
    return _canon(ctx, z)


def is_zero(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(reduce_full(ctx, a) == 0, axis=-1)


def eq(ctx: FieldCtx8, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(reduce_full(ctx, a) == reduce_full(ctx, b), axis=-1)


# ---------------------------------------------------------------------------
# Montgomery domain conversion
# ---------------------------------------------------------------------------


def to_mont(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, jnp.asarray(ctx.r2_limbs))


def from_mont(ctx: FieldCtx8, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> canonical standard-domain digits in [0, p)."""
    y = mont_mul(ctx, a, jnp.asarray(ctx.one_mont))   # == a (mont), < 2^7 p
    z = _mont_mul_small(ctx, y, ctx.one_plain)        # a * R^-1, < ~p
    return _canon(ctx, z)


def one(ctx: FieldCtx8, batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(ctx.one_mont), batch_shape + (ctx.L,))


def zero(ctx: FieldCtx8, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros(batch_shape + (ctx.L,), jnp.float32)


def parity_std(a: jnp.ndarray) -> jnp.ndarray:
    """Parity of canonical standard-domain digits (FP_sign convention,
    ref fp_BLS12381.cpp:928-934)."""
    return jnp.bitwise_and(a[..., 0].astype(jnp.int32), 1)


# ---------------------------------------------------------------------------
# Exponentiation by fixed public exponents — inversion / sqrt / qr
# ---------------------------------------------------------------------------


def pow_fixed(ctx: FieldCtx8, x: jnp.ndarray, e: int) -> jnp.ndarray:
    if e == 0:
        return one(ctx, x.shape[:-1])
    xn = normalize(ctx, x)
    bits = np.array([int(b) for b in bin(e)[2:]], np.int32)

    def step(acc, bit):
        acc = mont_sqr(ctx, acc)
        acc_m = mont_mul(ctx, acc, xn)
        return jnp.where(bit != 0, acc_m, acc)

    # unrolled scan groups: the backend pays a large fixed cost per scan
    # iteration, so each iteration handles U exponent bits
    U = 4
    tail = bits[1:]
    ng = len(tail) // U
    acc = xn
    if ng:
        def group(a, b4):
            for j in range(U):
                a = step(a, b4[j])
            return a, None

        acc, _ = jax.lax.scan(
            group, acc, jnp.asarray(tail[: ng * U].reshape(ng, U))
        )
    for b in tail[ng * U :]:
        acc = step(acc, jnp.int32(int(b)))
    return acc


def inv(ctx: FieldCtx8, x: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion x^(p-2) — constant-time, batched.  inv(0) = 0."""
    return pow_fixed(ctx, x, ctx.params.modulus - 2)


def sqrt(ctx: FieldCtx8, x: jnp.ndarray) -> jnp.ndarray:
    assert ctx.params.modulus % 4 == 3
    return pow_fixed(ctx, x, (ctx.params.modulus + 1) // 4)


def is_qr(ctx: FieldCtx8, x: jnp.ndarray) -> jnp.ndarray:
    t = pow_fixed(ctx, x, (ctx.params.modulus - 1) // 2)
    return jnp.logical_or(eq(ctx, t, one(ctx, x.shape[:-1])), is_zero(ctx, x))


def invsqrt(ctx: FieldCtx8, x: jnp.ndarray):
    """(inverse, sqrt-candidate) from ONE shared progenitor power chain
    (the reference's FP_invsqrt, fp_BLS12381.cpp:674-900): for p = 3 mod 4
    t = x^((p-3)/4) gives sqrt = x*t and inv = t^4 * x — one ~380-step
    Fermat ladder where sqrt() + inv() would pay two.  The sqrt output is
    a root only when x is a QR (callers verify by squaring, as with
    sqrt())."""
    assert ctx.params.modulus % 4 == 3
    t = pow_fixed(ctx, x, (ctx.params.modulus - 3) // 4)
    xn = normalize(ctx, x)
    s = mont_mul(ctx, t, xn)
    inv_ = mont_mul(ctx, mont_sqr(ctx, mont_sqr(ctx, t)), xn)
    return inv_, s


# ---------------------------------------------------------------------------
# Batch inversion (Montgomery's trick) for short chains
# ---------------------------------------------------------------------------


def batch_inv(ctx: FieldCtx8, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, 0)
    zeros = is_zero(ctx, x)
    safe = jnp.where(zeros[..., None], one(ctx, x.shape[:-1]), x)

    def fwd(carry, xi):
        return mont_mul(ctx, carry, xi), carry

    total, prefix = jax.lax.scan(fwd, one(ctx, x.shape[1:-1]), safe)
    tinv = inv(ctx, total)

    def bwd(carry, args):
        xi, pre = args
        out = mont_mul(ctx, carry, pre)
        nxt = mont_mul(ctx, carry, xi)
        return nxt, out

    _, outs = jax.lax.scan(bwd, tinv, (safe, prefix), reverse=True)
    outs = jnp.where(zeros[..., None], jnp.zeros_like(outs), outs)
    return jnp.moveaxis(outs, 0, axis)


# ---------------------------------------------------------------------------
# Host conversion helpers & engine interop
# ---------------------------------------------------------------------------


def const_limbs(ctx: FieldCtx8, v: int) -> np.ndarray:
    """Host int -> engine-dtype limb array (no domain conversion)."""
    return _f32(ctx.params.to_limbs(v % ctx.params.modulus))


def mont_const(ctx: FieldCtx8, v: int) -> np.ndarray:
    """Host int -> Montgomery-domain limb constant."""
    return _f32(
        ctx.params.to_limbs(v % ctx.params.modulus * ctx.params.R_mod % ctx.params.modulus)
    )


def from_int(ctx: FieldCtx8, values, mont: bool = True) -> jnp.ndarray:
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((flat.shape[0], ctx.L), np.float32)
    for i, v in enumerate(flat):
        out[i] = ctx.params.to_limbs(int(v) % ctx.params.modulus)
    out = out.reshape(arr.shape + (ctx.L,))
    dev = jnp.asarray(out)
    return to_mont(ctx, dev) if mont else dev


def to_int(ctx: FieldCtx8, limbs, mont: bool = True):
    """limb array -> python ints (canonical [0, p)); scalar or object array.
    Standard-domain conversion happens on host (exact big-int arithmetic)."""
    if mont:
        limbs = from_mont(ctx, limbs)
    arr = np.asarray(jax.device_get(limbs)).astype(np.int64)
    shape = arr.shape[:-1]
    flat = arr.reshape(-1, ctx.L)
    out = np.empty(flat.shape[0], object)
    for i in range(flat.shape[0]):
        out[i] = ctx.params.from_limbs(flat[i]) % ctx.params.modulus
    if shape == ():
        return out[0]
    return out.reshape(shape)


def from_limbs16(ctx: FieldCtx8, a16: jnp.ndarray) -> jnp.ndarray:
    """int16-engine limb array (..., L16) int32 -> (..., 2*L16) f32 digits
    (value-preserving; same Montgomery domain, R identical)."""
    lo = jnp.bitwise_and(a16, 255)
    hi = jnp.right_shift(a16, 8)
    inter = jnp.stack([lo, hi], axis=-1).reshape(a16.shape[:-1] + (-1,))
    out = inter.astype(jnp.float32)
    if out.shape[-1] != ctx.L:
        out = out[..., : ctx.L]
    return out


def to_limbs16(ctx: FieldCtx8, a8: jnp.ndarray) -> jnp.ndarray:
    """digits (..., L) f32 -> int16-engine limbs (..., ceil(L/2)) int32
    (value-preserving; caller ensures digits are nonnegative, e.g. via
    reduce_full/normalize)."""
    L = ctx.L
    pad = (-L) % 2
    if pad:
        a8 = jnp.concatenate([a8, jnp.zeros_like(a8[..., :pad])], -1)
    d = a8.astype(jnp.int32).reshape(a8.shape[:-1] + (-1, 2))
    return d[..., 0] + 256 * d[..., 1]
