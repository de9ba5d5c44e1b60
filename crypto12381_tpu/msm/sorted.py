"""Sort-based batched-affine Pippenger MSM — the large-N G1 workhorse.

Second-generation MSM kernel (replacing msm/pippenger.py's scan-carried
bucket-grid scatter on the single-chip hot path; that version remains as
the generic / sharded fallback).  The scatter architecture is capped by
XLA's in-place scatter threshold (~160 MB bucket grid -> c = 8, 33
windows, 13 muls per complete mixed add = ~429 field muls per point).
This module removes the bucket grid from the accumulation phase, which
unlocks c = 16 (17 windows) and a batched-affine first pass (~7 muls per
add):

  per window (a `lax.scan` over the 17 windows, ONE compiled body):
    1. sort the n signed window digits (jax.lax.sort_key_val on
       |digit|, carrying the point index) — equal buckets become runs;
    2. pass 1: merge adjacent equal-key pairs with a BATCHED AFFINE
       addition: all pair denominators are known before any addition
       happens (adjacent sorted entries), so ONE Montgomery block
       inversion serves the whole pass (~3 muls/add amortized, one
       shared Fermat chain).  Affine add = 5M + 2S vs 13M for the
       complete projective mixed add.  Edge cases cost no multiplies:
       coordinates are canonical digits, so x1 == x2 and y1 == -y2 are
       free integer compares, and the doubling denominator 2*y1 equals
       the always-computed y1 + y2 in exactly that case;
    3. passes 2..ceil(log2(n)): pair-merge survivors with the complete
       projective addition (fused RCB kernel — branchless, absorbs the
       infinities adversarial P + (-P) runs produce), compacting into
       statically shrinking arrays (size' = size/2 + nbuck/2 bounds the
       survivor count for EVERY input distribution); passes whose
       static size cannot shrink further are wrapped in `lax.cond` and
       skip at runtime once no mergeable runs remain (typical data
       finishes in ~log2(n/nbuck) + 3 passes; adversarial
       single-bucket inputs use all of them and stay correct);
    4. scatter the surviving unique-key entries into this window's row
       of a dense (K, nbuck, point) grid — collision-free by
       construction (keys are unique after the merge passes);
  then collapse all K windows' buckets at once with the shared
  O(sqrt(nbuck)) split weighted-suffix scheme (msm.pippenger), and
  Horner-combine the K window sums with c doublings each.

Reference counterpart: ECP_muln (3rd-party/miracl-core/
ecp_BLS12381.cpp:1112-1148 — serial Pippenger, unsigned 4-bit windows);
the signed-digit decomposition, sort/merge scheduling, block inversion
and completeness discipline here are TPU-native design, not a port.

fp32-engine only (the canonical-digit tricks are limb-scheme specific);
`CRYPTO12381_FP_ENGINE=int16` callers keep the generic scan MSM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import g1 as G1
from ..curves import weierstrass as W
from ..fields import fp32 as F8
from . import pippenger as MSM

CTX = F8.FP_CTX
L = CTX.L

#: sentinel bucket key for dead / padding slots (> any real |digit|)
_SENT = np.int32(1 << 24)


# ---------------------------------------------------------------------------
# Montgomery block inversion (one Fermat chain per call, batched over rows)
# ---------------------------------------------------------------------------


def block_batch_inv(v: jnp.ndarray, zeros=None, B: int = 128,
                    U: int = 4) -> jnp.ndarray:
    """Elementwise modular inverse of (m, L) loose values with ONE Fermat
    chain: the m values split into B-element columns; a B/U-iteration
    scan builds running products per column, one batched Fermat inversion
    handles the m/B column totals, and the backward scan unwinds.

    `zeros`: optional (m,) bool marking zero inputs (free when the caller
    holds canonical digits); if None a reduce_full-based test is paid.
    Zero inputs return 0 (Fermat semantics).  ~3 muls per element.
    B trades Fermat-chain rows (m/B) against scan iterations (B/U): the
    v2 MSM passes use B=512/U=32 (16 iterations, chain on CH/512 rows)."""
    m = v.shape[0]
    if zeros is None:
        zeros = F8.is_zero(CTX, v)
    safe = jnp.where(zeros[..., None], F8.one(CTX, (m,)), v)
    pad = (-m) % (B * U)
    if pad:
        safe = jnp.concatenate([safe, F8.one(CTX, (pad,))], 0)
    cols = safe.shape[0] // B
    zb = jnp.moveaxis(safe.reshape((cols, B, L)), 1, 0)     # (B, cols, L)
    zg = zb.reshape((B // U, U, cols, L))

    def fwd(carry, zs):
        pres = []
        for j in range(U):
            pres.append(carry)
            carry = F8.mont_mul(CTX, carry, zs[j])
        return carry, jnp.stack(pres, 0)

    total, prefix = jax.lax.scan(fwd, F8.one(CTX, (cols,)), zg)
    tinv = F8.inv(CTX, total)

    def bwd(carry, args):
        zs, pres = args
        outs = [None] * U
        for j in reversed(range(U)):
            outs[j] = F8.mont_mul(CTX, carry, pres[j])
            carry = F8.mont_mul(CTX, carry, zs[j])
        return carry, jnp.stack(outs, 0)

    pg = prefix.reshape((B // U, U, cols, L))
    _, zinv = jax.lax.scan(bwd, tinv, (zg, pg), reverse=True)
    zinv = jnp.moveaxis(zinv.reshape((B, cols, L)), 0, 1).reshape(-1, L)[:m]
    return jnp.where(zeros[..., None], jnp.zeros_like(zinv), zinv)


# ---------------------------------------------------------------------------
# Pass machinery
# ---------------------------------------------------------------------------


def _run_pos(k: jnp.ndarray) -> jnp.ndarray:
    """Position of each entry inside its equal-key run (sorted keys)."""
    n = k.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])
    start = jax.lax.cummax(jnp.where(change, iota, 0))
    return iota - start


def _survivor_src(even: jnp.ndarray, m_next: int) -> jnp.ndarray:
    """Indices of the even-run-position survivors, compacted into m_next
    slots (unused slots point at index n = the padded sentinel row)."""
    n = even.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.cumsum(even.astype(jnp.int32)) - 1
    dest = jnp.where(even, pos, m_next)
    return (
        jnp.full((m_next,), n, jnp.int32).at[dest].set(iota, mode="drop")
    )


def _pad_rows(a: jnp.ndarray, fill) -> jnp.ndarray:
    """Append one sentinel row (the gather target for unused src slots)."""
    tail = jnp.broadcast_to(jnp.asarray(fill, a.dtype), (1,) + a.shape[1:])
    return jnp.concatenate([a, tail], 0)


def pass_sizes(n: int, nbuck: int) -> list[int]:
    """Static survivor-array sizes for passes 1..ceil(log2(n)): each pass
    bounds its survivor count by size/2 + runs/2 over EVERY distribution
    (run of length l leaves ceil(l/2) survivors; runs <= min(size, nbuck))."""
    sizes = []
    m = n
    for _ in range(max(1, (n - 1).bit_length())):
        nxt = min(m, -(-m // 2) + (min(m, nbuck) + 1) // 2 + 1)
        sizes.append(nxt)
        m = nxt
    return sizes


def _pair_gather(k: jnp.ndarray, m_next: int):
    """Shared pass prologue: survivor src indices + merge mask + keys."""
    n = k.shape[0]
    r = _run_pos(k)
    even = (r & 1) == 0
    src = _survivor_src(even, m_next)
    kp = _pad_rows(k, _SENT)
    ka = kp[src]
    src1 = jnp.minimum(src + 1, n)
    merge = jnp.logical_and(kp[src1] == ka, ka < _SENT)
    return src, src1, ka, merge


def _pass1_gather(k, x, y, m_next):
    """Shared pass-1 front: pair gathers + canonical edge detection."""
    src, src1, ka, merge = _pair_gather(k, m_next)
    xp, yp = _pad_rows(x, 0.0), _pad_rows(y, 0.0)
    xa, ya = xp[src], yp[src]
    xb, yb = xp[src1], yp[src1]
    # canonical-digit edge detection (free integer compares)
    xeq = F8.canon_eq(xa, xb)
    s_ab = F8.canon_add(CTX, ya, yb)          # == 2*y1 in the doubling case
    yopp = F8.canon_is_zero(s_ab)
    d_ab = F8.canon_sub(CTX, xb, xa)
    den = jnp.where(xeq[..., None], s_ab, d_ab)
    # den == 0  <=>  xeq and yopp (x1 != x2 gives d_ab != 0 by definition;
    # 2y == 0 is impossible on y^2 = x^3 + 4: no order-2 points)
    inf_out = jnp.logical_and(xeq, yopp)
    den_safe = jnp.where(inf_out[..., None], F8.one(CTX, (m_next,)), den)
    return dict(ka=ka, merge=merge, xa=xa, ya=ya, xb=xb, yb=yb, xeq=xeq,
                inf_out=inf_out, den=den_safe)


def _pass1_den(k, x, y, m_next):
    """Pass-1 denominators only (no field multiplies — safe to batch over
    all windows in one graph and invert separately)."""
    return _pass1_gather(k, x, y, m_next)["den"]


def _pass1_apply(k, x, y, dinv, m_next):
    """Pass 1 with a PRECOMPUTED denominator inverse: batched-affine pair
    merge on canonical affine coordinates.  Returns compacted
    (k', (X, Y, Z)) survivors (projective, loose digits; identity encoded
    as (0, 1, 0)).  5M + 2S per attempted add."""
    g = _pass1_gather(k, x, y, m_next)
    ka, merge, xeq, inf_out = g["ka"], g["merge"], g["xeq"], g["inf_out"]
    xa, ya, xb, yb = g["xa"], g["ya"], g["xb"], g["yb"]
    x2 = F8.mont_sqr(CTX, xa)
    num = jnp.where(
        xeq[..., None], F8.mul_small(CTX, x2, 3), F8.canon_sub(CTX, yb, ya)
    )
    lam = F8.mont_mul(CTX, num, dinv)
    lam2 = F8.mont_sqr(CTX, lam)
    x3 = lam2 - xa - xb
    y3 = F8.mont_mul(CTX, lam, xa - x3) - ya

    one = F8.one(CTX, (m_next,))
    zero = jnp.zeros_like(one)
    m1 = merge[..., None]
    i1 = jnp.logical_and(merge, inf_out)[..., None]
    live = (ka < _SENT)[..., None]
    X = jnp.where(i1, zero, jnp.where(m1, x3, xa))
    Y = jnp.where(i1, one, jnp.where(m1, y3, ya))
    Z = jnp.where(i1, zero, jnp.where(live, one, zero))
    return ka, (X, Y, Z)


def _affine_pass(k, x, y, m_next):
    """Single-graph pass 1 (inversion inline).  Used by the traceable
    msm_g1_sorted; the staged top-level entry precomputes the inverses in
    a separate quiet jit instead (see msm_g1_sorted_staged: lax.scan
    bodies carrying Pallas kernel calls go nondeterministic on the
    axon-tunneled v5e when the surrounding graph is large)."""
    g = _pass1_gather(k, x, y, m_next)
    dinv = block_batch_inv(g["den"], zeros=jnp.zeros((m_next,), bool))
    return _pass1_apply(k, x, y, dinv, m_next)


def _rcb_pass(ops, k, P, m_next):
    """Passes 2+: pair merge with the complete projective addition."""
    src, src1, ka, merge = _pair_gather(k, m_next)
    Pp = tuple(_pad_rows(c, 0.0) for c in P)
    A = tuple(c[src] for c in Pp)
    B = tuple(c[src1] for c in Pp)
    S = W.add(ops, A, B)
    out = W.select_point(ops, merge, S, A)
    # unused slots gathered the (0,0,0) sentinel row -> explicit identity
    out = W.select_point(ops, ka >= _SENT, W.identity(ops, (m_next,)), out)
    return ka, out


def _any_mergeable(k: jnp.ndarray) -> jnp.ndarray:
    return jnp.any(jnp.logical_and(k[1:] == k[:-1], k[:-1] < _SENT))


# ---------------------------------------------------------------------------
# Public MSM
# ---------------------------------------------------------------------------


def _prep(points, scalars_std, c: int, nbits: int = 258,
          affine: bool = False):
    """Front end: force-affine + canonicalize + signed window digits.
    `nbits`: scalar coverage (see signed_window_digits — 258 covers any
    256-bit input; 256 assumes canonical mod-r scalars).  `affine`: the
    caller guarantees Z == 1 rows (no identities) — skips the batch
    Z-inversion chain entirely (~1 s of the 2^20 front at round-5
    rates; the api G1Vec tracks this as z_is_one)."""
    ops = G1.ops()
    gen = MSM._gen_affine_g1()
    if affine:
        x, y = points[0], points[1]
    else:
        x, y, scalars_std = MSM.force_affine(ops, points, scalars_std, gen)
    n = x.shape[0]
    pad = (-n) % 2
    if pad:
        gx, gy = gen
        x = jnp.concatenate([x, jnp.broadcast_to(gx, (pad, L))], 0)
        y = jnp.concatenate([y, jnp.broadcast_to(gy, (pad, L))], 0)
        scalars_std = jnp.concatenate(
            [scalars_std,
             jnp.zeros((pad,) + scalars_std.shape[1:], scalars_std.dtype)], 0
        )
    # canonical affine digits: free equality compares in pass 1.  The
    # three coordinate tables are PACKED as one (n, 3, L) uint8 array:
    # canonical digits fit a byte, and the per-window sorted gathers are
    # gather-bandwidth-bound — packing cuts their traffic 4x (and one
    # fused gather replaces three).
    xc = F8.reduce_full(CTX, x)
    yc = F8.reduce_full(CTX, y)
    yn = F8.canon_neg(CTX, yc)
    tab = jnp.stack([xc, yc, yn], 1).astype(jnp.uint8)   # (n, 3, L)
    digits = MSM.signed_window_digits(scalars_std, c, nbits)  # (n, K)
    return tab, digits


def _sort_window(dk, tab):
    n = dk.shape[0]
    keys = jnp.abs(dk)
    _, sidx = jax.lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))
    skeys = keys[sidx]
    g = tab[sidx].astype(jnp.float32)                    # (n, 3, L): one gather
    xs = g[:, 0]
    ys = jnp.where((dk[sidx] < 0)[..., None], g[:, 2], g[:, 1])
    return skeys, xs, ys


def _merge_and_grid(ops, k, P, sizes, nbuck):
    """Passes 2+ and the dense bucket scatter."""
    e_ndim = ops.elem_ndim
    for m_next in sizes[1:]:
        if m_next < k.shape[0]:
            k, P = _rcb_pass(ops, k, P, m_next)
        else:
            k, P = jax.lax.cond(
                _any_mergeable(k),
                lambda a, mn=m_next: _rcb_pass(ops, a[0], a[1], mn),
                lambda a: a,
                (k, P),
            )
    # unique keys -> collision-free dense scatter (bucket 0 carries
    # weight 0 in the collapse; sentinel keys drop out of range)
    grid = MSM._stack(W.identity(ops, (nbuck,)), e_ndim)
    return grid.at[k].set(MSM._stack(P, e_ndim), mode="drop")


def _finish(grids, c: int, K: int, nbuck: int):
    """Bucket collapse over all windows + Horner window combine."""
    ops = G1.ops()
    e_ndim = ops.elem_ndim
    S = MSM._stack(
        MSM._collapse_buckets(ops, grids, nbuck, K, e_ndim), e_ndim
    )

    def horner(acc, i):
        for _ in range(c):
            acc = W.double(ops, acc)
        sk = MSM._unstack(S[i], e_ndim)
        return W.add(ops, acc, sk), None

    acc, _ = jax.lax.scan(
        horner, W.identity(ops, ()), jnp.arange(K - 1, -1, -1)
    )
    return acc


def msm_g1_sorted(points, scalars_std, c: int = 16):
    """sum_i scalars[i] * points[i] over G1 (fp32 engine) as ONE traceable
    graph (usable inside other jits; the per-window block inversions run
    inline).  For large standalone MSMs prefer msm_g1_sorted_staged.

    points: projective (X, Y, Z) of (n, L) f32 arrays; scalars_std:
    (n, 18) int32 standard-domain Fr limbs.  Returns one projective point.
    """
    ops = G1.ops()
    K = -(-258 // c)
    nbuck = (1 << (c - 1)) + 1
    tab, digits = _prep(points, scalars_std, c)
    n = tab.shape[0]
    sizes = pass_sizes(n, nbuck)

    def window(carry, dk):
        skeys, xs, ys = _sort_window(dk, tab)
        k, P = _affine_pass(skeys, xs, ys, sizes[0])
        return carry, _merge_and_grid(ops, k, P, sizes, nbuck)

    _, grids = jax.lax.scan(window, 0, jnp.moveaxis(digits, 1, 0))
    return _finish(grids, c, K, nbuck)


# ---------------------------------------------------------------------------
# Staged execution: the single-chip large-N entry point.
#
# On the axon-tunneled v5e, lax.scan bodies that carry Pallas kernel calls
# (the Montgomery block-inversion chains and the Fermat power ladder)
# produce NONDETERMINISTIC results when the surrounding compiled graph is
# large (reproduced at n = 2^20; deterministic standalone at every size).
# The staged pipeline therefore isolates every scan-carried-Pallas
# construct into its own small jit:
#   stage 1  front end (force_affine's inversion runs here, quiet);
#   stage 2  per-window sort + pass-1 denominators (NO field multiplies);
#   stage 3  ONE Montgomery block inversion over all windows' denominators
#            (one Fermat chain total — also a perf win over per-window
#            inversion);
#   stage 4  pass 1 with precomputed inverses + merge passes + scatter
#            (plain batched kernels only inside the window scan);
#   stage 5  collapse + Horner.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _staged_jits(c: int, n: int):
    import jax as _jax

    ops = G1.ops()
    K = -(-258 // c)
    nbuck = (1 << (c - 1)) + 1
    sizes = pass_sizes(n + (n % 2), nbuck)
    m1 = sizes[0]

    @_jax.jit
    def j_front(points, scalars_std):
        return _prep(points, scalars_std, c)

    @_jax.jit
    def j_dens(tab, digits):
        def window(carry, dk):
            skeys, xs, ys = _sort_window(dk, tab)
            return carry, (skeys, _pass1_den(skeys, xs, ys, m1))

        _, (skeys, dens) = _jax.lax.scan(
            window, 0, jnp.moveaxis(digits, 1, 0)
        )
        return skeys, dens

    @_jax.jit
    def j_inv(dens):
        flat = dens.reshape(-1, L)
        out = block_batch_inv(flat, zeros=jnp.zeros(flat.shape[0], bool))
        return out.reshape(dens.shape)

    @_jax.jit
    def j_rest(tab, digits, dinvs):
        def window(carry, xs_in):
            dk, dinv = xs_in
            skeys, xs, ys = _sort_window(dk, tab)
            k, P = _pass1_apply(skeys, xs, ys, dinv, m1)
            return carry, _merge_and_grid(ops, k, P, sizes, nbuck)

        _, grids = _jax.lax.scan(
            window, 0, (jnp.moveaxis(digits, 1, 0), dinvs)
        )
        return _finish(grids, c, K, nbuck)

    return j_front, j_dens, j_inv, j_rest


def msm_g1_sorted_staged_v1(points, scalars_std, c: int = 16):
    """v1 staged MSM (kept for profiling comparison; superseded by the v2
    pipeline below): five jit dispatches, double sort, projective merge
    passes.  Concrete (non-traced) inputs only."""
    n = points[0].shape[0]
    j_front, j_dens, j_inv, j_rest = _staged_jits(c, n)
    tab, digits = j_front(points, scalars_std)
    _, dens = j_dens(tab, digits)
    dinvs = j_inv(dens)
    return j_rest(tab, digits, dinvs)


# =========================================================================
# Staged pipeline v2 — the single-chip large-N entry point.
#
# Second iteration of the staged design, built from the round-4 profile of
# v1 (BASELINE.md: front 1.8 s / dens 8.8 s / inv 2.4 s / merges+collapse
# 17.7 s at 2^20 — the field-multiply floor was only ~8 s).  What changed:
#
#   * ONE sort+gather per window (v1 sorted twice: once for denominators,
#     once in the merge stage) — the sorted per-window tables (keys,
#     sign-resolved uint8 coords) persist between stages;
#   * EVERY merge pass is batched-affine (v1 used the 14-mul complete
#     projective add for passes 2+): pair denominators are known before
#     any addition, one Montgomery block inversion per pass, ~7 muls per
#     slot (3 inv share + lam + lam^2 + y3 + a one-mul canon of x3 via
#     fp32.canon1).  Survivor x stays canonical uint8 (free equality for
#     the next pass's edge detection + 4x less gather traffic); survivor
#     y stays loose f32 under a tighten() bound (|y| < 2^11 p, so the
#     pass-chain never escapes the static budget);
#   * window-batched passes: all K windows' slots flatten into FIXED
#     2^21/2^18-row chunks inside each pass jit, so the Mosaic mont-mul
#     kernel compiles at TWO row counts total instead of one per pass
#     size (each distinct (kernel, rows) pair costs 30-90 s of remote
#     compile on this backend);
#   * host-driven pass loop: a per-pass scalar fetch skips the remaining
#     passes the moment no mergeable run survives, and selects between a
#     FAST pass kernel (no doubling / infinity logic — valid whenever no
#     equal-x merge pair exists, the always case for distinct-point MSMs;
#     the free canonical-digit xeq count proves it per pass) and the
#     GENERAL kernel (doubling via 3x^2, P + (-P) -> infinity flags) that
#     adversarial inputs fall back to;
#   * pass sizes quantized (2^16 granule above 2^17, 2^14 below) so the
#     ~20 static pass shapes collapse to ~6 distinct compiled graphs.
#
# Reference counterpart: ECP_muln (3rd-party/miracl-core/
# ecp_BLS12381.cpp:1112-1148); everything above is TPU-native scheduling
# with no analogue in the serial reference.
# =========================================================================

_CH_A = 1 << 21      # big multiply-chunk rows (Mosaic instance #1)
_CH_B = 1 << 18      # small multiply-chunk rows (Mosaic instance #2)
_INV_B = 512         # inversion block length (cols = CH/B per chunk)
_INV_U = 32          # inversion scan unroll (iters = B/U per direction)


def _quantize(m: int, lo: int) -> int:
    """Round a pass size up to the shape-sharing granule (never above the
    worst-case-safe bound is needed — larger is always correct).

    INVARIANT (relied on by _pair_gather2's mode='drop' scatter): the
    quantized sizes stay monotonically non-increasing and every pass's
    output size is >= pass_sizes' worst-case survivor bound for its
    input size, so REAL-key survivors always fit m_out; only survivors
    of the sentinel-padding run may overflow, and dropping those is
    harmless.  Changing this function (or pass_sizes) to ever return a
    value below pass_sizes' bound would silently drop real points."""
    g = (1 << 14) if m <= (1 << 17) else (1 << 16)
    return min(lo, -(-m // g) * g)


def _chunk_plan(total: int) -> list[int]:
    """Fixed-size chunk composition of `total` rows: CH_A chunks then CH_B
    chunks (last one padded)."""
    plan = []
    while total >= _CH_A:
        plan.append(_CH_A)
        total -= _CH_A
    while total > 0:
        plan.append(_CH_B)
        total -= _CH_B
    return plan


def _chunked(fn, flat_args, total: int, n_out: int):
    """Apply `fn` (a fixed-rows kernel) over the chunk plan of `total`
    rows INSIDE the surrounding jit: pad to the plan, run each chunk,
    concatenate.  flat_args: list of (T, ...) arrays."""
    plan = _chunk_plan(total)
    padded = sum(plan)
    if padded > total:
        flat_args = [
            jnp.concatenate(
                [a, jnp.zeros((padded - total,) + a.shape[1:], a.dtype)], 0
            )
            for a in flat_args
        ]
    outs = [[] for _ in range(n_out)]
    off = 0
    for ch in plan:
        res = fn(*[a[off : off + ch] for a in flat_args])
        if n_out == 1:
            res = (res,)
        for i in range(n_out):
            outs[i].append(res[i])
        off += ch
    cat = [jnp.concatenate(o, 0)[:total] for o in outs]
    return cat[0] if n_out == 1 else tuple(cat)


def _pair_gather2(k: jnp.ndarray, m_out: int):
    """Window-batched pass prologue on (K, m) sorted keys: survivor src
    indices, partner indices, compacted keys, merge mask.

    The mode='drop' survivor scatter is correct only because real-key
    survivors never exceed m_out (see the invariant note on _quantize):
    m_out >= pass_sizes' bound, so any dropped survivor belongs to the
    sentinel run at the sorted tail, which carries no point data."""
    Kw, m = k.shape
    iota = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (Kw, m))
    change = jnp.concatenate(
        [jnp.ones((Kw, 1), bool), k[:, 1:] != k[:, :-1]], 1
    )
    start = jax.lax.cummax(jnp.where(change, iota, 0), axis=1)
    even = ((iota - start) & 1) == 0
    pos = jnp.cumsum(even.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(even, pos, m_out)
    rows = jnp.arange(Kw, dtype=jnp.int32)[:, None]
    src = jnp.full((Kw, m_out), m, jnp.int32).at[rows, dest].set(
        iota, mode="drop"
    )
    kp = jnp.concatenate([k, jnp.full((Kw, 1), _SENT, k.dtype)], 1)
    ka = jnp.take_along_axis(kp, src, 1)
    src1 = jnp.minimum(src + 1, m)
    kb = jnp.take_along_axis(kp, src1, 1)
    merge = jnp.logical_and(kb == ka, ka < _SENT)
    return src, src1, ka, merge


def _gath(a: jnp.ndarray, idx: jnp.ndarray, fill=0):
    """(K, m, L) table -> (K, m_out, L) rows at idx, one sentinel row."""
    tail = jnp.broadcast_to(
        jnp.asarray(fill, a.dtype), a.shape[:1] + (1,) + a.shape[2:]
    )
    ap = jnp.concatenate([a, tail], 1)
    return jnp.take_along_axis(ap, idx[:, :, None], 1)


@functools.lru_cache(maxsize=None)
def _v2_struct(m_in: int, m_out: int, general: bool):
    """Per-pass front (no Mosaic ops — fast XLA compile per shape): pair
    structure, operand materialization, denominators, xeq count."""
    import jax as _jax

    def f(k, x, y, inf):
        src, src1, ka, merge = _pair_gather2(k, m_out)
        xa = _gath(x, src)
        xb = _gath(x, src1)
        ya = _gath(y, src).astype(jnp.float32)
        yb = _gath(y, src1).astype(jnp.float32)
        xeq_digits = jnp.all(xa == xb, axis=-1)
        one = F8.one(CTX, (k.shape[0], m_out))
        if not general:
            xeq = jnp.logical_and(xeq_digits, merge)
            den = jnp.where(
                merge[..., None], xb.astype(jnp.float32) - xa.astype(jnp.float32),
                one,
            )
            n_x = jnp.sum(xeq.astype(jnp.int32))
            return ka, merge, xa, ya, xb, yb, den, n_x
        infp = jnp.concatenate(
            [inf, jnp.ones((inf.shape[0], 1), bool)], 1
        )
        ia = jnp.take_along_axis(infp, src, 1)
        ib = jnp.take_along_axis(infp, src1, 1)
        live = jnp.logical_and(merge, jnp.logical_and(~ia, ~ib))
        xeq = jnp.logical_and(xeq_digits, live)
        s_ab = ya + yb
        yopp = F8.canon_is_zero(F8.canon1(CTX, s_ab))
        inf_out = jnp.logical_and(xeq, yopp)
        add_ok = jnp.logical_and(live, ~inf_out)
        den = jnp.where(
            xeq[..., None], s_ab,
            xb.astype(jnp.float32) - xa.astype(jnp.float32),
        )
        den = jnp.where(add_ok[..., None], den, one)
        return ka, merge, xa, ya, xb, yb, den, (ia, ib, xeq, inf_out)

    return _jax.jit(f)


def _apply_math(xa, ya, xb, yb, dinv, xeq=None):
    """Batched-affine pair addition core at fixed chunk rows: ~4 muls +
    the inversion share.  xeq=None -> fast variant (no doubling)."""
    xaf = xa.astype(jnp.float32)
    xbf = xb.astype(jnp.float32)
    num = yb - ya
    if xeq is not None:
        x2 = F8.mont_sqr(CTX, xaf)
        num = jnp.where(xeq[..., None], F8.mul_small(CTX, x2, 3), num)
    lam = F8.mont_mul(CTX, num, dinv)
    lam2 = F8.mont_sqr(CTX, lam)
    x3 = F8.canon1(CTX, lam2 - xaf - xbf)
    y3 = F8.tighten(CTX, F8.mont_mul(CTX, lam, xaf - x3) - ya)
    return x3, y3


@functools.lru_cache(maxsize=None)
def _v2_apply(total: int, general: bool):
    """Per-pass multiply stage: flat (T, .) slot arrays processed in
    fixed-row chunks (shared Mosaic instances)."""
    import jax as _jax

    def fast_chunk(xa, ya, xb, yb, dinv, merge):
        x3, y3 = _apply_math(xa, ya, xb, yb, dinv)
        m1 = merge[..., None]
        x_out = jnp.where(m1, x3, xa.astype(jnp.float32))
        y_out = jnp.where(m1, y3, ya)
        return x_out.astype(jnp.uint8), y_out

    def gen_chunk(xa, ya, xb, yb, dinv, merge, ia, ib, xeq, inf_out):
        x3, y3 = _apply_math(xa, ya, xb, yb, dinv, xeq)
        live = jnp.logical_and(merge, jnp.logical_and(~ia, ~ib))
        add_ok = jnp.logical_and(live, ~inf_out)[..., None]
        take_b = jnp.logical_and(merge, jnp.logical_and(ia, ~ib))[..., None]
        x_out = jnp.where(
            add_ok, x3,
            jnp.where(take_b, xb.astype(jnp.float32), xa.astype(jnp.float32)),
        )
        y_out = jnp.where(add_ok, y3, jnp.where(take_b, yb, ya))
        inf_new = jnp.where(
            merge,
            jnp.logical_or(jnp.logical_and(ia, ib), inf_out),
            ia,
        )
        return x_out.astype(jnp.uint8), y_out, inf_new

    if general:

        def f(xa, ya, xb, yb, dinv, merge, ia, ib, xeq, inf_out):
            return _chunked(
                gen_chunk,
                [xa, ya, xb, yb, dinv, merge, ia, ib, xeq, inf_out],
                total, 3,
            )

    else:

        def f(xa, ya, xb, yb, dinv, merge):
            return _chunked(
                fast_chunk, [xa, ya, xb, yb, dinv, merge], total, 2
            )

    return _jax.jit(f)


@functools.lru_cache(maxsize=None)
def _v2_inv(total: int):
    """Per-pass denominator inversion: fixed-row chunks, each its own
    Montgomery block (one Fermat chain per chunk)."""
    import jax as _jax

    def chunk(v):
        # _chunked pads with zero rows; route them (and only them —
        # real denominators are nonzero by construction) through 1 so
        # they cannot poison the block product chains
        safe = jnp.where(
            jnp.all(v == 0, axis=-1, keepdims=True),
            F8.one(CTX, (v.shape[0],)), v,
        )
        return block_batch_inv(
            safe, zeros=jnp.zeros(v.shape[0], bool), B=_INV_B, U=_INV_U
        )

    def f(den):
        sh = den.shape
        out = _chunked(chunk, [den.reshape(-1, L)], total, 1)
        return out.reshape(sh)

    return _jax.jit(f)


@functools.lru_cache(maxsize=None)
def _v2_anymerge(Kw: int, m: int):
    import jax as _jax

    def f(k):
        return jnp.any(
            jnp.logical_and(k[:, 1:] == k[:, :-1], k[:, :-1] < _SENT)
        )

    return _jax.jit(f)


@functools.lru_cache(maxsize=None)
def _v2_jits(c: int, n: int):
    import jax as _jax

    n2 = n + (n % 2)
    K = -(-258 // c)
    nbuck = (1 << (c - 1)) + 1

    @_jax.jit
    def j_front(points, scalars_std):
        return _prep(points, scalars_std, c)

    @_jax.jit
    def j_sortg(tab, digits):
        iota = jnp.arange(n2, dtype=jnp.int32)

        def w(carry, dk):
            sk, sidx = jax.lax.sort_key_val(jnp.abs(dk), iota)
            g = tab[sidx]                                   # one row gather
            xs = g[:, 0]
            ys = jnp.where((dk[sidx] < 0)[..., None], g[:, 2], g[:, 1])
            return carry, (sk, xs, ys)

        _, out = _jax.lax.scan(w, 0, jnp.moveaxis(digits, 1, 0))
        return out

    return j_front, j_sortg, K, nbuck


@functools.lru_cache(maxsize=None)
def _v2_finish(m_last: int, K: int, nbuck: int, c: int, general: bool):
    import jax as _jax

    ops = G1.ops()
    e_ndim = ops.elem_ndim

    def f(k, x, y, inf):
        xf = x.astype(jnp.float32)
        one = F8.one(CTX, k.shape)
        zero = jnp.zeros_like(one)
        if general:
            i1 = inf[..., None]
            X = jnp.where(i1, zero, xf)
            Y = jnp.where(i1, one, y)
            Z = jnp.where(i1, zero, one)
        else:
            X, Y, Z = xf, y, one
        grid = MSM._stack(W.identity(ops, (K, nbuck)), e_ndim)
        rows = jnp.arange(K, dtype=jnp.int32)[:, None]
        kk = jnp.where(k < _SENT, k, nbuck + 7)          # drop dead slots
        grid = grid.at[rows, kk].set(
            MSM._stack((X, Y, Z), e_ndim), mode="drop"
        )
        return _finish(grid, c, K, nbuck)

    return _jax.jit(f)


def msm_g1_sorted_staged(points, scalars_std, c: int = 16):
    """Staged large-N sorted MSM v2 (see the section comment above);
    concrete (non-traced) inputs only.  Returns one projective point."""
    import numpy as _np

    n = points[0].shape[0]
    j_front, j_sortg, K, nbuck = _v2_jits(c, n)
    tab, digits = j_front(points, scalars_std)
    k, x, y = j_sortg(tab, digits)
    n2 = k.shape[1]
    sizes = pass_sizes(n2, nbuck)
    inf = None
    general = False
    m = n2
    for m_raw in sizes:
        m_out = _quantize(m_raw, m)
        if not general:
            st = _v2_struct(m, m_out, False)
            ka, merge, xa, ya, xb, yb, den, n_x = st(k, x, y, None)
            if int(_np.asarray(n_x)) > 0:
                general = True
        if general:
            if inf is None:
                inf = jnp.asarray(_np.zeros((K, m), bool))
            st = _v2_struct(m, m_out, True)
            ka, merge, xa, ya, xb, yb, den, flags = st(k, x, y, inf)
        total = K * m_out
        dinv = _v2_inv(total)(den)
        fl = [a.reshape((total,) + a.shape[2:]) for a in (xa, ya, xb, yb)]
        dv = dinv.reshape(total, L)
        mg = merge.reshape(total)
        if general:
            ia, ib, xeq, inf_out = [a.reshape(total) for a in flags]
            x, y, inf = _v2_apply(total, True)(
                fl[0], fl[1], fl[2], fl[3], dv, mg, ia, ib, xeq, inf_out
            )
            inf = inf.reshape(K, m_out)
        else:
            x, y = _v2_apply(total, False)(
                fl[0], fl[1], fl[2], fl[3], dv, mg
            )
        x = x.reshape(K, m_out, L)
        y = y.reshape(K, m_out, L)
        k = ka
        m = m_out
        if not bool(_np.asarray(_v2_anymerge(K, m)(k))):
            break
    else:
        # pass_sizes covers the worst case (ceil(log2 n) halvings), so
        # falling out of the loop with mergeable runs left is impossible
        assert not bool(_np.asarray(_v2_anymerge(K, m)(k))), \
            "sorted-MSM v2: merge passes did not converge"
    if inf is None:
        inf = jnp.asarray(_np.zeros((K, m), bool))
    return _v2_finish(m, K, nbuck, c, general)(k, x, y, inf)
