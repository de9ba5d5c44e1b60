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


def block_batch_inv(v: jnp.ndarray, zeros=None) -> jnp.ndarray:
    """Elementwise modular inverse of (m, L) loose values with ONE Fermat
    chain: the m values split into 128-element columns; a 32-iteration
    scan builds running products per column, one batched Fermat inversion
    handles the m/128 column totals, and the backward scan unwinds.

    `zeros`: optional (m,) bool marking zero inputs (free when the caller
    holds canonical digits); if None a reduce_full-based test is paid.
    Zero inputs return 0 (Fermat semantics).  ~3 muls per element."""
    m = v.shape[0]
    if zeros is None:
        zeros = F8.is_zero(CTX, v)
    safe = jnp.where(zeros[..., None], F8.one(CTX, (m,)), v)
    U, B = 4, 128
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


def _prep(points, scalars_std, c: int):
    """Front end: force-affine + canonicalize + signed window digits."""
    ops = G1.ops()
    gen = MSM._gen_affine_g1()
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
    digits = MSM.signed_window_digits(scalars_std, c)    # (n, K)
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


def msm_g1_sorted_staged(points, scalars_std, c: int = 16):
    """Staged large-N MSM: five jit dispatches (see module comment above);
    concrete (non-traced) inputs only."""
    n = points[0].shape[0]
    j_front, j_dens, j_inv, j_rest = _staged_jits(c, n)
    tab, digits = j_front(points, scalars_std)
    _, dens = j_dens(tab, digits)
    dinvs = j_inv(dens)
    return j_rest(tab, digits, dinvs)
