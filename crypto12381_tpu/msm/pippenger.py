"""Batched Pippenger multi-scalar multiplication on TPU.

First-class version of the op the reference keeps disconnected
(ECP_muln, ecp_BLS12381.cpp:1112-1148; g1_point.hpp:361-371 calls it only
from a commented-out block): MSM is the large-N workhorse of every Σ/Π
protocol loop, so here it is a tuned batched device kernel.

Design (TPU-first):
  * scalars decompose into K signed c-bit window digits (the offset trick:
    digits of e + Σ 2^(ci+c-1), each minus 2^(c-1), lie in
    [-2^(c-1), 2^(c-1)] — branchless, and HALVES the bucket count vs the
    reference's unsigned 4-bit windows, so c can be ~3x larger for the
    same memory: bucket-phase adds drop from n*ceil(255/4) to
    n*ceil(256/c));
  * points are forced to affine (Z=1) up front by a two-level Montgomery
    batch inversion (identity inputs become the generator with scalar 0),
    so every bucket accumulation is the 13M *mixed* complete add
    (weierstrass.madd — one fused Pallas kernel per scan step) instead of
    the 14M projective add;
  * G parallel lanes each own a private (K, 2^(c-1)+1) bucket grid; a
    lax.scan walks n/G point blocks and each lane gather-adds its
    (per-window sign-corrected) point into one bucket per window — indices
    are unique per step by construction, so the scatter is race-free;
  * lanes reduce by a log2(G) tree of complete adds; buckets collapse with
    the classic suffix-sum; windows combine Horner-style with c doublings
    per window;
  * complete RCB formulas keep every step exception-free (identity
    buckets, repeated points, doubling collisions — no branches).

Multi-device sharding (points split across a mesh, per-device partial MSMs
combined with a log-tree of adds) lives in parallel/sharding.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import g1 as G1
from ..curves import g2 as G2
from ..curves import weierstrass as W
from ..fields.fp import LIMB_BITS, LIMB_MASK, carry_fix

N_BITS = 255


def window_digits(e_std: jnp.ndarray, c: int, K: int | None = None) -> jnp.ndarray:
    """(..., L) std-domain Fr limbs -> (..., K) c-bit window digits
    (unsigned).  Each digit straddles at most two 16-bit limbs."""
    if K is None:
        K = -(-N_BITS // c)
    e = e_std.astype(jnp.uint32)
    k = np.arange(K)
    bit0 = k * c
    limb_idx = bit0 // 16
    shift = bit0 % 16
    L = e.shape[-1]
    lo = e[..., np.minimum(limb_idx, L - 1)]
    hi_idx = np.minimum(limb_idx + 1, L - 1)
    hi = jnp.where(
        jnp.asarray(limb_idx + 1 < L), e[..., hi_idx], jnp.uint32(0)
    )
    both = jnp.bitwise_or(lo, jnp.left_shift(hi, np.uint32(16)))
    dig = jnp.bitwise_and(
        jnp.right_shift(both, jnp.asarray(shift, jnp.uint32)),
        jnp.uint32((1 << c) - 1),
    )
    return dig.astype(jnp.int32)


def signed_window_digits(e_std: jnp.ndarray, c: int,
                         nbits: int = 258) -> jnp.ndarray:
    """(..., L) Fr std limbs -> (..., K) SIGNED digits in
    [-2^(c-1), 2^(c-1)], K = ceil(nbits/c), with e = Σ d_i 2^(ci).

    Branchless offset trick: f = e + Σ_i 2^(ci+c-1); the unsigned c-bit
    digits of f minus 2^(c-1) are the signed digits (no sequential borrow
    chain — jit/batch friendly, unlike the reference's per-bit recoding).

    `nbits` picks the coverage/window-count trade:
      - 258 (default): cK >= 258, so ANY 256-bit scalar decomposes
        exactly (e need not be reduced mod r: f = e + offset
        < 2^256 + 2^(cK-1)*1.01 < 2^cK) — but the top window's digits
        then concentrate on {0, 1}, which the dense-rounds MSM cannot
        tolerate (one bucket holds a ~n/2-long run);
      - 256: requires e < 2^256 - offset (any CANONICAL Zp scalar,
        e < r < 2^255, qualifies — the ZpVec/api path guarantees this).
        With c = 16 the top window's digits spread uniformly over
        ~r/2^240 ~ 2^13.9 values, so bucket runs stay near-Poisson."""
    K = -(-nbits // c)
    off = sum(1 << (c * i + c - 1) for i in range(K))
    L = e_std.shape[-1]
    off_limbs = np.array(
        [(off >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L)], np.int32
    )
    f, _ = carry_fix(e_std + off_limbs)
    return window_digits(f, c, K) - (1 << (c - 1))


def _unstack(A, e_ndim: int):
    ax = A.ndim - 1 - e_ndim
    return tuple(jnp.take(A, i, axis=ax) for i in range(3))


def _stack(p, e_ndim: int):
    return jnp.stack(p, axis=p[0].ndim - e_ndim)


def force_affine(ops: W.FieldOps, points, scalars_std, gen_affine):
    """Projective batch -> (x, y) affine batch + adjusted scalars.

    Two-level Montgomery batch inversion of the Z column (one real field
    inversion per 1024-block, itself batched): identity points (Z = 0)
    become `gen_affine` with scalar 0, so downstream mixed adds never see
    a Z != 1 operand (SURVEY hard-part #5: inversion at batch).
    """
    X, Y, Z = points
    n = scalars_std.shape[0]
    is_id = ops.is_zero(Z)
    safe = ops.select(is_id, ops.one((n,)), Z)
    U = 4
    B = 128   # block length of the sequential product chain (U-divisible)
    pad = (-n) % (B * U)
    if pad:
        safe = jnp.concatenate([safe, ops.one((pad,))], 0)
    m = safe.shape[0] // B
    zb = jnp.moveaxis(safe.reshape((m, B) + safe.shape[1:]), 1, 0)  # (B, m, ..)
    zg = zb.reshape((B // U, U) + zb.shape[1:])

    def fwd(carry, zs):
        pres = []
        for j in range(U):
            pres.append(carry)
            carry = ops.mul_many([(carry, zs[j])])[0]
        return carry, jnp.stack(pres, 0)

    total, prefix = jax.lax.scan(fwd, ops.one((m,)), zg)
    prefix = prefix.reshape((B,) + zb.shape[1:])
    tinv = ops.inv(total)

    def bwd(carry, args):
        zs, pres = args
        outs = [None] * U
        for j in reversed(range(U)):
            outs[j] = ops.mul_many([(carry, pres[j])])[0]
            carry = ops.mul_many([(carry, zs[j])])[0]
        return carry, jnp.stack(outs, 0)

    pg = prefix.reshape((B // U, U) + zb.shape[1:])
    _, zinv = jax.lax.scan(bwd, tinv, (zg, pg), reverse=True)
    zinv = zinv.reshape((B,) + zb.shape[1:])
    zinv = jnp.moveaxis(zinv, 0, 1).reshape(safe.shape)[:n]
    x, y = ops.mul_many([(X, zinv), (Y, zinv)])
    gx, gy = gen_affine
    x = ops.select(is_id, jnp.broadcast_to(gx, x.shape), x)
    y = ops.select(is_id, jnp.broadcast_to(gy, y.shape), y)
    scalars_std = jnp.where(is_id[:, None], 0, scalars_std)
    return x, y, scalars_std


def pad_affine(ops: W.FieldOps, xy, scalars_std, lanes: int, gen_affine):
    """Pad n to a multiple of lanes with generator points / zero scalars
    (any valid affine point works at scalar 0; identity has no Z=1 form)."""
    x, y = xy
    n = scalars_std.shape[0]
    pad = (-n) % lanes
    if pad == 0:
        return xy, scalars_std
    gx, gy = gen_affine
    shape1 = (pad,) + x.shape[1:]
    x = jnp.concatenate([x, jnp.broadcast_to(gx, shape1)], 0)
    y = jnp.concatenate([y, jnp.broadcast_to(gy, shape1)], 0)
    scalars_std = jnp.concatenate(
        [scalars_std, jnp.zeros((pad, scalars_std.shape[1]), scalars_std.dtype)], 0
    )
    return (x, y), scalars_std


def msm(points, scalars_std, ops: W.FieldOps, c: int = 8, lanes: int = 64,
        gen_affine=None, unroll: int = 4):
    """sum_i scalars[i] * points[i].

    points: projective (X, Y, Z) tuple of (n, *elem) field arrays;
    scalars_std: (n, L) standard-domain Fr limbs.  lanes must be a power
    of two.  gen_affine: (x, y) of any fixed non-identity affine point
    (the curve generator), used for identity replacement and padding.
    Returns one projective point.
    """
    e_ndim = ops.elem_ndim
    assert (lanes & (lanes - 1)) == 0
    K = -(-258 // c)
    nbuck = (1 << (c - 1)) + 1
    U = unroll  # point-blocks per scan iteration (backend per-step cost)

    x, y, scalars_std = force_affine(ops, points, scalars_std, gen_affine)
    (x, y), scalars_std = pad_affine(
        ops, (x, y), scalars_std, lanes * U, gen_affine
    )
    n = scalars_std.shape[0]
    steps = n // lanes

    digits = signed_window_digits(scalars_std, c).reshape(steps, lanes, K)
    P = jnp.stack([x, y], axis=1)                     # (n, 2, *e)
    P = P.reshape((steps, lanes) + P.shape[1:])

    zero = ops.zero((lanes, K, nbuck))
    one = ops.one((lanes, K, nbuck))
    buckets = jnp.stack([zero, one, zero], axis=3)    # (lanes,K,nbuck,3,*e)

    lane_idx = jnp.arange(lanes)[:, None]
    win_idx = jnp.arange(K)[None, :]

    def step(buckets, pts, ds):
        idx = jnp.abs(ds)                             # (lanes, K)
        cur = buckets[lane_idx, win_idx, idx]         # (lanes,K,3,*e)
        cur_t = _unstack(cur, e_ndim)
        px = jnp.take(pts, 0, axis=1)[:, None]        # (lanes,1,*e)
        py = jnp.take(pts, 1, axis=1)[:, None]
        neg = (ds < 0)
        py_s = ops.select(neg, ops.neg(py), py)       # (lanes,K,*e)
        px_b = jnp.broadcast_to(px, py_s.shape)
        new = W.madd(ops, cur_t, (px_b, py_s))
        return buckets.at[lane_idx, win_idx, idx].set(_stack(new, e_ndim))

    def group(buckets, args):
        pts_u, ds_u = args       # (U, lanes, 2, *e), (U, lanes, K)
        for j in range(U):
            buckets = step(buckets, pts_u[j], ds_u[j])
        return buckets, None

    Pg = P.reshape((steps // U, U) + P.shape[1:])
    Dg = digits.reshape((steps // U, U) + digits.shape[1:])
    buckets, _ = jax.lax.scan(group, buckets, (Pg, Dg))

    # lane tree-reduction -> (K, nbuck, 3, *e)
    g = lanes
    while g > 1:
        half = g // 2
        a = _unstack(buckets[:half], e_ndim)
        b = _unstack(buckets[half:g], e_ndim)
        buckets = _stack(W.add(ops, a, b), e_ndim)
        g = half
    buckets = buckets[0]                              # (K, nbuck, 3, *e)

    S = _stack(_collapse_buckets(ops, buckets, nbuck, K, e_ndim), e_ndim)

    # window combine, Horner from the top window down
    def horner(acc, k):
        for _ in range(c):
            acc = W.double(ops, acc)
        sk = _unstack(S[k], e_ndim)
        return W.add(ops, acc, sk), None

    acc, _ = jax.lax.scan(
        horner, W.identity(ops, ()), jnp.arange(K - 1, -1, -1)
    )
    return acc


def _suffix_weighted(ops: W.FieldOps, pts, m, e_ndim, unroll=4):
    """Σ_{b=0}^{m-1} b * pts[:, b] per leading row via the run/total suffix
    scan, walking b = m-1 .. 1 in unrolled groups."""

    def one_step(carry, bp):
        run, total = carry
        run = W.add(ops, run, bp)
        total = W.add(ops, total, run)
        return (run, total)

    K = pts.shape[0]
    init = (W.identity(ops, (K,)), W.identity(ops, (K,)))
    idx = np.arange(m - 1, 0, -1)
    ng = len(idx) // unroll

    def group(carry, bs):
        for j in range(unroll):
            bp = _unstack(jnp.take(pts, bs[j], axis=1), e_ndim)
            carry = one_step(carry, bp)
        return carry, None

    carry = init
    if ng:
        carry, _ = jax.lax.scan(
            group, carry, jnp.asarray(idx[: ng * unroll].reshape(ng, unroll))
        )
    for b in idx[ng * unroll :]:
        carry = one_step(carry, _unstack(pts[:, int(b)], e_ndim))
    return carry[1]


def _collapse_buckets(ops: W.FieldOps, buckets, nbuck, K, e_ndim):
    """S_k = Σ_{b>=1} b · bucket[k, b] in ~O(√nbuck) scan iterations.

    Splitting b = χ·cc + j (χ a power of two): S = Σ_j j·(Σ_cc P[cc,j])
    + χ · Σ_cc cc·(Σ_j P[cc,j]).  The two inner sums are log-depth
    batched tree reductions; the two weighted sums are short suffix
    scans.  The naive single suffix scan is nbuck-1 sequential steps —
    thousands of iterations at c >= 12 on a backend that charges ~1.2 ms
    per scan step."""
    chi = 1
    while chi * chi < nbuck:
        chi *= 2
    m = -(-nbuck // chi)
    pad = chi * m - nbuck
    if pad:
        idp = _stack(W.identity(ops, (K, pad)), e_ndim)
        buckets = jnp.concatenate([buckets, idp], axis=1)
    grid = buckets.reshape((K, m, chi) + buckets.shape[2:])

    def tree(pts, axis):
        nloc = pts.shape[axis]
        while nloc > 1:
            half = nloc // 2
            a = _unstack(jnp.take(pts, np.arange(half), axis=axis), e_ndim)
            b = _unstack(
                jnp.take(pts, np.arange(half, 2 * half), axis=axis), e_ndim
            )
            s = _stack(W.add(ops, a, b), e_ndim)
            if nloc % 2:
                s = jnp.concatenate(
                    [s, jnp.take(pts, np.arange(nloc - 1, nloc), axis=axis)],
                    axis=axis,
                )
            pts = s
            nloc = pts.shape[axis]
        return jnp.squeeze(pts, axis=axis)

    cols = tree(grid, 1)                 # (K, chi, 3, *e): Σ over cc
    rows = tree(grid, 2)                 # (K, m, 3, *e):   Σ over j
    s1 = _suffix_weighted(ops, cols, chi, e_ndim)        # Σ j·col_j
    s2 = _suffix_weighted(ops, rows, m, e_ndim)          # Σ cc·row_cc
    # S = s1 + χ·s2 (χ is a power of two: log2(χ) doublings)
    for _ in range(int(np.log2(chi))):
        s2 = W.double(ops, s2)
    return W.add(ops, s1, s2)


def _gen_affine_g1():
    g = G1.generator(())
    return (g[0], g[1])


def _gen_affine_g2():
    g = G2.generator(())
    return (g[0], g[1])


def msm_g1(points, scalars_std, c: int = 8, lanes: int = 64, unroll: int = 4):
    return msm(points, scalars_std, G1.ops(), c, lanes, _gen_affine_g1(),
               unroll)


def msm_g2(points, scalars_std, c: int = 8, lanes: int = 64, unroll: int = 4):
    return msm(points, scalars_std, G2.ops(), c, lanes, _gen_affine_g2(),
               unroll)
