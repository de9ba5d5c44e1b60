"""Batched Pippenger multi-scalar multiplication on TPU.

First-class version of the op the reference keeps disconnected
(ECP_muln, ecp_BLS12381.cpp:1112-1148; g1_point.hpp:361-371 calls it only
from a commented-out block): MSM is the large-N workhorse of every Σ/Π
protocol loop, so here it is a tuned batched device kernel.

Design (TPU-first):
  * scalars decompose into K = ceil(255/c) unsigned c-bit windows; all
    windows are processed simultaneously (they share point loads);
  * G parallel lanes each own a private (K, 2^c) bucket grid; a lax.scan
    walks n/G point blocks and each lane gather-adds its point into one
    bucket per window (indices are unique per step by construction, so the
    scatter is race-free);
  * lanes reduce by a log2(G) tree of complete point adds; buckets collapse
    with the classic suffix-sum (2*(2^c-1) vectorized adds); windows
    combine Horner-style with c doublings per window;
  * complete RCB formulas make every add exception-free (identity buckets,
    repeated points, doubling collisions — no branches, bucket 0 is simply
    dropped by the weight-0 collapse).

Total point-add count: n*K (bucket phase, the textbook Pippenger cost) +
G*K*2^c/… for reductions — wall-clock is the n/G-step scan with G*K lane
parallelism.  Multi-device sharding (points split across a mesh,
per-device partial MSMs combined with a log-tree of adds) lives in
parallel/sharding.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import g1 as G1
from ..curves import g2 as G2
from ..curves import weierstrass as W

N_BITS = 255


def window_digits(e_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """(..., L) std-domain Fr limbs -> (..., K) c-bit window digits
    (unsigned).  Each digit straddles at most two 16-bit limbs."""
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


def _unstack(A, e_ndim: int):
    ax = A.ndim - 1 - e_ndim
    return tuple(jnp.take(A, i, axis=ax) for i in range(3))


def _stack(p, e_ndim: int):
    return jnp.stack(p, axis=p[0].ndim - e_ndim)


def pad_inputs(points, scalars_std, lanes: int, ops: W.FieldOps):
    """Pad n to a multiple of lanes with identity points / zero scalars."""
    n = scalars_std.shape[0]
    pad = (-n) % lanes
    if pad == 0:
        return points, scalars_std
    idp = W.identity(ops, (pad,))
    points = tuple(jnp.concatenate([p, i], 0) for p, i in zip(points, idp))
    scalars_std = jnp.concatenate(
        [scalars_std, jnp.zeros((pad, scalars_std.shape[1]), scalars_std.dtype)], 0
    )
    return points, scalars_std


def msm(points, scalars_std, ops: W.FieldOps, c: int = 6, lanes: int = 256):
    """sum_i scalars[i] * points[i].

    points: projective (X, Y, Z) tuple of (n, *elem) field arrays;
    scalars_std: (n, L) standard-domain Fr limbs; n % lanes == 0 (use
    pad_inputs).  lanes must be a power of two.  Returns one projective
    point.
    """
    e_ndim = ops.elem_ndim
    n = scalars_std.shape[0]
    K = -(-N_BITS // c)
    nbuck = 1 << c
    assert n % lanes == 0 and (lanes & (lanes - 1)) == 0
    steps = n // lanes

    digits = window_digits(scalars_std, c).reshape(steps, lanes, K)
    P = _stack(points, e_ndim)                        # (n, 3, *elem)
    P = P.reshape((steps, lanes) + P.shape[1:])

    zero = ops.zero((lanes, K, nbuck))
    one = ops.one((lanes, K, nbuck))
    buckets = jnp.stack([zero, one, zero], axis=3)    # (lanes,K,nbuck,3,*e)

    lane_idx = jnp.arange(lanes)[:, None]
    win_idx = jnp.arange(K)[None, :]

    def step(buckets, args):
        pts, ds = args                                # (lanes,3,*e), (lanes,K)
        cur = buckets[lane_idx, win_idx, ds]          # (lanes,K,3,*e)
        cur_t = _unstack(cur, e_ndim)
        p_t = tuple(x[:, None] for x in _unstack(pts, e_ndim))
        new = W.add(ops, cur_t, p_t)
        buckets = buckets.at[lane_idx, win_idx, ds].set(_stack(new, e_ndim))
        return buckets, None

    buckets, _ = jax.lax.scan(step, buckets, (P, digits))

    # lane tree-reduction -> (K, nbuck, 3, *e)
    g = lanes
    while g > 1:
        half = g // 2
        a = _unstack(buckets[:half], e_ndim)
        b = _unstack(buckets[half:g], e_ndim)
        buckets = _stack(W.add(ops, a, b), e_ndim)
        g = half
    buckets = buckets[0]                              # (K, nbuck, 3, *e)

    # bucket collapse: S_k = sum_{b>=1} b * bucket[k,b] via suffix sums
    def collapse(carry, b):
        run, total = carry
        bp = _unstack(buckets[:, b], e_ndim)
        run = W.add(ops, run, bp)
        total = W.add(ops, total, run)
        return (run, total), None

    (run, total), _ = jax.lax.scan(
        collapse,
        (W.identity(ops, (K,)), W.identity(ops, (K,))),
        jnp.arange(nbuck - 1, 0, -1),
    )
    S = _stack(total, e_ndim)                         # (K, 3, *e)

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


def msm_g1(points, scalars_std, c: int = 6, lanes: int = 256):
    return msm(points, scalars_std, G1.ops(), c, lanes)


def msm_g2(points, scalars_std, c: int = 6, lanes: int = 256):
    return msm(points, scalars_std, G2.ops(), c, lanes)
