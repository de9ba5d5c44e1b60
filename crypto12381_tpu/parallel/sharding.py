"""Multi-chip execution over a jax.sharding.Mesh.

The reference is strictly single-process (SURVEY §2.4: no threads, no
distributed backend).  This module is the scaling axis the TPU build adds:
points/scalars/pairing batches shard across a device mesh with shard_map,
partial results ride ICI through XLA collectives (all_gather of tiny
per-device partials; no NCCL/MPI analogue is needed because XLA provides
the transport).

Patterns:
  * sharded MSM — each device Pippengers its point shard, the D partial
    points are all-gathered (D * one point of traffic) and combined with a
    log-tree of complete adds, replicated on every device;
  * sharded multi-pairing — per-device Miller products, all_gather, local
    Fp12 product, one shared final exponentiation;
  * sharded batched pairing — embarrassingly parallel, output stays
    sharded.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS
from jax.experimental.shard_map import shard_map

from ..curves import g1 as G1
from ..curves import weierstrass as W
from ..fields import tower as TW
from ..msm import pippenger as MSM
from ..pairing import pairing as PAIR

AXIS = "d"


def default_mesh(devices: Sequence | None = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(devs, (AXIS,))


def _tree_reduce_points(ops, stacked, e_ndim):
    """(D, 3, *elem) stacked points -> one point tuple via log-tree adds."""
    D = stacked.shape[0]
    while D > 1:
        half = D // 2
        rest = stacked[2 * half :]
        a = MSM._unstack(stacked[:half], e_ndim)
        b = MSM._unstack(stacked[half : 2 * half], e_ndim)
        s = MSM._stack(W.add(ops, a, b), e_ndim)
        stacked = jnp.concatenate([s, rest], 0) if rest.shape[0] else s
        D = stacked.shape[0]
    return MSM._unstack(stacked[0], e_ndim)


def sharded_msm(mesh: Mesh, points, scalars_std, ops=None, c: int = 6,
                lanes: int = 256, gen_affine=None):
    """MSM with points/scalars sharded over the mesh's AXIS.

    points: projective (X, Y, Z) of (n, *elem); n divisible by
    (#devices * lanes).  Returns a replicated projective point tuple.
    """
    ops = ops or G1.ops()
    gen_affine = gen_affine or MSM._gen_affine_g1()
    e_ndim = ops.elem_ndim
    pspec = PS(AXIS)

    def local(X, Y, Z, s):
        part = MSM.msm((X, Y, Z), s, ops, c=c, lanes=lanes,
                       gen_affine=gen_affine)
        stacked = MSM._stack(part, e_ndim)            # (3, *elem)
        allp = jax.lax.all_gather(stacked, AXIS)      # (D, 3, *elem)
        return MSM._stack(_tree_reduce_points(ops, allp, e_ndim), e_ndim)

    fn = jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec),
        out_specs=PS(),
        check_rep=False,
    ))
    out = fn(points[0], points[1], points[2], scalars_std)
    return MSM._unstack(out, e_ndim)


def sharded_multi_pairing(mesh: Mesh, p_affs, q_affs):
    """prod_i e(P_i, Q_i) with the pair batch sharded over the mesh.

    p_affs: (x, y) Fp arrays (n, L); q_affs: (X, Y) Fp2 arrays (n, 2, L).
    Per-device Miller products combine via all_gather + local Fp12 product;
    the final exponentiation runs once on the replicated product.
    """

    def local(px, py, qx, qy):
        f = PAIR.multi_miller((px, py), (qx, qy))     # (2,3,2,L)
        allf = jax.lax.all_gather(f, AXIS)            # (D, 2,3,2,L)
        D = allf.shape[0]
        acc = allf[0]
        for i in range(1, D):
            acc = TW.fp12_mul(acc, allf[i])
        return PAIR.final_exp(acc)

    fn = jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(PS(AXIS), PS(AXIS), PS(AXIS), PS(AXIS)),
        out_specs=PS(),
        check_rep=False,
    ))
    return fn(p_affs[0], p_affs[1], q_affs[0], q_affs[1])


def sharded_batched_pairing(mesh: Mesh, p_affs, q_affs):
    """Elementwise e(P_i, Q_i) for a sharded batch; output stays sharded."""

    def local(px, py, qx, qy):
        return PAIR.pairing_affine((px, py), (qx, qy))

    fn = jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(PS(AXIS), PS(AXIS), PS(AXIS), PS(AXIS)),
        out_specs=PS(AXIS),
        check_rep=False,
    ))
    return fn(p_affs[0], p_affs[1], q_affs[0], q_affs[1])


def sharded_ps_verify(mesh: Mesh, s1, s2, g2e, X2e, Y2e, ms_std):
    """End-to-end PS batched verify sharded over the mesh (protocol-level
    sharding, not just a raw kernel): each device runs the FULL device
    path on its batch shard — the GS G2 ladder for X2 * Y2^m, the
    shared-squaring double-ate, one final exponentiation, the is_one
    check.  Embarrassingly parallel (zero collectives; the output stays
    sharded and is gathered by the host fetch).

    s1, s2: api.batch.G1Vec of shape (B,); g2e/X2e/Y2e: scalar host
    G2Elements; ms_std: (B, L) Fr std limbs.  Uneven batches pad with
    identity signatures (their slot verifies True and is sliced off).
    Returns a (B,) bool array.
    """
    from ..api import batch as BT

    B = ms_std.shape[0]
    D = mesh.devices.size
    Bp = -(-B // D) * D
    pad = Bp - B

    def padded(vec):
        if pad == 0:
            return vec.p
        idp = BT.G1Vec.identity((pad,)).p
        return tuple(
            jnp.concatenate([c, i], 0) for c, i in zip(vec.p, idp)
        )

    s1p = padded(s1)
    s2p = padded(s2)
    msp = (
        ms_std
        if pad == 0
        else jnp.concatenate(
            [ms_std, jnp.zeros((pad, ms_std.shape[1]), ms_std.dtype)], 0
        )
    )
    X2v = BT.G2Vec.from_elements([X2e])
    Y2v = BT.G2Vec.from_elements([Y2e])
    g2v = BT.G2Vec.from_elements([g2e])

    def local(s1x, s1y, s1z, s2x, s2y, s2z, ms):
        nloc = ms.shape[0]
        v1 = BT.G1Vec((s1x, s1y, s1z))
        v2 = BT.G1Vec((s2x, s2y, s2z))
        t = X2v.broadcast_to((nloc,)) * (
            Y2v.broadcast_to((nloc,)) ** BT.ZpVec(ms)
        )
        ok = BT.pair_prod(
            (v1, t), (v2.inverse(), g2v.broadcast_to((nloc,)))
        ).is_one()
        return ok

    pspec = PS(AXIS)
    fn = jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec,) * 7,
        out_specs=pspec,
        check_rep=False,
    ))
    ok = fn(*s1p, *s2p, msp)
    import numpy as np

    return np.asarray(ok)[:B]
