#!/usr/bin/env python
"""Micro-benchmark of the fused G1 madd kernel at MSM round working sets.

Usage: python tools/micro_madd.py [rows] [tile ...]
Temporarily overrides fp32k._TILE['g1_madd'] per run (fresh kernel cache
entry per tile because tile_for is read at trace time).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 524304
    tiles = [int(a) for a in sys.argv[2:]] or [128]

    import jax
    import jax.numpy as jnp

    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.fields import fp32 as F8
    from crypto12381_tpu.fields import fp32k as FK

    CTX = F8.FP_CTX
    L = CTX.L
    print(f"device: {jax.devices()[0]} rows={rows}", flush=True)

    rng = np.random.default_rng(3)
    k = int(rng.integers(1, 1 << 60))
    from crypto12381_tpu.pyref import curve as C

    p0 = C.g1_mul(C.G1_GEN, k)
    P = G1.from_affine_ints([p0[0]], [p0[1]])
    AX = jnp.broadcast_to(P[0], (rows, L))
    AY = jnp.broadcast_to(P[1], (rows, L))
    AZ = jnp.broadcast_to(P[2], (rows, L))
    q1 = C.g1_mul(C.G1_GEN, k + 1)
    Q = G1.from_affine_ints([q1[0]], [q1[1]])
    QX = jnp.broadcast_to(Q[0], (rows, L))
    QY = jnp.broadcast_to(Q[1], (rows, L))

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        jax.block_until_ready(leaves)
        np.asarray(leaves[0].ravel()[0])

    for t in tiles:
        FK._TILE["g1_madd"] = t
        FK._fused_pallas.cache_clear()
        f = jax.jit(lambda a, b, c, x, y: G1._fused_madd((a, b, c), (x, y)))
        t0 = time.time()
        out = f(AX, AY, AZ, QX, QY)
        sync(out)
        print(f"tile={t}: compile+first {time.time()-t0:.1f}s", flush=True)
        sync(f(AX, AY, AZ, QX, QY))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = f(AX, AY, AZ, QX, QY)
            sync(out)
        dt = (time.time() - t0) / reps
        mulrate = rows * 14 / dt
        print(f"tile={t}: {dt*1e3:.1f} ms / {rows} rows = "
              f"{mulrate/1e6:.1f} M muls/s", flush=True)


if __name__ == "__main__":
    main()
