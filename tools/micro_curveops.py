#!/usr/bin/env python
"""Micro-benchmark of the fused G1 add/dbl kernels at MSM working sets.

Usage: python tools/micro_curveops.py [rows] [tile ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    tiles = [int(a) for a in sys.argv[2:]] or [256]

    import jax
    import jax.numpy as jnp

    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.fields import fp32 as F8
    from crypto12381_tpu.fields import fp32k as FK
    from crypto12381_tpu.pyref import curve as C

    CTX = F8.FP_CTX
    L = CTX.L
    print(f"device: {jax.devices()[0]} rows={rows}", flush=True)

    p0 = C.g1_mul(C.G1_GEN, 987654321)
    q0 = C.g1_mul(C.G1_GEN, 123456789)
    P = G1.from_affine_ints([p0[0]], [p0[1]])
    Q = G1.from_affine_ints([q0[0]], [q0[1]])
    A = tuple(jnp.broadcast_to(c, (rows, L)) for c in P)
    B = tuple(jnp.broadcast_to(c, (rows, L)) for c in Q)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        jax.block_until_ready(leaves)
        np.asarray(leaves[0].ravel()[0])

    for t in tiles:
        for name, nmul, f in (
            ("g1_add", 12, lambda a, b: G1._fused_add(a, b)),
            ("g1_dbl", 8, lambda a, b: G1._fused_dbl(a)),
        ):
            FK._TILE[name] = t
            FK._fused_pallas.cache_clear()
            jf = jax.jit(f)
            try:
                t0 = time.time()
                out = jf(A, B)
                sync(out)
                print(f"{name} tile={t}: compile+first {time.time()-t0:.1f}s",
                      flush=True)
            except Exception as e:
                print(f"{name} tile={t}: FAIL {str(e)[:80]}", flush=True)
                continue
            sync(jf(A, B))
            t0 = time.time()
            reps = 5
            for _ in range(reps):
                out = jf(A, B)
                sync(out)
            dt = (time.time() - t0) / reps
            print(f"{name} tile={t}: {dt*1e3:.1f} ms / {rows} rows = "
                  f"{rows*nmul/dt/1e6:.1f} M muls/s", flush=True)


if __name__ == "__main__":
    main()
