#!/usr/bin/env python
"""TPU benchmark + correctness check for the dense-rounds MSM.

Builds n points P_i = [a_i]G (m distinct scalars tiled across the batch so
the input is non-degenerate: duplicate points with different scalars
exercise the merge ladder), random 255-bit scalars s_i, and checks the
result against the host-computed [sum a_i s_i mod r]G — an exact oracle
with O(n) host INTEGER work only (no host EC).

Usage: python tools/bench_sorted_msm.py [log2_n] [c ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def sync(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)
    np.asarray(leaves[0].ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.fields import fp as FPI
    from crypto12381_tpu.msm import rounds as MR
    from crypto12381_tpu.params import R
    from crypto12381_tpu.pyref import curve as C

    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cs = [int(a) for a in sys.argv[2:]] or [16]
    n = 1 << logn
    m = min(n, 1 << 13)
    rng = np.random.default_rng(5)

    print(f"device: {jax.devices()[0]}", flush=True)
    # distinct base points via one batched GLV ladder
    a_ints = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(m)]
    a_dev = FPI.from_int(FPI.FR_CTX, a_ints, mont=False)
    t0 = time.time()
    base = jax.jit(lambda s: G1.scalar_mul(G1.generator((m,)), s))(a_dev)
    sync(base)
    print(f"base points ({m}): {time.time()-t0:.1f}s", flush=True)
    # affine table (production shape; see bench.py MSM stage)
    aff = list(G1.to_affine_ints(base))
    base = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    reps = n // m
    P = tuple(
        jnp.tile(coord, (reps,) + (1,) * (coord.ndim - 1)) for coord in base
    )

    # canonical mod-r scalars — the api/ZpVec contract msm_g1_rounds
    # requires (raw 256-bit values would overflow the nbits=256 signed
    # decomposition)
    s_ints = [int.from_bytes(rng.bytes(32), "big") % R for _ in range(n)]
    s_raw = np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(18)] for v in s_ints],
        dtype=np.int32,
    )
    expect_k = sum(a_ints[i % m] * s_ints[i] for i in range(n)) % R
    expect = C.g1_mul(C.G1_GEN, expect_k)
    s_dev = jnp.asarray(s_raw)

    for c in cs:
        fn = lambda P, s, c=c: MR.msm_g1_rounds(P, s, c=c, affine=True)
        t0 = time.time()
        res = fn(P, s_dev)
        sync(res)
        print(f"c={c}: compile+first {time.time()-t0:.1f}s", flush=True)
        got = G1.to_affine_ints(res)
        assert got == expect, f"WRONG RESULT c={c}"
        print(f"c={c}: correctness OK", flush=True)
        sync(fn(P, s_dev))
        t0 = time.time()
        sync(fn(P, s_dev))
        dt = time.time() - t0
        print(f"c={c}: n=2^{logn}: {dt*1e3:.0f} ms = {n/dt/1e3:.1f} K pts/s",
              flush=True)


if __name__ == "__main__":
    main()
