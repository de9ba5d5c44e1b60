#!/usr/bin/env python
"""Multi-chip scaling-efficiency measurement on the virtual CPU mesh.

Real multi-chip hardware is unreachable from this container (one tunneled
v5e chip), so per-device THROUGHPUT scaling is measured on an
xla_force_host_platform_device_count mesh: per mesh size d the sharded
kernels run a fixed per-device problem (weak scaling) and we record
  efficiency(d) = throughput(d) / (d * throughput(1)).
CPU timing is noisy-but-honest for the thing this measures: the extra
work/communication the sharded graph adds per device (collectives,
padding, combine trees).  Results land in BASELINE.md.

Usage: python tools/bench_scaling.py [per_device_log2n]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)
    np.asarray(leaves[0].ravel()[0])


def bench_msm(per_dev_n: int, mesh_sizes=(1, 2, 4, 8)):
    import jax.numpy as jnp

    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.parallel import sharding as SH

    rng = np.random.default_rng(3)
    out = {}
    for d in mesh_sizes:
        n = per_dev_n * d
        mesh = SH.default_mesh(jax.devices()[:d])
        base = G1.generator((n,))
        scal = jnp.asarray(
            rng.integers(0, 1 << 16, size=(n, 18), dtype=np.int32)
        ).at[:, 16:].set(0)
        fn = lambda P, s, mesh=mesh: SH.sharded_msm(mesh, P, s, c=6, lanes=64)
        _sync(fn(base, scal))
        t0 = time.time()
        _sync(fn(base, scal))
        dt = time.time() - t0
        out[d] = n / dt
        print(f"msm d={d}: n={n} {dt*1e3:.0f} ms "
              f"{out[d]/1e3:.2f} K pts/s", flush=True)
    return out


def bench_pairing(per_dev_b: int, mesh_sizes=(1, 2, 4, 8)):
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.curves import g2 as G2
    from crypto12381_tpu.parallel import sharding as SH

    out = {}
    for d in mesh_sizes:
        B = per_dev_b * d
        mesh = SH.default_mesh(jax.devices()[:d])
        g1 = G1.generator((B,))
        g2 = G2.generator((B,))
        p_aff = (g1[0], g1[1])
        q_aff = (g2[0], g2[1])
        fn = lambda p, q, mesh=mesh: SH.sharded_batched_pairing(mesh, p, q)
        _sync(fn(p_aff, q_aff))
        t0 = time.time()
        _sync(fn(p_aff, q_aff))
        dt = time.time() - t0
        out[d] = B / dt
        print(f"pairing d={d}: B={B} {dt*1e3:.0f} ms "
              f"{out[d]:.2f} pair/s", flush=True)
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    msm = bench_msm(1 << logn)
    pair = bench_pairing(4)
    print("\n| kernel | d=1 | d=2 | d=4 | d=8 |")
    print("|---|---|---|---|---|")
    for name, r in (("sharded MSM pts/s", msm),
                    ("sharded pairing /s", pair)):
        print("| " + name + " | " + " | ".join(
            f"{r[d]:.0f}" for d in (1, 2, 4, 8)) + " |")
    print("| MSM efficiency | " + " | ".join(
        f"{r/(d*msm[1]):.2f}" for d, r in sorted(msm.items())) + " |")
    print("| pairing efficiency | " + " | ".join(
        f"{r/(d*pair[1]):.2f}" for d, r in sorted(pair.items())) + " |")


if __name__ == "__main__":
    main()
