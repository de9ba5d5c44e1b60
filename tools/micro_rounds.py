#!/usr/bin/env python
"""Micro-benchmarks for the round-5 dense-rounds MSM design: measures, on
the live device, every primitive the design composes — batched sort, row
gathers at the round working set, block inversion, mont_mul, canon ops,
and jit dispatch overhead — so the architecture decision rests on measured
rates, not estimates.

Usage: python tools/micro_rounds.py [log2n] [c]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << logn

    import jax
    import jax.numpy as jnp

    from crypto12381_tpu.fields import fp32 as F8
    from crypto12381_tpu.msm import sorted as MS

    CTX = F8.FP_CTX
    L = CTX.L
    K = -(-258 // c)
    nbuck = (1 << (c - 1)) + 1
    rows = K * nbuck

    print(f"device: {jax.devices()[0]}  n=2^{logn} c={c} K={K} "
          f"nbuck={nbuck} rows/round={rows}", flush=True)

    def sync(out):
        # block_until_ready does NOT synchronize through the axon tunnel;
        # fetching one element does (same trick as profile_sorted_msm).
        leaves = jax.tree_util.tree_leaves(out)
        np.asarray(leaves[0].ravel()[0])

    def t(label, fn, *args, reps=3):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            sync(out)
        dt = (time.time() - t0) / reps
        print(f"{label:44s} {dt*1e3:9.2f} ms", flush=True)
        return out, dt

    rng = np.random.default_rng(7)

    # 0. dispatch overhead: tiny jit round trip
    f0 = jax.jit(lambda a: a + 1)
    x0 = jnp.zeros((8, 128), jnp.float32)
    t("jit dispatch roundtrip (tiny)", f0, x0, reps=10)

    # 1. batched sort (K, n) int32 key + int32 val
    keys = jnp.asarray(rng.integers(0, nbuck, size=(K, n), dtype=np.int32))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (K, n))
    f1 = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, dimension=1))
    t(f"sort_key_val ({K},2^{logn})", f1, keys, iota, reps=1)

    # 1b. single-window sort for comparison
    f1b = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, dimension=0))
    t(f"sort_key_val (2^{logn},) x1 window", f1b, keys[0], iota[0], reps=1)

    # 2. row gather from the packed uint8 table at round working set
    tab = jnp.asarray(rng.integers(0, 256, size=(n, 3, L), dtype=np.uint8))
    gidx = jnp.asarray(rng.integers(0, n, size=(rows,), dtype=np.int32))
    f2 = jax.jit(lambda tb, ix: tb[ix])
    t(f"row gather (n,3,L)u8 x {rows}", f2, tab, gidx)

    # 2b. gather to f32 directly
    f2b = jax.jit(lambda tb, ix: tb[ix].astype(jnp.float32))
    t("row gather u8 -> f32 cast", f2b, tab, gidx)

    # 2c. take_along_axis form on (K, n, L) u8
    tabw = jnp.asarray(rng.integers(0, 256, size=(K, n, L), dtype=np.uint8))
    widx = jnp.asarray(rng.integers(0, n, size=(K, nbuck), dtype=np.int32))
    f2c = jax.jit(
        lambda tb, ix: jnp.take_along_axis(tb, ix[:, :, None], 1)
    )
    t(f"take_along_axis (K,n,L)u8 -> (K,nbuck)", f2c, tabw, widx)

    # 3. mont_mul at the round working set (steady state)
    a = jnp.asarray(
        rng.integers(0, 256, size=(rows, L)).astype(np.float32)
    )
    f3 = jax.jit(lambda v: F8.mont_mul(CTX, v, v))
    t(f"mont_mul {rows} rows", f3, a)

    # 3b. four chained mont_muls (the affine-add mul chain shape)
    def chain(v):
        w = F8.mont_mul(CTX, v, v)
        w = F8.mont_sqr(CTX, w)
        w = F8.mont_mul(CTX, w, v)
        return F8.canon1(CTX, w)

    f3b = jax.jit(chain)
    t("mul+sqr+mul+canon1 chain", f3b, a)

    # 4. block inversion at the round working set
    f4 = jax.jit(
        lambda v: MS.block_batch_inv(
            v, zeros=jnp.zeros(v.shape[0], bool), B=512, U=32
        )
    )
    t(f"block_batch_inv {rows} rows (B=512,U=32)", f4, a, reps=1)

    f4b = jax.jit(
        lambda v: MS.block_batch_inv(
            v, zeros=jnp.zeros(v.shape[0], bool), B=128, U=16
        )
    )
    t(f"block_batch_inv {rows} rows (B=128,U=16)", f4b, a, reps=1)

    # 5. canonical helpers at working set
    b = jnp.asarray(
        rng.integers(0, 256, size=(rows, L)).astype(np.float32)
    )
    t("canon_sub", jax.jit(lambda u, v: F8.canon_sub(CTX, u, v)), a, b)
    t("exact_carry", jax.jit(F8.exact_carry), a)
    t("canon1", jax.jit(lambda u: F8.canon1(CTX, u)), a)

    # 6. scatter-free accumulator update (dense where/select at rows)
    m1 = jnp.asarray(rng.integers(0, 2, size=(rows, 1)).astype(bool))
    f6 = jax.jit(lambda u, v, m: jnp.where(m, u, v))
    t("dense select (rows, L)", f6, a, b, m1)

    # 7. fused W.add complete projective for comparison (rows points)
    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.curves import weierstrass as W

    ops = G1.ops()
    P = (a, b, F8.one(CTX, (rows,)))
    Q = (b, a, F8.one(CTX, (rows,)))
    f7 = jax.jit(lambda p, q: W.add(ops, p, q))
    t(f"W.add complete (rows={rows})", f7, P, Q, reps=1)

    f7b = jax.jit(lambda p, q: W.madd(ops, p, (q[0], q[1])))
    t(f"W.madd mixed (rows={rows})", f7b, P, Q, reps=1)


if __name__ == "__main__":
    main()
