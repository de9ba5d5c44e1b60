#!/usr/bin/env python
"""Second micro round for the dense-rounds MSM: gather layout variants,
async enqueue cost, and the multiply/inversion floor at the round working
set — run on the live device.

Usage: python tools/micro_rounds2.py [log2n] [c]
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
        print(f"{label:46s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    rng = np.random.default_rng(7)

    # enqueue cost: 50 tiny jit calls, ONE sync at the end
    f0 = jax.jit(lambda a: a + 1)
    x0 = jnp.zeros((8, 128), jnp.float32)
    sync(f0(x0))
    t0 = time.time()
    y = x0
    for _ in range(50):
        y = f0(y)
    sync(y)
    print(f"{'50 chained tiny jits, one sync':46s} "
          f"{(time.time()-t0)*1e3:9.2f} ms", flush=True)

    gidx_np = rng.integers(0, n, size=(rows,), dtype=np.int32)
    gidx = jnp.asarray(gidx_np)
    gidx_sorted = jnp.asarray(np.sort(gidx_np))

    # A. (n, 3, L) u8 random rows (baseline from micro 1)
    tab = jnp.asarray(rng.integers(0, 256, size=(n, 3, L), dtype=np.uint8))
    fA = jax.jit(lambda tb, ix: tb[ix])
    t("A: (n,3,L)u8 gather, random idx", fA, tab, gidx)
    t("A2: same, SORTED idx", fA, tab, gidx_sorted)

    # B. (n, 128) f32 single-tile rows
    tabB = jnp.asarray(
        rng.integers(0, 256, size=(n, 128)).astype(np.float32)
    )
    fB = jax.jit(lambda tb, ix: tb[ix])
    t("B: (n,128)f32 gather, random idx", fB, tabB, gidx)
    t("B2: same, SORTED idx", fB, tabB, gidx_sorted)

    # C. (n, 128) u8 rows (one u8 lane-tile)
    tabC = jnp.asarray(rng.integers(0, 256, size=(n, 128), dtype=np.uint8))
    fC = jax.jit(lambda tb, ix: tb[ix])
    t("C: (n,128)u8 gather, random idx", fC, tabC, gidx)

    # D. block gather: 16 consecutive rows per index
    T = 16
    tabD = tabB.reshape(n // T, T, 128)
    bidx = jnp.asarray(
        rng.integers(0, n // T, size=(rows // T,), dtype=np.int32)
    )
    fD = jax.jit(lambda tb, ix: tb[ix])
    t(f"D: block gather ({T},128)f32 x {rows//T}", fD, tabD, bidx)

    # E. full permutation gather (K windows of n rows) — the sorted-table
    # materialization candidate
    perm = jnp.asarray(
        np.stack([rng.permutation(n).astype(np.int32) for _ in range(K)])
    )
    fE = jax.jit(lambda tb, px: tb[px.reshape(-1)].reshape(
        (K, n, 128)))
    t(f"E: permutation gather {K}x{n} rows (n,128)f32", fE, tabB, perm,
      reps=1)

    # F. one window of permutation gather
    fF = jax.jit(lambda tb, px: tb[px])
    t(f"F: permutation gather 1x{n} rows", fF, tabB, perm[0], reps=1)

    # G. mont_mul floor at round rows (steady state)
    a = jnp.asarray(rng.integers(0, 256, size=(rows, L)).astype(np.float32))
    fG = jax.jit(lambda v: F8.mont_mul(CTX, v, v))
    t(f"G: mont_mul {rows} rows", fG, a)

    # H. the fast-round mul chain: mul + sqr + canon1 + mul + canon1-ish
    def chain(v, w):
        lam = F8.mont_mul(CTX, v, w)
        lam2 = F8.mont_sqr(CTX, lam)
        x3 = F8.canon1(CTX, lam2 - v - w)
        y3 = F8.tighten(CTX, F8.mont_mul(CTX, lam, v - x3) - w)
        return x3, y3

    fH = jax.jit(chain)
    t("H: fast-round chain (2 mul+sqr+2 canon1)", fH, a, a)

    # I. block inversion at round rows
    fI = jax.jit(
        lambda v: MS.block_batch_inv(
            v, zeros=jnp.zeros(v.shape[0], bool), B=512, U=32
        )
    )
    t(f"I: block_batch_inv {rows} (B=512,U=32)", fI, a, reps=1)

    fI2 = jax.jit(
        lambda v: MS.block_batch_inv(
            v, zeros=jnp.zeros(v.shape[0], bool), B=2048, U=64
        )
    )
    t(f"I2: block_batch_inv {rows} (B=2048,U=64)", fI2, a, reps=1)

    # J. batched sort at (K, n) — re-measure with true sync
    keys = jnp.asarray(rng.integers(0, nbuck, size=(K, n), dtype=np.int32))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (K, n))
    fJ = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, dimension=1))
    t(f"J: sort_key_val ({K},2^{logn})", fJ, keys, iota, reps=1)


if __name__ == "__main__":
    main()
