#!/usr/bin/env python
"""TPU tuning/verification for the fused kernels (fields/fp32k).

Checks each fused program's Pallas output against the digit-identical XLA
fallback on device, then times the hot ops fused vs unfused.
Run on the TPU: python tools/tune_fused.py [op ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.fields import fp32k as FK
from crypto12381_tpu.fields import tower as TW
from crypto12381_tpu.params import P

CTX = FP.FP_CTX
rng = np.random.default_rng(42)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)
    np.asarray(leaves[0].ravel()[0])


def rand_fp(n):
    vals = [int.from_bytes(rng.bytes(47), "big") % P for _ in range(n)]
    return FP.from_int(CTX, vals)


def check(name):
    n_in, n_out, _ = FK.PROGRAMS[name]
    B = 512
    ins = [rand_fp(B) for _ in range(n_in)]
    t0 = time.time()
    pall = FK._fused_pallas(name)(*ins)
    sync(pall)
    print(f"{name}: pallas compile+run {time.time()-t0:.1f}s")
    xla = FK._fused_xla(name, ins)
    sync(xla)
    for i, (a, b) in enumerate(zip(pall, xla)):
        da = np.asarray(a)
        db = np.asarray(b)
        if not np.array_equal(da, db):
            bad = np.argwhere(da != db)
            print(f"  {name} out[{i}] MISMATCH at {bad[:3]}; "
                  f"pallas={da[tuple(bad[0])]} xla={db[tuple(bad[0])]}")
            return False
    print(f"  {name}: digit-identical ({n_out} outputs) OK")
    return True


def timeit(fn, *args, reps=10):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps


def bench_op(name, B=4096):
    n_in, n_out, _ = FK.PROGRAMS[name]
    ins = [rand_fp(B) for _ in range(n_in)]
    run = FK._fused_pallas(name)
    dt = timeit(run, *ins)
    # Fp-mul counts per op instance
    muls = {"fp2_mul": 3, "fp6_mul": 18, "fp12_mul": 54, "fp12_sqr": 36,
            "fp12_usqr": 18, "fp12_sparse_mul": 45, "g1_add": 14,
            "g2_add": 42, "g1_madd": 13, "g2_madd": 39}[name]
    rate = B / dt
    print(f"{name}: {rate/1e3:.1f} K ops/s at B={B} "
          f"({rate*muls/1e6:.1f} M fpmul-equiv/s, {dt*1e3:.2f} ms)")
    return rate


def bench_unfused_fp12_mul(B=4096):
    os.environ["CRYPTO12381_NO_FUSED"] = "1"
    x = jnp.stack([jnp.stack([jnp.stack([rand_fp(B), rand_fp(B)], -2)
                              for _ in range(3)], -3) for _ in range(2)], -4)
    y = x + 1.0
    fn = jax.jit(TW.fp12_mul)
    dt = timeit(fn, x, y)
    del os.environ["CRYPTO12381_NO_FUSED"]
    print(f"fp12_mul UNFUSED: {B/dt/1e3:.1f} K ops/s "
          f"({B/dt*54/1e6:.1f} M fpmul-equiv/s, {dt*1e3:.2f} ms)")


def check_composite(name, fn, n_in, muls, B=512):
    ins = [rand_fp(B) for _ in range(n_in)]

    def split(xs):
        if name in ("fp12_sqr_c", "fp12_usqr_c"):
            return (xs,)
        if name == "fp12_mul_c":
            return (xs[:12], xs[12:])
        if name == "sparse_mul_c":
            return (xs[:12], xs[12:])
        if name in ("g2_add_c",):
            c = [xs[2 * i : 2 * i + 2] for i in range(6)]
            return ((c[0], c[1], c[2]), (c[3], c[4], c[5]))
        if name == "g2_madd_c":
            c = [xs[2 * i : 2 * i + 2] for i in range(5)]
            return ((c[0], c[1], c[2]), (c[3], c[4]))

    args = split(ins)
    t0 = time.time()
    on_dev = fn(*args)
    sync(on_dev)
    print(f"{name}: compile+run {time.time()-t0:.1f}s")
    os.environ["CRYPTO12381_NO_PALLAS"] = "1"
    try:
        ref = fn(*args)
        sync(ref)
    finally:
        del os.environ["CRYPTO12381_NO_PALLAS"]
    la = jax.tree_util.tree_leaves(on_dev)
    lb = jax.tree_util.tree_leaves(ref)
    for i, (a, b) in enumerate(zip(la, lb)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            print(f"  {name} out[{i}] MISMATCH")
            return False
    print(f"  {name}: digit-identical OK")
    dt = timeit(jax.jit(fn), *args)
    rate = B / dt
    print(f"  {name}: {rate/1e3:.1f} K ops/s at B={B} "
          f"({rate*muls/1e6:.1f} M fpmul-equiv/s, {dt*1e3:.2f} ms)")
    return True


COMPOSITES = {
    "fp12_mul_c": (FK.fp12_mul_c, 24, 54),
    "fp12_sqr_c": (FK.fp12_sqr_c, 12, 36),
    "fp12_usqr_c": (FK.fp12_usqr_c, 12, 18),
    "sparse_mul_c": (FK.sparse_mul_c, 18, 45),
    "g2_add_c": (FK.g2_add_c, 12, 42),
    "g2_madd_c": (FK.g2_madd_c, 10, 39),
}


def main():
    print("device:", jax.devices()[0])
    names = sys.argv[1:] or (sorted(FK.KERNEL_OPS) + list(COMPOSITES))
    ok = True
    for n in names:
        if n in FK.KERNEL_OPS:
            ok &= check(n)
        elif n in COMPOSITES:
            fn, n_in, muls = COMPOSITES[n]
            ok &= check_composite(n, fn, n_in, muls)
    if not ok:
        print("CORRECTNESS FAILED — not timing kernels")
        return
    for n in names:
        if n in FK.KERNEL_OPS:
            bench_op(n)
    bench_unfused_fp12_mul()


if __name__ == "__main__":
    main()
