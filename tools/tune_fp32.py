#!/usr/bin/env python
"""Tune the fp32 Pallas mont_mul kernel on real TPU hardware.

For each (G, TILE) variant: correctness-check REDC(a*b) against exact host
bigint arithmetic on random loose inputs, then measure steady-state
mont_mul/s at a large batch.  Prints one line per variant.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from crypto12381_tpu.fields import fp32 as F

CTX = F.FP_CTX
P = CTX.params.modulus
R = 1 << (8 * CTX.L)
RINV = pow(R, -1, P)


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x.ravel()[0])


def _loose(rng, n):
    """Random loose signed inputs honoring the budget: |value| <= 2^12 * p,
    digits of |v| in [0,255] with a global sign."""
    lim = (1 << 12) * P
    out = np.zeros((n, CTX.L), np.float32)
    for i in range(n):
        v = int(rng.integers(0, 2**63)) * lim // 2**63
        s = 1 if rng.integers(0, 2) else -1
        out[i] = s * np.asarray(CTX.params.to_limbs(v), np.float32)
    return out


def check(n=1024):
    rng = np.random.default_rng(3)
    a = _loose(rng, n)
    b = _loose(rng, n)
    out = F._mont_mul_pallas(CTX, jnp.asarray(a), jnp.asarray(b))
    out = np.asarray(out).astype(np.int64)
    w = 256 ** np.arange(CTX.L, dtype=object)
    va = (a.astype(np.int64).astype(object) * w).sum(1)
    vb = (b.astype(np.int64).astype(object) * w).sum(1)
    vo = (out.astype(object) * w).sum(1)
    want = [(int(x) * int(y) * RINV) % P for x, y in zip(va, vb)]
    got = [int(v) % P for v in vo]
    bad = sum(1 for x, y in zip(want, got) if x != y)
    return bad


def rate(logn=22, reps=10):
    NB = 1 << logn
    a = jnp.broadcast_to(F.from_int(CTX, [3])[0], (NB, CTX.L))
    mulf = jax.jit(lambda x: F.mont_mul(CTX, x, x))
    sync(mulf(a))
    sync(mulf(a))
    t0 = time.time()
    for _ in range(reps):
        r = mulf(a)
    sync(r)
    return NB * reps / (time.time() - t0)


def main():
    variants = []
    for arg in sys.argv[1:]:
        parts = arg.split(",")
        g, t, rr = (int(x) for x in parts[:3])
        abl = parts[3] if len(parts) > 3 else ""
        variants.append((g, t, rr, abl))
    if not variants:
        variants = [(10, 512, 3, "")]
    for G, TILE, ROUNDS, abl in variants:
        F._PROD_G = G
        F._TILE = TILE
        F._COL_ROUNDS = ROUNDS
        F._ABL_NORM = "n" in abl
        F._ABL_PROD = "p" in abl
        F._ABL_REDC = "r" in abl
        F._mm_pallas.cache_clear()
        tag = f"G={G} TILE={TILE} R={ROUNDS} abl={abl or '-'}"
        try:
            t0 = time.time()
            bad = check() if not abl else 0
            ct = time.time() - t0
            if bad:
                print(f"{tag}: WRONG ({bad}/1024)", flush=True)
                continue
            r = rate()
            print(f"{tag}: {r/1e6:.1f} M/s (check+compile {ct:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
