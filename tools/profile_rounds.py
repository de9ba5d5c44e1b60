#!/usr/bin/env python
"""Stage profile of the dense-rounds MSM at a given size: front, sort,
round loop (by ladder rung), compactions, finish — each synced.

Usage: python tools/profile_rounds.py [log2_n] [c]
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
    from crypto12381_tpu.fields import fp32 as F8
    from crypto12381_tpu.msm import rounds as MR
    from crypto12381_tpu.params import R

    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << logn
    m = min(n, 1 << 13)
    rng = np.random.default_rng(5)
    CTX = F8.FP_CTX

    print(f"device: {jax.devices()[0]} n=2^{logn} c={c}", flush=True)
    a_ints = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(m)]
    a_dev = FPI.from_int(FPI.FR_CTX, a_ints, mont=False)
    base = jax.jit(lambda s: G1.scalar_mul(G1.generator((m,)), s))(a_dev)
    sync(base)
    reps = n // m
    P = tuple(
        jnp.tile(coord, (reps,) + (1,) * (coord.ndim - 1)) for coord in base
    )
    s_ints = [int.from_bytes(rng.bytes(32), "big") % R for _ in range(n)]
    s_raw = np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(18)] for v in s_ints],
        dtype=np.int32,
    )
    s_dev = jnp.asarray(s_raw)

    # full warm run first (compiles everything)
    t0 = time.time()
    sync(MR.msm_g1_rounds(P, s_dev, c=c))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    sync(MR.msm_g1_rounds(P, s_dev, c=c))
    total = time.time() - t0
    print(f"warm total: {total*1e3:.0f} ms", flush=True)

    # staged timing
    (j_front, j_sort, j_round, j_compact, j_finish, K, nbuck, S0) = MR._jits(
        c, n
    )
    t0 = time.time()
    tabf, digits, bad = j_front(P, s_dev)
    sync((tabf, digits))
    t_front = time.time() - t0
    t0 = time.time()
    pselsgn, stf, lnf, maxlen, counts_d = j_sort(digits)
    fetched = np.asarray(jnp.concatenate([bad[None], maxlen[None], counts_d]))
    t_sort = time.time() - t0
    Rr = int(fetched[1])
    counts = fetched[2:]
    print(f"front: {t_front*1e3:.0f} ms   sort+fetch: {t_sort*1e3:.0f} ms   "
          f"R={Rr}", flush=True)

    ladder = [s for s in MR._LADDER if s < S0]
    AX = jnp.zeros((S0, MR.L), jnp.float32)
    AY = F8.one(CTX, (S0,))
    AZ = jnp.zeros((S0, MR.L), jnp.float32)
    orig = jnp.arange(S0, dtype=jnp.int32)
    G0 = jnp.zeros((S0, MR.L), jnp.float32)
    G1_ = F8.one(CTX, (S0,))
    G2_ = jnp.zeros((S0, MR.L), jnp.float32)

    S = S0
    per_S = {}
    t_comp = 0.0
    for j in range(Rr):
        live_now = int(counts[j] if j < MR._COUNT_CAP else counts[-1])
        target = None
        while ladder and live_now <= ladder[0]:
            target = ladder.pop(0)
        if target is not None and target < S:
            jd = jnp.asarray(j, jnp.int32)
            t0 = time.time()
            stf, lnf, orig, AX, AY, AZ, G0, G1_, G2_ = j_compact(S, target)(
                stf, lnf, orig, AX, AY, AZ, G0, G1_, G2_, jd
            )
            sync(AX)
            t_comp += time.time() - t0
            S = target
        jd = jnp.asarray(j, jnp.int32)
        t0 = time.time()
        AX, AY, AZ = j_round(S)(tabf, pselsgn, stf, lnf, AX, AY, AZ, jd)
        sync(AX)
        dt = time.time() - t0
        cnt, tot = per_S.get(S, (0, 0.0))
        per_S[S] = (cnt + 1, tot + dt)
    t0 = time.time()
    out = j_finish(orig, AX, AY, AZ, G0, G1_, G2_)
    sync(out)
    t_fin = time.time() - t0
    for S, (cnt, tot) in sorted(per_S.items(), reverse=True):
        print(f"rounds @S={S}: {cnt} x {tot/cnt*1e3:.1f} ms = "
              f"{tot*1e3:.0f} ms", flush=True)
    print(f"compactions: {t_comp*1e3:.0f} ms   finish: {t_fin*1e3:.0f} ms",
          flush=True)
    staged = t_front + t_sort + sum(t for _, t in per_S.values()) + \
        t_comp + t_fin
    print(f"staged sum: {staged*1e3:.0f} ms (vs warm total {total*1e3:.0f} "
          "ms; staged pays per-stage sync)", flush=True)


if __name__ == "__main__":
    main()
