#!/usr/bin/env python
"""Per-stage timing of the v2 staged sorted MSM (msm.sorted.msm_g1_sorted_staged)
on the live device: replicates the host-driven pass loop with a sync+timer
around every dispatch, so the round-5 rework knows exactly where the
non-multiply time goes (sort? struct? inv? apply? collapse? host sync?).

Usage: python tools/profile_v2_msm.py [log2n] [c]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sync(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << logn

    import jax
    import jax.numpy as jnp

    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.fields import fp as FPI
    from crypto12381_tpu.msm import sorted as MS
    from crypto12381_tpu.params import R

    print(f"device: {jax.devices()[0]}, n=2^{logn}, c={c}", flush=True)
    rng = np.random.default_rng(3)

    m = min(n, 1 << 12)
    ks = [int.from_bytes(rng.bytes(31), "big") % R for _ in range(m)]
    kd = FPI.from_int(FPI.FR_CTX, ks, mont=False)
    base = jax.jit(lambda s: G1.scalar_mul(G1.generator((m,)), s))(kd)
    sync(base)
    reps_tile = n // m
    P = tuple(
        jnp.tile(cc, (reps_tile,) + (1,) * (cc.ndim - 1)) for cc in base
    )
    s_raw = rng.integers(0, 1 << 16, size=(n, 18), dtype=np.int32)
    s_raw[:, 16:] = 0
    s = jnp.asarray(s_raw)

    # warm up every jit by running the pipeline once end to end
    t0 = time.time()
    out = MS.msm_g1_sorted_staged(P, s, c=c)
    sync(out)
    print(f"compile+first total: {time.time()-t0:.1f}s", flush=True)

    # timed second run, stage by stage (everything compiled now)
    acc = {}

    def t(label, fn):
        t0 = time.time()
        r = fn()
        sync(r)
        dt = time.time() - t0
        acc[label] = acc.get(label, 0.0) + dt
        return r

    T0 = time.time()
    j_front, j_sortg, K, nbuck = MS._v2_jits(c, n)
    tab, digits = t("front", lambda: j_front(P, s))
    k, x, y = t("sortg", lambda: j_sortg(tab, digits))
    n2 = k.shape[1]
    sizes = MS.pass_sizes(n2, nbuck)
    inf = None
    general = False
    mm = n2
    np_ = np
    passno = 0
    for m_raw in sizes:
        m_out = MS._quantize(m_raw, mm)
        if not general:
            st = MS._v2_struct(mm, m_out, False)
            ka, merge, xa, ya, xb, yb, den, n_x = t(
                "struct", lambda: st(k, x, y, None)
            )
            tq = time.time()
            nx_host = int(np_.asarray(n_x))
            acc["sync:n_x"] = acc.get("sync:n_x", 0.0) + time.time() - tq
            if nx_host > 0:
                general = True
        if general:
            if inf is None:
                inf = jnp.asarray(np_.zeros((K, mm), bool))
            st = MS._v2_struct(mm, m_out, True)
            ka, merge, xa, ya, xb, yb, den, flags = t(
                "struct", lambda: st(k, x, y, inf)
            )
        total = K * m_out
        dinv = t("inv", lambda: MS._v2_inv(total)(den))
        fl = [a.reshape((total,) + a.shape[2:]) for a in (xa, ya, xb, yb)]
        dv = dinv.reshape(total, MS.L)
        mg = merge.reshape(total)
        if general:
            ia, ib, xeq, inf_out = [a.reshape(total) for a in flags]
            x, y, inf = t(
                "apply",
                lambda: MS._v2_apply(total, True)(
                    fl[0], fl[1], fl[2], fl[3], dv, mg, ia, ib, xeq, inf_out
                ),
            )
            inf = inf.reshape(K, m_out)
        else:
            x, y = t(
                "apply",
                lambda: MS._v2_apply(total, False)(
                    fl[0], fl[1], fl[2], fl[3], dv, mg
                ),
            )
        x = x.reshape(K, m_out, MS.L)
        y = y.reshape(K, m_out, MS.L)
        k = ka
        mm = m_out
        passno += 1
        tq = time.time()
        anym = bool(np_.asarray(MS._v2_anymerge(K, mm)(k)))
        acc["sync:anymerge"] = acc.get("sync:anymerge", 0.0) + time.time() - tq
        if not anym:
            break
    if inf is None:
        inf = jnp.asarray(np_.zeros((K, mm), bool))
    t("finish", lambda: MS._v2_finish(mm, K, nbuck, c, general)(k, x, y, inf))
    total_t = time.time() - T0
    print(f"passes: {passno}", flush=True)
    for kk, vv in acc.items():
        print(f"  {kk:16s} {vv*1e3:9.1f} ms", flush=True)
    print(f"total (timed run): {total_t:.2f}s  "
          f"-> {n/total_t/1e3:.1f} K pts/s", flush=True)


if __name__ == "__main__":
    main()
