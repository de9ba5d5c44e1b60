#!/usr/bin/env python
"""Per-stage + micro-op profile of the sorted MSM at 2^20 on the live
device.  Identifies where the non-multiply overhead goes (sort? row
gathers? pass machinery?) to direct the staged-v2 rework.

Usage: python tools/profile_sorted_msm.py [log2n]
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
    np.asarray(leaves[0].ravel()[0])


def t(label, fn, reps=2):
    out = fn()
    sync(out)  # compile+first
    t0 = time.time()
    out = fn()
    sync(out)
    dt = time.time() - t0
    if reps > 1:
        t0 = time.time()
        for _ in range(reps):
            sync(fn())
        dt = (time.time() - t0) / reps
    print(f"{label:42s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    c = 16

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

    # ---- staged pipeline stages --------------------------------------
    jf, jd, ji, jr = MS._staged_jits(c, n)
    tab, digits = t("stage front (prep)", lambda: jf(P, s), reps=1)
    skeys, dens = t("stage dens (sort+gather+pass1 den)",
                    lambda: jd(tab, digits), reps=1)
    dinvs = t("stage inv (global block inv)", lambda: ji(dens), reps=1)
    t("stage rest (pass1+merges+finish)",
      lambda: jr(tab, digits, dinvs), reps=1)

    # ---- micro-ops ----------------------------------------------------
    keys32 = jnp.abs(digits[:, 0])
    iota = jnp.arange(n, dtype=jnp.int32)
    f_sort = jax.jit(lambda k: jax.lax.sort_key_val(k, iota))
    sk, sidx = t("sort_key_val 2^%d x1" % logn, lambda: f_sort(keys32))

    f_gather = jax.jit(lambda tb, ix: tb[ix].astype(jnp.float32))
    t("row gather tab[(n,3,50)u8]->f32", lambda: f_gather(tab, sidx))

    f_gu8 = jax.jit(lambda tb, ix: tb[ix])
    t("row gather tab[(n,3,50)u8]->u8", lambda: f_gu8(tab, sidx))

    tabf = tab.astype(jnp.float32)
    f_gf = jax.jit(lambda tb, ix: tb[ix])
    t("row gather tabf[(n,3,50)f32]", lambda: f_gf(tabf, sidx))

    # one-hot-free within-window pair machinery
    f_struct = jax.jit(lambda k: MS._pair_gather(k, n // 2 + 20000)[3])
    t("pair struct (runpos+survivor+2 gathers)", lambda: f_struct(sk))

    # 17-window scan of JUST sort (isolates scan+sort from gathers)
    def allsorts(dd):
        def w(cy, dk):
            kk, si = jax.lax.sort_key_val(jnp.abs(dk), iota)
            return cy, kk[0] + si[0]

        return jax.lax.scan(w, 0, jnp.moveaxis(dd, 1, 0))[1]

    t("17-window scan: sort only", lambda: jax.jit(allsorts)(digits),
      reps=1)

    # block inversion micro at the pass-1 shape
    mtot = dens.shape[0] * dens.shape[1]
    flat = dens.reshape(-1, MS.L)
    f_inv = jax.jit(
        lambda v: MS.block_batch_inv(
            v, zeros=jnp.zeros(v.shape[0], bool)
        )
    )
    t(f"block_batch_inv {mtot} rows", lambda: f_inv(flat), reps=1)

    # mont_mul floor at the same row count
    f_mm = jax.jit(lambda v: MS.F8.mont_mul(MS.CTX, v, v))
    t(f"mont_mul {mtot} rows x1", lambda: f_mm(flat))


if __name__ == "__main__":
    main()
