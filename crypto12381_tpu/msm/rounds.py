"""Dense-rounds MSM — third-generation large-N G1 kernel.

Architecture (round-5 rework, built from measured failure modes of both
earlier designs: the scan-scatter MSM is capped by XLA's in-place-scatter
ceiling at c = 8 (33 windows x 13 muls/point), and the sorted merge-tree
paid more in per-pass index machinery, host syncs and canonicalization
passes than its affine adds saved):

  front:  force-affine + one canonical coordinate table packed as
          (n, 128) f32 rows — x digits in lanes 0..49, y in 50..99.  A
          single 128-lane row is ONE (8, 128) f32 tile, which makes the
          per-round random row gather ~2.5x faster than any multi-tile
          layout (measured: 26 ms vs 64 ms per 557 K rows);
  sort:   ONE batched sort of all K windows' |digits| (K, n).  Equal
          buckets become runs; two collision-free scatters extract the
          per-(window, bucket) run START and LENGTH grids.  That is the
          ONLY index machinery in the whole pipeline;
  rounds: the bucket accumulator is a DENSE per-(window, bucket) slot
          array of projective points.  Round j adds the j-th element of
          every live bucket's run — one point per bucket per round, so
          each round is: one row gather + one fused complete mixed-add
          kernel (fields/fp32k's single-launch RCB madd) + one select.
          NO scatter, NO inversion, NO edge-case logic: the complete
          formulas absorb doubling (duplicate points), P + (-P) and
          identity accumulators branchlessly;
  ladder: run lengths are Poisson(n / nbuck); as buckets finish, live
          slots are COMPACTED down a quantized size ladder (one gather
          per step) so late rounds don't pay the full working set.  The
          schedule comes from one fetch of the run-length survival
          counts after the sort — zero host round-trips inside the loop;
  finish: compacted slots scatter back into the full bucket grid, which
          collapses with the O(sqrt(nbuck)) weighted scheme + Horner
          window combine shared with msm/pippenger.

Why rounds instead of a merge tree: both do ~K*n point-adds, but rounds
need ONE compiled graph per ladder size (the round index is a traced
scalar), touch each point exactly once, and have no survivor-compaction
scatters or per-pass structure recomputation.  Why projective instead of
batched-affine: the fused complete madd (11 muls after the round-5
operand-side 3b folding, fields/fp32k) runs at the measured ~42 M
field-muls/s plateau, and the affine path's per-round block inversion +
canonicalization + flag machinery costs more than the 11 -> ~7 mul
saving returns (measured: 155 ms canonicalized affine chain + 87 ms
block inversion vs ~175 ms for the whole fused madd at the same working
set).

Reference counterpart: ECP_muln (3rd-party/miracl-core/
ecp_BLS12381.cpp:1112-1148 — serial Pippenger, unsigned 4-bit windows).
The dense conflict-free round scheduling and compaction ladder are
TPU-native design with no analogue in the serial reference.

fp32-engine only; other engines keep the generic scan MSM.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import g1 as G1
from ..curves import weierstrass as W
from ..fields import fp32 as F8
from . import pippenger as MSM
from .sorted import _prep, _finish

CTX = F8.FP_CTX
L = CTX.L

__all__ = ["msm_g1_rounds"]

#: survival-count window fetched after the sort (rounds beyond this keep
#: the last ladder size — only adversarial inputs ever get there)
_COUNT_CAP = 512

#: quantized compaction ladder (slot-array sizes; compile-shape budget).
#: Every distinct size costs one fused-madd Mosaic compile (~30-90 s via
#: the tunneled backend), so the ladder is short; override with
#: CRYPTO12381_MSM_LADDER="131072,32768" (or "" for no compaction) to
#: trade steady-state time against compile count.
_LADDER = tuple(
    int(s)
    for s in os.environ.get(
        "CRYPTO12381_MSM_LADDER", "262144,131072,65536,32768,16384"
    ).split(",")
    if s
)


@functools.lru_cache(maxsize=None)
def _jits(c: int, n: int, affine: bool = False):
    # nbits=256: canonical (mod-r) scalars only — this keeps the top
    # window's digit distribution uniform, which the rounds schedule
    # requires (a concentrated top window would put ~n/2 points in one
    # bucket = ~n/2 serial rounds).  msm_g1_rounds detects violations at
    # the counts fetch and falls back to the scan MSM.
    K = -(-256 // c)
    nbuck = (1 << (c - 1)) + 1
    n2 = n + (n % 2)          # _prep pads odd n with a zero-scalar point
    nf = K * n2               # flat sorted-slot count
    S0 = K * nbuck            # full slot-array size

    # r as 18 16-bit limbs, for the canonicality check below
    from ..params import R as _R

    r_limbs = np.array(
        [(_R >> (16 * i)) & 0xFFFF for i in range(18)], np.int32
    )

    @jax.jit
    def j_front(points, scalars_std):
        tab8, digits = _prep(points, scalars_std, c, nbits=256,
                             affine=affine)
        tabf = jnp.zeros((n2, 128), jnp.float32)
        tabf = tabf.at[:, :L].set(tab8[:, 0].astype(jnp.float32))
        tabf = tabf.at[:, L : 2 * L].set(tab8[:, 1].astype(jnp.float32))
        # any scalar >= r?  (lexicographic limb compare; the nbits=256
        # decomposition is only exact for canonical scalars, so a
        # violation routes the call to the generic scan MSM)
        rl = jnp.asarray(r_limbs)
        ne = scalars_std != rl
        hi = 17 - jnp.argmax(ne[:, ::-1], axis=1)
        rows = jnp.arange(scalars_std.shape[0])
        ge = jnp.where(ne.any(1), scalars_std[rows, hi] > rl[hi], True)
        return tabf, digits, jnp.any(ge).astype(jnp.int32)

    @jax.jit
    def j_sort(digits):
        """(n2, K) signed digits -> flat sorted structure + run grids +
        survival counts."""
        dT = jnp.moveaxis(digits, 1, 0)                     # (K, n2)
        keys = jnp.abs(dT)
        iota = jnp.broadcast_to(
            jnp.arange(n2, dtype=jnp.int32)[None, :], (K, n2)
        )
        skeys, psel = jax.lax.sort_key_val(keys, iota, dimension=1)
        sgn = jnp.take_along_axis(dT, psel, 1) < 0
        # point row + sign in one int32 word: one gather per round
        pselsgn = jnp.where(sgn, psel | np.int32(1 << 30), psel).reshape(nf)
        first = jnp.concatenate(
            [jnp.ones((K, 1), bool), skeys[:, 1:] != skeys[:, :-1]], 1
        )
        last = jnp.concatenate(
            [skeys[:, :-1] != skeys[:, 1:], jnp.ones((K, 1), bool)], 1
        )
        rows = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], (K, n2)
        )
        ks = jnp.where(first, skeys, nbuck)
        starts = jnp.full((K, nbuck), n2, jnp.int32).at[
            rows, ks
        ].set(iota, mode="drop")
        ke = jnp.where(last, skeys, nbuck)
        ends = jnp.zeros((K, nbuck), jnp.int32).at[
            rows, ke
        ].set(iota + 1, mode="drop")
        lens = jnp.maximum(ends - jnp.where(starts < n2, starts, 0), 0)
        lens = lens.at[:, 0].set(0)      # digit-0 runs contribute nothing
        # flat start index into the (K*n2,) sorted arrays
        stf = (
            jnp.arange(K, dtype=jnp.int32)[:, None] * n2
            + jnp.minimum(starts, n2 - 1)
        ).reshape(S0)
        lnf = lens.reshape(S0)
        counts = jnp.sum(
            lnf[None, :] > jnp.arange(_COUNT_CAP, dtype=jnp.int32)[:, None],
            axis=1,
        )
        return pselsgn, stf, lnf, jnp.max(lnf), counts

    ops = G1.ops()

    @functools.lru_cache(maxsize=None)
    def j_round(S: int):
        @jax.jit
        def f(tabf, pselsgn, stf, lnf, AX, AY, AZ, j):
            live = j < lnf
            pos = jnp.minimum(stf + j, nf - 1)
            ps = pselsgn[pos]
            prow = ps & np.int32((1 << 30) - 1)
            neg = ps >= np.int32(1 << 30)
            g = tabf[prow]                               # (S, 128)
            px = g[:, :L]
            py0 = g[:, L : 2 * L]
            py = jnp.where(neg[:, None], F8.canon_neg(CTX, py0), py0)
            SX, SY, SZ = W.madd(ops, (AX, AY, AZ), (px, py))
            m = live[:, None]
            return (
                jnp.where(m, SX, AX),
                jnp.where(m, SY, AY),
                jnp.where(m, SZ, AZ),
            )

        return f

    @functools.lru_cache(maxsize=None)
    def j_compact(S_from: int, S_to: int):
        @jax.jit
        def f(stf, lnf, orig, AX, AY, AZ, G0, G1_, G2_, j):
            # merge current state into the persistent grid, then gather
            # the still-live slots down to S_to rows
            G0 = G0.at[orig].set(AX, mode="drop")
            G1_ = G1_.at[orig].set(AY, mode="drop")
            G2_ = G2_.at[orig].set(AZ, mode="drop")
            surv = j < lnf
            iota = jnp.arange(S_from, dtype=jnp.int32)
            posc = jnp.cumsum(surv.astype(jnp.int32)) - 1
            dest = jnp.where(surv, posc, S_to)
            src = jnp.full((S_to,), S_from, jnp.int32).at[dest].set(
                iota, mode="drop"
            )
            ok = src < S_from
            srcc = jnp.minimum(src, S_from - 1)
            stf2 = jnp.where(ok, stf[srcc], 0)
            lnf2 = jnp.where(ok, lnf[srcc], 0)   # dead slots: never live
            orig2 = jnp.where(ok, orig[srcc], S0)  # dropped at scatter
            one = F8.one(CTX, (S_to,))
            zero = jnp.zeros_like(one)
            okm = ok[:, None]
            AX2 = jnp.where(okm, AX[srcc], zero)
            AY2 = jnp.where(okm, AY[srcc], one)
            AZ2 = jnp.where(okm, AZ[srcc], zero)
            return stf2, lnf2, orig2, AX2, AY2, AZ2, G0, G1_, G2_

        return f

    @jax.jit
    def j_finish(orig, AX, AY, AZ, G0, G1_, G2_):
        G0 = G0.at[orig].set(AX, mode="drop")
        G1_ = G1_.at[orig].set(AY, mode="drop")
        G2_ = G2_.at[orig].set(AZ, mode="drop")
        grid = jnp.stack([G0, G1_, G2_], axis=1).reshape(K, nbuck, 3, L)
        return _finish(grid, c, K, nbuck)

    return j_front, j_sort, j_round, j_compact, j_finish, K, nbuck, S0


@functools.lru_cache(maxsize=None)
def _scan_fallback():
    return jax.jit(lambda P, s: MSM.msm_g1(P, s, c=8))


def msm_g1_rounds(points, scalars_std, c: int = 16,
                  affine: bool = False):
    """sum_i scalars[i] * points[i] over G1 (fp32 engine): dense-rounds
    Pippenger with fused complete adds.  Concrete (non-traced) inputs
    only — the round loop is host-driven with one counts fetch total.
    Returns one projective point.

    PRECONDITION: scalars must be canonical Zp std limbs (< r < 2^255)
    — the ZpVec/api path guarantees this; raw callers with possibly
    unreduced 256-bit scalars must reduce mod r first (the nbits=256
    decomposition is exact only below 2^256 - offset ~ 2^255.99).

    Run-length guard: the rounds schedule is serial in the longest
    bucket run, so heavily duplicated scalars (adversarial input) would
    degenerate to O(n) rounds.  The schedule length R comes back with
    the (single) counts fetch; when R exceeds the tracked window the
    call falls back to the generic scan MSM — always correct, just not
    on this kernel's fast path.

    `affine=True`: caller guarantees Z == 1 rows with no identities
    (G1Vec.z_is_one; parsed/stored point tables) — skips the front's
    batch Z-inversion chain."""
    n = points[0].shape[0]
    dbg = os.environ.get("CRYPTO12381_DEBUG_MSM")

    def _log(msg, _t=[time.time()]):
        if dbg:
            now = time.time()
            print(f"[rounds +{now - _t[0]:6.1f}s] {msg}",
                  file=sys.stderr, flush=True)
            _t[0] = now

    (j_front, j_sort, j_round, j_compact, j_finish, K, nbuck, S0) = _jits(
        c, n, affine
    )
    tabf, digits, bad = j_front(points, scalars_std)
    pselsgn, stf, lnf, maxlen, counts_d = j_sort(digits)
    _log("front+sort dispatched")
    fetched = np.asarray(
        jnp.concatenate([bad[None], maxlen[None], counts_d])
    )  # the ONE host round-trip
    R = int(fetched[1])
    counts = fetched[2:]
    _log(f"counts fetched: R={R} live0={int(counts[0])} S0={S0}")
    if fetched[0] or R > _COUNT_CAP:
        # non-canonical scalars (>= r: nbits=256 decomposition invalid)
        # or degenerate run distribution (duplicate-heavy scalars: the
        # rounds schedule would serialize) — use the scan MSM instead
        _log(f"bad={int(fetched[0])} R={R}: falling back to scan MSM")
        return _scan_fallback()(points, scalars_std)

    ladder = [s for s in _LADDER if s < S0]
    AX = jnp.zeros((S0, L), jnp.float32)
    AY = F8.one(CTX, (S0,))
    AZ = jnp.zeros((S0, L), jnp.float32)
    orig = jnp.arange(S0, dtype=jnp.int32)
    G0 = jnp.zeros((S0, L), jnp.float32)
    G1_ = F8.one(CTX, (S0,))
    G2_ = jnp.zeros((S0, L), jnp.float32)

    S = S0
    for j in range(R):
        # compact before round j when the live count fits a smaller rung
        # (pop every qualifying rung; one compaction to the smallest)
        live_now = int(counts[j] if j < _COUNT_CAP else counts[-1])
        target = None
        while ladder and live_now <= ladder[0]:
            target = ladder.pop(0)
        if target is not None and target < S:
            jd = jnp.asarray(j, jnp.int32)
            stf, lnf, orig, AX, AY, AZ, G0, G1_, G2_ = j_compact(S, target)(
                stf, lnf, orig, AX, AY, AZ, G0, G1_, G2_, jd
            )
            _log(f"round {j}: compacted {S} -> {target} "
                 f"(live {live_now})")
            S = target
        jd = jnp.asarray(j, jnp.int32)
        AX, AY, AZ = j_round(S)(tabf, pselsgn, stf, lnf, AX, AY, AZ, jd)
        if dbg:
            jax.block_until_ready(AX)
            _log(f"round {j} done (S={S})")
    out = j_finish(orig, AX, AY, AZ, G0, G1_, G2_)
    _log("finish dispatched")
    return out
