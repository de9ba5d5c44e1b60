"""Dense-rounds batched-affine Pippenger MSM — third-generation large-N
G1 kernel.

Architecture (round-5 rework of msm/sorted.py's merge-tree design, built
from its measured failure mode: per-pass index machinery and host syncs
dominated the multiply floor):

  front:  force-affine + canonical uint8 coordinate table (n, 3, L)
          + signed c-bit window digits (msm/pippenger.signed_window_digits);
  sort:   ONE batched sort of all K windows' |digits| (K, n) — equal
          buckets become runs; the per-(window, bucket) run START and
          LENGTH grids (K, nbuck) are extracted once with two collision-free
          scatters (first/last-of-run positions).  No other index machinery
          exists anywhere in the pipeline;
  rounds: the bucket accumulator A is a DENSE (K, nbuck) affine array
          (x canonical uint8, y loose f32 under the tighten() budget, inf
          flag).  Round j adds, to every live bucket, the j-th element of
          that bucket's sorted run — one point per bucket per round, so
          the update is a plain dense select: NO scatter, NO compaction,
          no per-round structure computation (the partner row index is
          just starts + j).  Each round is a batched-affine complete add:
          all (K * nbuck) pair denominators are known up front, ONE
          Montgomery block inversion serves the round, ~7 field muls per
          slot.  Doubling (duplicate input points) and P + (-P) -> inf
          edges resolve branchlessly from the canonical-digit compares,
          exactly like the merge-tree kernel's general pass;
  finish: the accumulator IS the bucket grid — O(sqrt(nbuck)) weighted
          collapse + Horner window combine (shared with msm/pippenger).

Round count = max run length =~ n/2^(c-1) + Poisson tail for random
scalars (62 at n = 2^20, c = 16); every round is the SAME compiled graph
(the round index is a traced scalar), so the whole pipeline compiles 4
graphs total and runs with zero host round-trips inside the loop (one
max-length fetch after the sort decides the loop trip count).  Worst-case
(adversarial single-bucket) inputs degrade to n rounds but stay correct.

Reference counterpart: ECP_muln (3rd-party/miracl-core/
ecp_BLS12381.cpp:1112-1148 — serial Pippenger, unsigned 4-bit windows).
The dense conflict-free round scheduling, batched block inversion and
canonical-digit edge discipline are TPU-native design with no analogue in
the serial reference.

fp32-engine only; other engines keep the generic scan MSM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import g1 as G1
from ..fields import fp32 as F8
from . import pippenger as MSM
from .sorted import _prep, block_batch_inv, _finish

CTX = F8.FP_CTX
L = CTX.L

__all__ = ["msm_g1_rounds"]


@functools.lru_cache(maxsize=None)
def _jits(c: int, n: int):
    """The four compiled graphs of the pipeline (keyed by (c, n); the
    round graphs are round-index-agnostic)."""
    K = -(-258 // c)
    nbuck = (1 << (c - 1)) + 1
    n2 = n + (n % 2)          # _prep pads odd n with a zero-scalar point

    @jax.jit
    def j_front(points, scalars_std):
        return _prep(points, scalars_std, c)

    @jax.jit
    def j_sort(digits):
        """(n2, K) signed digits -> per-window sorted structure:
        psel (K, n2) point-row per sorted slot, sgn (K, n2) digit sign,
        starts/lens (K, nbuck) run grids, maxlen scalar."""
        dT = jnp.moveaxis(digits, 1, 0)                     # (K, n2)
        keys = jnp.abs(dT)
        iota = jnp.broadcast_to(
            jnp.arange(n2, dtype=jnp.int32)[None, :], (K, n2)
        )
        skeys, psel = jax.lax.sort_key_val(keys, iota, dimension=1)
        sgn = jnp.take_along_axis(dT, psel, 1) < 0
        first = jnp.concatenate(
            [jnp.ones((K, 1), bool), skeys[:, 1:] != skeys[:, :-1]], 1
        )
        last = jnp.concatenate(
            [skeys[:, :-1] != skeys[:, 1:], jnp.ones((K, 1), bool)], 1
        )
        rows = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], (K, n2)
        )
        # collision-free scatters: one first/last slot per (window, bucket)
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
        return psel, sgn, starts, lens, jnp.max(lens)

    def _partner(tab, psel, sgn, starts, lens, j):
        """Gather round j's partner point for every (window, bucket):
        canonical affine uint8 coords (sign-resolved) + live mask."""
        live = j < lens
        slot = jnp.minimum(jnp.where(live, starts + j, 0), n2 - 1)
        prow = jnp.take_along_axis(psel, slot, 1)           # (K, nbuck)
        g = tab[prow]                                       # (K, nbuck, 3, L)
        px = g[..., 0, :]
        sg = jnp.take_along_axis(sgn, slot, 1)
        py = jnp.where(sg[..., None], g[..., 2, :], g[..., 1, :])
        return live, px, py

    @jax.jit
    def j_den(tab, psel, sgn, starts, lens, Ax, Ay, Ainf, j):
        """Round prologue: partner gather + edge flags + denominators.
        No Mosaic multiplies except the one-mul canon of Ay + py (the
        y-opposition test); the block inversion runs in its own jit."""
        live, px, py = _partner(tab, psel, sgn, starts, lens, j)
        pyf = py.astype(jnp.float32)
        first = jnp.logical_and(live, Ainf)
        act = jnp.logical_and(live, ~Ainf)
        xeq = jnp.logical_and(act, jnp.all(Ax == px, axis=-1))
        s_ab = Ay + pyf           # == 2*Ay (mod p) in the doubling case
        yopp = jnp.logical_and(
            xeq, F8.canon_is_zero(F8.canon1(CTX, s_ab))
        )
        add_ok = jnp.logical_and(act, ~yopp)
        dbl = jnp.logical_and(xeq, ~yopp)
        den = jnp.where(
            dbl[..., None], s_ab,
            px.astype(jnp.float32) - Ax.astype(jnp.float32),
        )
        den = jnp.where(
            add_ok[..., None], den, F8.one(CTX, (K, nbuck))
        )
        flags = (live, first, add_ok, dbl, yopp)
        return den, flags, px, py

    @jax.jit
    def j_inv(den):
        flat = den.reshape(-1, L)
        out = block_batch_inv(
            flat, zeros=jnp.zeros(flat.shape[0], bool), B=512, U=32
        )
        return out.reshape(den.shape)

    @jax.jit
    def j_apply(Ax, Ay, Ainf, px, py, dinv, live, first, add_ok, dbl,
                yopp):
        """Affine add A <- A + P per live bucket (~6 muls + inversion
        share): lam = num/den, x3 = lam^2 - xA - xP (one-mul canon ->
        uint8), y3 = lam (xA - x3) - yA (tighten'd loose f32)."""
        Axf = Ax.astype(jnp.float32)
        pxf = px.astype(jnp.float32)
        pyf = py.astype(jnp.float32)
        num = jnp.where(
            dbl[..., None],
            F8.mul_small(CTX, F8.mont_sqr(CTX, Axf), 3),
            pyf - Ay,
        )
        lam = F8.mont_mul(CTX, num, dinv)
        lam2 = F8.mont_sqr(CTX, lam)
        x3 = F8.canon1(CTX, lam2 - Axf - pxf)
        y3 = F8.tighten(CTX, F8.mont_mul(CTX, lam, Axf - x3) - Ay)
        a1 = add_ok[..., None]
        f1 = first[..., None]
        Ax_n = jnp.where(f1, px, jnp.where(a1, x3.astype(jnp.uint8), Ax))
        Ay_n = jnp.where(f1, pyf, jnp.where(a1, y3, Ay))
        # live & first -> point; live & yopp -> infinity; else unchanged
        Ainf_n = jnp.where(live, jnp.where(Ainf, False, yopp), Ainf)
        return Ax_n, Ay_n, Ainf_n

    @jax.jit
    def j_finish(Ax, Ay, Ainf):
        one = F8.one(CTX, (K, nbuck))
        zero = jnp.zeros_like(one)
        i1 = Ainf[..., None]
        X = jnp.where(i1, zero, Ax.astype(jnp.float32))
        Y = jnp.where(i1, one, Ay)
        Z = jnp.where(i1, zero, one)
        grid = jnp.stack([X, Y, Z], axis=2)              # (K, nbuck, 3, L)
        return _finish(grid, c, K, nbuck)

    return j_front, j_sort, j_den, j_inv, j_apply, j_finish, K, nbuck


def msm_g1_rounds(points, scalars_std, c: int = 16):
    """sum_i scalars[i] * points[i] over G1 (fp32 engine): dense-rounds
    batched-affine Pippenger.  Concrete (non-traced) inputs only — the
    round loop is host-driven (one compiled graph per stage, one scalar
    fetch total).  Returns one projective point."""
    n = points[0].shape[0]
    (j_front, j_sort, j_den, j_inv, j_apply, j_finish, K, nbuck) = _jits(
        c, n
    )
    tab, digits = j_front(points, scalars_std)
    psel, sgn, starts, lens, maxlen = j_sort(digits)
    R = int(np.asarray(maxlen))                  # the one host round-trip
    Ax = jnp.zeros((K, nbuck, L), jnp.uint8)
    Ay = jnp.zeros((K, nbuck, L), jnp.float32)
    Ainf = jnp.ones((K, nbuck), bool)
    for j in range(R):
        jd = jnp.asarray(j, jnp.int32)
        den, flags, px, py = j_den(
            tab, psel, sgn, starts, lens, Ax, Ay, Ainf, jd
        )
        dinv = j_inv(den)
        live, first, add_ok, dbl, yopp = flags
        Ax, Ay, Ainf = j_apply(
            Ax, Ay, Ainf, px, py, dinv, live, first, add_ok, dbl, yopp
        )
    return j_finish(Ax, Ay, Ainf)
