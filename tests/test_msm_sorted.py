"""Differential tests for the sort-based batched-affine MSM (msm/sorted.py)
vs the exact host oracle — including the adversarial cases the batched
affine pass must survive (duplicate points -> doubling, P/-P pairs ->
infinity, identity inputs, zero scalars, single-bucket pileups)."""

import random

import jax
import numpy as np

from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.fields import fp as FPI
from crypto12381_tpu.msm import sorted as MS
from crypto12381_tpu.params import R
from crypto12381_tpu.pyref import curve as C

rng = random.Random(4242)


def _points_device(pts_ref):
    return G1.from_affine_ints(
        [p[0] for p in pts_ref], [p[1] for p in pts_ref]
    )


def _scalars_device(scalars):
    return FPI.from_int(FPI.FR_CTX, scalars, mont=False)


def _oracle(pts_ref, scalars):
    expect = None
    for p, k in zip(pts_ref, scalars):
        expect = C.g1_add(expect, C.g1_mul(p, k))
    return expect


def _check(pts_ref, scalars, c):
    P = _points_device(pts_ref)
    s = _scalars_device(scalars)
    res = jax.jit(lambda P, s: MS.msm_g1_sorted(P, s, c=c))(P, s)
    got = G1.to_affine_ints(res)
    assert got == _oracle(pts_ref, scalars), f"c={c}, n={len(scalars)}"


def test_sorted_msm_random():
    n = 64
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    _check(pts, scalars, c=8)


def test_sorted_msm_duplicate_points_single_bucket():
    """All points equal AND all scalars equal: every window is one long
    run of identical points — maximal doubling pressure on the affine
    pass and the full ladder of merge passes."""
    n = 33  # odd: exercises generator padding
    s = rng.randrange(R)
    pts = [C.g1_mul(C.G1_GEN, 7)] * n
    _check(pts, [s] * n, c=6)


def test_sorted_msm_opposite_points():
    """P and -P with equal scalars land in the same bucket and cancel to
    the identity inside the merge passes."""
    base = [C.g1_mul(C.G1_GEN, k) for k in (3, 11, 29)]
    pts = []
    scalars = []
    s = rng.randrange(R)
    for p in base:
        pts += [p, C.g1_neg(p)]
        scalars += [s, s]
    # plus one survivor so the total is not the identity
    pts.append(C.g1_mul(C.G1_GEN, 5))
    scalars.append(rng.randrange(R))
    _check(pts, scalars, c=5)


def test_sorted_msm_identity_and_zero_scalars():
    n = 9
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n - 2)] + [0, rng.randrange(R)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = _points_device(pts)
    import jax.numpy as jnp

    X, Y, Z = P
    zmask = jnp.asarray([1.0] * (n - 1) + [0.0])[:, None]
    P = (X, Y, Z * zmask)  # last point -> identity
    s = _scalars_device(scalars)
    res = jax.jit(lambda P, s: MS.msm_g1_sorted(P, s, c=6))(P, s)
    got = G1.to_affine_ints(res)
    assert got == _oracle(pts[: n - 1], scalars[: n - 1])


def test_sorted_msm_matches_scan_msm():
    """Cross-check the two independent MSM architectures on one input."""
    from crypto12381_tpu.msm import pippenger as MSM

    n = 32
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = _points_device(pts)
    s = _scalars_device(scalars)
    a = jax.jit(lambda P, s: MS.msm_g1_sorted(P, s, c=7))(P, s)
    b = jax.jit(lambda P, s: MSM.msm_g1(P, s, c=4, lanes=8))(P, s)
    assert G1.to_affine_ints(a) == G1.to_affine_ints(b)


def test_block_batch_inv():
    import jax.numpy as jnp

    from crypto12381_tpu.fields import fp32 as F8
    from crypto12381_tpu.params import P as PMOD

    vals = [rng.randrange(1, PMOD) for _ in range(7)] + [0]
    v = F8.from_int(F8.FP_CTX, vals)
    out = jax.jit(MS.block_batch_inv)(v)
    got = F8.to_int(F8.FP_CTX, out)
    for x, g in zip(vals, np.asarray(got, object)):
        assert int(g) == (pow(x, PMOD - 2, PMOD) if x else 0)


# ---------------------------------------------------------------------------
# v2 staged pipeline (msm_g1_sorted_staged) — ADVICE r4: the entry used by
# G1Vec.msm and bench had no direct coverage.  Same adversarial matrix as
# the traceable version, invoked through the host-driven staged loop so the
# fast->general kernel switch, the quantized pass sizes and the chunked
# inversion all execute.
# ---------------------------------------------------------------------------


def _check_staged(pts_ref, scalars, c):
    P = _points_device(pts_ref)
    s = _scalars_device(scalars)
    res = MS.msm_g1_sorted_staged(P, s, c=c)
    got = G1.to_affine_ints(res)
    assert got == _oracle(pts_ref, scalars), f"staged c={c}, n={len(scalars)}"


def test_staged_msm_random_fast_path():
    """Distinct random points: every pass must stay on the FAST kernel
    (no equal-x merge pair ever appears)."""
    n = 70
    ks = rng.sample(range(1, 10_000), n)
    scalars = [rng.randrange(R) for _ in range(n)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    _check_staged(pts, scalars, c=8)


def test_staged_msm_duplicate_points_general_switch():
    """All points equal with equal scalars: pass 1's equal-x pairs force
    the general kernel (doubling path) and the full merge ladder."""
    n = 33  # odd: generator padding
    s = rng.randrange(R)
    pts = [C.g1_mul(C.G1_GEN, 7)] * n
    _check_staged(pts, [s] * n, c=6)


def test_staged_msm_opposite_points_infinity():
    """P/-P same-bucket pairs cancel to infinity inside the general
    kernel; the inf flags must propagate through later passes."""
    base = [C.g1_mul(C.G1_GEN, k) for k in (3, 11, 29)]
    pts, scalars = [], []
    s = rng.randrange(R)
    for p in base:
        pts += [p, C.g1_neg(p)]
        scalars += [s, s]
    pts.append(C.g1_mul(C.G1_GEN, 5))
    scalars.append(rng.randrange(R))
    _check_staged(pts, scalars, c=5)


def test_staged_msm_identity_and_zero_scalars():
    n = 9
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n - 2)] + [0, rng.randrange(R)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = _points_device(pts)
    import jax.numpy as jnp

    X, Y, Z = P
    zmask = jnp.asarray([1.0] * (n - 1) + [0.0])[:, None]
    P = (X, Y, Z * zmask)  # last point -> identity
    s = _scalars_device(scalars)
    res = MS.msm_g1_sorted_staged(P, s, c=6)
    got = G1.to_affine_ints(res)
    assert got == _oracle(pts[: n - 1], scalars[: n - 1])


def test_staged_msm_matches_v1_and_scan():
    """Cross-check all three MSM architectures on one mixed input that
    includes a duplicate pair (general switch) and a zero scalar."""
    from crypto12381_tpu.msm import pippenger as MSM

    n = 24
    ks = [rng.randrange(R) for _ in range(n - 2)] + [77, 77]
    scalars = [rng.randrange(R) for _ in range(n - 1)] + [0]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = _points_device(pts)
    s = _scalars_device(scalars)
    a = MS.msm_g1_sorted_staged(P, s, c=7)
    b = jax.jit(lambda P, s: MS.msm_g1_sorted(P, s, c=7))(P, s)
    d = jax.jit(lambda P, s: MSM.msm_g1(P, s, c=4, lanes=8))(P, s)
    assert G1.to_affine_ints(a) == G1.to_affine_ints(b) == G1.to_affine_ints(d)
