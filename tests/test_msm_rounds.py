"""Differential tests for the dense-rounds batched-affine MSM
(msm/rounds.py) vs the exact host oracle — same adversarial matrix as the
sorted-MSM tests: duplicate points (doubling rounds), P/-P cancellation
(infinity propagation through later rounds), identity inputs, zero
scalars, odd n (generator padding)."""

import random

import numpy as np

from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.fields import fp as FPI
from crypto12381_tpu.msm import rounds as MR
from crypto12381_tpu.params import R
from crypto12381_tpu.pyref import curve as C

rng = random.Random(515)


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
    res = MR.msm_g1_rounds(P, s, c=c)
    got = G1.to_affine_ints(res)
    assert got == _oracle(pts_ref, scalars), f"c={c}, n={len(scalars)}"


def test_rounds_msm_random():
    n = 70
    ks = rng.sample(range(1, 10_000), n)
    scalars = [rng.randrange(R) for _ in range(n)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    _check(pts, scalars, c=8)


def test_rounds_msm_duplicate_points_single_bucket():
    """All points and scalars equal: one maximal run per window, doubling
    on every round."""
    n = 33  # odd: generator padding
    s = rng.randrange(R)
    pts = [C.g1_mul(C.G1_GEN, 7)] * n
    _check(pts, [s] * n, c=6)


def test_rounds_msm_opposite_points():
    """P/-P same-bucket pairs cancel to infinity mid-run; the accumulator
    must re-seed from infinity on the following round."""
    base = [C.g1_mul(C.G1_GEN, k) for k in (3, 11, 29)]
    pts, scalars = [], []
    s = rng.randrange(R)
    for p in base:
        pts += [p, C.g1_neg(p)]
        scalars += [s, s]
    pts.append(C.g1_mul(C.G1_GEN, 5))
    scalars.append(rng.randrange(R))
    _check(pts, scalars, c=5)


def test_rounds_msm_identity_and_zero_scalars():
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
    res = MR.msm_g1_rounds(P, s, c=6)
    got = G1.to_affine_ints(res)
    assert got == _oracle(pts[: n - 1], scalars[: n - 1])


def test_rounds_msm_unreduced_256bit_scalars():
    """Scalars >= r violate the canonical-scalar precondition: the
    device range check must detect them at the counts fetch and route
    the call to the (always-correct) scan MSM fallback."""
    n = 12
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(1 << 256) for _ in range(n)]
    assert any(x >= R for x in scalars)
    import jax.numpy as jnp

    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = _points_device(pts)
    limbs = np.array(
        [[(e >> (16 * i)) & 0xFFFF for i in range(18)] for e in scalars],
        np.int32,
    )
    s = jnp.asarray(limbs)  # raw limbs: NOT reduced mod r
    for c in (7, 16):
        res = MR.msm_g1_rounds(P, s, c=c)
        got = G1.to_affine_ints(res)
        assert got == _oracle(pts, [x % R for x in scalars])


def test_rounds_msm_affine_fast_path():
    """affine=True (z_is_one tables: skip the Z-inversion front) must
    match the projective path and the oracle."""
    n = 40
    ks = rng.sample(range(1, 10_000), n)
    scalars = [rng.randrange(R) for _ in range(n)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = _points_device(pts)
    s = _scalars_device(scalars)
    res = MR.msm_g1_rounds(P, s, c=8, affine=True)
    assert G1.to_affine_ints(res) == _oracle(pts, scalars)


def test_rounds_msm_matches_scan():
    """Cross-check vs the scan Pippenger on a mixed input with a
    duplicate pair and a zero scalar."""
    import jax

    from crypto12381_tpu.msm import pippenger as MSM

    n = 24
    ks = [rng.randrange(R) for _ in range(n - 2)] + [77, 77]
    scalars = [rng.randrange(R) for _ in range(n - 1)] + [0]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = _points_device(pts)
    s = _scalars_device(scalars)
    a = MR.msm_g1_rounds(P, s, c=7)
    b = jax.jit(lambda P, s: MSM.msm_g1(P, s, c=4, lanes=8))(P, s)
    assert G1.to_affine_ints(a) == G1.to_affine_ints(b)
