"""Differential tests: batched JAX G1/G2 group law vs the exact oracle."""

import random

import jax
import numpy as np

from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.curves import g2 as G2
from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.fields import fp as FPI  # scalars (Fr) stay int16
from crypto12381_tpu.params import R
from crypto12381_tpu.pyref import curve as C

rng = random.Random(7)


def fr_std(vals):
    return FPI.from_int(FPI.FR_CTX, vals, mont=False)


def test_g1_add_double_vs_oracle():
    ks = [rng.randrange(1, R) for _ in range(3)]
    pts_ref = [C.g1_mul(C.G1_GEN, k) for k in ks]
    xs = [p[0] for p in pts_ref]
    ys = [p[1] for p in pts_ref]
    P = G1.from_affine_ints(xs, ys)
    assert np.asarray(G1.on_curve(P)).all()
    # pairwise adds: P[i] + P[(i+1)%3]
    Q = tuple(np.roll(np.asarray(c), -1, axis=0) for c in P)
    import jax.numpy as jnp

    Q = tuple(jnp.asarray(c) for c in Q)
    S = G1.add(P, Q)
    got = G1.to_affine_ints(S)
    for i in range(3):
        expect = C.g1_add(pts_ref[i], pts_ref[(i + 1) % 3])
        assert got[i] == expect, f"add[{i}]"
    # doubling through the same complete formula
    D = G1.double(P)
    gotd = G1.to_affine_ints(D)
    for i in range(3):
        assert gotd[i] == C.g1_add(pts_ref[i], pts_ref[i]), f"dbl[{i}]"


def test_g1_edge_cases():
    P = G1.generator()
    # P + (-P) = O ; O + P = P ; O + O = O
    s1 = G1.add(P, G1.neg(P))
    assert bool(np.asarray(G1.is_identity(s1)))
    s2 = G1.add(G1.identity(), P)
    assert G1.to_affine_ints(s2) == C.G1_GEN
    s3 = G1.add(G1.identity(), G1.identity())
    assert bool(np.asarray(G1.is_identity(s3)))
    # eq
    assert bool(np.asarray(G1.eq(P, P)))
    assert not bool(np.asarray(G1.eq(P, G1.double(P))))
    assert bool(np.asarray(G1.eq(G1.identity(), G1.identity())))


def test_g1_scalar_mul():
    ks = [rng.randrange(R) for _ in range(2)] + [0, 1, R - 1]
    P = G1.generator((len(ks),))
    res = G1.scalar_mul(P, fr_std(ks))
    got = G1.to_affine_ints(res)
    for i, k in enumerate(ks):
        assert got[i] == C.g1_mul(C.G1_GEN, k), f"smul[{i}] k={k}"


def test_g1_clear_cofactor_and_subgroup():
    # a point in the subgroup: r*P == O
    P = G1.generator()
    assert bool(np.asarray(G1.in_subgroup(P)))


def test_g2_ops_vs_oracle():
    ks = [rng.randrange(1, R) for _ in range(2)]
    pts_ref = [C.g2_mul(C.G2_GEN, k) for k in ks]
    P0 = G2.from_affine_fp2(*pts_ref[0])
    P1 = G2.from_affine_fp2(*pts_ref[1])
    assert bool(np.asarray(G2.on_curve(P0)))
    S = G2.add(P0, P1)
    assert G2.to_affine_ints(S) == C.g2_add(pts_ref[0], pts_ref[1])
    D = G2.double(P0)
    assert G2.to_affine_ints(D) == C.g2_add(pts_ref[0], pts_ref[0])
    # edge: P + (-P) == O
    assert bool(np.asarray(G2.is_identity(G2.add(P0, G2.neg(P0)))))


def test_g2_scalar_mul():
    k = rng.randrange(R)
    P = G2.generator()
    res = G2.scalar_mul(P, fr_std(k))
    assert G2.to_affine_ints(res) == C.g2_mul(C.G2_GEN, k)


def test_g2_device_subgroup_and_cofactor():
    """Device G2 membership (psi check) and Budroni-Pintore cofactor
    clearing vs the oracle (VERDICT r2 missing #7)."""
    from crypto12381_tpu.curves import g2 as G2
    from crypto12381_tpu.params import R, X_ABS

    ks = [rng.randrange(1, R) for _ in range(2)]
    pts = [C.g2_mul(C.G2_GEN, k) for k in ks]
    Q = G2.from_affine_fp2(
        ([p[0][0] for p in pts], [p[0][1] for p in pts]),
        ([p[1][0] for p in pts], [p[1][1] for p in pts]),
    )
    assert bool(np.asarray(G2.in_subgroup(Q)).all())
    # tweak y -> off curve -> not a member
    bad = (Q[0], FP.add(FP.FP_CTX, Q[1], G2.ops().one((2,))), Q[2])
    assert not bool(np.asarray(G2.in_subgroup(bad)).any())
    # clear_cofactor acts as multiplication by its known scalar on G2
    x = -X_ABS
    h = (x * x - x - 1) + (x - 1) * x + 2 * (x * x)
    cleared = G2.clear_cofactor(Q)
    got = G2.to_affine_ints(cleared)
    exp = [C.g2_mul(p, h % R) for p in pts]
    assert list(got) == exp
    assert bool(np.asarray(G2.in_subgroup(cleared)).all())
