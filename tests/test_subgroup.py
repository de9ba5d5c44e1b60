"""Endomorphism subgroup checks vs the full-order oracle, incl. adversarial
off-subgroup curve points (the cofactor part of E / E')."""

import random

import jax
import numpy as np

from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.curves import g2 as G2
from crypto12381_tpu.params import B_G1, P, R
from crypto12381_tpu.pyref import curve as C
from crypto12381_tpu.pyref import field as F

rng = random.Random(616)


def _off_subgroup_g1():
    """A curve point NOT in the r-subgroup: SSWU output before cofactor
    clearing is uniform-ish in E(Fp) (order h*r, h > 1)."""
    x = 1
    while True:
        rhs = (x * x * x + B_G1) % P
        y = F.fp_sqrt(rhs)
        if y is not None:
            pt = (x, y)
            if not C.g1_in_subgroup(pt):
                return pt
        x += 1


def test_g1_in_subgroup_endo():
    good = [C.g1_mul(C.G1_GEN, rng.randrange(1, R)) for _ in range(3)]
    bad = [_off_subgroup_g1()]
    pts = good + bad
    Pd = G1.from_affine_ints([p[0] for p in pts], [p[1] for p in pts])
    got = np.asarray(jax.jit(G1.in_subgroup)(Pd))
    want = np.asarray([True, True, True, False])
    assert (got == want).all()
    # identity counts as member (matches the old [r]P semantics)
    assert bool(np.asarray(jax.jit(G1.in_subgroup)(G1.identity(()))))


def _off_subgroup_g2():
    from crypto12381_tpu.params import B_G2

    x = (3, 1)
    while True:
        rhs = F.fp2_add(F.fp2_mul(F.fp2_sqr(x), x), B_G2)
        y = F.fp2_sqrt(rhs)
        if y is not None:
            pt = (x, y)
            if not C.g2_in_subgroup(pt):
                return pt
        x = (x[0] + 1, x[1])


def test_g2_in_subgroup_endo():
    good = [C.g2_mul(C.G2_GEN, rng.randrange(1, R)) for _ in range(2)]
    bad = [_off_subgroup_g2()]
    pts = good + bad
    Qd = G2.from_affine_fp2(
        ([p[0][0] for p in pts], [p[0][1] for p in pts]),
        ([p[1][0] for p in pts], [p[1][1] for p in pts]),
    )
    got = np.asarray(jax.jit(G2.in_subgroup)(Qd))
    assert (got == np.asarray([True, True, False])).all()
