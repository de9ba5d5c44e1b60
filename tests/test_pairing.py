"""Differential tests: batched JAX pairing vs the exact oracle + golden
vectors (the reference's GT byte values)."""

import json
import pathlib
import random

import jax.numpy as jnp
import numpy as np

from crypto12381_tpu.compat import codec
from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.curves import g2 as G2
from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.fields import tower as TW
from crypto12381_tpu.pairing import pairing as PAIR
from crypto12381_tpu.params import R
from crypto12381_tpu.pyref import curve as C
from crypto12381_tpu.pyref import field as PF
from crypto12381_tpu.pyref import pairing as PR

VEC = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "reference.json").read_text()
)
rng = random.Random(5)

import jax

# jit once per shape; eager dispatch of the full pairing graph is too slow
_pair_jit = jax.jit(lambda p, q: PAIR.pairing_affine(p, q))
_multi_jit = jax.jit(lambda p, q: PAIR.multi_pairing(p, q))


def g1_dev(pt):
    x = FP.from_int(FP.FP_CTX, pt[0])
    y = FP.from_int(FP.FP_CTX, pt[1])
    return (x, y)


def g2_dev(pt):
    return (
        jnp.stack([FP.from_int(FP.FP_CTX, pt[0][0]), FP.from_int(FP.FP_CTX, pt[0][1])], -2),
        jnp.stack([FP.from_int(FP.FP_CTX, pt[1][0]), FP.from_int(FP.FP_CTX, pt[1][1])], -2),
    )


def test_pairing_generator_matches_reference_bytes():
    e = _pair_jit(g1_dev(C.G1_GEN), g2_dev(C.G2_GEN))
    got = codec.gt_serialize(TW.fp12_to_pyref(e)).hex()
    assert got == VEC["gt_e_g1_g2"]


def test_pairing_random_matches_pyref():
    a = rng.randrange(1, R)
    b = rng.randrange(1, R)
    pa = C.g1_mul(C.G1_GEN, a)
    qb = C.g2_mul(C.G2_GEN, b)
    e = _pair_jit(g1_dev(pa), g2_dev(qb))
    expect = PR.pairing(pa, qb)
    assert TW.fp12_to_pyref(e) == PF._fp12_canon(expect)


def test_batched_bilinearity():
    ks = [2, 3]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    px = FP.from_int(FP.FP_CTX, [p[0] for p in pts])
    py = FP.from_int(FP.FP_CTX, [p[1] for p in pts])
    qx = jnp.stack(
        [FP.from_int(FP.FP_CTX, [C.G2_GEN[0][0]] * 2), FP.from_int(FP.FP_CTX, [C.G2_GEN[0][1]] * 2)],
        -2,
    )
    qy = jnp.stack(
        [FP.from_int(FP.FP_CTX, [C.G2_GEN[1][0]] * 2), FP.from_int(FP.FP_CTX, [C.G2_GEN[1][1]] * 2)],
        -2,
    )
    e = _pair_jit((px, py), (qx, qy))  # batch of 2
    e2, e3 = TW.fp12_to_pyref(e[0]), TW.fp12_to_pyref(e[1])
    base = PR.pairing(C.G1_GEN, C.G2_GEN)
    assert e2 == PF._fp12_canon(PF.fp12_pow(base, 2))
    assert e3 == PF._fp12_canon(PF.fp12_pow(base, 3))


def test_multi_pairing_double_ate_vector():
    # e(2g, h) * e(g, 3h) == reference PAIR_double_ate vector
    p1 = C.g1_mul(C.G1_GEN, 2)
    q2 = C.g2_mul(C.G2_GEN, 3)
    px = FP.from_int(FP.FP_CTX, [p1[0], C.G1_GEN[0]])
    py = FP.from_int(FP.FP_CTX, [p1[1], C.G1_GEN[1]])
    qx = jnp.stack(
        [
            FP.from_int(FP.FP_CTX, [C.G2_GEN[0][0], q2[0][0]]),
            FP.from_int(FP.FP_CTX, [C.G2_GEN[0][1], q2[0][1]]),
        ],
        -2,
    )
    qy = jnp.stack(
        [
            FP.from_int(FP.FP_CTX, [C.G2_GEN[1][0], q2[1][0]]),
            FP.from_int(FP.FP_CTX, [C.G2_GEN[1][1], q2[1][1]]),
        ],
        -2,
    )
    e = _multi_jit((px, py), (qx, qy))
    got = codec.gt_serialize(TW.fp12_to_pyref(e)).hex()
    assert got == VEC["gt_double_ate"]


def test_pairing_infinity_masks():
    e = PAIR.pairing_affine(
        g1_dev(C.G1_GEN),
        g2_dev(C.G2_GEN),
        p_inf=jnp.asarray(True),
    )
    assert bool(np.asarray(TW.fp12_is_one(e)))
