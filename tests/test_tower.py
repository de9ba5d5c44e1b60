"""Differential tests: JAX tower arithmetic vs the exact pyref oracle."""

import random

import numpy as np

from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.fields import tower as TW
from crypto12381_tpu.params import P
from crypto12381_tpu.pyref import field as PF

rng = random.Random(99)


def rfp2():
    return (rng.randrange(P), rng.randrange(P))


def rfp6():
    return (rfp2(), rfp2(), rfp2())


def rfp12():
    return (rfp6(), rfp6())


def fp2_dev(v):
    import jax.numpy as jnp

    return jnp.stack([FP.from_int(FP.FP_CTX, v[0]), FP.from_int(FP.FP_CTX, v[1])], -2)


def fp2_host(x):
    return (int(FP.to_int(FP.FP_CTX, x[..., 0, :])), int(FP.to_int(FP.FP_CTX, x[..., 1, :])))


def test_fp2_ops():
    a_i, b_i = rfp2(), rfp2()
    a, b = fp2_dev(a_i), fp2_dev(b_i)
    assert fp2_host(TW.fp2_mul(a, b)) == PF.fp2_mul(a_i, b_i)
    assert fp2_host(TW.fp2_sqr(a)) == PF.fp2_sqr(a_i)
    assert fp2_host(TW.fp2_add(a, b)) == PF.fp2_add(a_i, b_i)
    assert fp2_host(TW.fp2_sub(a, b)) == PF.fp2_sub(a_i, b_i)
    assert fp2_host(TW.fp2_inv(a)) == PF.fp2_inv(a_i)
    assert fp2_host(TW.fp2_mul_xi(a)) == PF.fp2_mul_xi(a_i)
    assert fp2_host(TW.fp2_conj(a)) == PF.fp2_conj(a_i)


def test_fp12_mul_sqr_inv():
    x_i, y_i = rfp12(), rfp12()
    x = TW.fp12_from_pyref(x_i)
    y = TW.fp12_from_pyref(y_i)
    assert TW.fp12_to_pyref(TW.fp12_mul(x, y)) == PF._fp12_canon(PF.fp12_mul(x_i, y_i))
    assert TW.fp12_to_pyref(TW.fp12_sqr(x)) == PF._fp12_canon(PF.fp12_sqr(x_i))
    assert TW.fp12_to_pyref(TW.fp12_inv(x)) == PF._fp12_canon(PF.fp12_inv(x_i))
    assert TW.fp12_to_pyref(TW.fp12_conj(x)) == PF._fp12_canon(PF.fp12_conj(x_i))


def test_fp12_frobenius():
    x_i = rfp12()
    x = TW.fp12_from_pyref(x_i)
    for n in (1, 2, 3, 6):
        got = TW.fp12_to_pyref(TW.fp12_frob(x, n))
        expect = x_i
        for _ in range(n):
            expect = PF.fp12_frob(expect)
        assert got == PF._fp12_canon(expect), f"frob^{n}"


def test_fp12_roundtrip_and_eq():
    x_i = rfp12()
    x = TW.fp12_from_pyref(x_i)
    assert TW.fp12_to_pyref(x) == PF._fp12_canon(x_i)
    assert bool(np.asarray(TW.fp12_eq(x, x)))
    y = TW.fp12_mul(x, TW.fp12_one())
    assert bool(np.asarray(TW.fp12_eq(x, y)))
    assert bool(np.asarray(TW.fp12_is_one(TW.fp12_mul(x, TW.fp12_inv(x)))))
