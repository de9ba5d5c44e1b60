"""Differential tests: JAX limb field arithmetic vs the exact pyref oracle."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto12381_tpu.fields import fp as FP
from crypto12381_tpu.params import P, R

rng = random.Random(1234)


def _rand_ints(n, mod):
    vals = [rng.randrange(mod) for _ in range(n - 3)]
    return vals + [0, 1, mod - 1]


@pytest.mark.parametrize("ctx,mod", [(FP.FP_CTX, P), (FP.FR_CTX, R)])
def test_roundtrip(ctx, mod):
    vals = _rand_ints(8, mod)
    arr = FP.from_int(ctx, vals)
    back = FP.to_int(ctx, arr)
    assert [int(v) for v in back] == vals


@pytest.mark.parametrize("ctx,mod", [(FP.FP_CTX, P), (FP.FR_CTX, R)])
def test_mul_add_sub_neg(ctx, mod):
    a_i = _rand_ints(16, mod)
    b_i = list(reversed(_rand_ints(16, mod)))
    a = FP.from_int(ctx, a_i)
    b = FP.from_int(ctx, b_i)
    got_mul = FP.to_int(ctx, FP.mont_mul(ctx, a, b))
    got_add = FP.to_int(ctx, FP.add(ctx, a, b))
    got_sub = FP.to_int(ctx, FP.sub(ctx, a, b))
    got_neg = FP.to_int(ctx, FP.neg(ctx, a))
    for i, (x, y) in enumerate(zip(a_i, b_i)):
        assert int(got_mul[i]) == x * y % mod, f"mul[{i}]"
        assert int(got_add[i]) == (x + y) % mod, f"add[{i}]"
        assert int(got_sub[i]) == (x - y) % mod, f"sub[{i}]"
        assert int(got_neg[i]) == (-x) % mod, f"neg[{i}]"


@pytest.mark.parametrize("ctx,mod", [(FP.FP_CTX, P), (FP.FR_CTX, R)])
def test_inv(ctx, mod):
    vals = [rng.randrange(1, mod) for _ in range(4)] + [1, mod - 1]
    a = FP.from_int(ctx, vals)
    got = FP.to_int(ctx, FP.inv(ctx, a))
    for i, x in enumerate(vals):
        assert int(got[i]) == pow(x, -1, mod), f"inv[{i}]"
    # inv(0) == 0
    z = FP.from_int(ctx, [0])
    assert int(FP.to_int(ctx, FP.inv(ctx, z))[0]) == 0


@pytest.mark.parametrize("ctx,mod", [(FP.FP_CTX, P), (FP.FR_CTX, R)])
def test_batch_inv(ctx, mod):
    vals = [rng.randrange(1, mod) for _ in range(5)] + [0, 7]
    a = FP.from_int(ctx, vals)
    got = FP.to_int(ctx, FP.batch_inv(ctx, a))
    for i, x in enumerate(vals):
        expect = pow(x, -1, mod) if x else 0
        assert int(got[i]) == expect, f"batch_inv[{i}]"


def test_sqrt_qr():
    sq = [pow(rng.randrange(1, P), 2, P) for _ in range(4)]
    a = FP.from_int(FP.FP_CTX, sq)
    r = FP.to_int(FP.FP_CTX, FP.sqrt(FP.FP_CTX, a))
    for i, x in enumerate(sq):
        assert pow(int(r[i]), 2, P) == x
    qr = np.asarray(FP.is_qr(FP.FP_CTX, a))
    assert qr.all()
    # known non-residue: find one
    nr = 5  # legendre(5, p)?
    while pow(nr, (P - 1) // 2, P) == 1:
        nr += 1
    b = FP.from_int(FP.FP_CTX, [nr])
    assert not bool(np.asarray(FP.is_qr(FP.FP_CTX, b))[0])


def test_mul_small():
    vals = _rand_ints(8, P)
    a = FP.from_int(FP.FP_CTX, vals)
    for k in (0, 1, 2, 3, 12, 101):
        got = FP.to_int(FP.FP_CTX, FP.mul_small(FP.FP_CTX, a, k))
        for i, x in enumerate(vals):
            assert int(got[i]) == x * k % P, f"mul_small k={k} i={i}"


def test_eq_iszero_parity():
    a = FP.from_int(FP.FP_CTX, [5, 0, P - 1])
    assert np.asarray(FP.is_zero(FP.FP_CTX, a)).tolist() == [False, True, False]
    b = FP.from_int(FP.FP_CTX, [5, 1, P - 1])
    assert np.asarray(FP.eq(FP.FP_CTX, a, b)).tolist() == [True, False, True]
    std = FP.from_mont(FP.FP_CTX, a)
    assert np.asarray(FP.parity_std(std)).tolist() == [1, 0, 0]  # p-1 is even


def test_lazy_range_closure():
    # Stress: long chains of ops stay correct (range invariant holds).
    vals = _rand_ints(4, P)
    a = FP.from_int(FP.FP_CTX, vals)
    acc = a
    expect = list(vals)
    for step in range(20):
        acc = FP.mont_mul(FP.FP_CTX, acc, a)
        acc = FP.add(FP.FP_CTX, acc, acc)
        acc = FP.sub(FP.FP_CTX, acc, a)
        expect = [((e * v) * 2 - v) % P for e, v in zip(expect, vals)]
    got = FP.to_int(FP.FP_CTX, acc)
    assert [int(g) for g in got] == expect
