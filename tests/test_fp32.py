"""Differential tests for the f32/8-bit-limb engine (fields/fp32.py):
exact big-int oracle, signed loose-chain discipline, and interop with the
int16 engine (same Montgomery R => pure re-limbing)."""

import numpy as np
import pytest

from crypto12381_tpu.fields import fp as F16
from crypto12381_tpu.fields import fp32 as F8
from crypto12381_tpu.params import P, R

rng = np.random.default_rng(7)


def rand_ints(n, mod):
    return [int.from_bytes(rng.bytes(64), "little") % mod for _ in range(n)]


@pytest.mark.parametrize("ctx,mod", [(F8.FP_CTX, P), (F8.FR_CTX, R)])
def test_mont_mul_exact(ctx, mod):
    n = 8
    Rm = ctx.params.R
    av, bv = rand_ints(n, mod), rand_ints(n, mod)
    a = F8.from_int(ctx, av, mont=False)
    b = F8.from_int(ctx, bv, mont=False)
    got = F8.to_int(ctx, F8.mont_mul(ctx, a, b), mont=False)
    exp = [x * y * pow(Rm, -1, mod) % mod for x, y in zip(av, bv)]
    assert list(got) == exp


@pytest.mark.parametrize("ctx,mod", [(F8.FP_CTX, P), (F8.FR_CTX, R)])
def test_signed_loose_chain(ctx, mod):
    """12*(a-b) - a as raw signed limbs, squared through REDC."""
    n = 8
    Rm = ctx.params.R
    av, bv = rand_ints(n, mod), rand_ints(n, mod)
    a = F8.from_int(ctx, av, mont=False)
    b = F8.from_int(ctx, bv, mont=False)
    e = F8.add(ctx, F8.mul_small(ctx, F8.sub(ctx, a, b), 12), F8.neg(ctx, a))
    got = F8.to_int(ctx, F8.mont_mul(ctx, e, e), mont=False)
    exp = [((12 * (x - y) - x) ** 2) * pow(Rm, -1, mod) % mod
           for x, y in zip(av, bv)]
    assert list(got) == exp


@pytest.mark.parametrize("ctx,mod", [(F8.FP_CTX, P), (F8.FR_CTX, R)])
def test_edges_and_inverse(ctx, mod):
    import jax.numpy as jnp

    edge = [0, 1, mod - 1, mod - 2, (mod + 1) // 2]
    a = F8.from_int(ctx, edge)          # Montgomery
    assert list(F8.to_int(ctx, a)) == edge
    iv = F8.inv(ctx, a)
    prod = F8.mont_mul(ctx, iv, a)
    eqs = np.asarray(F8.eq(ctx, prod, F8.one(ctx, (len(edge),))))
    assert eqs[1:].all()                # inv(0) = 0 -> product != 1
    assert not eqs[0]
    assert bool(jnp.all(F8.is_zero(ctx, F8.zero(ctx, (3,)))))
    # negative representatives canonicalize
    s = F8.add(ctx, F8.neg(ctx, a), a)
    assert bool(jnp.all(F8.is_zero(ctx, s)))


def test_sqrt_qr():
    ctx = F8.FP_CTX
    vals = rand_ints(4, P)
    sq = [v * v % P for v in vals]
    a = F8.from_int(ctx, sq)
    r = F8.sqrt(ctx, a)
    got = [int(x) for x in F8.to_int(ctx, F8.mont_mul(ctx, r, r))]
    assert got == [v % P for v in sq]
    assert np.asarray(F8.is_qr(ctx, a)).all()


def test_batch_inv():
    ctx = F8.FP_CTX
    vals = rand_ints(5, P) + [0]
    a = F8.from_int(ctx, vals)
    iv = F8.batch_inv(ctx, a, axis=0)
    got = list(F8.to_int(ctx, iv))
    exp = [pow(v, -1, P) if v else 0 for v in vals]
    assert got == exp


def test_interop_int16():
    vals = rand_ints(6, P)
    a16 = F16.from_int(F16.FP_CTX, vals)
    a8 = F8.from_limbs16(F8.FP_CTX, a16)
    assert list(F8.to_int(F8.FP_CTX, a8)) == vals
    back = F8.to_limbs16(F8.FP_CTX, F8.reduce_full(F8.FP_CTX, a8))
    assert list(F16.to_int(F16.FP_CTX, back)) == vals


def test_xla_pallas_digit_identical():
    """On TPU the fused Pallas kernel must produce digit-identical output
    to the XLA path; on CPU this degenerates to XLA==XLA (still checks the
    dispatch plumbing)."""
    import jax

    ctx = F8.FP_CTX
    x = np.float32(rng.integers(0, 256, (64, ctx.L)))
    y = np.float32(rng.integers(0, 256, (64, ctx.L)))
    ref = np.asarray(F8._mont_mul_xla(ctx, x, y))
    if jax.default_backend() in ("tpu", "axon"):
        out = np.asarray(F8._mont_mul_pallas(ctx, x, y))
        assert np.array_equal(out, ref)
    else:
        out = np.asarray(F8.mont_mul(ctx, x, y))
        assert np.array_equal(out, ref)


@pytest.mark.parametrize("ctx,mod", [(F8.FP_CTX, P), (F8.FR_CTX, R)])
def test_tighten_contracts_doubling_chain(ctx, mod):
    """tighten must stop bound-doubling chains (the fp12_usqr pattern:
    out = 3*fresh - 2*input, iterated) from escaping the static budget —
    value preserved mod m, digits small, for 64 chained rounds."""
    Rm = ctx.params.R
    av = rand_ints(4, mod)
    a = F8.from_int(ctx, av, mont=False)
    exp = [v % mod for v in av]
    x = a
    xv = list(exp)
    for _ in range(64):
        f = F8.mont_mul(ctx, x, x)                      # fresh product
        fv = [v * v * pow(Rm, -1, mod) % mod for v in xv]
        x = F8.tighten(ctx, F8.sub(ctx, F8.mul_small(ctx, f, 3),
                                   F8.add(ctx, x, x)))
        xv = [(3 * f_ - 2 * v) % mod for f_, v in zip(fv, xv)]
        lim = np.abs(np.asarray(x)).max()
        assert lim < 2 ** 19, lim
    got = list(F8.to_int(ctx, F8.reduce_full(ctx, x), mont=False))
    assert got == xv


@pytest.mark.parametrize("ctx,mod", [(F8.FP_CTX, P), (F8.FR_CTX, R)])
def test_canon1_matches_reduce_full(ctx, mod):
    """canon1 (one-multiply canonicalization) must equal reduce_full on
    budget-range loose signed inputs, including negatives and fresh mont
    outputs."""
    av = rand_ints(6, mod)
    bv = rand_ints(6, mod)
    a = F8.from_int(ctx, av)
    b = F8.from_int(ctx, bv)
    m = F8.mont_mul(ctx, a, b)                 # fresh mont output (loose)
    loose = F8.sub(ctx, m, F8.add(ctx, a, F8.add(ctx, b, b)))  # negative-ish
    for x in (a, m, loose, F8.zero(ctx, (6,))):
        got = np.asarray(F8.canon1(ctx, x))
        ref = np.asarray(F8.reduce_full(ctx, x))
        assert np.array_equal(got, ref)
