"""Differential tests for the fused multi-product programs (fields/fp32k).

On CPU `fused()` runs the XLA fallback, which is the SAME program code the
Pallas kernel executes on TPU — so these tests pin the fused arithmetic
against the independent scan-based tower/curve paths (which are themselves
pinned to pyref and the reference's golden vectors)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.fields import tower as TW
from crypto12381_tpu.params import P

if FP.ENGINE != "fp32":  # pragma: no cover
    pytest.skip("fused kernels are fp32-engine only", allow_module_level=True)

from crypto12381_tpu.fields import fp32k as FK

CTX = FP.FP_CTX
rng = random.Random(31337)
B = 2


def _rand_fp(batch=(B,)):
    n = int(np.prod(batch))
    vals = [rng.randrange(P) for _ in range(n)]
    return FP.from_int(CTX, vals).reshape(batch + (CTX.L,))


def _rand_fp2(batch=(B,)):
    return jnp.stack([_rand_fp(batch), _rand_fp(batch)], axis=-2)


def _rand_fp6(batch=(B,)):
    return jnp.stack([_rand_fp2(batch) for _ in range(3)], axis=-3)


def _rand_fp12(batch=(B,)):
    return jnp.stack([_rand_fp6(batch), _rand_fp6(batch)], axis=-4)


def _flat12(x):
    return TW._flat12(x)


def test_fused_fp2_mul():
    a, b = _rand_fp2(), _rand_fp2()
    # make inputs loose (raw adds) to exercise the norm path
    a = FP.add(CTX, a, a)
    old = TW.fp2_mul(a, b)
    got = FK.fused("fp2_mul", a[..., 0, :], a[..., 1, :],
                   b[..., 0, :], b[..., 1, :])
    new = jnp.stack(got, axis=-2)
    assert bool(np.asarray(TW.fp2_eq(old, new)).all())


def test_fused_fp6_mul():
    a, b = _rand_fp6(), _rand_fp6()
    old = TW.fp6_mul(a, b)
    ac = [a[..., i, j, :] for i in range(3) for j in range(2)]
    bc = [b[..., i, j, :] for i in range(3) for j in range(2)]
    got = FK.fused("fp6_mul", *ac, *bc)
    new = jnp.stack(got, axis=-2).reshape(a.shape)
    eqs = [
        TW.fp2_eq(old[..., i, :, :], new[..., i, :, :]) for i in range(3)
    ]
    assert bool(np.asarray(jnp.stack(eqs)).all())


def _fp12_via_fused(name, *xs12):
    comps = []
    for x in xs12:
        c, batch = _flat12(x)
        comps += c
    return TW._unflat12(FK.fused(name, *comps), batch)


def test_fused_fp12_mul_sqr_usqr():
    x, y = _rand_fp12(), _rand_fp12()
    assert bool(np.asarray(
        TW.fp12_eq(TW.fp12_mul(x, y), _fp12_via_fused("fp12_mul", x, y))
    ).all())
    assert bool(np.asarray(
        TW.fp12_eq(TW.fp12_sqr(x), _fp12_via_fused("fp12_sqr", x))
    ).all())
    # usqr is only VALID on cyclotomic elements, but as raw algebra both
    # paths compute the same polynomial — differential equality holds for
    # arbitrary inputs.
    assert bool(np.asarray(
        TW.fp12_eq(TW.fp12_usqr(x), _fp12_via_fused("fp12_usqr", x))
    ).all())


def test_fused_sparse_mul():
    from crypto12381_tpu.pairing import pairing as PAIR

    f = _rand_fp12()
    line = (_rand_fp2(), _rand_fp2(), _rand_fp2())
    old = PAIR._mul_sparse(f, line)
    fs, batch = _flat12(f)
    lcs = [c[..., j, :] for c in line for j in (0, 1)]
    new = TW._unflat12(FK.fused("fp12_sparse_mul", *fs, *lcs), batch)
    assert bool(np.asarray(TW.fp12_eq(old, new)).all())


def test_composites_match_direct_programs():
    """The row-stacked composites (TPU path for the fp12-level ops) agree
    with the monolithic XLA programs and the scan-based tower ops."""
    x, y = _rand_fp12(), _rand_fp12()
    xs, batch = _flat12(x)
    ys, _ = _flat12(y)
    assert bool(np.asarray(TW.fp12_eq(
        TW.fp12_mul(x, y), TW._unflat12(FK.fp12_mul_c(xs, ys), batch)
    )).all())
    assert bool(np.asarray(TW.fp12_eq(
        TW.fp12_sqr(x), TW._unflat12(FK.fp12_sqr_c(xs), batch)
    )).all())
    assert bool(np.asarray(TW.fp12_eq(
        TW.fp12_usqr(x), TW._unflat12(FK.fp12_usqr_c(xs), batch)
    )).all())
    from crypto12381_tpu.pairing import pairing as PAIR

    line = (_rand_fp2(), _rand_fp2(), _rand_fp2())
    lcs = [c[..., j, :] for c in line for j in (0, 1)]
    assert bool(np.asarray(TW.fp12_eq(
        PAIR._mul_sparse(x, line),
        TW._unflat12(FK.sparse_mul_c(xs, lcs), batch),
    )).all())


def test_fused_g2_composite_adds():
    from crypto12381_tpu.curves import g2 as G2
    from crypto12381_tpu.curves import weierstrass as W
    from crypto12381_tpu.params import R
    from crypto12381_tpu.pyref import curve as C

    ks = [rng.randrange(1, R) for _ in range(2)]
    q = [C.g2_mul(C.G2_GEN, k) for k in ks]

    def fp2s(vs):
        return jnp.stack(
            [FP.from_int(CTX, [v[0] for v in vs]),
             FP.from_int(CTX, [v[1] for v in vs])], axis=-2
        )

    qx = fp2s([p[0] for p in q])
    qy = fp2s([p[1] for p in q])
    qz = fp2s([(1, 0), (1, 0)])
    qa = (qx[:1], qy[:1], qz[:1])
    qb = (qx[1:], qy[1:], qz[1:])
    assert bool(np.asarray(G2.eq(
        W.add(G2.ops(), qa, qb), G2._fused_add(qa, qb)
    )).all())
    assert bool(np.asarray(G2.eq(
        W.madd(G2.ops(), qa, (qb[0], qb[1])),
        G2._fused_madd(qa, (qb[0], qb[1])),
    )).all())
    # mixed add vs complete add agreement
    assert bool(np.asarray(G2.eq(
        W.madd(G2.ops(), qa, (qb[0], qb[1])), W.add(G2.ops(), qa, qb)
    )).all())
    # dedicated doubling (generic + fused composite) vs add(p, p)
    assert bool(np.asarray(G2.eq(
        W.double(G2.ops(), qa), W.add(G2.ops(), qa, qa)
    )).all())
    assert bool(np.asarray(G2.eq(
        G2._fused_dbl(qa), W.add(G2.ops(), qa, qa)
    )).all())


def test_dedicated_double_g1():
    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.curves import weierstrass as W
    from crypto12381_tpu.params import R
    from crypto12381_tpu.pyref import curve as C

    ks = [rng.randrange(1, R) for _ in range(2)]
    pts = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = G1.from_affine_ints([p[0] for p in pts], [p[1] for p in pts])
    dbl = W.double(G1.ops(), P)
    exp = W.add(G1.ops(), P, P)
    assert bool(np.asarray(G1.eq(dbl, exp)).all())
    assert bool(np.asarray(G1.eq(G1._fused_dbl(P), exp)).all())
    # identity doubles to identity (completeness of RCB Alg. 9)
    idp = G1.identity((2,))
    assert bool(np.asarray(G1.is_identity(W.double(G1.ops(), idp))).all())
    assert bool(np.asarray(G1.is_identity(G1._fused_dbl(idp))).all())


def test_fused_curve_adds():
    from crypto12381_tpu.curves import g1 as G1
    from crypto12381_tpu.curves import g2 as G2
    from crypto12381_tpu.curves import weierstrass as W
    from crypto12381_tpu.params import R
    from crypto12381_tpu.pyref import curve as C

    ks = [rng.randrange(1, R) for _ in range(4)]
    p1 = [C.g1_mul(C.G1_GEN, k) for k in ks[:2]]
    pts = G1.from_affine_ints(
        [p[0] for p in p1], [p[1] for p in p1]
    )
    a = tuple(c[:1] for c in pts)
    b = tuple(c[1:] for c in pts)
    old = W.add(G1.ops(), a, b)
    new = G1._fused_add(a, b)
    assert bool(np.asarray(G1.eq(old, new)).all())
    # identity / doubling edge cases stay exception-free
    idp = G1.identity((1,))
    assert bool(np.asarray(G1.eq(G1._fused_add(a, idp), a)).all())
    assert bool(np.asarray(
        G1.eq(G1._fused_add(a, a), W.add(G1.ops(), a, a))
    ).all())
    # mixed add: fused vs generic vs complete
    q_aff = (b[0], b[1])
    assert bool(np.asarray(G1.eq(
        W.madd(G1.ops(), a, q_aff), W.add(G1.ops(), a, b)
    )).all())
    assert bool(np.asarray(G1.eq(
        G1._fused_madd(a, q_aff), W.add(G1.ops(), a, b)
    )).all())

    q = [C.g2_mul(C.G2_GEN, k) for k in ks[2:]]

    def fp2s(vs):
        return jnp.stack(
            [FP.from_int(CTX, [v[0] for v in vs]),
             FP.from_int(CTX, [v[1] for v in vs])], axis=-2
        )

    qx = fp2s([p[0] for p in q])
    qy = fp2s([p[1] for p in q])
    qz = fp2s([(1, 0), (1, 0)])
    qa = (qx[:1], qy[:1], qz[:1])
    qb = (qx[1:], qy[1:], qz[1:])
    old2 = W.add(G2.ops(), qa, qb)
    new2 = G2._fused_add(qa, qb)
    assert bool(np.asarray(G2.eq(old2, new2)).all())
