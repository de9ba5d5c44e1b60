"""Endomorphism-accelerated scalar mul: GLV (G1), GS (G2), GT pow, and the
device-side Barrett scalar decompositions, all differentially tested against
the plain ladders / exact pyref oracle."""

import random

import jax.numpy as jnp
import numpy as np

from crypto12381_tpu.curves import endo as E
from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.curves import g2 as G2
from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.fields import fp as FPI  # scalars (Fr) stay int16
from crypto12381_tpu.fields import tower as TW
from crypto12381_tpu.ops import scalar_decomp as SD
from crypto12381_tpu.pairing import pairing as PAIR
from crypto12381_tpu.params import R, X_ABS
from crypto12381_tpu.pyref import curve as C
from crypto12381_tpu.pyref import field as PF
from crypto12381_tpu.pyref import pairing as PR

rng = random.Random(99)


def fr_std(vals):
    return FPI.from_int(FPI.FR_CTX, vals, mont=False)


def limbs_to_int(a):
    a = np.asarray(a)
    return sum(int(v) << (16 * i) for i, v in enumerate(a))


def test_divmod_const():
    ks = [rng.randrange(R) for _ in range(4)] + [0, 1, R - 1, SD.GLV_LAMBDA]
    k = fr_std(ks)
    for d in (SD.GLV_LAMBDA, X_ABS):
        q, r = SD.divmod_const(k, d, lq=12, lr=8)
        for i, ki in enumerate(ks):
            assert limbs_to_int(q[i]) == ki // d, (d, i)
            assert limbs_to_int(r[i]) == ki % d, (d, i)


def test_glv_gs_split_reconstruct():
    ks = [rng.randrange(R) for _ in range(5)]
    k = fr_std(ks)
    k1, k2 = SD.glv_split(k)
    d = SD.gs_split(k)
    for i, ki in enumerate(ks):
        assert limbs_to_int(k1[i]) + SD.GLV_LAMBDA * limbs_to_int(k2[i]) == ki
        assert (
            sum(limbs_to_int(d[i, j]) * X_ABS**j for j in range(4)) == ki
        )
        assert limbs_to_int(k1[i]).bit_length() <= SD.GLV_BITS
        assert limbs_to_int(k2[i]).bit_length() <= SD.GLV_BITS
        for j in range(4):
            assert limbs_to_int(d[i, j]) < X_ABS


def test_endomorphisms_vs_oracle():
    k = rng.randrange(1, R)
    pt = C.g1_mul(C.G1_GEN, k)
    P = G1.from_affine_ints([pt[0]], [pt[1]])
    lam = SD.GLV_LAMBDA % R
    assert G1.to_affine_ints(E.phi_g1(P))[0] == C.g1_mul(pt, lam)

    qt = C.g2_mul(C.G2_GEN, k)
    Q = G2.from_affine_fp2(([qt[0][0]], [qt[0][1]]), ([qt[1][0]], [qt[1][1]]))
    psi = E.psi_g2(Q)
    expect = C.g2_mul(qt, (-X_ABS) % R)
    assert G2.to_affine_ints(psi)[0] == expect


def test_glv_mul_matches_plain():
    ks = [rng.randrange(R) for _ in range(3)] + [0, 1, R - 1]
    base = rng.randrange(1, R)
    pt = C.g1_mul(C.G1_GEN, base)
    P = G1.from_affine_ints([pt[0]] * len(ks), [pt[1]] * len(ks))
    e = fr_std(ks)
    got = G1.to_affine_ints(G1.scalar_mul(P, e))
    for i, ki in enumerate(ks):
        expect = C.g1_mul(pt, ki)
        assert got[i] == (None if expect is None else expect), i


def test_gs_mul_matches_oracle():
    ks = [rng.randrange(R) for _ in range(2)] + [0, R - 1]
    base = rng.randrange(1, R)
    qt = C.g2_mul(C.G2_GEN, base)
    n = len(ks)
    Q = G2.from_affine_fp2(
        ([qt[0][0]] * n, [qt[0][1]] * n), ([qt[1][0]] * n, [qt[1][1]] * n)
    )
    e = fr_std(ks)
    got = G2.to_affine_ints(G2.scalar_mul(Q, e))
    for i, ki in enumerate(ks):
        expect = C.g2_mul(qt, ki)
        assert got[i] == (None if expect is None else expect), i


def _cyclotomic_elems(n):
    """Reduced pairing values (exact, via pyref) as a batched device fp12."""
    outs = []
    for _ in range(n):
        a = rng.randrange(1, R)
        b = rng.randrange(1, R)
        f = PR.pairing(C.g1_mul(C.G1_GEN, a), C.g2_mul(C.G2_GEN, b))
        outs.append(f)
    dev = jnp.stack([TW.fp12_from_pyref(f) for f in outs], axis=0)
    return outs, dev


def test_usqr_matches_sqr_on_cyclotomic():
    host, dev = _cyclotomic_elems(2)
    u = TW.fp12_usqr(dev)
    s = TW.fp12_sqr(dev)
    assert bool(np.asarray(TW.fp12_eq(u, s)).all())
    for i, f in enumerate(host):
        expect = PF.fp12_mul(f, f)
        got = TW.fp12_to_pyref(jnp.take(u, i, axis=0))
        assert got == expect, i


def test_gt_pow_matches_oracle():
    host, dev = _cyclotomic_elems(2)
    ks = [rng.randrange(R), 1]
    e = fr_std(ks)
    out = PAIR.gt_pow(dev, e)
    for i, f in enumerate(host):
        expect = PF.fp12_pow(f, ks[i])
        got = TW.fp12_to_pyref(jnp.take(out, i, axis=0))
        assert got == expect, i
