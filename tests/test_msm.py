"""MSM differential tests vs the exact oracle (tiny parameters on CPU)."""

import random

import jax
import numpy as np

from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.fields import fp as FPI  # scalars (Fr) stay int16
from crypto12381_tpu.msm import pippenger as MSM
from crypto12381_tpu.params import R
from crypto12381_tpu.pyref import curve as C

rng = random.Random(77)


def test_window_digits():
    e = rng.randrange(R)
    arr = FPI.from_int(FPI.FR_CTX, [e], mont=False)
    for c in (4, 6, 8, 13):
        d = np.asarray(MSM.window_digits(arr, c))[0]
        K = -(-255 // c)
        expect = [(e >> (k * c)) & ((1 << c) - 1) for k in range(K)]
        assert d.tolist() == expect, f"c={c}"


def test_signed_window_digits():
    """Digits must reconstruct ANY 256-bit value exactly (not just e < r:
    the bench feeds unreduced scalars — cK >= 258 coverage)."""
    for c in (4, 8, 12, 13):
        K = -(-258 // c)
        for e in (0, 1, rng.randrange(R), R - 1, (1 << 256) - 1,
                  rng.randrange(1 << 256)):
            import jax.numpy as jnp

            limbs = np.array(
                [(e >> (16 * i)) & 0xFFFF for i in range(18)], np.int32
            )[None, :]
            arr = jnp.asarray(limbs)  # raw limbs: NOT reduced mod r
            d = np.asarray(MSM.signed_window_digits(arr, c))[0].tolist()
            assert len(d) == K
            assert all(-(1 << (c - 1)) <= x <= (1 << (c - 1)) for x in d)
            assert sum(x << (c * i) for i, x in enumerate(d)) == e, (c, e)


def test_msm_g1_small():
    n = 16
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    pts_ref = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = G1.from_affine_ints([p[0] for p in pts_ref], [p[1] for p in pts_ref])
    s = FPI.from_int(FPI.FR_CTX, scalars, mont=False)
    res = jax.jit(
        lambda P, s: MSM.msm_g1(P, s, c=4, lanes=8)
    )(P, s)
    got = G1.to_affine_ints(res)
    expect = None
    for p, k in zip(pts_ref, scalars):
        expect = C.g1_add(expect, C.g1_mul(p, k))
    assert got == expect


def test_msm_with_padding_zero_scalars_and_identity_points():
    """n not a lane multiple (internal generator padding), a zero scalar,
    and an identity input point (replaced by generator at scalar 0)."""
    n = 5
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n - 1)] + [0]
    pts_ref = [C.g1_mul(C.G1_GEN, k) for k in ks]
    P = G1.from_affine_ints([p[0] for p in pts_ref], [p[1] for p in pts_ref])
    # overwrite point 1 with the identity (Z = 0)
    import jax.numpy as jnp

    X, Y, Z = P
    zmask = jnp.asarray([1.0, 0.0, 1.0, 1.0, 1.0])[:, None]
    P = (X, Y, Z * zmask)
    res = jax.jit(lambda P, s: MSM.msm_g1(P, s, c=5, lanes=8))(
        P, FPI.from_int(FPI.FR_CTX, scalars, mont=False)
    )
    got = G1.to_affine_ints(res)
    expect = None
    for i, (p, k) in enumerate(zip(pts_ref, scalars)):
        if i == 1:
            continue
        expect = C.g1_add(expect, C.g1_mul(p, k))
    assert got == expect


def test_msm_g1_large_same_base():
    """2^16-point MSM (VERDICT r1): all points = generator, so the expected
    value reduces to gen^(sum s_i mod r) — one oracle scalar mul.  Repeated
    points stress the complete-add/doubling paths of every bucket."""
    n = 1 << 16
    nprng = np.random.default_rng(123)
    scalars = [int.from_bytes(nprng.bytes(31), "big") % R for _ in range(n)]
    base = G1.generator((n,))
    s = FPI.from_int(FPI.FR_CTX, scalars, mont=False)
    res = jax.jit(lambda P, s: MSM.msm_g1(P, s, c=8, lanes=64))(base, s)
    got = G1.to_affine_ints(res)
    expect = C.g1_mul(C.G1_GEN, sum(scalars) % R)
    assert got == expect


def test_msm_g2():
    from crypto12381_tpu.curves import g2 as G2

    n = 8
    ks = [rng.randrange(R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    pts_ref = [C.g2_mul(C.G2_GEN, k) for k in ks]
    P = G2.from_affine_fp2(
        ([p[0][0] for p in pts_ref], [p[0][1] for p in pts_ref]),
        ([p[1][0] for p in pts_ref], [p[1][1] for p in pts_ref]),
    )
    s = FPI.from_int(FPI.FR_CTX, scalars, mont=False)
    res = jax.jit(lambda P, s: MSM.msm_g2(P, s, c=5, lanes=4))(P, s)
    got = G2.to_affine_ints(res)
    expect = None
    for k, sc in zip(ks, scalars):
        expect = C.g2_add(expect, C.g2_mul(C.G2_GEN, k * sc % R))
    assert got == expect
