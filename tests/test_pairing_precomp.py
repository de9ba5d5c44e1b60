"""Fixed-G2 precomputed-line Miller loop == plain Miller loop."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from crypto12381_tpu.api import batch as BT
from crypto12381_tpu.params import R
from crypto12381_tpu.pyref import curve as C

rng = random.Random(9090)


def _g1vec(ks):
    return BT.G1Vec.from_affine([C.g1_mul(C.G1_GEN, k) for k in ks])


def _g2vec(ks):
    return BT.G2Vec.from_affine([C.g2_mul(C.G2_GEN, k) for k in ks])


def test_pair_prod_fixed_matches_plain():
    B = 3
    ks1 = [rng.randrange(R) for _ in range(B)]
    ks2 = [rng.randrange(R) for _ in range(B)]
    q1, q2 = rng.randrange(R), rng.randrange(R)
    a = _g1vec(ks1)
    b = _g1vec(ks2)
    Q1 = _g2vec([q1])
    Q2 = _g2vec([q2])

    def fixed(ap, bp, q1p, q2p):
        return BT.pair_prod_fixed(
            (BT.G1Vec(ap, z_is_one=True), BT.G2Vec(q1p, z_is_one=True)),
            (BT.G1Vec(bp, z_is_one=True), BT.G2Vec(q2p, z_is_one=True)),
        ).f

    def plain(ap, bp, q1p, q2p):
        B = ap[0].shape[0]
        return BT.pair_prod(
            (BT.G1Vec(ap), BT.G2Vec(q1p, z_is_one=True).broadcast_to((B,))),
            (BT.G1Vec(bp), BT.G2Vec(q2p, z_is_one=True).broadcast_to((B,))),
        ).f

    f1 = jax.jit(fixed)(a.p, b.p, Q1.p, Q2.p)
    f2 = jax.jit(plain)(a.p, b.p, Q1.p, Q2.p)
    from crypto12381_tpu.fields import tower as TW

    assert bool(np.asarray(TW.fp12_eq(f1, f2)).all())


def test_pair_prod_fixed_infinity_pairs():
    """Infinite G1 entries contribute exactly 1 (match plain path)."""
    B = 2
    ks1 = [rng.randrange(R) for _ in range(B)]
    a = _g1vec(ks1)
    # make entry 0 the identity
    X, Y, Z = a.p
    mask = jnp.asarray([0.0, 1.0])[:, None]
    a = BT.G1Vec((X, Y, Z * mask), z_is_one=True)
    b = _g1vec([rng.randrange(R) for _ in range(B)])
    Q1 = _g2vec([rng.randrange(R)])
    Q2 = _g2vec([rng.randrange(R)])
    f1 = BT.pair_prod_fixed((a, Q1), (b, Q2)).f
    f2 = BT.pair_prod(
        (a, Q1.broadcast_to((B,))), (b, Q2.broadcast_to((B,)))
    ).f
    from crypto12381_tpu.fields import tower as TW

    assert bool(np.asarray(TW.fp12_eq(f1, f2)).all())
