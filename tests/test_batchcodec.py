"""Vectorized batch codecs (api/batch.py) == scalar host codecs."""

import random

import numpy as np
import pytest

from crypto12381_tpu.api import batch as BT
from crypto12381_tpu.compat import codec
from crypto12381_tpu.params import R
from crypto12381_tpu.pyref import curve as C

rng = random.Random(31337)


def test_g1_parse_batch_matches_host():
    pts = [C.g1_mul(C.G1_GEN, rng.randrange(R)) for _ in range(9)]
    blobs = [codec.g1_serialize(p) for p in pts]
    vec = BT.G1Vec.parse(blobs)
    ref = BT.G1Vec.from_affine([codec.g1_parse(b) for b in blobs])
    assert bool(np.asarray(vec == ref).all())
    # and the batched serialize round-trips to the same bytes
    assert vec.serialize() == blobs


def test_g1_parse_batch_rejects_off_curve():
    # x with no curve point: find one
    x = 5
    from crypto12381_tpu.params import B_G1, P
    from crypto12381_tpu.pyref import field as F

    while F.fp_sqrt((x * x * x + B_G1) % P) is not None:
        x += 1
    bad = bytes([0x02]) + codec.int_to_bytes(x)
    with pytest.raises(ValueError):
        BT.G1Vec.parse([bad])


def test_g1_parse_batch_rejects_bad_prefix():
    with pytest.raises(ValueError):
        BT.G1Vec.parse([bytes([0x05]) + b"\0" * 48])


def test_zp_parse_serialize_batch():
    vals = [0, 1, R - 1] + [rng.randrange(R) for _ in range(5)]
    blobs = [codec.zp_serialize(v) for v in vals]
    vec = BT.ZpVec.parse(blobs)
    got = [int(v) for v in np.asarray(vec.to_ints(), object).reshape(-1)]
    assert got == vals
    assert vec.serialize() == blobs


def test_zp_parse_batch_range_check():
    with pytest.raises(ValueError):
        BT.ZpVec.parse([codec.zp_serialize(1), R.to_bytes(48, "big")])
    with pytest.raises(ValueError):
        BT.ZpVec.parse([(R + 5).to_bytes(48, "big")])
