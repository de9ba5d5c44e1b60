"""Validate the host-side reference stack (pyref/compat) bit-for-bit against
golden vectors dumped from an out-of-tree build of the reference
(tools/oracle/dump_vectors.cpp -> tests/vectors/reference.json).

This anchors the whole framework: the JAX/TPU kernels are differentially
tested against pyref, and pyref is proven identical to the reference here.
"""

import hashlib
import json
import pathlib

import pytest

from crypto12381_tpu import params
from crypto12381_tpu.compat import codec, csprng
from crypto12381_tpu.pyref import curve as C
from crypto12381_tpu.pyref import field as F
from crypto12381_tpu.pyref import pairing as PR

VEC = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "reference.json").read_text()
)


def H(name):
    return VEC[name]


def test_rom_constants_match():
    assert int(H("p"), 16) == params.P
    assert int(H("r"), 16) == params.R
    assert int(H("cof_eff"), 16) == params.H_EFF_G1
    assert int(H("g1x"), 16) == params.G1_GEN_X
    assert int(H("g1y"), 16) == params.G1_GEN_Y
    assert int(H("g2xa"), 16) == params.G2_GEN_X[0]
    assert int(H("g2xb"), 16) == params.G2_GEN_X[1]
    assert int(H("g2ya"), 16) == params.G2_GEN_Y[0]
    assert int(H("g2yb"), 16) == params.G2_GEN_Y[1]
    assert int(H("iso_a"), 16) == params.ISO11_A
    assert int(H("iso_b"), 16) == params.ISO11_B


def test_csprng_stream():
    rng = csprng.RandomEngine("seed")
    stream = bytes(rng.rand_byte() for _ in range(64))
    assert stream.hex() == H("rand_stream_seed")


def test_randomnum_mod_r():
    rng = csprng.RandomEngine("seed")
    for expected in H("randomnum_r"):
        v = rng.random_mod(params.R)
        assert v == int(expected, 16)


def test_g1_serialization():
    assert codec.g1_serialize(C.G1_GEN).hex() == H("g1_gen_ser")
    assert codec.g1_serialize(C.g1_add(C.G1_GEN, C.G1_GEN)).hex() == H("g1_2g_ser")
    assert codec.g1_serialize(C.g1_mul(C.G1_GEN, 12345)).hex() == H("g1_12345g_ser")
    # round-trip
    assert codec.g1_parse(bytes.fromhex(H("g1_12345g_ser"))) == C.g1_mul(
        C.G1_GEN, 12345
    )


def test_g2_serialization():
    assert codec.g2_serialize(C.G2_GEN).hex() == H("g2_gen_ser")
    q = C.g2_mul(C.G2_GEN, 12345)
    assert codec.g2_serialize(q).hex() == H("g2_12345h_ser")
    assert codec.g2_parse(bytes.fromhex(H("g2_12345h_ser"))) == q


def test_pairing_gt_bytes():
    e = PR.pairing(C.G1_GEN, C.G2_GEN)
    assert codec.gt_serialize(e).hex() == H("gt_e_g1_g2")
    # parse round-trip
    assert F.fp12_eq(codec.gt_parse(bytes.fromhex(H("gt_e_g1_g2"))), e)


def test_pairing_bilinear_vector():
    e = PR.pairing(C.g1_mul(C.G1_GEN, 7), C.g2_mul(C.G2_GEN, 11))
    assert codec.gt_serialize(e).hex() == H("gt_e_7g_11h")
    # and equals e(g,h)^77
    base = codec.gt_parse(bytes.fromhex(H("gt_e_g1_g2")))
    assert F.fp12_eq(e, F.fp12_pow(base, 77))


def test_gt_pow():
    base = codec.gt_parse(bytes.fromhex(H("gt_e_g1_g2")))
    assert codec.gt_serialize(F.fp12_pow(base, 5)).hex() == H("gt_e_pow5")


def test_double_ate():
    # e(2g, h) * e(g, 3h)
    e1 = PR.pairing(C.g1_mul(C.G1_GEN, 2), C.G2_GEN)
    e2 = PR.pairing(C.G1_GEN, C.g2_mul(C.G2_GEN, 3))
    assert codec.gt_serialize(F.fp12_mul(e1, e2)).hex() == H("gt_double_ate")


def test_sha3_is_hashlib():
    assert hashlib.sha3_512(b"abc").hexdigest() == H("sha3_512_abc")


def test_hash_to_zp():
    d = hashlib.sha3_512(b"abc").digest()
    v = int.from_bytes(d, "big") % params.R
    assert v == int(H("hash_zp_abc"), 16)


def test_native_csprng_matches_python_and_oracle():
    pytest.importorskip("ctypes")
    from crypto12381_tpu.compat.csprng import (NativeRandomEngine,
                                               RandomEngine, _NATIVE)

    if _NATIVE is None:
        pytest.skip("native compat library not built")
    py = RandomEngine("seed")
    nat = NativeRandomEngine("seed")
    assert py.rand_bytes(256) == nat.rand_bytes(256)
    py2, nat2 = RandomEngine("another"), NativeRandomEngine("another")
    for _ in range(3):
        assert py2.random_mod(params.R) == nat2.random_mod(params.R)
