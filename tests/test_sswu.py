"""Hash-to-G1: pyref vs oracle vectors is covered implicitly (sswu tables
come from the dump); here: batched JAX map2point vs pyref, including both
QR branches, and full hash-to-G1 serialization."""

import hashlib
import json
import pathlib
import random

import jax

from crypto12381_tpu.compat import codec
from crypto12381_tpu.curves import g1 as G1
from crypto12381_tpu.fields import active as FP
from crypto12381_tpu.hashing import sswu as JSSWU
from crypto12381_tpu.params import P
from crypto12381_tpu.pyref import curve as C
from crypto12381_tpu.pyref import sswu as PSSWU

VEC = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "reference.json").read_text()
)
rng = random.Random(42)


def test_map2point_batch_vs_pyref():
    us = [5, 7, 123456789, rng.randrange(P), rng.randrange(P), 1]
    u = FP.from_int(FP.FP_CTX, us)
    pts = jax.jit(JSSWU.map2point)(u)
    got = G1.to_affine_ints(pts)
    for i, ui in enumerate(us):
        assert got[i] == PSSWU.map2point(ui), f"map2point[{i}] u={ui}"


def test_hash_to_g1_vector():
    d = hashlib.sha3_512(b"abc").digest()
    u = int.from_bytes(d, "big") % P
    pt = jax.jit(JSSWU.hash_field_to_g1)(FP.from_int(FP.FP_CTX, [u]))
    aff = G1.to_affine_ints(pt)[0]
    assert codec.g1_serialize(aff).hex() == VEC["hash_g1_abc"]


def test_iso11_data_matches_oracle_dump():
    """The library's embedded PC table (crypto12381_tpu/iso11_data.py) must
    equal the table dumped from the reference build (rules out
    transcription errors while keeping the library fixture-free)."""
    from crypto12381_tpu.iso11_data import PC

    pc = [int(h, 16) for h in VEC["pc"]]
    assert list(PC) == pc
