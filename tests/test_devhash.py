"""Device hash->Zp / hash->G1 == scalar host path (api.batch.hash_to_*)."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np

from crypto12381_tpu.api import batch as BT
from crypto12381_tpu.api.elements import G1Element, ZpNumber

rng = random.Random(55)


def _digests(n):
    ds = [hashlib.sha3_512(bytes([i, 7])).digest() for i in range(n)]
    arr = np.stack([np.frombuffer(d, np.uint8) for d in ds])
    return ds, jnp.asarray(arr)


def test_hash_to_zp_matches_host():
    ds, dev = _digests(6)
    vec = BT.hash_to_zp(dev)
    got = [int(v) for v in np.asarray(vec.to_ints(), object).reshape(-1)]
    want = [ZpNumber.from_hash(d).value for d in ds]
    assert got == want


def test_hash_to_g1_matches_host():
    ds, dev = _digests(4)
    vec = BT.hash_to_g1(dev)
    got = [e.pt for e in vec.to_elements()]
    want = [G1Element.from_hash(d).pt for d in ds]
    assert got == want


def test_from_hash_device_route(monkeypatch):
    monkeypatch.setenv("CRYPTO12381_DEVICE_HASH", "1")
    d = hashlib.sha3_512(b"route").digest()
    dev = G1Element.from_hash(d)
    monkeypatch.delenv("CRYPTO12381_DEVICE_HASH")
    host = G1Element.from_hash(d)
    assert dev.pt == host.pt
