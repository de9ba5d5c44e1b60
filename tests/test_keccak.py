"""Device batched SHA3-512 == hashlib (bit-exact), incl. ragged batches."""

import hashlib
import random

import numpy as np

from crypto12381_tpu.hashing import keccak as KC

rng = random.Random(777)


def _ref(b: bytes) -> bytes:
    return hashlib.sha3_512(b).digest()


def test_sha3_512_batch_various_lengths():
    # boundary lengths around the 72-byte rate
    lens = [0, 1, 5, 71, 72, 73, 144, 145, 200, 300]
    msgs = [bytes(rng.randrange(256) for _ in range(l)) for l in lens]
    maxlen = max(lens)
    data = np.zeros((len(msgs), maxlen), np.uint8)
    for i, m in enumerate(msgs):
        data[i, : len(m)] = np.frombuffer(m, np.uint8)
    out = np.asarray(KC.sha3_512_batch(data, lens))
    for i, m in enumerate(msgs):
        assert bytes(out[i]) == _ref(m), f"len={lens[i]}"


def test_sha3_512_batch_uniform():
    msgs = [b"x" * 100, b"y" * 100, bytes(range(100))]
    data = np.stack([np.frombuffer(m, np.uint8) for m in msgs])
    out = np.asarray(KC.sha3_512_batch(data, [100] * 3))
    for i, m in enumerate(msgs):
        assert bytes(out[i]) == _ref(m)
