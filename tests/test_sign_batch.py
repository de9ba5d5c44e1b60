"""Batched signing == scalar signing, byte-for-byte, for the same seed."""

from crypto12381_tpu.api.sets import create_random_engine
from crypto12381_tpu.schemes import bbs, ps


def test_ps_sign_batch_matches_scalar():
    msgs = [b"alpha", b"bravo", b"charlie"]
    r1 = create_random_engine("sb-seed")
    keys = ps.key_gen(r1)
    want = [ps.sign(keys.sk, m, r1) for m in msgs]
    r2 = create_random_engine("sb-seed")
    keys2 = ps.key_gen(r2)
    assert keys2.sk == keys.sk
    got = ps.sign_batch(keys.sk, msgs, r2)
    assert got == want
    assert all(ps.verify(keys.pk, m, s) for m, s in zip(msgs, got))


def test_bbs_sign_batch_matches_scalar():
    r1 = create_random_engine("sb2")
    pp = bbs.setup(3, r1)
    keys = bbs.key_gen(pp, r1)
    msgs = [bbs.encode_message(b"m-%d" % i) for i in range(3)]
    want = [bbs.sign(pp, keys.sk, m, r1) for m in msgs]
    r2 = create_random_engine("sb2")
    pp2 = bbs.setup(3, r2)
    keys2 = bbs.key_gen(pp2, r2)
    assert keys2.sk == keys.sk
    got = bbs.sign_batch(pp, keys.sk, msgs, r2)
    assert got == want
    assert all(bbs.verify(pp, keys.pk, m, s) for m, s in zip(msgs, got))
