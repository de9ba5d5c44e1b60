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


def test_sign_batch_int16_engine():
    """ADVICE r4: pack_bytes assumes the fp32 digit layout; under
    CRYPTO12381_FP_ENGINE=int16 sign_batch must take the engine-generic
    codec fallback and still match scalar signing byte-for-byte.  The
    engine is chosen at import time, so this runs in a subprocess."""
    import os
    import subprocess
    import sys

    code = r"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
from crypto12381_tpu.fields import active as FPA
assert FPA.ENGINE == "int16", FPA.ENGINE
from crypto12381_tpu.api.sets import create_random_engine
from crypto12381_tpu.schemes import bbs, ps

msgs = [b"alpha", b"bravo"]
r1 = create_random_engine("sb-i16")
keys = ps.key_gen(r1)
want = [ps.sign(keys.sk, m, r1) for m in msgs]
r2 = create_random_engine("sb-i16")
ps.key_gen(r2)
assert ps.sign_batch(keys.sk, msgs, r2) == want

r1 = create_random_engine("sb-i16b")
pp = bbs.setup(2, r1)
bk = bbs.key_gen(pp, r1)
bm = [bbs.encode_message(b"x%d" % i) for i in range(2)]
bwant = [bbs.sign(pp, bk.sk, m, r1) for m in bm]
r2 = create_random_engine("sb-i16b")
bbs.setup(2, r2)
bbs.key_gen(pp, r2)
assert bbs.sign_batch(pp, bk.sk, bm, r2) == bwant
print("INT16-SIGN-BATCH-OK")
"""
    env = dict(os.environ, CRYPTO12381_FP_ENGINE="int16",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "INT16-SIGN-BATCH-OK" in out.stdout, (out.stdout, out.stderr[-4000:])
