"""Batched signing == scalar signing, byte-for-byte, for the same seed."""

from crypto12381_tpu.api.sets import create_random_engine
from crypto12381_tpu.schemes import bbs, bbs_plus, ps


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


def test_bbs_plus_sign_batch_matches_scalar():
    r1 = create_random_engine("sbp")
    pp = bbs_plus.setup(3, r1)
    keys = bbs_plus.key_gen(pp, r1)
    msgs = [b"plus-%d" % i for i in range(3)]
    want = [bbs_plus.sign(pp, keys.sk, m, r1) for m in msgs]
    r2 = create_random_engine("sbp")
    pp2 = bbs_plus.setup(3, r2)
    keys2 = bbs_plus.key_gen(pp2, r2)
    assert keys2.sk == keys.sk
    got = bbs_plus.sign_batch(pp, keys.sk, msgs, r2)
    assert got == want
    assert all(
        bbs_plus.verify(pp, keys.pk, m, s) for m, s in zip(msgs, got)
    )


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


def test_mhac_cred_pres_batch_matches_scalar():
    """cred_pres_batch == cred_pres called B times, byte-for-byte, for the
    same CSPRNG stream (the O(m*t) exponent work batches on device)."""
    from crypto12381_tpu.api.sets import create_random_engine
    from crypto12381_tpu.schemes import mhac_bbs

    def flow(random, use_batch):
        setup = mhac_bbs.iss_setup(4, random)
        pp, keys = setup.pp, setup.keys
        Prv = [0, 2]
        Pub = [1, 3]
        creds_l, groups_l, ptypes_l, pubs_l, shares_l = [], [], [], [], []
        for _ in range(2):
            ai = mhac_bbs.generate_attributes(pp, 3, 6, Prv, random)
            creds = mhac_bbs.cred_iss(
                pp, keys.sk, 3, ai.commitments, Pub,
                ai.public_attributes, random,
            )
            group = mhac_bbs.make_pres_group(creds, [0, 2, 5])
            ptype = mhac_bbs.make_pres_type(
                pp, [1], Prv, ai.public_attributes
            )
            creds_l.append(creds)
            groups_l.append(group)
            ptypes_l.append(ptype)
            pubs_l.append(ai.public_attributes)
            shares_l.append(ai.private_attributes_share)
        if use_batch:
            pres = mhac_bbs.cred_pres_batch(
                pp, creds_l, groups_l, ptypes_l, Prv, pubs_l, shares_l,
                random,
            )
        else:
            pres = [
                mhac_bbs.cred_pres(
                    pp, creds_l[i], groups_l[i], ptypes_l[i], Prv,
                    pubs_l[i], shares_l[i], random,
                )
                for i in range(2)
            ]
        return pp, keys, Prv, ptypes_l, pubs_l, pres

    _, k1, Prv, pt1, pub1, want = flow(create_random_engine("mh-b"), False)
    pp2, k2, _, pt2, pub2, got = flow(create_random_engine("mh-b"), True)
    for w, g in zip(want, got):
        assert bytes(w.fixed_part) == bytes(g.fixed_part)
        assert [bytes(x) for x in w.z] == [bytes(x) for x in g.z]
        assert ([bytes(x) for x in w.z_hid_pub]
                == [bytes(x) for x in g.z_hid_pub])
    for i in range(2):
        assert mhac_bbs.verify_pres(
            pp2, k2.pk, pt2[i], Prv, pub2[i], got[i]
        )
