"""Byte-exact scheme-flow tests against golden vectors dumped from the
reference build (tools/oracle/dump_*_flow.cpp, reference flows in
/root/reference/examples/*/test.cpp — same seeds, same draw order).

These catch systematic draw-order/serialization slips that scheme-internal
sign/verify round-trips cannot (VERDICT r1, missing #3)."""

import json
import pathlib

import pytest

from crypto12381_tpu.api.sets import Zp, create_random_engine, select_in, serialize
from crypto12381_tpu.schemes import bbs, bbs_plus, ps, sss

VEC_DIR = pathlib.Path(__file__).parent / "vectors"


def _vec(name):
    return json.loads((VEC_DIR / name).read_text())


def test_ps_flow_bytes():
    """North-star config (ref example_ps.cpp, examples/ps/test.cpp:19-41):
    keygen -> sign -> re-randomize -> verify, every artifact byte-exact
    against tools/oracle/dump_ps_flow.cpp run on the reference build."""
    vec = _vec("ps_flow.json")
    r = create_random_engine("seed")
    keys = ps.key_gen(r)
    assert keys.pk.hex() == vec["g2"] + vec["X2"] + vec["Y2"]
    assert keys.sk.hex() == vec["sk"]
    msg = b"\x00" * 47 + bytes([23])
    sig = ps.sign(keys.sk, msg, r)
    assert sig.hex() == vec["signature"]
    rand_sig = ps.randomnize(sig, r)
    assert rand_sig.hex() == vec["signature_rand"]
    assert ps.verify(keys.pk, msg, rand_sig) == vec["verify"] is True


def test_bbs_flow_bytes():
    vec = _vec("bbs_flow.json")
    r = create_random_engine("seed")
    pp = bbs.setup(16, r)
    keys = bbs.key_gen(pp, r)
    assert pp.g1_g2.hex() == vec["g1"] + vec["g2"]
    assert [h.hex() for h in pp.h] == vec["h"]
    assert keys.sk.hex() == vec["sk"]
    assert keys.pk.hex() == vec["pk"]
    msg = bbs.encode_message(b"Hello, BBS!")
    assert [m.hex() for m in msg] == vec["message"]
    sig = bbs.sign(pp, keys.sk, msg, r)
    assert sig.hex() == vec["signature_A"] + vec["signature_x"]
    assert bbs.verify(pp, keys.pk, msg, sig) == vec["verify"] is True


def test_bbs_plus_flow_bytes():
    vec = _vec("bbs_plus_flow.json")
    r = create_random_engine("seed")
    pp = bbs_plus.setup(16, r)
    keys = bbs_plus.key_gen(pp, r)
    assert pp.g1_g2_h0.hex() == vec["g1"] + vec["g2"] + vec["h0"]
    assert [h.hex() for h in pp.h] == vec["h"]
    assert keys.sk.hex() == vec["sk"]
    assert keys.pk.hex() == vec["pk"]
    sig = bbs_plus.sign(pp, keys.sk, b"Hello, BBS+!", r)
    assert sig.hex() == (
        vec["signature_A"] + vec["signature_x"] + vec["signature_r"]
    )
    assert bbs_plus.verify(pp, keys.pk, b"Hello, BBS+!", sig) == vec["verify"] is True


def test_sss_flow_bytes():
    vec = _vec("sss_flow.json")
    r = create_random_engine("seed")
    secret = serialize(select_in(Zp, r))
    assert secret.hex() == vec["secret"]
    shares = sss.share(4, 6, secret, r)
    assert [s.hex() for s in shares] == vec["shares"]
    rec = sss.reconstruct([1, 3, 4, 6], [shares[i - 1] for i in (1, 3, 4, 6)])
    assert rec.hex() == vec["reconstructed"]
    assert (rec == secret) == vec["match"] is True


def test_bbs04_flow_bytes():
    from crypto12381_tpu.schemes import bbs04

    vec = _vec("bbs04_flow.json")
    r = create_random_engine("seed")
    keys = bbs04.key_gen(4, r)
    assert keys.gpk.hex() == vec["gpk"]
    assert keys.gmsk.hex() == vec["gmsk"]
    assert [g.hex() for g in keys.gsk] == vec["gsk"]
    # the reference signs the 10-byte span "hello bbs" INCLUDING the
    # literal's NUL terminator (std::span over a char[10] array)
    msg = b"hello bbs\x00"
    sig = bbs04.sign(keys.gpk, keys.gsk[2], msg, r)
    assert sig.hex() == vec["signature"]
    assert bbs04.verify(keys.gpk, msg, sig) == vec["verify"] is True
    opened = bbs04.open_signature(keys.gmsk, sig)
    assert opened.hex() == vec["opened"]
    assert keys.gsk[vec["opened_index"]][:49] == opened


def test_ac_bbs_flow_bytes():
    from crypto12381_tpu.schemes import ac_bbs

    vec = _vec("ac_bbs_flow.json")
    r = create_random_engine("seed")
    keys = ac_bbs.keygen(32, r)
    assert keys.sk.hex() == vec["sk"]
    assert keys.pk.fixed_part.hex() == vec["pk_fixed"]
    assert [y.hex() for y in keys.pk.Y] == vec["Y"]
    attr = ac_bbs.generate_attributes(keys.pk, 32, r)
    assert [a.hex() for a in attr] == vec["attr"]
    sig = ac_bbs.issue(keys, attr, r)
    assert sig.hex() == vec["sig_A"] + vec["sig_w"]
    msg = b"\x00"  # reference: span over "" includes the NUL
    p = ac_bbs.pres(msg, attr, sig, [0, 3], keys.pk, r)
    assert p.fixed_part.hex() == vec["pres_fixed"]
    assert [u.hex() for u in p.u] == vec["pres_u"]
    assert ac_bbs.verify(msg, attr, [0, 3], p, keys.pk) == vec["verify"] is True


def test_ac_rbbs_flow_bytes():
    from crypto12381_tpu.schemes import ac_rbbs

    vec = _vec("ac_rbbs_flow.json")
    r = create_random_engine("seed")
    keys = ac_rbbs.keygen(32, r)
    assert keys.sk.hex() == vec["sk"]
    assert keys.pk.fixed_part.hex() == vec["pk_fixed"]
    assert [y.hex() for y in keys.pk.Y] == vec["Y"]     # incl. zero Y[n]
    assert [y.hex() for y in keys.pk.tilde_Y] == vec["tilde_Y"]
    attr = ac_rbbs.generate_attributes(keys.pk, 32, r)
    assert [a.hex() for a in attr] == vec["attr"]
    sig = ac_rbbs.issue(keys, attr, r)
    assert sig.hex() == vec["sig_A"] + vec["sig_w"]
    rc = ac_rbbs.redact(attr, sig, [0, 3], keys.pk)
    assert rc.hex() == vec["redact"]
    msg = b"\x00"
    p = ac_rbbs.pres(msg, sig, rc, r)
    assert p.hex() == vec["pres"]
    assert ac_rbbs.verify(msg, attr, [0, 3], p, keys.pk) == vec["verify"] is True


def test_ac_rps_flow_bytes_at_reference_params():
    """n=64, I={0,1,3} — the reference test's exact parameters
    (examples/AC-rps/test.cpp:36,47).  The oracle dump records that the
    REFERENCE's own verify fails on its own presentation (verify_t1 and
    verify_t2 both false: pres.cpp:26 hashes (A_, B_, C~_J, i) for its
    q-challenges while verify.cpp:17 hashes (a[j in I], i) — different
    transcripts), so the byte-exact Python port must also return False."""
    from crypto12381_tpu.schemes import ac_rps

    vec = _vec("ac_rps_flow.json")
    r = create_random_engine("seed")
    keys = ac_rps.keygen(64, r)
    assert keys.sk.hex() == vec["sk"]
    assert keys.pk.fixed_part.hex() == vec["pk_fixed"]
    assert [y.hex() for y in keys.pk.Y] == vec["Y"]
    assert [y.hex() for y in keys.pk.tilde_Y] == vec["tilde_Y"]
    attr = ac_rps.generate_attributes(keys.pk, 64, r)
    assert [a.hex() for a in attr] == vec["attr"]
    sig = ac_rps.issue(keys, attr, r)
    assert sig.hex() == vec["sig"]
    I = [0, 1, 3]
    rc = ac_rps.redact(attr, sig, I, keys.pk)
    assert rc.hex() == vec["redact"]
    msg = b"\x00"
    p = ac_rps.pres(msg, attr, sig, I, rc, keys.pk, r)
    assert p.hex() == vec["pres"]
    assert vec["verify_t1"] is False and vec["verify_t2"] is False
    assert ac_rps.verify(msg, attr, I, p, keys.pk) == vec["verify"] is False


def test_mhac_bbs_flow_bytes():
    """Full 7-stage MHAC-BBS flow at the reference test's parameters
    (iss_setup(4), Prv={0,2}, t=3, n=6, S={0,2,5}, Rev={1})."""
    from crypto12381_tpu.schemes import mhac_bbs as MH

    vec = _vec("mhac_bbs_flow.json")
    r = create_random_engine("seed")
    setup = MH.iss_setup(4, r)
    pp, keys = setup.pp, setup.keys
    assert pp.g1_g2.hex() == vec["g1g2"]
    assert [x.hex() for x in pp.h] == vec["h"]
    assert keys.sk.hex() == vec["sk"] and keys.pk.hex() == vec["pk"]
    Prv, Pub = [0, 2], [1, 3]
    ai = MH.generate_attributes(pp, 3, 6, Prv, r)
    assert [a.hex() for a in ai.public_attributes] == vec["pub_attrs"]
    assert [
        [s.hex() for s in row] for row in ai.private_attributes_share
    ] == vec["shares"]
    assert [c.hex() for c in ai.commitments] == vec["C"]
    creds = MH.cred_iss(pp, keys.sk, 3, ai.commitments, Pub,
                        ai.public_attributes, r)
    assert creds.A.hex() == vec["cred_A"]
    assert [s.hex() for s in creds.e_share] == vec["e_share"]
    assert [d.hex() for d in creds.D] == vec["D"]
    grp = MH.make_pres_group(creds, [0, 2, 5])
    assert [l.hex() for l in grp.lam] == vec["group_lam"]
    assert grp.D.hex() == vec["group_D"]
    ptype = MH.make_pres_type(pp, [1], Prv, ai.public_attributes)
    assert ptype.C_rev.hex() == vec["C_rev"]
    assert ptype.C_pub.hex() == vec["C_pub"]
    pres = MH.cred_pres(pp, creds, grp, ptype, Prv, ai.public_attributes,
                        ai.private_attributes_share, r)
    assert pres.fixed_part.hex() == vec["pres_fixed"]
    assert [z.hex() for z in pres.z] == vec["pres_z"]
    assert [z.hex() for z in pres.z_hid_pub] == vec["pres_z_hid_pub"]
    ok = MH.verify_pres(pp, keys.pk, ptype, Prv, ai.public_attributes, pres)
    assert ok == vec["verify"] is True
