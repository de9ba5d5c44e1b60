"""Byte-exact scheme-flow tests against golden vectors dumped from the
reference build (tools/oracle/dump_*_flow.cpp, reference flows in
/root/reference/examples/*/test.cpp — same seeds, same draw order).

These catch systematic draw-order/serialization slips that scheme-internal
sign/verify round-trips cannot (VERDICT r1, missing #3)."""

import json
import pathlib

import pytest

from crypto12381_tpu.api.sets import Zp, create_random_engine, select_in, serialize
from crypto12381_tpu.schemes import bbs, bbs_plus, sss

VEC_DIR = pathlib.Path(__file__).parent / "vectors"


def _vec(name):
    return json.loads((VEC_DIR / name).read_text())


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
