"""API-level tests mirroring the reference's test.cpp and examples/ps
test flows (same seeds, same draw order)."""

from crypto12381_tpu.api.sets import (G1, G2, Zp, create_random_engine,
                                      hash_, pair, parse, select_in,
                                      serialize)
from crypto12381_tpu.schemes import ps


def test_pair_test():
    """ref test.cpp:6-23."""
    random = create_random_engine("this is a seed")
    g1 = select_in(~G1, random)
    g2 = select_in(~G2, random)
    x, y = select_in(Zp ** 2, random)
    assert pair(g1**x, g2**y) == (pair(g1, g2) ** (x * y))


def test_parse_test():
    """ref test.cpp:25-47."""
    random = create_random_engine("this is a seed")
    x, y, z = select_in(Zp ** 3, random)
    g = select_in(~G1, random)
    data = serialize(x, g**y, g**z)
    x1, Y1, Z1 = parse(Zp, G1, G1, data)
    assert x == x1 and (g**y) == Y1 and (g**z) == Z1


def test_hash_test():
    """ref test.cpp:49-66."""
    random = create_random_engine("this is a seed")
    x, y, z = select_in(Zp ** 3, random)
    c1 = hash_(x, y, z).to(Zp)
    c2 = hash_([x, y, z]).to(Zp)
    assert c1 == c2


def test_ps_single_message():
    """ref examples/ps/test.cpp:19-41 (seed "seed", 48-byte message with
    last byte 23)."""
    random = create_random_engine("seed")
    keys = ps.key_gen(random)
    message = bytes(47) + bytes([23])
    signature = ps.sign(keys.sk, message, random)
    signature = ps.randomnize(signature, random)
    assert ps.verify(keys.pk, message, signature)
    # negative: tampered message fails
    assert not ps.verify(keys.pk, b"x" + message[1:], signature)


def test_ps_multi_message():
    """ref examples/ps/test.cpp:43-65."""
    random = create_random_engine("seed")
    keys = ps.key_gen_n(5, random)
    message = (
        b"what a fuck, that is too short, "
        b"hhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhh"
    )
    signature = ps.sign_n(keys, message, random)
    signature = ps.randomnize(signature, random)
    assert ps.verify_n(keys, message, signature)
    assert not ps.verify_n(keys, message + b"!", signature)


def test_ps_sequential_aggregate():
    """ref examples/ps/test.cpp:67-95."""
    random = create_random_engine("seed")
    a = ps.As.setup(random)
    keys1 = a.key_gen(random)
    keys2 = a.key_gen(random)
    m = ["message1", "m2"]
    sig1 = a.sign(keys1, b"message1", [], [], b"", random)
    sig2 = a.sign(keys2, b"m2", [keys1[1]], m[:1], sig1, random)
    assert a.verify([keys1[1], keys2[1]], m, sig2)
    assert not a.verify([keys2[1], keys1[1]], m, sig2)
