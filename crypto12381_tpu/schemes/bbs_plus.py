"""BBS+ signatures (blinded BBS).

Counterpart of the reference's examples/bbs-plus (src/bbs+.cpp:5-73).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, encode_to, inverse, pair, parse,
                        product_, select_in, serialize)

__all__ = ["PublicParameters", "Keys", "setup", "key_gen", "sign", "verify"]


@dataclass
class PublicParameters:
    g1_g2_h0: bytes    # G1 | G2 | G1
    h: list            # [G1 bytes]


@dataclass
class Keys:
    pk: bytes
    sk: bytes


def setup(n: int, random) -> PublicParameters:
    g1 = select_in(~G1, random)
    g2 = select_in(~G2, random)
    h0 = select_in(~G1, random)
    h = [serialize(select_in(~G1, random)) for _ in range(n)]
    return PublicParameters(g1_g2_h0=serialize(g1, g2, h0), h=h)


def key_gen(pp: PublicParameters, random) -> Keys:
    gamma = select_in(~Zp, random)
    g1, g2, h0 = parse(G1, G2, G1, pp.g1_g2_h0)
    return Keys(pk=serialize(g2**gamma), sk=serialize(gamma))


def sign(pp: PublicParameters, sk: bytes, message: bytes, random) -> bytes:
    """A = (g1 h0^r prod h_i^m_i)^(1/(gamma+x)); sigma = (A, x, r)."""
    g1, g2, h0 = parse(G1, G2, G1, pp.g1_g2_h0)
    h = [parse(G1, b) for b in pp.h]
    gamma = parse(Zp, sk)
    m = encode_to(Zp, message)
    n = len(m)
    if n > len(h):
        raise ValueError("message is too long")
    x, r = select_in(Zp ** 2, random)
    base = g1 * (h0**r) * product_([h[i] ** m[i] for i in range(n)])
    A = base ** inverse(gamma + x)
    return serialize(A, x, r)


def verify(pp: PublicParameters, pk: bytes, message: bytes, signature: bytes) -> bool:
    g1, g2, h0 = parse(G1, G2, G1, pp.g1_g2_h0)
    h = [parse(G1, b) for b in pp.h]
    w = parse(G2, pk)
    m = encode_to(Zp, message)
    n = len(m)
    if n > len(h):
        raise ValueError("message is too long")
    A, x, r = parse(G1, Zp, Zp, signature)
    lhs = pair(A, w * (g2**x))
    rhs = pair(g1 * (h0**r) * product_([h[i] ** m[i] for i in range(n)]), g2)
    return lhs == rhs
