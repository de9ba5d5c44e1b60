"""BBS signatures over pre-encoded messages.

Counterpart of the reference's examples/bbs (src/bbs.cpp:5-74): same
algorithms, draw order and byte formats.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, encode_to, inverse, pair, parse,
                        product_, select_in, serialize)

__all__ = ["PublicParameters", "Keys", "setup", "key_gen", "encode_message",
           "sign", "verify"]


@dataclass
class PublicParameters:
    g1_g2: bytes       # G1 | G2
    h: list            # [G1 bytes]


@dataclass
class Keys:
    pk: bytes          # G2  (w)
    sk: bytes          # Zp  (gamma)


def setup(n: int, random) -> PublicParameters:
    g1 = select_in(~G1, random)
    g2 = select_in(~G2, random)
    h = select_in(~G1, random, n)
    return PublicParameters(
        g1_g2=serialize(g1, g2), h=[serialize(hi) for hi in h]
    )


def key_gen(pp: PublicParameters, random) -> Keys:
    gamma = select_in(~Zp, random)
    g1, g2 = parse(G1, G2, pp.g1_g2)
    return Keys(pk=serialize(g2**gamma), sk=serialize(gamma))


def encode_message(message: bytes) -> list[bytes]:
    return [serialize(m) for m in encode_to(Zp, message)]


def sign(pp: PublicParameters, sk: bytes, message: list[bytes], random) -> bytes:
    """A = (g1 * prod h_i^m_i)^(1/(gamma+x)); sigma = (A, x)."""
    g1, g2 = parse(G1, G2, pp.g1_g2)
    h = [parse(G1, b) for b in pp.h]
    gamma = parse(Zp, sk)
    m = [parse(Zp, b) for b in message]
    n = len(m)
    if n > len(h):
        raise ValueError("message is too long")
    x = select_in(Zp, random)
    base = g1 * product_([h[i] ** m[i] for i in range(n)])
    A = base ** inverse(gamma + x)
    return serialize(A, x)


def verify(pp: PublicParameters, pk: bytes, message: list[bytes], signature: bytes) -> bool:
    """e(A, w g2^x) == e(g1 prod h_i^m_i, g2)."""
    g1, g2 = parse(G1, G2, pp.g1_g2)
    h = [parse(G1, b) for b in pp.h]
    w = parse(G2, pk)
    m = [parse(Zp, b) for b in message]
    n = len(m)
    if n > len(h):
        raise ValueError("message is too long")
    A, x = parse(G1, Zp, signature)
    lhs = pair(A, w * (g2**x))
    rhs = pair(g1 * product_([h[i] ** m[i] for i in range(n)]), g2)
    return lhs == rhs
