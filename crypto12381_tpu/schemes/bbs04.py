"""BBS04 short group signatures (Boneh-Boyen-Shacham).

Counterpart of the reference's examples/bbs04 (src/bbs.cpp:5-87): 7-scalar
zero-knowledge proof of knowledge, fused double-ate pairing products,
Fiat-Shamir challenge over 8 elements, and signer tracing via `open`.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, hash_, inverse, pair, parse, select_in,
                        serialize)

__all__ = ["Keys", "key_gen", "sign", "verify", "open_signature"]


@dataclass
class Keys:
    gpk: bytes          # G1 | G2 | G1^3 | G2  (g1, g2, h, u, v, w)
    gmsk: bytes         # Zp^2                 (xi1, xi2)
    gsk: list           # [G1 | Zp]            (A_i, x_i) per member


def key_gen(n: int, random) -> Keys:
    g1, h = select_in((~G1) ** 2, random)
    g2 = select_in(~G2, random)
    xi1, xi2, gamma = select_in((~Zp) ** 3, random)

    u = h ** inverse(xi1)
    v = h ** inverse(xi2)
    w = g2**gamma

    gsk = []
    for _ in range(n):
        xi = select_in(~Zp, random)
        Ai = g1 ** inverse(gamma + xi)
        gsk.append(serialize(Ai, xi))

    return Keys(
        gpk=serialize(g1, g2, h, u, v, w),
        gmsk=serialize(xi1, xi2),
        gsk=gsk,
    )


def sign(gpk: bytes, gsk: bytes, message: bytes, random) -> bytes:
    g1, g2, h, u, v, w = parse(G1, G2, G1 ** 3, G2, gpk)
    A, x = parse(G1, Zp, gsk)

    alpha, beta, ra, rb, rx, rd1, rd2 = select_in(Zp ** 7, random)

    T1 = u**alpha
    T2 = v**beta
    T3 = A * (h ** (alpha + beta))

    R1 = u**ra
    R2 = v**rb
    R3 = pair((T3**rx) * (h ** (-(rd1 + rd2))), g2) * pair(h ** (-(ra + rb)), w)
    R4 = (T1**rx) * (u ** (-rd1))
    R5 = (T2**rx) * (v ** (-rd2))

    c = hash_(message, T1, T2, T3, R1, R2, R3, R4, R5).to(Zp)

    sa = ra + c * alpha
    sb = rb + c * beta
    cx = c * x
    sx = rx + cx
    sd1 = rd1 + alpha * cx
    sd2 = rd2 + beta * cx

    return serialize(T1, T2, T3, c, sa, sb, sx, sd1, sd2)


def verify(gpk: bytes, message: bytes, signature: bytes) -> bool:
    g1, g2, h, u, v, w = parse(G1, G2, G1 ** 3, G2, gpk)
    T1, T2, T3, c, sa, sb, sx, sd1, sd2 = parse(G1 ** 3, Zp ** 6, signature)

    neg_c = -c
    R1 = (u**sa) * (T1**neg_c)
    R2 = (v**sb) * (T2**neg_c)
    R3 = pair((T3**sx) * (h ** (-sd1 + -sd2)) / (g1**c), g2) * pair(
        (h ** (-(sa + sb))) * (T3**c), w
    )
    R4 = (T1**sx) * (u ** (-sd1))
    R5 = (T2**sx) * (v ** (-sd2))

    return c == hash_(message, T1, T2, T3, R1, R2, R3, R4, R5).to(Zp)


def open_signature(gmsk: bytes, signature: bytes) -> bytes:
    """Trace the signer: A = T3 / (T1^xi1 T2^xi2) (src/bbs.cpp:77-86)."""
    T1, T2, T3, c, sa, sb, sx, sd1, sd2 = parse(G1 ** 3, Zp ** 6, signature)
    xi1, xi2 = parse(Zp ** 2, gmsk)
    a = T3 / ((T1**xi1) * (T2**xi2))
    return serialize(a)
