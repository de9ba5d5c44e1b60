"""Redactable PS anonymous credentials.

Counterpart of the reference's examples/AC-rps: recursive y^n key ladders,
GT element in presentations (U = e(A, tY0^k)), pairing-heavy verify with a
GT exponentiation.

Faithful port note: the reference's own example derives the q-challenges
differently in `pres` (hash of the transcript A_, B_, tCJ_) and in `verify`
(hash of the disclosed attributes), and `U` uses the *unrandomized* A —
its verify equations do not hold for its own presentations.  We reproduce
the reference's algorithms verbatim (capability parity), so verify returns
the same outcome the reference executable produces.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, GT, Zp, hash_, inverse, pair, parse,
                        product_, select_in, serialize)

__all__ = ["Keys", "PublicKey", "keygen", "generate_attributes", "issue",
           "redact", "pres", "verify"]


@dataclass
class PublicKey:
    fixed_part: bytes
    Y: list
    tilde_Y: list


@dataclass
class Keys:
    sk: bytes
    pk: PublicKey


def keygen(n: int, random) -> Keys:
    g = select_in(~G1, random)
    tg = select_in(~G2, random)
    x, y = select_in(Zp ** 2, random)
    tX = tg**x
    Y = [bytes(49)] * (2 * n)
    tY = [b""] * n
    yn = y
    for i in range(2 * n):
        if i < n:
            tY[i] = serialize(tg**yn)
        if i != n:
            Y[i] = serialize(g**yn)
        yn = yn * y
    return Keys(
        sk=serialize(x, y),
        pk=PublicKey(fixed_part=serialize(g, tg, tX), Y=Y, tilde_Y=tY),
    )


def generate_attributes(pk: PublicKey, n: int, random) -> list[bytes]:
    return [serialize(a) for a in select_in(Zp, random, n)]


def issue(keys: Keys, attr: list[bytes], random) -> bytes:
    x, y = parse(Zp ** 2, keys.sk)
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    s1 = select_in(~G1, random)
    # ym = sum a[i] * y^(i+1)
    ym = None
    yn = y
    for i in range(n):
        term = a[i] * yn
        ym = term if ym is None else ym + term
        yn = yn * y
    s2 = s1 ** inverse(x + ym)
    return serialize(s1, s2)


def redact(attr: list[bytes], sig: bytes, I, pk: PublicKey) -> bytes:
    tY = [parse(G2, b) for b in pk.tilde_Y]
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    J = [i for i in range(n) if i not in I]
    terms = [tY[j] ** a[j] for j in J if j != 0]
    tCJ = product_(terms)
    return serialize(tCJ)


def pres(m: bytes, attr: list[bytes], sig: bytes, I, redact_cache: bytes,
         pk: PublicKey, random) -> bytes:
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    A, B = parse(G1 ** 2, sig)
    J = [i for i in range(n) if i not in I]
    tCJ = parse(G2, redact_cache)
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    tY = [parse(G2, b) for b in pk.tilde_Y]

    k, r, t = select_in(Zp ** 3, random)

    A_ = A**r
    B_ = (B**r) * (A_**t)
    tCJ_ = (tg**t) * tCJ

    q = [
        hash_(A_, B_, tCJ_, int(i).to_bytes(8, "little")).to(Zp)
        for i in range(n)
    ]

    Yc = {}

    def Y(kk):
        if kk not in Yc:
            Yc[kk] = parse(G1, pk.Y[kk])
        return Yc[kk]

    terms = []
    for kk in range(2 * n):
        valid_i = [i for i in I if 0 <= (kk - n + i) < n and (kk - n + i) in J]
        has_t = 0 <= (n - 1 - kk) < n and (n - 1 - kk) in I
        if not valid_i and not has_t:
            continue
        acc = t if has_t else None
        for i in valid_i:
            term = q[i] * a[kk - n + i]
            acc = term if acc is None else acc + term
        terms.append(Y(kk) ** acc)
    D_ = product_(terms)

    U = pair(A, tY[0] ** k)
    c = hash_(m, A_, B_, tCJ_, D_, U).to(Zp)
    s = k + a[0] * c

    return serialize(A_, B_, D_, tCJ_, U, s)


def verify(m: bytes, attr: list[bytes], I, presinfo: bytes, pk: PublicKey) -> bool:
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    tY = [parse(G2, b) for b in pk.tilde_Y]
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    A_, B_, D_, tCJ_, U, s = parse(G1 ** 3, G2, GT, Zp, presinfo)

    c = hash_(m, A_, B_, tCJ_, D_, U).to(Zp)
    base = serialize(*[a[j] for j in I])
    q = [hash_(base, int(i).to_bytes(8, "little")).to(Zp) for i in range(n)]

    Y = {i: parse(G1, pk.Y[n - 1 - i]) for i in I}

    prod_tY = None
    for i in I:
        if i == 0:
            continue
        term = tY[i] ** a[i]
        prod_tY = term if prod_tY is None else prod_tY * term
    rhs_g2 = tX * tCJ_ if prod_tY is None else tX * tCJ_ * prod_tY

    t1 = pair(A_, tY[0] ** s) * inverse(U) == (
        pair(inverse(A_), rhs_g2) * pair(B_, tg)
    ) ** c
    t2 = pair(product_([Y[i] ** q[i] for i in I]), tCJ_) == pair(D_, tg)
    return t1 and t2
