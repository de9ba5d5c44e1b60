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

__all__ = ["Keys", "PublicKey", "keygen", "generate_attributes", "issue", "verify_batch",
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


def verify_batch(m: bytes, attr: list[bytes], I, presinfos, pk: PublicKey):
    """Device-batched verify of B redactable-PS presentations under one
    (m, attr, I, pk): the GT condition runs as batched pairings with a
    batched GS GT-power by the challenges, the q-condition as a
    shared-squaring double-ate (ref examples/AC-rps/src/verify.cpp:15-26
    verifies one at a time).  Returns a (B,) bool array."""
    import numpy as np

    from ..api import batch as BT

    B = len(presinfos)
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    tY = [parse(G2, b) for b in pk.tilde_Y]
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    base = serialize(*[a[j] for j in I])
    q = [hash_(base, int(i).to_bytes(8, "little")).to(Zp) for i in range(n)]
    Y = {i: parse(G1, pk.Y[n - 1 - i]) for i in I}
    prod_tY = None
    for i in I:
        if i == 0:
            continue
        term = tY[i] ** a[i]
        prod_tY = term if prod_tY is None else prod_tY * term
    tX_const = tX if prod_tY is None else tX * prod_tY
    CYq = product_([Y[i] ** q[i] for i in I])

    import hashlib

    from ..api.elements import ZpNumber

    sig_b = [bytes(p) for p in presinfos]
    A_ = BT.G1Vec.parse(b[:49] for b in sig_b)
    B_ = BT.G1Vec.parse(b[49:98] for b in sig_b)
    D_ = BT.G1Vec.parse(b[98:147] for b in sig_b)
    tCJ_ = BT.G2Vec.parse(b[147:244] for b in sig_b)
    U = BT.GTVec.parse(b[244:820] for b in sig_b)
    s = BT.ZpVec.parse(b[820:868] for b in sig_b)
    # c = H(m, A, B, tCJ, D, U) over the raw presentation slices
    mb = m if isinstance(m, bytes) else bytes(m)
    cs = BT.ZpVec.from_ints([
        ZpNumber.from_hash(hashlib.sha3_512(
            mb + b[:98] + b[147:244] + b[98:147] + b[244:820]
        ).digest())
        for b in sig_b
    ])

    ok = _verify_device_jit()(
        A_.p, B_.p, D_.p, tCJ_.p, U.f, s.std, cs.std,
        BT.G1Vec.from_elements([CYq]).p,
        BT.G2Vec.from_elements([tg]).p,
        BT.G2Vec.from_elements([tY[0]]).p,
        BT.G2Vec.from_elements([tX_const]).p,
    )
    return np.asarray(ok)


def _verify_device_jit():
    """One jitted graph for verify_batch's device portion (see
    ps._verify_device_jit — eager dispatch is ~500x slower on TPU)."""
    global _VERIFY_DEV
    if _VERIFY_DEV is None:
        import jax

        from ..api import batch as BT

        def f(Ap, Bp, Dp, tCJp, Uf, s, cs, CYqp, tgp, tY0p, tXcp):
            B = s.shape[0]
            A_ = BT.G1Vec(Ap, z_is_one=True)
            B_ = BT.G1Vec(Bp, z_is_one=True)
            D_ = BT.G1Vec(Dp, z_is_one=True)
            tCJ_ = BT.G2Vec(tCJp, z_is_one=True)
            U = BT.GTVec(Uf)

            def b2(v):
                return BT.G2Vec(v).broadcast_to((B,))

            tgv = b2(tgp)
            rhs_g2 = b2(tXcp) * tCJ_
            P1 = BT.pair_vec(A_, b2(tY0p) ** BT.ZpVec(s))
            P2 = BT.pair_prod((A_.inverse(), rhs_g2), (B_, tgv))
            t1 = (
                P1 * U.inverse() * (P2 ** BT.ZpVec(cs)).inverse_unitary()
            ).is_one()
            CYqv = BT.G1Vec(CYqp).broadcast_to((B,))
            t2 = BT.pair_prod((CYqv, tCJ_), (D_.inverse(), tgv)).is_one()
            return t1 & t2

        _VERIFY_DEV = jax.jit(f)
    return _VERIFY_DEV


_VERIFY_DEV = None
