"""Redactable BBS anonymous credentials.

Counterpart of the reference's examples/AC-rbbs: key ladders Y[k]=g^(y^k+1),
redact cache with q-vector hash challenges and cross-term multi-exps,
3-condition pairing verify.  Notes kept bit-compatible:
  * the q challenges hash the disclosed attributes then the index i as the
    reference's raw size_t bytes (8-byte little-endian);
  * Y[n] is never written by the reference's keygen ladder (zero bytes) and
    never used (its valid_i set is empty) — we parse Y entries lazily to
    reproduce that without decoding the zero placeholder.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, hash_, inverse, pair, parse, product_,
                        select_in, serialize)

__all__ = ["Keys", "PublicKey", "keygen", "generate_attributes", "issue",
           "redact", "pres", "verify", "verify_batch"]


@dataclass
class PublicKey:
    fixed_part: bytes   # G1 | G2^2
    Y: list             # [G1 bytes] length 2n (slot n is zero bytes)
    tilde_Y: list       # [G2 bytes] length n


@dataclass
class Keys:
    sk: bytes           # Zp^2 (x, y)
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
    g, tg, tX = parse(G1, G2 ** 2, keys.pk.fixed_part)
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    w = select_in(~Zp, random)
    Yp = [parse(G1, keys.pk.Y[i]) for i in range(n)]
    A = (g * product_([Yp[i] ** a[i] for i in range(n)])) ** inverse(x + w)
    return serialize(A, w)


def _q_challenges(a, I, n):
    """q[i] = hash(a[j] for j in I, i).to(Zp) — i hashed as the reference's
    trivially-copyable size_t (8 bytes little-endian)."""
    base = serialize(*[a[j] for j in I])
    return [
        hash_(base, int(i).to_bytes(8, "little")).to(Zp) for i in range(n)
    ]


def redact(attr: list[bytes], sig: bytes, I, pk: PublicKey):
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    A, w = parse(G1, Zp, sig)
    J = [i for i in range(n) if i not in I]

    Yc = {}

    def Y(k):
        if k not in Yc:
            Yc[k] = parse(G1, pk.Y[k])
        return Yc[k]

    C_I = g * product_([Y(i) ** a[i] for i in I])
    B = C_I * (A ** (-w))
    C_J = product_([Y(j) ** a[j] for j in J])
    q = _q_challenges(a, I, n)

    terms = []
    for k in range(2 * n):
        valid_i = [i for i in I if 0 <= (k - n + i) < n and (k - n + i) in J]
        if valid_i:
            acc = None
            for i in valid_i:
                term = q[i] * a[k - n + i]
                acc = term if acc is None else acc + term
            terms.append(Y(k) ** acc)
    D = product_(terms)

    return serialize(C_I, C_J, B, D)


def pres(m: bytes, sig: bytes, redact_cache: bytes, random) -> bytes:
    A, w = parse(G1, Zp, sig)
    C_I, C_J, B, D = parse(G1 ** 4, redact_cache)
    r = select_in(Zp, random)
    A_ = A**r
    B_ = B**r
    C_J_ = C_J**r
    D_ = D**r
    alpha, beta = select_in(Zp ** 2, random)
    U = (C_I**alpha) * (A_**beta)
    c = hash_(m, A_, B_, C_J_, D_, U).to(Zp)
    s = alpha + r * c
    t = beta + (-w) * c
    return serialize(A_, B_, C_J_, D_, U, s, t)


def verify(m: bytes, attr: list[bytes], I, presinfo: bytes, pk: PublicKey) -> bool:
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    A_, B_, C_J_, D_, U, s, t = parse(G1 ** 5, Zp ** 2, presinfo)
    c = hash_(m, A_, B_, C_J_, D_, U).to(Zp)
    q = _q_challenges(a, I, n)

    Y = {i: parse(G1, pk.Y[i]) for i in I}
    tY = {i: parse(G2, pk.tilde_Y[n - 1 - i]) for i in I}

    cond1 = pair(A_, tX) == pair(C_J_ * B_, tg)
    lhs2 = U * (B_**c)
    rhs2 = ((g * product_([Y[i] ** a[i] for i in I])) ** s) * (A_**t)
    cond2 = lhs2 == rhs2
    acc = product_([tY[i] ** q[i] for i in I])
    cond3 = pair(C_J_, acc) == pair(D_, tg)
    return cond1 and cond2 and cond3


def verify_batch(m: bytes, attr: list[bytes], I, presinfos, pk: PublicKey):
    """Device-batched 3-condition verify of B presentations under one
    (m, attr, I, pk): both pairing conditions run as shared-squaring
    double-ates over the batch, the group equation as batched G1 ladders
    (ref examples/AC-rbbs/src/verify.cpp:6-27 verifies one at a time).
    Returns a (B,) bool array."""
    import numpy as np

    from ..api import batch as BT

    B = len(presinfos)
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    q = _q_challenges(a, I, n)
    Y = {i: parse(G1, pk.Y[i]) for i in I}
    tY = {i: parse(G2, pk.tilde_Y[n - 1 - i]) for i in I}
    CI = g * product_([Y[i] ** a[i] for i in I])      # batch constants
    acc = product_([tY[i] ** q[i] for i in I])

    import hashlib

    from ..api.elements import ZpNumber

    sig_b = [bytes(p) for p in presinfos]
    A_ = BT.G1Vec.parse(b[:49] for b in sig_b)
    B_ = BT.G1Vec.parse(b[49:98] for b in sig_b)
    C_J_ = BT.G1Vec.parse(b[98:147] for b in sig_b)
    D_ = BT.G1Vec.parse(b[147:196] for b in sig_b)
    U = BT.G1Vec.parse(b[196:245] for b in sig_b)
    s = BT.ZpVec.parse(b[245:293] for b in sig_b)
    t = BT.ZpVec.parse(b[293:341] for b in sig_b)
    # c = H(m, A, B, C_J, D, U) over the raw fixed_part slices
    mb = m if isinstance(m, bytes) else bytes(m)
    cs = BT.ZpVec.from_ints([
        ZpNumber.from_hash(hashlib.sha3_512(mb + b[:245]).digest())
        for b in sig_b
    ])

    ok = _verify_device_jit()(
        A_.p, B_.p, C_J_.p, D_.p, U.p, s.std, t.std, cs.std,
        BT.G1Vec.from_elements([CI]).p,
        BT.G2Vec.from_elements([acc]).p,
        BT.G2Vec.from_elements([tX]).p,
        BT.G2Vec.from_elements([tg]).p,
    )
    return np.asarray(ok)


def _verify_device_jit():
    """One jitted graph for verify_batch's device portion (see
    ps._verify_device_jit — eager dispatch is ~500x slower on TPU)."""
    global _VERIFY_DEV
    if _VERIFY_DEV is None:
        import jax

        from ..api import batch as BT

        def f(Ap, Bp, CJp, Dp, Up, s, t, cs, CIp, accp, tXp, tgp):
            B = s.shape[0]
            A_ = BT.G1Vec(Ap, z_is_one=True)
            B_ = BT.G1Vec(Bp, z_is_one=True)
            C_J_ = BT.G1Vec(CJp, z_is_one=True)
            D_ = BT.G1Vec(Dp, z_is_one=True)
            U = BT.G1Vec(Up, z_is_one=True)
            tg1 = BT.G2Vec(tgp, z_is_one=True)
            cond1 = BT.pair_prod_fixed(
                (A_, BT.G2Vec(tXp, z_is_one=True)),
                ((C_J_ * B_).inverse(), tg1),
            ).is_one()
            cond3 = BT.pair_prod_fixed(
                (C_J_, BT.G2Vec(accp, z_is_one=True)),
                (D_.inverse(), tg1),
            ).is_one()
            lhs2 = U * (B_ ** BT.ZpVec(cs))
            rhs2 = (
                BT.G1Vec(CIp).broadcast_to((B,)) ** BT.ZpVec(s)
            ) * (A_ ** BT.ZpVec(t))
            return cond1 & (lhs2 == rhs2) & cond3

        _VERIFY_DEV = jax.jit(f)
    return _VERIFY_DEV


_VERIFY_DEV = None
