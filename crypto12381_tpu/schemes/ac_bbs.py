"""Anonymous credentials with selective disclosure over BBS.

Counterpart of the reference's examples/AC-bbs (keygen/issue/pres/verify):
commitments C_I/C_J over disclosed/hidden attribute index sets, blinded
opening proof, 2-condition pairing verify.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, hash_, inverse, pair, parse, product_,
                        select_in, serialize)

__all__ = ["Keys", "PublicKey", "PresInfo", "keygen", "generate_attributes",
           "issue", "pres", "verify", "verify_batch"]


@dataclass
class PublicKey:
    fixed_part: bytes   # G1 | G2^2  (g, tilde_g, tilde_X)
    Y: list             # [G1 bytes]


@dataclass
class Keys:
    sk: bytes           # Zp (x)
    pk: PublicKey


@dataclass
class PresInfo:
    fixed_part: bytes   # G1^3 | Zp^2  (A_, B_, U, s, t)
    u: list             # [Zp bytes]


def keygen(n: int, random) -> Keys:
    g = select_in(~G1, random)
    tg = select_in(~G2, random)
    x = select_in(Zp, random)
    tX = tg**x
    Y = select_in(~G1, random, n)
    return Keys(
        sk=serialize(x),
        pk=PublicKey(fixed_part=serialize(g, tg, tX), Y=[serialize(y) for y in Y]),
    )


def generate_attributes(pk: PublicKey, n: int, random) -> list[bytes]:
    return [serialize(a) for a in select_in(Zp, random, n)]


def issue(keys: Keys, attr: list[bytes], random) -> bytes:
    x = parse(Zp, keys.sk)
    g, tg, tX = parse(G1, G2 ** 2, keys.pk.fixed_part)
    Y = [parse(G1, b) for b in keys.pk.Y]
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    w = select_in(~Zp, random)
    A = (g * product_([Y[i] ** a[i] for i in range(n)])) ** inverse(x + w)
    return serialize(A, w)


def pres(m: bytes, attr: list[bytes], sig: bytes, I, pk: PublicKey, random) -> PresInfo:
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    Y = [parse(G1, b) for b in pk.Y]
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    A, w = parse(G1, Zp, sig)
    J = [i for i in range(n) if i not in I]

    C_I = g * product_([Y[i] ** a[i] for i in I])
    C_J = product_([Y[j] ** a[j] for j in J])

    r = select_in(Zp, random)
    A_ = A**r
    B_ = ((C_I * C_J) ** r) * (A_ ** (-w))

    alpha, beta = select_in(Zp ** 2, random)
    delta = select_in(Zp, random, len(J))

    U = (C_I**alpha) * (A_**beta) * product_(
        [Y[J[j]] ** delta[j] for j in range(len(J))]
    )

    c = hash_(m, A_, B_, U).to(Zp)

    s = alpha + r * c
    t = beta + (-w) * c
    u = [delta[j] + r * c * a[J[j]] for j in range(len(J))]

    return PresInfo(
        fixed_part=serialize(A_, B_, U, s, t), u=[serialize(x) for x in u]
    )


def verify(m: bytes, attr: list[bytes], I, presinfo: PresInfo, pk: PublicKey) -> bool:
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    Y = [parse(G1, b) for b in pk.Y]
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    A_, B_, U, s, t = parse(G1 ** 3, Zp ** 2, presinfo.fixed_part)
    u = [parse(Zp, b) for b in presinfo.u]
    J = [i for i in range(n) if i not in I]

    c = hash_(m, A_, B_, U).to(Zp)

    cond1 = pair(A_, tX) == pair(B_, tg)
    lhs = U * (B_**c)
    rhs = ((g * product_([Y[i] ** a[i] for i in I])) ** s) * (A_**t) * product_(
        [Y[J[j]] ** u[j] for j in range(len(J))]
    )
    return cond1 and lhs == rhs


def verify_batch(m: bytes, attr: list[bytes], I, presinfos, pk: PublicKey):
    """Device-batched verify of B presentations under one (m, attr, I, pk):
    the pairing condition runs as a shared-squaring double-ate over the
    whole batch, the group-equation as batched G1 ladders (the reference
    verifies each presentation separately, examples/AC-bbs/src/verify.cpp).
    Only the Fiat-Shamir hash stays on host.  Returns a (B,) bool array."""
    import numpy as np

    from ..api import batch as BT

    B = len(presinfos)
    g, tg, tX = parse(G1, G2 ** 2, pk.fixed_part)
    Y = [parse(G1, b) for b in pk.Y]
    a = [parse(Zp, b) for b in attr]
    n = len(a)
    J = [i for i in range(n) if i not in I]
    CI = g * product_([Y[i] ** a[i] for i in I])   # batch-constant

    import hashlib

    from ..api.elements import ZpNumber

    sig_b = [bytes(p.fixed_part) for p in presinfos]
    A_ = BT.G1Vec.parse(b[:49] for b in sig_b)
    B_ = BT.G1Vec.parse(b[49:98] for b in sig_b)
    U = BT.G1Vec.parse(b[98:147] for b in sig_b)
    s = BT.ZpVec.parse(b[147:195] for b in sig_b)
    t = BT.ZpVec.parse(b[195:243] for b in sig_b)
    us = [[parse(Zp, b) for b in p.u] for p in presinfos]
    # c = H(m, A, B, U): the serialized forms ARE the fixed_part slices
    mb = m if isinstance(m, bytes) else bytes(m)
    cs = BT.ZpVec.from_ints([
        ZpNumber.from_hash(hashlib.sha3_512(mb + b[:147]).digest())
        for b in sig_b
    ])

    import jax.numpy as jnp

    if J:
        umat = jnp.stack(
            [BT.ZpVec.from_ints([u[j] for u in us]).std for j in range(len(J))],
            0,
        )
        yj = BT.G1Vec.from_elements([Y[j] for j in J]).p
    else:
        umat = jnp.zeros((0, B, 18), jnp.int32)
        yj = BT.G1Vec.identity((0,)).p
    ok = _verify_device_jit()(
        A_.p, B_.p, U.p, s.std, t.std, cs.std, umat,
        BT.G1Vec.from_elements([CI]).p, yj,
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

        def f(Ap, Bp, Up, s, t, cs, umat, CIp, yj, tXp, tgp):
            B = s.shape[0]
            A_ = BT.G1Vec(Ap, z_is_one=True)
            B_ = BT.G1Vec(Bp, z_is_one=True)
            U = BT.G1Vec(Up, z_is_one=True)

            def b2(v):
                return BT.G2Vec(v).broadcast_to((B,))

            cond1 = BT.pair_prod_fixed(
                (A_, BT.G2Vec(tXp, z_is_one=True)),
                (B_.inverse(), BT.G2Vec(tgp, z_is_one=True)),
            ).is_one()
            lhs = U * (B_ ** BT.ZpVec(cs))
            rhs = BT.G1Vec(CIp).broadcast_to((B,)) ** BT.ZpVec(s)
            rhs = rhs * (A_ ** BT.ZpVec(t))
            for j in range(umat.shape[0]):
                yv = BT.G1Vec(tuple(c[j : j + 1] for c in yj))
                rhs = rhs * (yv.broadcast_to((B,)) ** BT.ZpVec(umat[j]))
            return cond1 & (lhs == rhs)

        _VERIFY_DEV = jax.jit(f)
    return _VERIFY_DEV


_VERIFY_DEV = None
