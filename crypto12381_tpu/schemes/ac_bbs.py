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

    parsed = [parse(G1 ** 3, Zp ** 2, p.fixed_part) for p in presinfos]
    A_ = BT.G1Vec.from_elements(p[0] for p in parsed)
    B_ = BT.G1Vec.from_elements(p[1] for p in parsed)
    U = BT.G1Vec.from_elements(p[2] for p in parsed)
    s = BT.ZpVec.from_ints([p[3] for p in parsed])
    t = BT.ZpVec.from_ints([p[4] for p in parsed])
    us = [[parse(Zp, b) for b in p.u] for p in presinfos]
    cs = BT.ZpVec.from_ints(
        [hash_(m, p[0], p[1], p[2]).to(Zp) for p in parsed]
    )

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
            A_, B_, U = BT.G1Vec(Ap), BT.G1Vec(Bp), BT.G1Vec(Up)

            def b2(v):
                return BT.G2Vec(v).broadcast_to((B,))

            cond1 = BT.pair_prod(
                (A_, b2(tXp)), (B_.inverse(), b2(tgp))
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
