"""BBS+ signatures (blinded BBS).

Counterpart of the reference's examples/bbs-plus (src/bbs+.cpp:5-73).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, encode_to, inverse, pair, parse,
                        product_, select_in, serialize)

__all__ = ["PublicParameters", "Keys", "setup", "key_gen", "sign",
           "sign_batch", "verify", "verify_batch"]


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


def sign_batch(pp: PublicParameters, sk: bytes, messages, random) -> list:
    """B signatures in ONE device graph — byte-identical to sign() called
    B times with the same CSPRNG stream.  Per message the (x, r) draws
    happen on host in reference order; the blinded base products
    g1 h0^r Π h_i^m_i and the A = base^(1/(gamma+x)) ladders batch on
    device (ref src/bbs+.cpp:33-55).  messages: B raw byte strings."""
    import jax as _jax
    import jax.numpy as jnp

    from ..api import batch as BT
    from ..fields import active as FPA

    g1e, g2e, h0e = parse(G1, G2, G1, pp.g1_g2_h0)
    he = [parse(G1, b) for b in pp.h]
    gamma = parse(Zp, sk)
    B = len(messages)
    enc = [encode_to(Zp, m) for m in messages]
    n = max((len(e) for e in enc), default=0)
    if n > len(he):
        raise ValueError("message is too long")
    xs, rs, einv = [], [], []
    for _ in range(B):
        x, r = select_in(Zp ** 2, random)
        xs.append(x)
        rs.append(r)
        einv.append(inverse(gamma + x))
    if n:
        mm = jnp.stack(
            [
                BT.ZpVec.from_ints(
                    [e[i].value if i < len(e) else 0 for e in enc]
                ).std
                for i in range(n)
            ],
            0,
        )
        hp = BT.G1Vec.from_elements(he[:n]).p
    else:
        mm = jnp.zeros((0, B, 18), jnp.int32)
        hp = BT.G1Vec.identity((0,)).p
    rv = BT.ZpVec.from_ints(rs)
    ev = BT.ZpVec.from_ints(einv)
    if FPA.ENGINE == "fp32":
        xs_inf = _sign_device_jit()(
            mm, BT.G1Vec.from_elements([g1e]).p,
            BT.G1Vec.from_elements([h0e]).p, hp, rv.std, ev.std,
        )
        ab = BT.G1Vec.pack_bytes(*_jax.device_get(xs_inf))
    else:
        # engine-generic fallback: pack_bytes assumes fp32 8-bit digits
        base = BT.G1Vec.from_elements([g1e] * B) * (
            BT.G1Vec.from_elements([h0e] * B) ** rv
        )
        for i in range(n):
            hi = BT.G1Vec.from_elements([he[i]] * B)
            base = base * (hi ** BT.ZpVec(mm[i]))
        ab = (base ** ev).serialize()
    xb = BT.ZpVec.from_ints(xs).serialize()
    rb = rv.serialize()
    return [ab[i] + xb[i] + rb[i] for i in range(B)]


def _sign_device_jit():
    global _SIGN_DEV
    if _SIGN_DEV is None:
        import jax

        from ..api import batch as BT

        def f(mm, g1p, h0p, hp, rs, einv):
            B = einv.shape[0]
            h0 = BT.G1Vec(h0p, z_is_one=True).broadcast_to((B,))
            base = BT.G1Vec(g1p, z_is_one=True).broadcast_to((B,)) \
                * (h0 ** BT.ZpVec(rs))
            for i in range(mm.shape[0]):
                hi = BT.G1Vec(tuple(c[i : i + 1] for c in hp),
                              z_is_one=True)
                base = base * (hi.broadcast_to((B,)) ** BT.ZpVec(mm[i]))
            # serialize_device fused in (see bbs._sign_device_jit)
            return (base ** BT.ZpVec(einv)).serialize_device()

        _SIGN_DEV = jax.jit(f)
    return _SIGN_DEV


_SIGN_DEV = None


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


def verify_batch(pp: PublicParameters, pk: bytes, messages, signatures):
    """Device-batched verify of B signatures under one (pp, pk).

    Same shape as bbs.verify_batch with the extra h0^r blinding column:
    e(Aᵢ, w·g2^xᵢ) == e(g1·h0^rᵢ·Π h_j^m_{ij}, g2) for the whole batch as
    two batched Miller loops sharing one final exponentiation
    (ref src/bbs+.cpp:57-73 evaluates each side per signature).
    Returns a (B,) bool array.
    """
    import numpy as np

    from ..api import batch as BT

    B = len(messages)
    assert len(signatures) == B
    g1e, g2e, h0e = parse(G1, G2, G1, pp.g1_g2_h0)
    he = [parse(G1, b) for b in pp.h]
    we = parse(G2, pk)
    enc = [encode_to(Zp, m) for m in messages]
    n = max((len(e) for e in enc), default=0)
    if n > len(he):
        raise ValueError("message is too long")

    import jax.numpy as jnp

    sig_b = [bytes(s) for s in signatures]
    A = BT.G1Vec.parse(s[:49] for s in sig_b)
    xs = BT.ZpVec.parse(s[49:97] for s in sig_b)
    rs = BT.ZpVec.parse(s[97:145] for s in sig_b)
    if n:
        mm = jnp.stack(
            [
                BT.ZpVec.from_ints(
                    [e[i].value if i < len(e) else 0 for e in enc]
                ).std
                for i in range(n)
            ],
            0,
        )
        hp = BT.G1Vec.from_elements(he[:n]).p
    else:
        mm = jnp.zeros((0, B, 18), jnp.int32)
        hp = BT.G1Vec.identity((0,)).p
    ok = _verify_device_jit()(
        A.p, xs.std, rs.std, mm,
        BT.G1Vec.from_elements([g1e]).p,
        BT.G1Vec.from_elements([h0e]).p,
        BT.G2Vec.from_elements([g2e]).p,
        BT.G2Vec.from_elements([we]).p,
        hp,
    )
    return np.asarray(ok)


def _verify_device_jit():
    """Single jitted graph for the device portion (see ps._verify_device_jit
    — eager dispatch through the tunnel is ~500x slower)."""
    global _VERIFY_DEV
    if _VERIFY_DEV is None:
        import jax

        from ..api import batch as BT

        def f(Ap, xs, rs, mm, g1p, h0p, g2p, wp, hp):
            # same fixed-G2 re-association as bbs._verify_device_jit
            B = xs.shape[0]
            h0 = BT.G1Vec(h0p, z_is_one=True).broadcast_to((B,))
            base = BT.G1Vec(g1p, z_is_one=True).broadcast_to((B,)) \
                * (h0 ** BT.ZpVec(rs))
            for i in range(mm.shape[0]):
                hi = BT.G1Vec(tuple(c[i : i + 1] for c in hp),
                              z_is_one=True)
                base = base * (hi.broadcast_to((B,)) ** BT.ZpVec(mm[i]))
            A = BT.G1Vec(Ap, z_is_one=True)
            t = (A ** BT.ZpVec(xs)) * base.inverse()
            return BT.pair_prod_fixed(
                (A, BT.G2Vec(wp, z_is_one=True)),
                (t, BT.G2Vec(g2p, z_is_one=True)),
            ).is_one()

        _VERIFY_DEV = jax.jit(f)
    return _VERIFY_DEV


_VERIFY_DEV = None
