"""Pointcheval-Sanders signatures (single, multi-message, sequential
aggregate).

Capability counterpart of the reference's examples/ps
(src/ps.cpp:6-147, include/ps.hpp): identical algorithms, RNG draw order and
byte formats, so seeded flows are bit-compatible.  All key/signature
material is plain `bytes` in the reference's serialized layouts.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..api.sets import (G1, G2, Zp, encode_to, hash_, pair, parse, product_,
                        select_in, serialize, sum_)
from ..api.algebra import algebraic, symbols, transform
from ..api.elements import G1Pow, ZpNumber

__all__ = [
    "Keys", "KeysN", "As",
    "key_gen", "key_gen_n", "sign", "sign_batch", "sign_n", "verify", "verify_n",
    "verify_batch",
    "verify_n_batch", "randomnize",
]


@dataclass
class Keys:
    sk: bytes  # Zp^2
    pk: bytes  # G2^3


def key_gen(random) -> Keys:
    """ref src/ps.cpp:6-15."""
    g2 = select_in(~G2, random)
    x, y = select_in(~Zp ** 2, random)
    return Keys(sk=serialize(x, y), pk=serialize(g2, g2**x, g2**y))


def sign(sk: bytes, message: bytes, random) -> bytes:
    """ref src/ps.cpp:17-24: sigma = (h, h^(x + y m)), m = H(message)."""
    x, y = parse(Zp ** 2, sk)
    m = hash_(message).to(Zp)
    h = select_in(~G1, random)
    return serialize(h, h ** (x + y * m))


def sign_batch(sk: bytes, messages, random) -> list:
    """B signatures in ONE device graph — byte-identical to sign() called
    B times with the same CSPRNG stream (the per-message draw order is
    preserved on host; only the exponentiations move to the device).

    s1 = g^u, s2 = g^(u (x + y m)): both are fixed-base powers of the
    generator, so the whole batch is one (2B,)-row GLV ladder plus one
    vectorized batch serialization (ref src/ps.cpp:17-24).
    """
    from ..api import batch as BT

    x, y = parse(Zp ** 2, sk)
    e1, e2 = [], []
    for m in messages:
        mm = hash_(_as_bytes(m)).to(Zp)
        h = select_in(~G1, random)          # lazy gen^u: one draw, as sign()
        u = h.exp
        e1.append(u)
        e2.append((x + y * mm) * u)
    import jax

    from ..fields import active as FPA

    B = len(messages)
    exps = BT.ZpVec.from_ints(e1 + e2)
    if FPA.ENGINE == "fp32":
        xs, inf = _sign_device_jit()(exps.std)
        blobs = BT.G1Vec.pack_bytes(*jax.device_get((xs, inf)))
    else:
        # pack_bytes assumes the fp32 engine's 48x8-bit digit layout;
        # other engines (int16 differential-test engine) go through the
        # engine-generic codec path.
        blobs = (BT.G1Vec.generator((2 * B,)) ** exps).serialize()
    return [blobs[i] + blobs[B + i] for i in range(B)]


def _sign_device_jit():
    """One jitted graph for sign_batch's device portion (fixed-base GLV
    ladder + affine + from_mont): eager dispatch costs ~0.5-1 s per op on
    the tunneled backend — jitting took the measured rate from 8.9
    signs/s to device-bound (same fix as _verify_device_jit)."""
    global _SIGN_DEV
    if _SIGN_DEV is None:
        import jax

        from ..api import batch as BT

        def f(exps_std):
            pts = BT.G1Vec.generator(
                (exps_std.shape[0],)
            ) ** BT.ZpVec(exps_std)
            return pts.serialize_device()

        _SIGN_DEV = jax.jit(f)
    return _SIGN_DEV


_SIGN_DEV = None


def verify(pk: bytes, message: bytes, signature: bytes) -> bool:
    """ref src/ps.cpp:26-33: e(s1, X2 Y2^m) == e(s2, g2)."""
    g2, X2, Y2 = parse(G2 ** 3, pk)
    m = hash_(message).to(Zp)
    s1, s2 = parse(G1 ** 2, signature)
    return pair(s1, X2 * (Y2**m)) == pair(s2, g2)


def randomnize(signature: bytes, random) -> bytes:
    """ref src/ps.cpp:35-40."""
    s1, s2 = parse(G1 ** 2, signature)
    r = select_in(~Zp, random)
    return serialize(s1**r, s2**r)


def verify_batch(pk: bytes, messages, signatures, mesh=None):
    """Device-batched verify of B signatures under one public key.

    The pairing equation is re-associated by bilinearity so every G2
    operand is FIXED:  e(s1, X2 Y2^m) == e(s2, g2)  becomes
    e(s1, X2) e(s1^m, Y2) e(s2^-1, g2) == 1 — three pairings against
    fixed public-key points sharing ONE Miller squaring chain with
    precomputed line coefficients (no per-element G2 arithmetic at all;
    the scalar moves to a cheaper G1 GLV ladder).  Host edges are
    vectorized: signature bytes cross as (B, 49) arrays and y-coordinate
    decompression is one batched device sqrt chain (api/batch.G1Vec.parse).
    The reference materializes each side separately per signature
    (src/ps.cpp:26-33).  With `mesh` the batch shards across the mesh
    (parallel.sharding.sharded_ps_verify).  Returns a (B,) bool array.
    """
    import numpy as np

    from ..api import batch as BT

    B = len(messages)
    assert len(signatures) == B
    g2e, X2e, Y2e = parse(G2 ** 3, pk)
    ms = BT.ZpVec.from_ints([hash_(_as_bytes(m)).to(Zp) for m in messages])
    s1 = BT.G1Vec.parse(bytes(s)[:49] for s in signatures)
    s2 = BT.G1Vec.parse(bytes(s)[49:98] for s in signatures)
    if mesh is not None:
        from ..parallel import sharding as SH

        return SH.sharded_ps_verify(mesh, s1, s2, g2e, X2e, Y2e, ms.std)
    X2 = BT.G2Vec.from_elements([X2e])
    Y2 = BT.G2Vec.from_elements([Y2e])
    g2 = BT.G2Vec.from_elements([g2e])
    ok = _verify_device_jit()(s1.p, s2.p, X2.p, Y2.p, g2.p, ms.std)
    return np.asarray(ok)


def _verify_device_jit():
    """One jitted graph for verify_batch's device portion: without it,
    every tower op dispatches eagerly through the device tunnel (measured
    ~0.7 s PER SIGNATURE on the tunneled v5e vs ~2 ms inside one jit)."""
    global _VERIFY_DEV
    if _VERIFY_DEV is None:
        import jax

        from ..api import batch as BT

        def f(s1p, s2p, X2p, Y2p, g2p, ms):
            s1 = BT.G1Vec(s1p, z_is_one=True)
            s2 = BT.G1Vec(s2p, z_is_one=True)
            s1m = s1 ** BT.ZpVec(ms)
            return BT.pair_prod_fixed(
                (s1, BT.G2Vec(X2p, z_is_one=True)),
                (s1m, BT.G2Vec(Y2p, z_is_one=True)),
                (s2.inverse(), BT.G2Vec(g2p, z_is_one=True)),
            ).is_one()

        _VERIFY_DEV = jax.jit(f)
    return _VERIFY_DEV


_VERIFY_DEV = None


# ------------------------------------------------------------- multi-message


@dataclass
class KeysN:
    x: bytes          # Zp
    y: list           # [Zp bytes]
    g2: bytes         # G2
    X2: bytes         # G2
    Y2: list          # [G2 bytes]


def key_gen_n(n: int, random) -> KeysN:
    """ref src/ps.cpp:42-66 (same draw order: g2, x, then y_i each)."""
    g2 = select_in(~G2, random)
    x = select_in(~Zp, random)
    X2 = g2**x
    ys, Y2s = [], []
    for _ in range(n):
        y = select_in(~Zp, random)
        ys.append(serialize(y))
        Y2s.append(serialize(g2**y))
    return KeysN(x=serialize(x), y=ys, g2=serialize(g2), X2=serialize(X2), Y2=Y2s)


def sign_n(sk: KeysN, message: bytes, random) -> bytes:
    """ref src/ps.cpp:68-82: h^(x + sum y_i m_i) with encode_to units."""
    m = encode_to(Zp, message)
    n = len(m)
    if n > len(sk.y):
        raise ValueError("message is too long")
    x = parse(Zp, sk.x)
    y = [parse(Zp, b) for b in sk.y]
    h = select_in(~G1, random)
    expo = x + sum_(y[i] * m[i] for i in range(n))
    return serialize(h, h**expo)


def verify_n(pk: KeysN, message: bytes, signature: bytes) -> bool:
    """ref src/ps.cpp:84-99: e(s1, X2 prod Y2_i^m_i) == e(s2, g2)."""
    m = encode_to(Zp, message)
    n = len(m)
    if n > len(pk.Y2):
        raise ValueError("message is too long")
    g2 = parse(G2, pk.g2)
    X2 = parse(G2, pk.X2)
    Y2 = [parse(G2, b) for b in pk.Y2]
    s1, s2 = parse(G1 ** 2, signature)
    # Π[i.in[n]](Y2_i^m_i) in the reference's symbolic index notation
    # (src/ps.cpp:84-99); the materialized terms fuse as one G2 multi-exp.
    i_, = symbols("i_")
    acc = product_(algebraic(Y2)[i_] ** algebraic(m)[i_], i_.in_[n])
    return pair(s1, X2 * acc) == pair(s2, g2)


# --------------------------------------------------- sequential aggregate As


class As:
    """Sequential aggregate PS (ref src/ps.cpp:101-147, include/ps.hpp As)."""

    def __init__(self, pp: bytes):
        self.pp = pp  # G1^2 | G2^2

    @classmethod
    def setup(cls, random) -> "As":
        g1 = select_in(~G1, random)
        g2 = select_in(~G2, random)
        x = select_in(~Zp, random)
        return cls(pp=serialize(g1, g1**x, g2, g2**x))

    def key_gen(self, random):
        g1, X1, g2, X2 = parse(G1 ** 2, G2 ** 2, self.pp)
        y = select_in(Zp, random)
        return serialize(y), serialize(g2**y)  # (sk, pk)

    def sign_no_check(self, sk: bytes, message: bytes, signature: bytes, random) -> bytes:
        m = hash_(message).to(Zp)
        y = parse(Zp, sk)
        s1, s2 = parse(G1 ** 2, signature)
        t = select_in(Zp, random)
        return serialize(s1**t, (s2 * (s1 ** (y * m))) ** t)

    def sign(self, keys, message: bytes, pks, messages, signature: bytes, random) -> bytes:
        sk, pk = keys
        if len(pks) == 0:
            # the default signature is pp's leading G1^2 bytes (g1, X1) —
            # ref include/ps.hpp:68-71 overlays pp.default_signature on pp
            return self.sign_no_check(sk, message, self.pp[:98], random)
        if not self.verify(pks, messages, signature):
            raise ValueError("invalid signature")
        if any(p == pk for p in pks):
            raise ValueError("repetitive pk")
        return self.sign_no_check(sk, message, signature, random)

    def verify(self, pks, messages, signature: bytes) -> bool:
        g1, X1, g2, X2 = parse(G1 ** 2, G2 ** 2, self.pp)
        Y2 = [parse(G2, b) for b in pks]
        r = len(messages)
        # symbolic hash-range + Π, reference style (src/ps.cpp:125-146):
        # the hash of each message materializes through a transform range
        m = transform(messages, lambda mm: hash_(_as_bytes(mm)).to(Zp))
        s1, s2 = parse(G1 ** 2, signature)
        i_, = symbols("i_")
        acc = product_(algebraic(Y2)[i_] ** m[i_], i_.in_[r])
        return pair(s1, X2 * acc) == pair(s2, g2)


def _as_bytes(m) -> bytes:
    return m.encode() if isinstance(m, str) else bytes(m)


def verify_n_batch(pk: KeysN, messages, signatures):
    """Device-batched multi-message verify: B signatures, each checking
    e(s1ᵢ, X2·Π_j Y2_j^m_{ij}) == e(s2ᵢ, g2).

    The Π_j Y2_j^m_{ij} G2 multi-exponentiation runs as n batched GS
    ladders over the whole batch (the reference does n eager PAIR_G2mul
    per signature, src/ps.cpp:84-99), and both pairing sides share one
    batched final exponentiation.  Returns a (B,) bool array.
    """
    import numpy as np

    from ..api import batch as BT

    B = len(messages)
    assert len(signatures) == B
    g2e = parse(G2, pk.g2)
    X2e = parse(G2, pk.X2)
    Y2e = [parse(G2, b) for b in pk.Y2]
    ms = [encode_to(Zp, _as_bytes(m)) for m in messages]
    n = max((len(m) for m in ms), default=0)
    if n > len(Y2e):
        raise ValueError("message is too long")

    sigs = [parse(G1 ** 2, s) for s in signatures]
    s1 = BT.G1Vec.from_elements(s[0] for s in sigs)
    s2 = BT.G1Vec.from_elements(s[1] for s in sigs)
    g2 = BT.G2Vec.from_elements([g2e]).broadcast_to((B,))
    acc = BT.G2Vec.from_elements([X2e]).broadcast_to((B,))
    for j in range(n):
        yj = BT.G2Vec.from_elements([Y2e[j]]).broadcast_to((B,))
        ej = BT.ZpVec.from_ints(
            [m[j].value if j < len(m) else 0 for m in ms]
        )
        acc = acc * (yj ** ej)
    ok = BT.pair_prod((s1, acc), (s2.inverse(), g2)).is_one()
    return np.asarray(ok)
