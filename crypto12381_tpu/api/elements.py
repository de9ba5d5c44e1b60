"""Element types with the reference's paper-notation API.

Python counterpart of the reference's wrapper layer L2
(include/crypto12381/{zp_number,g1_point,g2_point,liner_pair}.hpp): the same
multiplicative notation (`*` = group op, `^`/`**` = exponentiation, `pair()`
lazy pairing with double-ate fusion, `inverse()`), the same serialized byte
formats, and the same deterministic RNG semantics.

Design split (TPU-first, SURVEY §7):
  * These scalar wrappers execute protocol *bookkeeping* on exact host
    arithmetic (pyref) — single 255/381-bit operations are microseconds on
    host and the reference is single-element too.
  * All *bulk* work — batched pairings, multi-exponentiations, vectors of
    group elements — lowers to the batched JAX/TPU kernels through
    api/batch.py and msm/; the lazy G1Pow/GTPair shapes below exist exactly
    so products of pows and products of pairings can be fused into one
    batched device call (mirroring the reference's double-mult and
    double-ate fusions, g1_point.hpp:301-337, liner_pair.hpp:215-228).
"""

from __future__ import annotations

import hashlib
from typing import Iterable

from ..compat import codec
from ..compat.csprng import RandomEngine
from ..params import G1_BYTES, G2_BYTES, GT_BYTES, P, R, ZP_BYTES
from ..pyref import curve as C
from ..pyref import field as F
from ..pyref import pairing as PRR
from ..pyref import sswu as SS

__all__ = [
    "ZpNumber",
    "G1Element",
    "G1Pow",
    "G2Element",
    "GTElement",
    "GTPair",
    "pair",
    "inverse",
]


def _as_zp_int(v) -> int:
    if isinstance(v, ZpNumber):
        return v.value
    if isinstance(v, int):
        return v % R
    raise TypeError(f"cannot use {type(v)} as a Zp scalar")


def _zp_int_or_none(v):
    """int value, or None when `v` is a foreign type (e.g. a symbolic
    algebra.Expr) — operators return NotImplemented then, so the DSL's
    reflected operators can build deferred nodes."""
    if isinstance(v, ZpNumber):
        return v.value
    if isinstance(v, int):
        return v % R
    return None


class ZpNumber:
    """Scalar mod r (the group order).  ref: zp_number.hpp ZpNumber<>.

    The reference's lazy-normalization template machinery (ChunkRange carry
    budgets) is a CPU bignum optimisation; host arbitrary-precision ints are
    exact, and batched device Zp arithmetic lives in fields/fp.py (FR_CTX).
    """

    __slots__ = ("value",)
    SERIALIZED_SIZE = ZP_BYTES

    def __init__(self, value: int):
        self.value = value % R

    # -- construction ------------------------------------------------

    @classmethod
    def select(cls, rng: RandomEngine) -> "ZpNumber":
        return cls(rng.random_mod(R))

    @classmethod
    def select_nonzero(cls, rng: RandomEngine) -> "ZpNumber":
        return cls(rng.random_mod_nonzero(R))

    @classmethod
    def parse(cls, data: bytes) -> "ZpNumber":
        return cls(codec.zp_parse(bytes(data)))

    @classmethod
    def from_hash(cls, digest64: bytes) -> "ZpNumber":
        """SHA3-512 digest -> Zp, fixed-time mod r (zp_number.hpp:417-426)."""
        return cls(int.from_bytes(digest64, "big") % R)

    # -- arithmetic --------------------------------------------------

    def __add__(self, other):
        o = _zp_int_or_none(other)
        if o is None:
            return NotImplemented
        return ZpNumber(self.value + o)

    __radd__ = __add__

    def __sub__(self, other):
        o = _zp_int_or_none(other)
        if o is None:
            return NotImplemented
        return ZpNumber(self.value - o)

    def __rsub__(self, other):
        o = _zp_int_or_none(other)
        if o is None:
            return NotImplemented
        return ZpNumber(o - self.value)

    def __mul__(self, other):
        o = _zp_int_or_none(other)
        if o is None:
            return NotImplemented
        return ZpNumber(self.value * o)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return ZpNumber(self.value * pow(_as_zp_int(other), -1, R))

    def __rtruediv__(self, other):
        return ZpNumber(_as_zp_int(other) * pow(self.value, -1, R))

    def __neg__(self):
        return ZpNumber(-self.value)

    def __pow__(self, e):
        return ZpNumber(pow(self.value, int(e), R))

    def inverse(self) -> "ZpNumber":
        return ZpNumber(pow(self.value, -1, R))

    def __eq__(self, other):
        return self.value == _as_zp_int(other)

    def __hash__(self):
        return hash(("Zp", self.value))

    def __repr__(self):
        return f"Zp(0x{self.value:x})"

    def serialize(self) -> bytes:
        return codec.zp_serialize(self.value)


class G1Element:
    """Point in G1, multiplicative notation.  ref: g1_point.hpp G1Point."""

    __slots__ = ("pt",)
    SERIALIZED_SIZE = G1_BYTES

    def __init__(self, pt):
        self.pt = pt  # pyref affine tuple or None

    @classmethod
    def generator(cls) -> "G1Element":
        return cls(C.G1_GEN)

    @classmethod
    def identity(cls) -> "G1Element":
        return cls(None)

    @classmethod
    def parse(cls, data: bytes) -> "G1Element":
        return cls(codec.g1_parse(bytes(data)))

    @classmethod
    def from_hash(cls, digest64: bytes) -> "G1Element":
        """hash-to-G1: digest mod p -> SSWU map2point -> clear cofactor
        (g1_point.hpp:203-218).  Default: exact host path.  With
        CRYPTO12381_DEVICE_HASH=1 the device SSWU kernel
        (hashing/sswu.py) runs instead — identical results (tested), one
        jit call per element; the batched form is api.batch.hash_to_g1."""
        import os

        if os.environ.get("CRYPTO12381_DEVICE_HASH"):
            import jax.numpy as jnp
            import numpy as np

            from . import batch as BT

            d = jnp.asarray(
                np.frombuffer(bytes(digest64), np.uint8)[None, :]
            )
            vec = BT.hash_to_g1(d)
            return vec.to_elements()[0]
        return cls(SS.hash_to_g1(digest64))

    def __mul__(self, other):
        if isinstance(other, (G1Element, G1Pow)):
            return G1Element(C.g1_add(self.pt, other.point().pt))
        return NotImplemented

    def __truediv__(self, other):
        if isinstance(other, (G1Element, G1Pow)):
            return G1Element(C.g1_add(self.pt, C.g1_neg(other.point().pt)))
        return NotImplemented

    def __pow__(self, e):
        ei = _zp_int_or_none(e)
        if ei is None:
            return NotImplemented
        return G1Pow(self, ei)

    __xor__ = __pow__

    def __eq__(self, other):
        if isinstance(other, (G1Element, G1Pow)):
            return self.pt == other.point().pt
        return NotImplemented

    def __hash__(self):
        return hash(("G1", self.pt))

    def point(self) -> "G1Element":
        return self

    def in_subgroup(self) -> bool:
        """r-torsion membership check (PAIR_G1member semantics,
        pair_BLS12381.cpp:1100-1130; the reference wrapper never calls it —
        exposed here as state-of-practice parse-time validation)."""
        return C.g1_in_subgroup(self.pt)

    def inverse(self) -> "G1Element":
        return G1Element(C.g1_neg(self.pt))

    def serialize(self) -> bytes:
        return codec.g1_serialize(self.pt)

    @staticmethod
    def product(elems: Iterable) -> "G1Element":
        """Product of G1 elements / pows; pows are combined via one
        multi-scalar multiplication shape (the op the reference hides at
        ecp_BLS12381.cpp:1112 Pippenger)."""
        acc = None
        pows = []
        for e in elems:
            if isinstance(e, G1Pow):
                pows.append(e)
            else:
                acc = C.g1_add(acc, e.point().pt)
        if pows:
            acc = C.g1_add(acc, _msm_host([p.base.pt for p in pows], [p.exp for p in pows]))
        return G1Element(acc)


def _msm_host(points, scalars):
    """Host MSM for the scalar API: joint double-scalar ladder for pairs
    (ref ECP_clmul2), Pippenger buckets beyond (ref ECP_muln) — the device
    Pippenger for batched arrays lives in msm/pippenger.py."""
    if len(points) == 2:
        return C.g1_mul2(points[0], scalars[0], points[1], scalars[1])
    return C.g1_msm(points, scalars)


class G1Pow:
    """Lazy base^exp in G1 (ref g1_point.hpp G1Pow): keeps the exponent so
    products of pows can fuse into multi-scalar multiplications."""

    __slots__ = ("base", "exp")

    def __init__(self, base: G1Element, exp: int):
        self.base = base
        self.exp = exp % R

    @classmethod
    def select(cls, rng: RandomEngine) -> "G1Pow":
        return cls(G1Element.generator(), rng.random_mod(R))

    @classmethod
    def select_except1(cls, rng: RandomEngine) -> "G1Pow":
        return cls(G1Element.generator(), rng.random_mod_nonzero(R))

    def point(self) -> G1Element:
        return G1Element(C.g1_mul(self.base.pt, self.exp))

    def __pow__(self, e):
        ei = _zp_int_or_none(e)
        if ei is None:
            return NotImplemented
        return G1Pow(self.base, self.exp * ei)

    __xor__ = __pow__

    def __mul__(self, other):
        if isinstance(other, G1Pow):
            return G1Element(
                C.g1_mul2(self.base.pt, self.exp, other.base.pt, other.exp)
            )
        if isinstance(other, G1Element):
            return self.point() * other
        return NotImplemented

    def __truediv__(self, other):
        if isinstance(other, (G1Element, G1Pow)):
            return self.point() / other.point()
        return NotImplemented

    def __eq__(self, other):
        if isinstance(other, (G1Element, G1Pow)):
            return self.point().pt == other.point().pt
        return NotImplemented

    def __hash__(self):
        return hash(("G1Pow", self.base.pt, self.exp))

    def inverse(self) -> "G1Pow":
        return G1Pow(self.base, -self.exp)

    def serialize(self) -> bytes:
        return self.point().serialize()


class G2Element:
    """Point in G2 (eager exponentiation, like the reference's G2Point)."""

    __slots__ = ("pt",)
    SERIALIZED_SIZE = G2_BYTES

    def __init__(self, pt):
        self.pt = pt

    @classmethod
    def generator(cls) -> "G2Element":
        return cls(C.G2_GEN)

    @classmethod
    def identity(cls) -> "G2Element":
        return cls(None)

    @classmethod
    def parse(cls, data: bytes) -> "G2Element":
        return cls(codec.g2_parse(bytes(data)))

    @classmethod
    def select(cls, rng: RandomEngine) -> "G2Element":
        return cls(C.g2_mul(C.G2_GEN, rng.random_mod(R)))

    @classmethod
    def select_except1(cls, rng: RandomEngine) -> "G2Element":
        return cls(C.g2_mul(C.G2_GEN, rng.random_mod_nonzero(R)))

    def __mul__(self, other):
        if isinstance(other, G2Element):
            return G2Element(C.g2_add(self.pt, other.pt))
        return NotImplemented

    def __truediv__(self, other):
        if isinstance(other, G2Element):
            return G2Element(C.g2_add(self.pt, C.g2_neg(other.pt)))
        return NotImplemented

    def __pow__(self, e):
        ei = _zp_int_or_none(e)
        if ei is None:
            return NotImplemented
        return G2Element(C.g2_mul(self.pt, ei))

    __xor__ = __pow__

    def __eq__(self, other):
        if isinstance(other, G2Element):
            return self.pt == other.pt
        return NotImplemented

    def __hash__(self):
        return hash(("G2", self.pt))

    def point(self) -> "G2Element":
        return self

    def in_subgroup(self) -> bool:
        """r-torsion membership check (PAIR_G2member semantics,
        pair_BLS12381.cpp:1132-1160)."""
        return C.g2_in_subgroup(self.pt)

    def inverse(self) -> "G2Element":
        return G2Element(C.g2_neg(self.pt))

    def serialize(self) -> bytes:
        return codec.g2_serialize(self.pt)

    @staticmethod
    def product(elems: Iterable) -> "G2Element":
        acc = None
        for e in elems:
            acc = C.g2_add(acc, e.pt)
        return G2Element(acc)


class GTElement:
    """Element of GT (Fp12 unit subgroup).  ref: liner_pair.hpp GTPoint."""

    __slots__ = ("val",)
    SERIALIZED_SIZE = GT_BYTES

    def __init__(self, val):
        self.val = val  # pyref fp12 tuple

    @classmethod
    def parse(cls, data: bytes) -> "GTElement":
        return cls(codec.gt_parse(bytes(data)))

    @classmethod
    def one(cls) -> "GTElement":
        return cls(F.FP12_ONE)

    def __mul__(self, other):
        if isinstance(other, GTElement):
            return GTElement(F.fp12_mul(self.val, other.val))
        if isinstance(other, GTPair):
            return GTElement(F.fp12_mul(self.val, other.value().val))
        return NotImplemented

    def __truediv__(self, other):
        o = other.value() if isinstance(other, GTPair) else other
        return GTElement(F.fp12_mul(self.val, F.fp12_inv(o.val)))

    def __pow__(self, e):
        ei = _zp_int_or_none(e)
        if ei is None:
            return NotImplemented
        return GTElement(F.fp12_pow(self.val, ei))

    __xor__ = __pow__

    def __eq__(self, other):
        if isinstance(other, GTPair):
            other = other.value()
        if isinstance(other, GTElement):
            return F.fp12_eq(self.val, other.val)
        return NotImplemented

    def __hash__(self):
        return hash(("GT", F._fp12_canon(self.val)))

    def value(self) -> "GTElement":
        return self

    def in_subgroup(self) -> bool:
        """GT membership: x^r == 1 (PAIR_GTmember semantics,
        pair_BLS12381.cpp:1162-1177)."""
        return F.fp12_eq(F.fp12_pow(self.val, R), F.FP12_ONE)

    def inverse(self) -> "GTElement":
        return GTElement(F.fp12_inv(self.val))

    def serialize(self) -> bytes:
        return codec.gt_serialize(self.val)


class GTPair:
    """Lazy pairing e(P, Q) (ref liner_pair.hpp GTPair): products of pairs
    share one Miller accumulation + final exponentiation (double-ate)."""

    __slots__ = ("pairs",)

    def __init__(self, pairs):
        self.pairs = list(pairs)  # [(g1_affine, g2_affine), ...]

    def value(self) -> GTElement:
        acc = None
        for p1, p2 in self.pairs:
            f = PRR.miller_loop(p1, p2) if (p1 is not None and p2 is not None) else None
            if f is not None:
                acc = f if acc is None else F.fp12_mul(acc, f)
        if acc is None:
            return GTElement.one()
        e = PRR.final_exp(acc)
        return GTElement(F.fp12_mul(F.fp12_sqr(e), e))  # reference = ate^3

    def __mul__(self, other):
        if isinstance(other, GTPair):
            return GTPair(self.pairs + other.pairs)
        if isinstance(other, GTElement):
            return self.value() * other
        return NotImplemented

    def __truediv__(self, other):
        return self.value() / other

    def __pow__(self, e):
        return self.value() ** e

    __xor__ = __pow__

    def __eq__(self, other):
        return self.value() == other

    def serialize(self) -> bytes:
        return self.value().serialize()


def pair(p1, p2) -> GTPair:
    """Lazy bilinear pairing (liner_pair.hpp:261-265)."""
    return GTPair([(p1.point().pt, p2.point().pt)])


def inverse(x):
    """Free-function inverse matching the reference's `inverse(...)`."""
    return x.inverse()
