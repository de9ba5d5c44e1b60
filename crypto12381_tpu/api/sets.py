"""Set/protocol API: the reference's L4 surface in Python.

Counterpart of include/crypto12381/{interface,set}.hpp: set objects with
serialized sizes, random selection (`select_in`, star sets excluding the
identity, vector selection, tuple selection over cartesian powers `Set**n`),
`parse`/`serialize` with compile-time-style offsets, incremental SHA3-512
`hash_(...)` convertible `.to(Zp)/.to(G1)`, `sum_`/`product_` (Σ/Π),
`encode_to`, `make_Zp`, `polynomial`.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Any, Iterable, Sequence

from ..compat.csprng import RandomEngine
from ..params import G1_BYTES, G2_BYTES, GT_BYTES, R, ZP_BYTES
from .elements import (G1Element, G1Pow, G2Element, GTElement, GTPair,
                       ZpNumber, inverse, pair)

__all__ = [
    "Zp", "G1", "G2", "GT", "Set", "CartesianPower",
    "select_in", "parse", "serialize", "hash_", "sum_", "product_",
    "encode_to", "make_Zp", "polynomial", "create_random_engine",
    "packed", "SerializedPack",
]


def create_random_engine(seed) -> RandomEngine:
    return RandomEngine(seed)


@dataclass(frozen=True)
class Set:
    """A group tag (ref interface.hpp:12-40).  `~S` (or `.star`) excludes
    the identity; `S ** n` is the cartesian power for parse/select."""

    name: str
    size: int
    star: bool = False

    @property
    def serialized_size(self) -> int:
        return self.size

    def __invert__(self) -> "Set":
        return Set(self.name, self.size, star=True)

    def __pow__(self, n: int) -> "CartesianPower":
        return CartesianPower(self, n)

    def __or__(self, other):
        """Cartesian product set A | B (set.hpp:596-627)."""
        parts = other.parts if isinstance(other, ProductSet) else (other,)
        return ProductSet((self,) + parts)

    def __mul__(self, other):
        """A * B — the reference's alias for A | B (set.hpp:596-627)."""
        return self.__or__(other)

    def __repr__(self):
        return ("*" if self.star else "") + self.name


@dataclass(frozen=True)
class CartesianPower:
    base: Set
    exponent: int

    @property
    def serialized_size(self) -> int:
        return self.base.serialized_size * self.exponent

    def __pow__(self, n: int) -> "CartesianPower":
        return CartesianPower(self.base, self.exponent * n)

    def __invert__(self) -> "CartesianPower":
        # ~Zp ** 2 parses as ~(Zp ** 2): star the base set
        return CartesianPower(~self.base, self.exponent)


@dataclass(frozen=True)
class ProductSet:
    parts: tuple

    @property
    def serialized_size(self) -> int:
        return sum(p.serialized_size for p in self.parts)

    def __or__(self, other):
        parts = other.parts if isinstance(other, ProductSet) else (other,)
        return ProductSet(self.parts + parts)

    def __mul__(self, other):
        """A * B — the reference's alias for A | B (set.hpp:596-627)."""
        return self.__or__(other)


Zp = Set("Zp", ZP_BYTES)
G1 = Set("G1", G1_BYTES)
G2 = Set("G2", G2_BYTES)
GT = Set("GT", GT_BYTES)


# ---------------------------------------------------------------------------
# Random selection (set.hpp:81-112, 556-570)
# ---------------------------------------------------------------------------


def _select_one(s: Set, rng: RandomEngine):
    if s.name == "Zp":
        return ZpNumber.select_nonzero(rng) if s.star else ZpNumber.select(rng)
    if s.name == "G1":
        return G1Pow.select_except1(rng) if s.star else G1Pow.select(rng)
    if s.name == "G2":
        return G2Element.select_except1(rng) if s.star else G2Element.select(rng)
    raise ValueError(f"cannot select in {s}")


def select_in(s, rng: RandomEngine, n: int | None = None):
    """Random element(s): select_in(G1, rng), select_in(~Zp, rng),
    select_in(Zp, rng, n) -> list, select_in(Zp**k, rng) -> tuple."""
    if isinstance(s, CartesianPower):
        return tuple(_select_one(s.base, rng) for _ in range(s.exponent))
    if isinstance(s, ProductSet):
        return tuple(_select_one(p, rng) for p in s.parts)
    if n is not None:
        return [_select_one(s, rng) for _ in range(n)]
    return _select_one(s, rng)


# ---------------------------------------------------------------------------
# Parse / serialize (set.hpp:114-293)
# ---------------------------------------------------------------------------

_PARSERS = {
    "Zp": ZpNumber.parse,
    "G1": G1Element.parse,
    "G2": G2Element.parse,
    "GT": GTElement.parse,
}


def _flatten_sets(sets) -> list[Set]:
    out: list[Set] = []
    for s in sets:
        if isinstance(s, CartesianPower):
            out.extend([s.base] * s.exponent)
        elif isinstance(s, ProductSet):
            out.extend(s.parts)
        else:
            out.append(s)
    return out


def parse(*args):
    """parse(SetA, SetB, ..., data).  data may be bytes or anything with a
    .serialize() -> treated as raw bytes.  Returns one element for a single
    set, else a tuple in declaration order.  A @packed struct class is also
    accepted: parse(MyPack, data) -> MyPack instance (the reference's
    struct-typed parse over trivially-copyable packs, set.hpp:114-203)."""
    *sets, data = args
    if not isinstance(data, (bytes, bytearray, memoryview)):
        data = bytes(data)
    if len(sets) == 1 and isinstance(sets[0], type) and hasattr(sets[0], "_pack_fields"):
        return sets[0].parse(bytes(data))
    flat = _flatten_sets(sets)
    total = sum(s.serialized_size for s in flat)
    if len(data) != total:
        raise ValueError(f"parse: need {total} bytes, got {len(data)}")
    out = []
    off = 0
    for s in flat:
        out.append(_PARSERS[s.name](data[off : off + s.serialized_size]))
        off += s.serialized_size
    return out[0] if len(out) == 1 else tuple(out)


def _serialize_one(e) -> bytes:
    if hasattr(e, "serialize"):
        return e.serialize()
    if isinstance(e, (bytes, bytearray)):
        return bytes(e)
    raise TypeError(f"cannot serialize {type(e)}")


class SerializedPack(bytes):
    """Bytes result of serialize(...) that can re-type itself into any
    right-sized @packed struct — the Python analogue of the reference's
    serialize_pack convertible / `.to(Struct)` (set.hpp:235-293)."""

    def to(self, struct_cls):
        if not hasattr(struct_cls, "_pack_fields"):
            raise TypeError(f"{struct_cls!r} is not a @packed struct")
        if len(self) != struct_cls.SERIALIZED_SIZE:
            raise ValueError(
                f"serialized pack is {len(self)} bytes; "
                f"{struct_cls.__name__} needs {struct_cls.SERIALIZED_SIZE}"
            )
        return struct_cls.parse(bytes(self))


def serialize(*elems) -> SerializedPack:
    """Concatenated byte serialization (set.hpp serialize_pack); the result
    is plain bytes that additionally supports `.to(PackedStruct)`."""
    out = bytearray()
    for e in elems:
        if isinstance(e, (list, tuple)):
            out += serialize(*e)
        else:
            out += _serialize_one(e)
    return SerializedPack(out)


def packed(cls):
    """Declare a fixed-layout struct of group elements — the counterpart of
    the reference's trivially-copyable packs with compile-time offsets
    (serialized_field, interface.hpp:47-54; struct parse set.hpp:114-203).

    Class attributes declare fields in order, each a Set or cartesian power:

        @packed
        class Signature:
            h = G1
            he = G1

    The class gains SERIALIZED_SIZE, an __init__ over the fields,
    ``parse(data)`` and ``serialize()``, and structural equality.
    """
    fields = [
        (name, spec)
        for name, spec in vars(cls).items()
        if isinstance(spec, (Set, CartesianPower, ProductSet))
    ]
    if not fields:
        raise TypeError(f"@packed class {cls.__name__} declares no fields")
    names = [n for n, _ in fields]
    specs = [s for _, s in fields]
    sizes = [sum(f.serialized_size for f in _flatten_sets([s])) for s in specs]
    cls._pack_fields = tuple(fields)
    cls.SERIALIZED_SIZE = sum(sizes)

    def __init__(self, *args, **kw):
        vals = dict(zip(names, args))
        vals.update(kw)
        if set(vals) != set(names):
            raise TypeError(f"{cls.__name__} needs fields {names}")
        for n in names:
            setattr(self, n, vals[n])

    @classmethod
    def _parse(kls, data: bytes):
        if len(data) != kls.SERIALIZED_SIZE:
            raise ValueError(
                f"{kls.__name__}: need {kls.SERIALIZED_SIZE} bytes, "
                f"got {len(data)}"
            )
        vals = []
        off = 0
        for spec, size in zip(specs, sizes):
            vals.append(parse(spec, data[off : off + size]))
            off += size
        return kls(*vals)

    def _serialize(self) -> SerializedPack:
        return serialize(*(getattr(self, n) for n in names))

    def __eq__(self, other):
        if not isinstance(other, cls):
            return NotImplemented
        return all(getattr(self, n) == getattr(other, n) for n in names)

    def __repr__(self):
        inner = ", ".join(f"{n}={getattr(self, n)!r}" for n in names)
        return f"{cls.__name__}({inner})"

    cls.__init__ = __init__
    cls.parse = _parse
    cls.serialize = _serialize
    cls.__eq__ = __eq__
    cls.__hash__ = None
    cls.__repr__ = __repr__
    return cls


# ---------------------------------------------------------------------------
# Hashing (set.hpp:317-457): incremental SHA3-512 over serialized elements
# ---------------------------------------------------------------------------


class HashState:
    """SHA3-512 accumulator; elements contribute their serialized bytes,
    ranges element-wise, raw bytes as-is (set.hpp hash_state)."""

    def __init__(self, *args):
        self._h = hashlib.sha3_512()
        for a in args:
            self.update(a)

    def update(self, a) -> "HashState":
        if isinstance(a, (bytes, bytearray, memoryview)):
            self._h.update(bytes(a))
        elif hasattr(a, "serialize"):
            self._h.update(a.serialize())
        elif isinstance(a, (list, tuple)):
            for e in a:
                self.update(e)
        elif isinstance(a, int):
            raise TypeError("hash of raw int is ambiguous; wrap in ZpNumber")
        else:
            raise TypeError(f"cannot hash {type(a)}")
        return self

    def __or__(self, a) -> "HashState":
        return self.update(a)

    def digest(self) -> bytes:
        return self._h.digest()

    def to(self, s: Set):
        if s.name == "Zp":
            return ZpNumber.from_hash(self.digest())
        if s.name == "G1":
            return G1Element.from_hash(self.digest())
        raise ValueError(f"hash .to({s}) not supported (matches reference)")


def hash_(*args) -> HashState:
    return HashState(*args)


# ---------------------------------------------------------------------------
# Σ / Π (set.hpp:465-554)
# ---------------------------------------------------------------------------


def _symbolic_terms(expr, spec) -> list:
    """Materialize a symbolic Σ/Π body over its index range: `spec` is an
    algebra.RangeSub (i.in_[n] / i.in_(range).except_(j)) or a bare count
    (symbol defaults to `i`), mirroring the reference's Σ[n](expr) and
    Σ[i.in(range).except(j)] notation (set.hpp:465-540)."""
    from . import algebra as ALG

    if isinstance(spec, int):
        spec = ALG.RangeSub("i", lo=0, hi=spec)
    if not isinstance(spec, ALG.RangeSub):
        raise TypeError(f"bad symbolic range spec {spec!r}")
    vals = spec.resolve()
    if vals is None:
        raise ValueError("symbolic range bounds must be concrete here")
    return [
        ALG.substitute(expr, **{spec.name: v}) if isinstance(expr, ALG.Expr)
        else expr
        for v in vals
    ]


def sum_(items, spec=None):
    """Σ over Zp values (lazy renormalisation is a host no-op).

    Two forms, as in the reference (set.hpp:465-505):
      * ``sum_(iterable)`` — plain range reduction;
      * ``sum_(expr, i.in_[n])`` — symbolic body over a bound index.
    """
    if spec is not None:
        items = _symbolic_terms(items, spec)
    acc = None
    for it in items:
        acc = it if acc is None else acc + it
    if acc is None:
        return ZpNumber(0)
    return acc


def product_(items, spec=None):
    """Π with the reference's fusions: G1 pows fuse into one MSM, GTPairs
    into one multi-pairing.

    Accepts ``product_(iterable)`` or the symbolic
    ``product_(expr, i.in_[n].except_(j))`` form (set.hpp:507-540); the
    symbolic body materializes to a term list FIRST so the G1Pow/GTPair
    fusion below still sees the whole product."""
    if spec is not None:
        items = _symbolic_terms(items, spec)
    items = list(items)
    if not items:
        raise ValueError("empty product")
    first = items[0]
    if isinstance(first, (G1Element, G1Pow)):
        return G1Element.product(items)
    if isinstance(first, G2Element):
        return G2Element.product(items)
    if isinstance(first, GTPair):
        acc = items[0]
        for it in items[1:]:
            acc = acc * it
        return acc
    acc = first
    for it in items[1:]:
        acc = acc * it
    return acc


# ---------------------------------------------------------------------------
# encode_to / make_Zp / polynomial (zp_number.hpp:873-975)
# ---------------------------------------------------------------------------


def encode_to(s: Set, message: bytes) -> list[ZpNumber]:
    """Split a message into 31-byte units, bit 249 set to avoid zero
    (zp_number.hpp:873-899)."""
    if s.name != "Zp":
        raise ValueError("encode_to only defined for Zp (as in the reference)")
    if isinstance(message, str):
        message = message.encode()
    unit = 31
    out = []
    n_full = len(message) // unit
    marker = 1 << (8 * unit)  # the byte just above the 31-byte unit
    for i in range(n_full):
        chunk = message[i * unit : (i + 1) * unit]
        out.append(ZpNumber(marker + int.from_bytes(chunk, "big")))
    rest = len(message) % unit
    if rest:
        chunk = message[len(message) - rest :]
        # remaining bytes occupy the HIGH end of the 31-byte unit
        v = int.from_bytes(chunk + b"\x00" * (unit - rest), "big")
        out.append(ZpNumber(marker + v))
    return out


def make_Zp(x: int) -> ZpNumber:
    """Integer -> Zp with the reference's signed semantics
    (zp_number.hpp:911-943)."""
    return ZpNumber(x)


def polynomial(x, a0, coeffs: Sequence) -> Any:
    """a0 + sum a_i x^i.

    DELIBERATE deviation from the reference: zp_number.hpp:947-968 computes
    x^i with std::pow on doubles, which silently loses precision for
    integer x with x^i >= 2^53; here the powers are exact modular integers.
    For the small share indices the examples use (x <= ~1000, i <= ~6) the
    two agree bit-for-bit — the golden SSS vectors prove it."""
    xi = _coerce_int(x)
    acc = a0
    p = 1
    for a in coeffs:
        p = p * xi % R
        acc = acc + a * ZpNumber(p)
    return acc


def _coerce_int(x) -> int:
    return x.value if isinstance(x, ZpNumber) else int(x)
