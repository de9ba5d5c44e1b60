"""Byte codecs matching the reference's serialization formats bit-for-bit.

Formats (ref: include/crypto12381/interface.hpp:12-40 and the MIRACL
to/fromOctet routines):

  Zp : 48-byte big-endian integer (BIG_toBytes width MODBYTES=48).
  G1 : 49 bytes = prefix 0x02 (y even) / 0x03 (y odd) + x as 48-byte BE
       (ecp_BLS12381.cpp:478-483; sign = parity, fp_BLS12381.cpp:928-934).
  G2 : 97 bytes = prefix 0x02/0x03 by FP2_sign(y) + x.imag|x.real, each
       48-byte BE (ecp2_BLS12381.cpp:209-220; FP2_toBytes writes the imag
       coefficient first, fp2_BLS12381.cpp:83-87).
  GT : 576 bytes = FP12_toOctet order c,b,a over the reference's Fp4 tower
       (fp12_BLS12381.cpp:923-930), i.e. w-basis Fp2 coefficients in the
       order C5,C2,C4,C1,C3,C0, each as imag|real 48-byte BE.

These host-side codecs operate on plain ints / tuples (pyref
representations); the api layer converts JAX limb arrays to ints first
(vectorised batch (de)serialisation lives in api/elements.py).
"""

from __future__ import annotations

from ..params import B_G1, B_G2, MODBYTES, P
from ..pyref import field as F

# ------------------------------------------------------------------ ints


def int_to_bytes(v: int, width: int = MODBYTES) -> bytes:
    return int(v).to_bytes(width, "big")


def int_from_bytes(b: bytes) -> int:
    return int.from_bytes(b, "big")


# ------------------------------------------------------------------ Zp


def zp_serialize(v: int) -> bytes:
    return int_to_bytes(v)


def zp_parse(b: bytes, *, check: bool = True) -> int:
    from ..params import R

    v = int_from_bytes(b)
    if check and v >= R:
        raise ValueError("Parse to Zp number over range.")
    return v


# ------------------------------------------------------------------ G1


def g1_serialize(pt) -> bytes:
    if pt is None:
        # MIRACL serializes infinity as x=0 with y-parity 0 (ECP_affine of
        # infinity leaves x=y=0).
        return bytes([0x02]) + int_to_bytes(0)
    x, y = pt
    prefix = 0x03 if (y & 1) else 0x02
    return bytes([prefix]) + int_to_bytes(x)


def g1_parse(b: bytes):
    prefix = b[0]
    x = int_from_bytes(b[1:49])
    if prefix not in (0x02, 0x03):
        raise ValueError("bad G1 prefix")
    rhs = (x * x * x + B_G1) % P
    y = F.fp_sqrt(rhs)
    if y is None:
        raise ValueError("x not on curve")
    if (y & 1) != (prefix & 1):
        y = (-y) % P
    return (x, y)


# ------------------------------------------------------------------ G2


def g2_serialize(pt) -> bytes:
    if pt is None:
        return bytes([0x02]) + int_to_bytes(0) * 2
    (xr, xi), y = pt
    prefix = 0x03 if F.fp2_sign(y) == 1 else 0x02
    return bytes([prefix]) + int_to_bytes(xi) + int_to_bytes(xr)


def g2_parse(b: bytes):
    prefix = b[0]
    xi = int_from_bytes(b[1:49])
    xr = int_from_bytes(b[49:97])
    x = (xr, xi)
    rhs = F.fp2_add(F.fp2_mul(F.fp2_sqr(x), x), B_G2)
    y = F.fp2_sqrt(rhs)
    if y is None:
        raise ValueError("x not on twist")
    # fp2_sqrt returns the sign-0 root (matching ECP2_setx which calls
    # FP2_sqrt then conditionally negates by requested parity s).
    if F.fp2_sign(y) != (prefix & 1):
        y = F.fp2_neg(y)
    return (x, y)


# ------------------------------------------------------------------ GT

# FP12_toOctet writes FP4 c, b, a; each FP4 writes FP2 b, a; each FP2 writes
# Fp imag, real.  In w-basis coefficients (C0..C5) that is the Fp sequence:
_GT_ORDER = (5, 2, 4, 1, 3, 0)  # Fp2 coefficient order C5,C2,C4,C1,C3,C0


def gt_serialize(f) -> bytes:
    cs = F.fp12_coeffs_w(f)
    out = bytearray()
    for k in _GT_ORDER:
        real, imag = cs[k]
        out += int_to_bytes(imag)
        out += int_to_bytes(real)
    return bytes(out)


def gt_parse(b: bytes):
    cs = [None] * 6
    for slot, k in enumerate(_GT_ORDER):
        off = slot * 96
        imag = int_from_bytes(b[off : off + 48])
        real = int_from_bytes(b[off + 48 : off + 96])
        cs[k] = (real, imag)
    return F.fp12_from_coeffs_w(tuple(cs))
