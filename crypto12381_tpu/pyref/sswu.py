"""Exact host-side replica of the reference's constant-time map-to-point.

Implements the same math as ECP_map2point for WEIERSTRASS + 11-isogeny
(ecp_BLS12381.cpp:1495-1633): simplified SWU with Z = 11 onto the isogenous
curve y^2 = x^3 + A'x + B', then the 11-isogeny rational maps (PC table),
then effective-cofactor clearing — semantics must match bit-for-bit because
serialized hash-to-G1 outputs are part of the protocol byte contracts.

The PC coefficient table lives in crypto12381_tpu.iso11_data (library data,
no dependency on the tests/ tree); tests/test_sswu.py asserts it equals the
oracle dump tests/vectors/reference.json to rule out transcription errors.
"""

from __future__ import annotations

from ..iso11_data import XDEN, XNUM, YDEN, YNUM
from ..params import ISO11_A, ISO11_B, P, SSWU_Z
from . import curve as C
from . import field as F


def iso11_tables():
    """(xnum[12], xden[10], ynum[16], yden[15]) in the reference's Horner
    (highest-degree-first) consumption order (ecp_BLS12381.cpp:1566-1626)."""
    return list(XNUM), list(XDEN), list(YNUM), list(YDEN)


def map2point(u: int):
    """SSWU map Fp -> E(Fp) (before cofactor clearing), matching the
    reference's candidate/sign conventions."""
    sgn = u & 1
    t = SSWU_Z * u * u % P
    w = (t + 1) * t % P                      # Z^2 u^4 + Z u^2
    D = ISO11_A * w % P                      # A'*w
    N = (-ISO11_B) * (w + 1) % P             # -B'(w+1)
    X2 = N
    X3 = t * X2 % P
    gx1 = (X2 * X2 % P + ISO11_A * D % P * D) % P * X2 % P
    gx1 = (gx1 + ISO11_B * pow(D, 3, P)) % P  # numerator of g(x1)*D^3
    w3 = gx1 * D % P
    qr = F.fp_is_qr(w3)
    w3_inv = pow(w3, -1, P) if w3 else 0
    Dinv = w3_inv * gx1 % P                  # 1/D
    x_qr = X2 * Dinv % P
    x_nqr = X3 * Dinv % P
    D2 = Dinv * Dinv % P
    if qr:
        s = F.fp_sqrt(w3)
        Y = s * D2 % P
        X = x_qr
    else:
        u3 = SSWU_Z * pow(u, 3, P) % P
        s = F.fp_sqrt(w3 * SSWU_Z % P)
        Y = s * (D2 * u3 % P) % P
        X = x_nqr
    if (Y & 1) ^ sgn:
        Y = (-Y) % P
    # 11-isogeny rational maps, Horner highest-first
    xnum_t, xden_t, ynum_t, yden_t = iso11_tables()
    xnum = xnum_t[0]
    for c in xnum_t[1:]:
        xnum = (xnum * X + c) % P
    xden = (X + xden_t[0]) % P
    for c in xden_t[1:]:
        xden = (xden * X + c) % P
    ynum = ynum_t[0]
    for c in ynum_t[1:]:
        ynum = (ynum * X + c) % P
    yden = (X + yden_t[0]) % P
    for c in yden_t[1:]:
        yden = (yden * X + c) % P
    ynum = ynum * Y % P
    # projective (xnum*yden, ynum*xden, xden*yden) -> affine
    z = xden * yden % P
    zi = pow(z, -1, P)
    return (xnum * yden % P * zi % P, ynum * xden % P * zi % P)


def hash_to_g1(digest64: bytes):
    """The wrapper's hash-to-G1 (g1_point.hpp:203-218): 512-bit digest mod p,
    map2point, clear effective cofactor."""
    u = int.from_bytes(digest64, "big") % P
    pt = map2point(u)
    return C.g1_clear_cofactor(pt)
