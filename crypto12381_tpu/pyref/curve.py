"""Exact G1/G2 group law — host-side reference (affine, Python ints).

Oracle counterpart of the reference's ECP/ECP2 units
(3rd-party/miracl-core/ecp_BLS12381.cpp, ecp2_BLS12381.cpp); independent
implementation used to differentially test the batched JAX Jacobian kernels.

Points are affine tuples; None is the point at infinity.
  G1: (x, y) with ints mod p,      y^2 = x^3 + 4
  G2: ((xr, xi), (yr, yi)) in Fp2, y^2 = x^3 + 4(1+i)
"""

from __future__ import annotations

from ..params import (B_G1, B_G2, G1_GEN_X, G1_GEN_Y, G2_GEN_X, G2_GEN_Y,
                      H_EFF_G1, P, R)
from . import field as F

G1_GEN = (G1_GEN_X, G1_GEN_Y)
G2_GEN = (G2_GEN_X, G2_GEN_Y)


# --------------------------------------------------------------------- G1

def g1_is_on_curve(pt):
    if pt is None:
        return True
    x, y = pt
    return (y * y - (x * x * x + B_G1)) % P == 0


def g1_neg(pt):
    if pt is None:
        return None
    return (pt[0], (-pt[1]) % P)


def g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_mul(pt, k):
    k %= R
    result = None
    addend = pt
    while k:
        if k & 1:
            result = g1_add(result, addend)
        addend = g1_add(addend, addend)
        k >>= 1
    return result


def g1_mul_int(pt, k):
    """Scalar mul by a plain integer (no mod-r reduction) — for cofactors."""
    result = None
    addend = pt
    while k:
        if k & 1:
            result = g1_add(result, addend)
        addend = g1_add(addend, addend)
        k >>= 1
    return result


def g1_clear_cofactor(pt):
    """Effective-cofactor clearing: multiply by 1+|x| (ecp_BLS12381.cpp:1252,
    rom CURVE_Cof)."""
    return g1_mul_int(pt, H_EFF_G1)


def g1_eq(p1, p2):
    return p1 == p2


# --------------------------------------------------------------------- G2

def g2_is_on_curve(pt):
    if pt is None:
        return True
    x, y = pt
    lhs = F.fp2_sqr(y)
    rhs = F.fp2_add(F.fp2_mul(F.fp2_sqr(x), x), B_G2)
    return lhs == rhs


def g2_neg(pt):
    if pt is None:
        return None
    return (pt[0], F.fp2_neg(pt[1]))


def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if F.fp2_is_zero(F.fp2_add(y1, y2)):
            return None
        num = F.fp2_scalar(F.fp2_sqr(x1), 3)
        lam = F.fp2_mul(num, F.fp2_inv(F.fp2_scalar(y1, 2)))
    else:
        lam = F.fp2_mul(F.fp2_sub(y2, y1), F.fp2_inv(F.fp2_sub(x2, x1)))
    x3 = F.fp2_sub(F.fp2_sub(F.fp2_sqr(lam), x1), x2)
    y3 = F.fp2_sub(F.fp2_mul(lam, F.fp2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(pt, k):
    k %= R
    result = None
    addend = pt
    while k:
        if k & 1:
            result = g2_add(result, addend)
        addend = g2_add(addend, addend)
        k >>= 1
    return result


def g2_eq(p1, p2):
    return p1 == p2
