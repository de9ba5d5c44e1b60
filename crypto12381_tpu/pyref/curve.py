"""Exact G1/G2 group law — host-side reference (Python ints).

Oracle counterpart of the reference's ECP/ECP2 units
(3rd-party/miracl-core/ecp_BLS12381.cpp, ecp2_BLS12381.cpp); independent
implementation used to differentially test the batched JAX Jacobian kernels,
and the execution engine for the scalar protocol API (api/elements.py).

Public API is affine: points are affine tuples; None is the point at
infinity.
  G1: (x, y) with ints mod p,      y^2 = x^3 + 4
  G2: ((xr, xi), (yr, yi)) in Fp2, y^2 = x^3 + 4(1+i)

Internally scalar multiplication, joint double-scalar multiplication
(Shamir's trick; the host analogue of the reference's fused 2-bit joint
ladder ECP_mul2/clmul2, ecp_BLS12381.cpp:1159-1248) and multi-scalar
multiplication (Pippenger buckets, ecp_BLS12381.cpp:1112-1148) run in
Jacobian coordinates with a single final inversion — the reference pays one
modular inversion total per op the same way (affine conversion at the end);
a naive affine ladder would pay one per group add.
"""

from __future__ import annotations

from ..params import (B_G1, B_G2, G1_GEN_X, G1_GEN_Y, G2_GEN_X, G2_GEN_Y,
                      H_EFF_G1, P, R)
from . import field as F

G1_GEN = (G1_GEN_X, G1_GEN_Y)
G2_GEN = (G2_GEN_X, G2_GEN_Y)


# ------------------------------------------------------------------ field ops

class _Fp:
    """Base-field ops for the generic Jacobian ladder (ints mod p)."""

    zero = 0
    one = 1

    @staticmethod
    def add(a, b):
        return (a + b) % P

    @staticmethod
    def sub(a, b):
        return (a - b) % P

    @staticmethod
    def neg(a):
        return (-a) % P

    @staticmethod
    def mul(a, b):
        return (a * b) % P

    @staticmethod
    def sqr(a):
        return (a * a) % P

    @staticmethod
    def inv(a):
        return pow(a, -1, P)

    @staticmethod
    def is_zero(a):
        return a % P == 0


class _Fp2:
    """Quadratic-extension ops (pyref field tuples)."""

    zero = F.FP2_ZERO
    one = F.FP2_ONE
    add = staticmethod(F.fp2_add)
    sub = staticmethod(F.fp2_sub)
    neg = staticmethod(F.fp2_neg)
    mul = staticmethod(F.fp2_mul)
    sqr = staticmethod(F.fp2_sqr)
    inv = staticmethod(F.fp2_inv)
    is_zero = staticmethod(F.fp2_is_zero)


# ------------------------------------------------------- generic Jacobian core
#
# Jacobian (X, Y, Z): affine x = X/Z^2, y = Y/Z^3; Z = 0 is infinity.

def _j_from_affine(pt, K):
    if pt is None:
        return None
    return (pt[0], pt[1], K.one)


def _j_dbl(p, K):
    if p is None:
        return None
    X, Y, Z = p
    if K.is_zero(Y):
        return None
    A = K.sqr(X)
    B = K.sqr(Y)
    C = K.sqr(B)
    D = K.sub(K.sqr(K.add(X, B)), K.add(A, C))
    D = K.add(D, D)
    E = K.add(K.add(A, A), A)
    Fq = K.sqr(E)
    X3 = K.sub(Fq, K.add(D, D))
    Y3 = K.sub(K.mul(E, K.sub(D, X3)), _x8(C, K))
    Z3 = K.mul(K.add(Y, Y), Z)
    return (X3, Y3, Z3)


def _x8(a, K):
    t = K.add(a, a)
    t = K.add(t, t)
    return K.add(t, t)


def _j_add(p, q, K):
    """General Jacobian + Jacobian (handles equal / opposite inputs)."""
    if p is None:
        return q
    if q is None:
        return p
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = K.sqr(Z1)
    Z2Z2 = K.sqr(Z2)
    U1 = K.mul(X1, Z2Z2)
    U2 = K.mul(X2, Z1Z1)
    S1 = K.mul(K.mul(Y1, Z2), Z2Z2)
    S2 = K.mul(K.mul(Y2, Z1), Z1Z1)
    H = K.sub(U2, U1)
    Rr = K.sub(S2, S1)
    if K.is_zero(H):
        if K.is_zero(Rr):
            return _j_dbl(p, K)
        return None
    HH = K.sqr(H)
    HHH = K.mul(H, HH)
    V = K.mul(U1, HH)
    X3 = K.sub(K.sub(K.sqr(Rr), HHH), K.add(V, V))
    Y3 = K.sub(K.mul(Rr, K.sub(V, X3)), K.mul(S1, HHH))
    Z3 = K.mul(K.mul(Z1, Z2), H)
    return (X3, Y3, Z3)


def _j_neg(p, K):
    if p is None:
        return None
    X, Y, Z = p
    return (X, K.neg(Y), Z)


def _j_to_affine(p, K):
    if p is None or K.is_zero(p[2]):
        return None
    X, Y, Z = p
    zi = K.inv(Z)
    zi2 = K.sqr(zi)
    return (_c(K.mul(X, zi2), K), _c(K.mul(K.mul(Y, zi2), zi), K))


def _c(v, K):
    return v % P if K is _Fp else v


def _j_mul(pt, k, K, width=4):
    """Windowed Jacobian scalar mul by nonnegative int k (one inversion)."""
    if pt is None or k == 0:
        return None
    base = _j_from_affine(pt, K)
    table = [None] * (1 << width)
    table[1] = base
    for i in range(2, 1 << width):
        table[i] = _j_add(table[i - 1], base, K)
    nbits = k.bit_length()
    nw = -(-nbits // width)
    acc = None
    for w in range(nw - 1, -1, -1):
        if acc is not None:
            for _ in range(width):
                acc = _j_dbl(acc, K)
        d = (k >> (w * width)) & ((1 << width) - 1)
        if d:
            acc = _j_add(acc, table[d], K)
    return acc


def _j_mul2(p, a, q, b, K):
    """Joint double-scalar a*P + b*Q via 2-bit Shamir windows (host analogue
    of the reference's ECP_clmul2, ecp_BLS12381.cpp:1159-1248)."""
    jp = _j_from_affine(p, K)
    jq = _j_from_affine(q, K)
    table = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            if i == 0 and j == 0:
                continue
            t = None
            if i:
                t = jp if i == 1 else _j_mul_small(jp, i, K)
            if j:
                u = jq if j == 1 else _j_mul_small(jq, j, K)
                t = _j_add(t, u, K)
            table[i][j] = t
    nbits = max(a.bit_length(), b.bit_length(), 1)
    nw = -(-nbits // 2)
    acc = None
    for w in range(nw - 1, -1, -1):
        if acc is not None:
            acc = _j_dbl(_j_dbl(acc, K), K)
        i = (a >> (2 * w)) & 3
        j = (b >> (2 * w)) & 3
        if i or j:
            acc = _j_add(acc, table[i][j], K)
    return acc


def _j_mul_small(p, k, K):
    acc = None
    for _ in range(k):
        acc = _j_add(acc, p, K)
    return acc


def _j_msm(points, scalars, K):
    """Host Pippenger (bucket) MSM over Jacobian points — the op the
    reference ships as ECP_muln (ecp_BLS12381.cpp:1112-1148)."""
    pts = [_j_from_affine(p, K) for p in points]
    ks = [k % R for k in scalars]
    n = len(pts)
    if n == 0:
        return None
    if n == 1:
        return _j_mul(points[0], ks[0], K)
    c = 4 if n < 32 else (8 if n < 1024 else 12)
    nbits = 255
    nw = -(-nbits // c)
    acc = None
    for w in range(nw - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = _j_dbl(acc, K)
        buckets = [None] * (1 << c)
        for p, k in zip(pts, ks):
            d = (k >> (w * c)) & ((1 << c) - 1)
            if d:
                buckets[d] = _j_add(buckets[d], p, K)
        run = None
        tot = None
        for b in range((1 << c) - 1, 0, -1):
            run = _j_add(run, buckets[b], K)
            tot = _j_add(tot, run, K)
        acc = _j_add(acc, tot, K)
    return acc


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
    return _j_to_affine(_j_mul(pt, k % R, _Fp), _Fp)


def g1_mul_int(pt, k):
    """Scalar mul by a plain integer (no mod-r reduction) — for cofactors."""
    return _j_to_affine(_j_mul(pt, k, _Fp), _Fp)


def g1_mul2(p, a, q, b):
    """a*P + b*Q fused into one joint 2-bit ladder (ECP_clmul2 analogue)."""
    if p is None or a % R == 0:
        return g1_mul(q, b)
    if q is None or b % R == 0:
        return g1_mul(p, a)
    return _j_to_affine(_j_mul2(p, a % R, q, b % R, _Fp), _Fp)


def g1_msm(points, scalars):
    """Multi-scalar multiplication (host Pippenger, ECP_muln analogue)."""
    pairs = [(p, k) for p, k in zip(points, scalars) if p is not None]
    if not pairs:
        return None
    pts, ks = zip(*pairs)
    return _j_to_affine(_j_msm(list(pts), list(ks), _Fp), _Fp)


def g1_clear_cofactor(pt):
    """Effective-cofactor clearing: multiply by 1+|x| (ecp_BLS12381.cpp:1252,
    rom CURVE_Cof)."""
    return g1_mul_int(pt, H_EFF_G1)


def g1_in_subgroup(pt):
    """r-torsion membership: [r]P == O (semantic contract of
    PAIR_G1member, pair_BLS12381.cpp:1100-1130)."""
    return g1_is_on_curve(pt) and _j_mul(pt, R, _Fp) is None


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
    return _j_to_affine(_j_mul(pt, k % R, _Fp2), _Fp2)


def g2_mul2(p, a, q, b):
    """a*P + b*Q in G2, one joint ladder."""
    if p is None or a % R == 0:
        return g2_mul(q, b)
    if q is None or b % R == 0:
        return g2_mul(p, a)
    return _j_to_affine(_j_mul2(p, a % R, q, b % R, _Fp2), _Fp2)


def g2_msm(points, scalars):
    """G2 multi-scalar multiplication (host Pippenger)."""
    pairs = [(p, k) for p, k in zip(points, scalars) if p is not None]
    if not pairs:
        return None
    pts, ks = zip(*pairs)
    return _j_to_affine(_j_msm(list(pts), list(ks), _Fp2), _Fp2)


def g2_in_subgroup(pt):
    """r-torsion membership: [r]Q == O (PAIR_G2member contract,
    pair_BLS12381.cpp:1132-1160)."""
    return g2_is_on_curve(pt) and _j_mul(pt, R, _Fp2) is None


def g2_eq(p1, p2):
    return p1 == p2
