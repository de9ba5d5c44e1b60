"""Exact optimal-ate pairing — host-side reference.

Independent of the reference's PAIR unit (pair_BLS12381.cpp:425-757) but
computes the identical *reduced* pairing value: the Miller function here uses
the mathematically transparent route (untwist G2 points into E(Fp12) and run
generic line evaluations), and the final exponentiation is the full generic
power (p^12-1)/r.  Any denominators/vertical factors that differ from the
reference's fused-line formulation are killed by the final exponentiation, so
serialized GT outputs agree bit-for-bit (validated by tests/test_vectors.py).

Slow (pure Python) — used only to generate/verify test vectors.
"""

from __future__ import annotations

from ..params import P, R, X_ABS
from . import field as F

# v = w^2, w in Fp12; untwist psi: E'(Fp2) -> E(Fp12), (x,y) -> (x/v, y/(v*w))
# (M-type twist with w^6 = xi, see params tower notes).

_W = (F.FP6_ZERO, F.FP6_ONE)  # w  = 0 + 1*w  ... (Fp6 one in the b slot)


def _fp12_from_fp2(c, pos):
    """Embed an Fp2 value at w-basis position pos (0..5)."""
    coeffs = [F.FP2_ZERO] * 6
    coeffs[pos] = c
    return F.fp12_from_coeffs_w(tuple(coeffs))


def _untwist(q):
    """Map a twisted-curve point into E(Fp12)."""
    x, y = q
    xw = _fp12_from_fp2(x, 0)
    yw = _fp12_from_fp2(y, 0)
    # 1/v = v^2/xi -> w-basis pos 4 coefficient xi^{-1}; 1/(v*w) = w-pos ... use
    # generic inversion for clarity (pyref only cares about correctness).
    v = _fp12_from_fp2(F.FP2_ONE, 2)      # v = w^2
    vw = _fp12_from_fp2(F.FP2_ONE, 3)     # v*w = w^3
    return (F.fp12_mul(xw, F.fp12_inv(v)), F.fp12_mul(yw, F.fp12_inv(vw)))


def _line(t, q, s):
    """Evaluate the line through t,q (or tangent at t if t==q) at point s.

    All points are on E(Fp12) in affine coords (pairs of Fp12).
    """
    xt, yt = t
    xq, yq = q
    xs, ys = s
    if xt == xq and yt == yq:
        num = F.fp12_mul(F.fp12_mul(xt, xt), (F.fp12_from_coeffs_w(((3, 0), (0, 0), (0, 0), (0, 0), (0, 0), (0, 0)))))
        den = F.fp12_add(yt, yt)
        lam = F.fp12_mul(num, F.fp12_inv(den))
    elif xt == xq:
        # vertical line x = xt
        return F.fp12_add(xs, _neg12(xt))
    else:
        lam = F.fp12_mul(F.fp12_add(yq, _neg12(yt)), F.fp12_inv(F.fp12_add(xq, _neg12(xt))))
    # l = (ys - yt) - lam*(xs - xt)
    return F.fp12_add(F.fp12_add(ys, _neg12(yt)), _neg12(F.fp12_mul(lam, F.fp12_add(xs, _neg12(xt)))))


def _neg12(x):
    return (F.fp6_neg(x[0]), F.fp6_neg(x[1]))


def _ec12_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if F.fp12_add(y1, y2) == F.FP12_ZERO or all(
            c == (0, 0) for c in F.fp12_coeffs_w(F.fp12_add(y1, y2))
        ):
            return None
        num = F.fp12_mul(F.fp12_mul(x1, x1), F.fp12_from_coeffs_w(((3, 0),) + ((0, 0),) * 5))
        lam = F.fp12_mul(num, F.fp12_inv(F.fp12_add(y1, y1)))
    else:
        lam = F.fp12_mul(F.fp12_add(y2, _neg12(y1)), F.fp12_inv(F.fp12_add(x2, _neg12(x1))))
    x3 = F.fp12_add(F.fp12_add(F.fp12_mul(lam, lam), _neg12(x1)), _neg12(x2))
    y3 = F.fp12_add(F.fp12_mul(lam, F.fp12_add(x1, _neg12(x3))), _neg12(y1))
    return (x3, y3)


def miller_loop(p, q):
    """f_{|x|, Q}(P) over E(Fp12); p in G1 (ints), q in G2 (Fp2 pairs)."""
    px, py = p
    s = (F.fp12_from_coeffs_w(((px, 0),) + ((0, 0),) * 5),
         F.fp12_from_coeffs_w(((py, 0),) + ((0, 0),) * 5))
    qq = _untwist(q)
    f = F.FP12_ONE
    t = qq
    bits = bin(X_ABS)[3:]  # skip MSB
    for bit in bits:
        f = F.fp12_mul(F.fp12_sqr(f), _line(t, t, s))
        t = _ec12_add(t, t)
        if bit == "1":
            f = F.fp12_mul(f, _line(t, qq, s))
            t = _ec12_add(t, qq)
    # x is negative: f_{x} = conj(f_{|x|}) up to factors killed by fexp
    return F.fp12_conj(f)


def final_exp(f):
    return F.fp12_pow(f, (P**12 - 1) // R)


def pairing(p, q):
    """Reduced pairing with the *reference's* normalization.

    MIRACL's PAIR_ate iterates the Miller loop over the bits of n3 = 3|x|
    (the NAF-via-3n trick, pair_BLS12381.cpp:425-505), so its reduced value
    is the cube of the textbook optimal-ate pairing: e_ref(P,Q) =
    e_ate(P,Q)^3.  Cubing preserves bilinearity/non-degeneracy (3 does not
    divide r) and is required for bit-exact GT serialization
    (tests/test_vectors_pyref.py::test_pairing_gt_bytes).
    """
    if p is None or q is None:
        return F.FP12_ONE
    e = final_exp(miller_loop(p, q))
    return F.fp12_mul(F.fp12_sqr(e), e)
