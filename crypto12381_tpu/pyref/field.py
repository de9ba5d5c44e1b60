"""Exact (arbitrary-precision) BLS12-381 field tower — host-side reference.

This is the framework's *oracle*: every JAX/Pallas field kernel is
differentially tested against these plain-integer implementations, and these
in turn are validated bit-for-bit against the reference build
(tools/oracle -> tests/vectors/*).  Mirrors the capability of the reference's
fp/fp2/fp4/fp12 MIRACL units (3rd-party/miracl-core/fp*_BLS12381.cpp) but is
an independent implementation over Python ints.

Representations:
  Fp   : int in [0, p)
  Fp2  : (real, imag)                     a + b*i,  i^2 = -1
  Fp6  : (c0, c1, c2) of Fp2              c0 + c1*v + c2*v^2,  v^3 = xi = 1+i
  Fp12 : (a, b) of Fp6                    a + b*w,  w^2 = v
"""

from __future__ import annotations

from ..params import P, R

# --------------------------------------------------------------------- Fp

def fp_add(a, b):
    return (a + b) % P


def fp_sub(a, b):
    return (a - b) % P


def fp_mul(a, b):
    return (a * b) % P


def fp_neg(a):
    return (-a) % P


def fp_inv(a):
    return pow(a, -1, P)


def fp_sqrt(a):
    """Principal root a^((p+1)/4); p = 3 mod 4.  Returns None if non-residue.

    Matches MIRACL FP_sqrt (fp_BLS12381.cpp:674-900): progenitor method
    computes the same value for residues.
    """
    r = pow(a, (P + 1) // 4, P)
    if (r * r) % P != a % P:
        return None
    return r


def fp_is_qr(a):
    return a % P == 0 or pow(a, (P - 1) // 2, P) == 1


def fp_sign(a):
    """Parity sign convention: FP_sign = BIG_parity (fp_BLS12381.cpp:928-934)."""
    return a & 1


def fp_islarger(a):
    """-1 / 0 / 1 as in MIRACL FP_islarger (fp_BLS12381.cpp:342-350)."""
    if a == 0:
        return 0
    s = (P - a) % P
    return 1 if a > s else (-1 if a < s else 0)


# --------------------------------------------------------------------- Fp2

FP2_ZERO = (0, 0)
FP2_ONE = (1, 0)


def fp2_add(x, y):
    return ((x[0] + y[0]) % P, (x[1] + y[1]) % P)


def fp2_sub(x, y):
    return ((x[0] - y[0]) % P, (x[1] - y[1]) % P)


def fp2_neg(x):
    return ((-x[0]) % P, (-x[1]) % P)


def fp2_mul(x, y):
    a, b = x
    c, d = y
    return ((a * c - b * d) % P, (a * d + b * c) % P)


def fp2_sqr(x):
    a, b = x
    return ((a + b) * (a - b) % P, 2 * a * b % P)


def fp2_scalar(x, k):
    return (x[0] * k % P, x[1] * k % P)


def fp2_conj(x):
    return (x[0], (-x[1]) % P)


def fp2_inv(x):
    a, b = x
    t = pow(a * a + b * b, -1, P)
    return (a * t % P, (-b * t) % P)


def fp2_mul_xi(x):
    """Multiply by xi = 1+i (MIRACL FP2_mul_ip with QNRI=0, NEGATOWER)."""
    a, b = x
    return ((a - b) % P, (a + b) % P)


def fp2_is_zero(x):
    return x[0] % P == 0 and x[1] % P == 0


def fp2_sign(x):
    """FP2_sign (fp2_BLS12381.cpp:168-181): parity of real part, or of imag
    part when real is zero."""
    p1 = fp_sign(x[0])
    p2 = fp_sign(x[1])
    if x[0] % P == 0:
        return p2
    return p1


def fp2_islarger(x):
    """FP2_islarger: compare imag part first, then real (fp2_BLS12381.cpp)."""
    if fp2_is_zero(x):
        return 0
    cmp = fp_islarger(x[1])
    if cmp != 0:
        return cmp
    return fp_islarger(x[0])


def fp2_sqrt(x):
    """Deterministic Fp2 square root matching MIRACL FP2_sqrt's sign fix:
    returns the root with FP2_sign == 0.  None if non-residue."""
    a, b = x
    if b % P == 0:
        r = fp_sqrt(a)
        if r is None:
            # sqrt(a) = sqrt(-a) * i
            r = fp_sqrt((-a) % P)
            if r is None:
                return None
            cand = (0, r)
        else:
            cand = (r, 0)
    else:
        # norm = a^2 + b^2; s = sqrt(norm); t = sqrt((a+s)/2) (or (a-s)/2)
        s = fp_sqrt((a * a + b * b) % P)
        if s is None:
            return None
        t2 = (a + s) * pow(2, -1, P) % P
        t = fp_sqrt(t2)
        if t is None:
            t2 = (a - s) * pow(2, -1, P) % P
            t = fp_sqrt(t2)
            if t is None:
                return None
        im = b * pow(2 * t, -1, P) % P
        cand = (t, im)
    if fp2_sign(cand) == 1:
        cand = fp2_neg(cand)
    # verify
    if fp2_sqr(cand) != (a % P, b % P):
        return None
    return cand


# --------------------------------------------------------------------- Fp6

FP6_ZERO = (FP2_ZERO, FP2_ZERO, FP2_ZERO)
FP6_ONE = (FP2_ONE, FP2_ZERO, FP2_ZERO)


def fp6_add(x, y):
    return tuple(fp2_add(a, b) for a, b in zip(x, y))


def fp6_sub(x, y):
    return tuple(fp2_sub(a, b) for a, b in zip(x, y))


def fp6_neg(x):
    return tuple(fp2_neg(a) for a in x)


def fp6_mul(x, y):
    a0, a1, a2 = x
    b0, b1, b2 = y
    t0 = fp2_mul(a0, b0)
    t1 = fp2_mul(a1, b1)
    t2 = fp2_mul(a2, b2)
    c0 = fp2_add(t0, fp2_mul_xi(fp2_sub(fp2_mul(fp2_add(a1, a2), fp2_add(b1, b2)), fp2_add(t1, t2))))
    c1 = fp2_add(fp2_sub(fp2_mul(fp2_add(a0, a1), fp2_add(b0, b1)), fp2_add(t0, t1)), fp2_mul_xi(t2))
    c2 = fp2_add(fp2_sub(fp2_mul(fp2_add(a0, a2), fp2_add(b0, b2)), fp2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fp6_sqr(x):
    return fp6_mul(x, x)


def fp6_mul_by_v(x):
    """Multiply by v: (c0,c1,c2) -> (xi*c2, c0, c1)."""
    return (fp2_mul_xi(x[2]), x[0], x[1])


def fp6_inv(x):
    a0, a1, a2 = x
    t0 = fp2_sub(fp2_sqr(a0), fp2_mul_xi(fp2_mul(a1, a2)))
    t1 = fp2_sub(fp2_mul_xi(fp2_sqr(a2)), fp2_mul(a0, a1))
    t2 = fp2_sub(fp2_sqr(a1), fp2_mul(a0, a2))
    d = fp2_add(fp2_mul(a0, t0), fp2_mul_xi(fp2_add(fp2_mul(a2, t1), fp2_mul(a1, t2))))
    di = fp2_inv(d)
    return (fp2_mul(t0, di), fp2_mul(t1, di), fp2_mul(t2, di))


# --------------------------------------------------------------------- Fp12

FP12_ZERO = (FP6_ZERO, FP6_ZERO)
FP12_ONE = (FP6_ONE, FP6_ZERO)


def fp12_add(x, y):
    return (fp6_add(x[0], y[0]), fp6_add(x[1], y[1]))


def fp12_mul(x, y):
    a0, a1 = x
    b0, b1 = y
    t0 = fp6_mul(a0, b0)
    t1 = fp6_mul(a1, b1)
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(b0, b1)), t0), t1)
    return (c0, c1)


def fp12_sqr(x):
    return fp12_mul(x, x)


def fp12_conj(x):
    """Conjugation by the p^6 Frobenius: (a, b) -> (a, -b)."""
    return (x[0], fp6_neg(x[1]))


def fp12_inv(x):
    a0, a1 = x
    d = fp6_sub(fp6_sqr(a0), fp6_mul_by_v(fp6_sqr(a1)))
    di = fp6_inv(d)
    return (fp6_mul(a0, di), fp6_neg(fp6_mul(a1, di)))


def fp12_pow(x, e):
    if e < 0:
        return fp12_pow(fp12_inv(x), -e)
    result = FP12_ONE
    base = x
    while e:
        if e & 1:
            result = fp12_mul(result, base)
        base = fp12_sqr(base)
        e >>= 1
    return result


def fp12_eq(x, y):
    return _fp12_canon(x) == _fp12_canon(y)


def _fp12_canon(x):
    return tuple(tuple((c[0] % P, c[1] % P) for c in h) for h in x)


def fp12_coeffs_w(x):
    """Return the 6 Fp2 coefficients (C0..C5) over the w-basis {w^k}.

    C0=a.c0, C2=a.c1, C4=a.c2, C1=b.c0, C3=b.c1, C5=b.c2 where x = a + b*w,
    v = w^2.  Used by the GT byte codec (compat/codec.py) to match the
    reference's FP12_toOctet grouping (fp12_BLS12381.cpp:923-930).
    """
    a, b = x
    return (a[0], b[0], a[1], b[1], a[2], b[2])


def fp12_from_coeffs_w(c):
    return ((c[0], c[2], c[4]), (c[1], c[3], c[5]))


# ----------------------------------------------------------------- Frobenius

def _frob_constants():
    """gamma[k] = xi^((p^k - 1)/6) drives x -> x^p on the w-basis."""
    # xi = 1 + i; compute xi^((p-1)/6) in Fp2
    e = (P - 1) // 6
    base = (1, 1)
    g = FP2_ONE
    b = base
    ee = e
    while ee:
        if ee & 1:
            g = fp2_mul(g, b)
        b = fp2_sqr(b)
        ee >>= 1
    return g


FROB_GAMMA = _frob_constants()  # xi^((p-1)/6)


def fp12_frob(x):
    """x -> x^p using w-basis coefficients: C_k -> conj(C_k) * gamma^k."""
    cs = fp12_coeffs_w(x)
    out = []
    gk = FP2_ONE
    for k, c in enumerate(cs):
        if k:
            gk = fp2_mul(gk, FROB_GAMMA)
        out.append(fp2_mul(fp2_conj(c), gk))
    return fp12_from_coeffs_w(tuple(out))


# --------------------------------------------------------------------- Fr

def fr_add(a, b):
    return (a + b) % R


def fr_sub(a, b):
    return (a - b) % R


def fr_mul(a, b):
    return (a * b) % R


def fr_neg(a):
    return (-a) % R


def fr_inv(a):
    return pow(a, -1, R)
