"""Batched Fp2/Fp6/Fp12 tower arithmetic on TPU.

TPU-native counterpart of the reference's fp2/fp4/fp12 MIRACL units
(3rd-party/miracl-core/fp{2,4,12}_BLS12381.cpp).  Same field, different
grouping: we use the standard Fp6/Fp2 tower (v^3 = xi = 1+i, w^2 = v) whose
w-basis coefficients coincide with the reference's Fp4 tower — see
compat/codec.py for the byte-order mapping.

Key TPU design point: every tower multiplication *collects all its base-Fp
multiplications into one stacked mont_mul call* (a leading stacked axis),
so the limb-product MXU contraction stays large no matter how high in the
tower we are (an Fp12 mul = 54 Fp muls in a single kernel-sized batch).

Shapes (engine limb arrays; L is the active engine's limb count — 25 int32
limbs for the int16 engine, 50 float32 digits for the fp32 engine):
  Fp2  : (..., 2, L)       [c_re, c_im]
  Fp6  : (..., 3, 2, L)    coefficients of 1, v, v^2
  Fp12 : (..., 2, 3, 2, L) coefficients of 1, w
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..params import P
from ..pyref import field as PF
from . import active as FP

CTX = FP.FP_CTX
L = CTX.L

try:  # fused single-kernel tower ops (fp32 engine only)
    from . import fp32k as FK
except Exception:  # pragma: no cover
    FK = None


def _fused_on() -> bool:
    return FK is not None and FK.enabled()


def _flat12(x):
    """fp12 (..., 2, 3, 2, L) -> 12 component arrays (..., L) in
    [h][c][re/im] order (a pure reshape — the memory order already agrees
    with fp32k's component convention)."""
    batch = x.shape[:-4]
    v = x.reshape(batch + (12, L))
    return [v[..., i, :] for i in range(12)], batch


def _unflat12(comps, batch):
    return jnp.stack(comps, axis=-2).reshape(batch + (2, 3, 2, L))


def _dispatch12(fn, *arrs12):
    """Run a fused composite over fp12 arrays (promoting a scalar batch to
    (1,) — the composites stack instances along axis 0)."""
    arrs12 = jnp.broadcast_arrays(*arrs12)
    scalar = arrs12[0].ndim == 4
    if scalar:
        arrs12 = [a[None] for a in arrs12]
    comps = []
    batch = arrs12[0].shape[:-4]
    for a in arrs12:
        cs, batch = _flat12(a)
        comps.append(cs)
    out = _unflat12(fn(*comps), batch)
    return out[0] if scalar else out


# ---------------------------------------------------------------------------
# Fp2
# ---------------------------------------------------------------------------


def fp2_add(a, b):
    return FP.add(CTX, a, b)


def fp2_sub(a, b, bmax: int = 26):
    return FP.sub(CTX, a, b, bmax)


def fp2_neg(a, bmax: int = 26):
    return FP.neg(CTX, a, bmax)


def fp2_conj(a):
    return jnp.stack([a[..., 0, :], FP.neg(CTX, a[..., 1, :])], axis=-2)


def fp2_mul_xi(a, bmax: int = 26):
    """Multiply by xi = 1+i: (re, im) -> (re-im, re+im).  bmax bounds the
    operand's limbs for the raw subtraction (see fp.sub contract)."""
    re, im = a[..., 0, :], a[..., 1, :]
    return jnp.stack([FP.sub(CTX, re, im, bmax), FP.add(CTX, re, im)], axis=-2)


def fp2_mul_small(a, k: int):
    return FP.mul_small(CTX, a, k)


def fp2_mul_fp(a, s):
    """Multiply both coefficients by an Fp element s (..., L)."""
    return FP.mont_mul(CTX, a, s[..., None, :])


def fp2_mul_many(pairs):
    """Karatsuba Fp2 products for a list of (a, b); 3 Fp muls each, all in
    one stacked multiplication (one fused kernel launch when available)."""
    if _fused_on():
        k = len(pairs)
        ab = jnp.broadcast_arrays(*[c for p in pairs for c in p])
        batch = ab[0].shape[:-2]
        flat = [c.reshape((-1,) + c.shape[len(batch):]) for c in ab]
        a0 = jnp.concatenate([flat[2 * i][..., 0, :] for i in range(k)], 0)
        a1 = jnp.concatenate([flat[2 * i][..., 1, :] for i in range(k)], 0)
        b0 = jnp.concatenate([flat[2 * i + 1][..., 0, :] for i in range(k)], 0)
        b1 = jnp.concatenate([flat[2 * i + 1][..., 1, :] for i in range(k)], 0)
        o_re, o_im = FK.fused("fp2_mul", a0, a1, b0, b1)
        n = o_re.shape[0] // k
        out = []
        for i in range(k):
            re = o_re[i * n : (i + 1) * n].reshape(batch + (L,))
            im = o_im[i * n : (i + 1) * n].reshape(batch + (L,))
            out.append(jnp.stack([re, im], axis=-2))
        return out
    xs, ys = [], []
    for a, b in pairs:
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        xs += [a0, a1, FP.add(CTX, a0, a1)]
        ys += [b0, b1, FP.add(CTX, b0, b1)]
    T = FP.mont_mul(CTX, jnp.stack(xs, axis=-2), jnp.stack(ys, axis=-2))
    out = []
    for i in range(len(pairs)):
        t0, t1, t2 = T[..., 3 * i, :], T[..., 3 * i + 1, :], T[..., 3 * i + 2, :]
        re = FP.sub(CTX, t0, t1, 17)
        im = FP.sub(CTX, t2, FP.add(CTX, t0, t1), 17)
        out.append(jnp.stack([re, im], axis=-2))
    return out


def fp2_mul(a, b):
    return fp2_mul_many([(a, b)])[0]


def fp2_sqr(a):
    """(a0+a1)(a0-a1), 2*a0*a1 — two Fp muls in one call."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    X = jnp.stack([FP.add(CTX, a0, a1), a0], axis=-2)
    Y = jnp.stack([FP.sub(CTX, a0, a1, 26), FP.double(CTX, a1)], axis=-2)
    T = FP.mont_mul(CTX, X, Y)
    return T  # already (..., 2, L): [re, im]


def fp2_sqr_many(elems):
    """Squares of a list of Fp2 elements — 2 Fp muls each, all in one
    stacked mont_mul (same trick as fp2_mul_many)."""
    if _fused_on():
        k = len(elems)
        es = jnp.broadcast_arrays(*elems)
        batch = es[0].shape[:-2]
        flat = [c.reshape((-1,) + c.shape[len(batch):]) for c in es]
        a0 = jnp.concatenate([f[..., 0, :] for f in flat], 0)
        a1 = jnp.concatenate([f[..., 1, :] for f in flat], 0)
        o_re, o_im = FK.fused("fp2_sqr", a0, a1)
        n = o_re.shape[0] // k
        return [
            jnp.stack(
                [o_re[i * n : (i + 1) * n].reshape(batch + (L,)),
                 o_im[i * n : (i + 1) * n].reshape(batch + (L,))], axis=-2
            )
            for i in range(k)
        ]
    xs, ys = [], []
    for a in elems:
        a0, a1 = a[..., 0, :], a[..., 1, :]
        xs += [FP.add(CTX, a0, a1), a0]
        ys += [FP.sub(CTX, a0, a1, 26), FP.double(CTX, a1)]
    T = FP.mont_mul(CTX, jnp.stack(xs, axis=-2), jnp.stack(ys, axis=-2))
    return [T[..., 2 * i : 2 * i + 2, :] for i in range(len(elems))]


def fp2_inv(a):
    a0, a1 = a[..., 0, :], a[..., 1, :]
    T = FP.mont_mul(CTX, jnp.stack([a0, a1], -2), jnp.stack([a0, a1], -2))
    d = FP.add(CTX, T[..., 0, :], T[..., 1, :])
    di = FP.inv(CTX, d)
    # bmax 17 on the fresh REDC output keeps the negated value small
    # (~21p): products of two loose operands must stay under the 2^22*p^2
    # REDC top-limb budget.
    return jnp.stack(
        [FP.mont_mul(CTX, a0, di), FP.neg(CTX, FP.mont_mul(CTX, a1, di), 17)],
        axis=-2,
    )


def fp2_is_zero(a):
    return jnp.logical_and(
        FP.is_zero(CTX, a[..., 0, :]), FP.is_zero(CTX, a[..., 1, :])
    )


def fp2_eq(a, b):
    return jnp.logical_and(
        FP.eq(CTX, a[..., 0, :], b[..., 0, :]),
        FP.eq(CTX, a[..., 1, :], b[..., 1, :]),
    )


def fp2_zero(batch=()):
    return FP.zero(CTX, batch + (2,))


def fp2_one(batch=()):
    return jnp.stack([FP.one(CTX, batch), FP.zero(CTX, batch)], axis=-2)


# ---------------------------------------------------------------------------
# Fp6 (c0 + c1 v + c2 v^2)
# ---------------------------------------------------------------------------


def _c(x, i):
    return x[..., i, :, :]


def fp6_stack(c0, c1, c2):
    return jnp.stack([c0, c1, c2], axis=-3)


def fp6_add(a, b):
    return FP.add(CTX, a, b)


def fp6_sub(a, b, bmax: int = 26):
    return FP.sub(CTX, a, b, bmax)


def fp6_neg(a, bmax: int = 26):
    return FP.neg(CTX, a, bmax)


def fp6_mul_by_v(a, bmax: int = 28):
    """(c0,c1,c2) -> (xi*c2, c0, c1)."""
    return fp6_stack(fp2_mul_xi(_c(a, 2), bmax), _c(a, 0), _c(a, 1))


def _fp6_pairs(a, b):
    """The 6 Fp2 products of one Fp6 Karatsuba multiplication."""
    a0, a1, a2 = _c(a, 0), _c(a, 1), _c(a, 2)
    b0, b1, b2 = _c(b, 0), _c(b, 1), _c(b, 2)
    return [
        (a0, b0),
        (a1, b1),
        (a2, b2),
        (fp2_add(a0, a1), fp2_add(b0, b1)),
        (fp2_add(a1, a2), fp2_add(b1, b2)),
        (fp2_add(a0, a2), fp2_add(b0, b2)),
    ]


def _fp6_combine(t):
    # operands are fp2 products (tier T1: limbs < 2^18); sums of two are
    # < 2^19 -> K22 floors; nested sub/xi climb the tier ladder 22 -> 26.
    t0, t1, t2, m01, m12, m02 = t
    c0 = fp2_add(t0, fp2_mul_xi(fp2_sub(m12, fp2_add(t1, t2), 22), 26))
    c1 = fp2_add(fp2_sub(m01, fp2_add(t0, t1), 22), fp2_mul_xi(t2, 22))
    c2 = fp2_add(fp2_sub(m02, fp2_add(t0, t2), 22), t1)
    return fp6_stack(c0, c1, c2)


def fp6_mul_many(pairs):
    """Batch any number of Fp6 products through one stacked Fp mul
    (one fused fp6_mul kernel launch, instances row-stacked, when
    available).

    Outputs are tightened (limbs < 2^18, zero top limb, value ~10p): they
    may be multiplied or subtracted freely downstream."""
    if _fused_on():
        k = len(pairs)
        ab = jnp.broadcast_arrays(*[c for p in pairs for c in p])
        batch = ab[0].shape[:-3]
        flat = [c.reshape((-1,) + c.shape[len(batch):]) for c in ab]
        comps = []
        for side in (0, 1):
            for ci in range(3):
                for j in (0, 1):
                    comps.append(
                        jnp.concatenate(
                            [flat[2 * i + side][..., ci, j, :]
                             for i in range(k)], 0
                        )
                    )
        outs = FK.fused("fp6_mul", *comps)
        n = outs[0].shape[0] // k
        res = []
        for i in range(k):
            cs = [o[i * n : (i + 1) * n].reshape(batch + (L,)) for o in outs]
            res.append(
                fp6_stack(
                    jnp.stack(cs[0:2], -2),
                    jnp.stack(cs[2:4], -2),
                    jnp.stack(cs[4:6], -2),
                )
            )
        return res
    fp2_pairs = []
    for a, b in pairs:
        fp2_pairs += _fp6_pairs(a, b)
    prods = fp2_mul_many(fp2_pairs)
    return [
        FP.tighten(CTX, _fp6_combine(prods[6 * i : 6 * i + 6]))
        for i in range(len(pairs))
    ]


def fp6_mul(a, b):
    return fp6_mul_many([(a, b)])[0]


def fp6_sqr(a):
    return fp6_mul(a, a)


def fp6_inv(a):
    a0, a1, a2 = _c(a, 0), _c(a, 1), _c(a, 2)
    sq = fp2_mul_many([(a0, a0), (a1, a1), (a2, a2), (a1, a2), (a0, a1), (a0, a2)])
    s0, s1, s2, s12, s01, s02 = sq
    t0 = fp2_sub(s0, fp2_mul_xi(s12, 22), 26)   # s's are T1 (< 2^18)
    t1 = fp2_sub(fp2_mul_xi(s2, 22), s01, 22)
    t2 = fp2_sub(s1, s02, 22)
    parts = fp2_mul_many([(a0, t0), (a2, t1), (a1, t2)])
    d = fp2_add(parts[0], fp2_mul_xi(fp2_add(parts[1], parts[2]), 22))
    di = fp2_inv(d)
    outs = fp2_mul_many([(t0, di), (t1, di), (t2, di)])
    return fp6_stack(*outs)


def fp6_zero(batch=()):
    return FP.zero(CTX, batch + (3, 2))


def fp6_one(batch=()):
    return fp6_stack(fp2_one(batch), fp2_zero(batch), fp2_zero(batch))


# ---------------------------------------------------------------------------
# Fp12 (a + b w)
# ---------------------------------------------------------------------------


def _h(x, i):
    return x[..., i, :, :, :]


def fp12_stack(a, b):
    return jnp.stack([a, b], axis=-4)


def fp12_mul(x, y):
    if _fused_on():
        return _dispatch12(FK.fp12_mul_c, x, y)
    a0, a1 = _h(x, 0), _h(x, 1)
    b0, b1 = _h(y, 0), _h(y, 1)
    t0, t1, m = fp6_mul_many(
        [(a0, b0), (a1, b1), (fp6_add(a0, a1), fp6_add(b0, b1))]
    )
    c0 = fp6_add(t0, fp6_mul_by_v(t1, 22))
    c1 = fp6_sub(m, fp6_add(t0, t1), 22)
    return FP.tighten(CTX, fp12_stack(c0, c1))


def fp12_sqr(x):
    """Complex-squaring style: c0 = (a+b)(a+vb) - m - vm, c1 = 2m with
    m = a*b — 2 Fp6 muls."""
    if _fused_on():
        return _dispatch12(FK.fp12_sqr_c, x)
    a, b = _h(x, 0), _h(x, 1)
    t, m = fp6_mul_many([(fp6_add(a, b), fp6_add(a, fp6_mul_by_v(b, 22))), (a, b)])
    c0 = fp6_sub(t, fp6_add(m, fp6_mul_by_v(m, 22)), 26)
    c1 = fp6_add(m, m)
    return FP.tighten(CTX, fp12_stack(c0, c1))


def fp12_usqr(x):
    """Cyclotomic (Granger-Scott) squaring — valid ONLY for elements of the
    cyclotomic subgroup (e.g. anything past the easy final-exp part, i.e.
    all reduced-pairing values).  9 Fp2 squarings = 18 Fp muls, vs 30 for
    the dense fp12_sqr.  TPU counterpart of FP12_usqr
    (fp12_BLS12381.cpp:236-282).

    Uses the three Fp4 subalgebras spanned by (1, w^3): with a=(a0,a1,a2),
    b=(b0,b1,b2) the pairs are (a0,b1), (b0,a2), (a1,b2); an Fp4 square
    (A,B) -> (A^2 + xi B^2, 2AB) and the cyclotomic identity reassemble the
    full square from the 9 component squares.
    """
    if _fused_on():
        return _dispatch12(FK.fp12_usqr_c, x)
    a, b = _h(x, 0), _h(x, 1)
    a0, a1, a2 = _c(a, 0), _c(a, 1), _c(a, 2)
    b0, b1, b2 = _c(b, 0), _c(b, 1), _c(b, 2)
    sq = fp2_sqr_many(
        [
            b1, a0, fp2_add(b1, a0),
            a2, b0, fp2_add(a2, b0),
            b2, a1, fp2_add(b2, a1),
        ]
    )
    t0, t1, s01, t2, t3, s23, t4, t5, s45 = sq
    # cross terms 2*X*Y = (X+Y)^2 - X^2 - Y^2   (all operands tier T1)
    t6 = fp2_sub(s01, fp2_add(t0, t1), 22)            # 2 a0 b1
    t7 = fp2_sub(s23, fp2_add(t2, t3), 22)            # 2 a2 b0
    t8 = fp2_mul_xi(fp2_sub(s45, fp2_add(t4, t5), 22), 26)  # 2 xi a1 b2
    # Fp4 square real parts: xi*B^2 + A^2
    u0 = fp2_add(fp2_mul_xi(t0, 22), t1)              # xi b1^2 + a0^2
    u2 = fp2_add(fp2_mul_xi(t2, 22), t3)              # xi a2^2 + b0^2
    u4 = fp2_add(fp2_mul_xi(t4, 22), t5)              # xi b2^2 + a1^2
    two = lambda z: FP.add(CTX, z, z)
    three = lambda z: FP.add(CTX, two(z), z)
    c0 = fp6_stack(
        fp2_sub(three(u0), two(a0), 26),
        fp2_sub(three(u2), two(a1), 26),
        fp2_sub(three(u4), two(a2), 26),
    )
    c1 = fp6_stack(
        fp2_add(three(t8), two(b0)),
        fp2_add(three(t6), two(b1)),
        fp2_add(three(t7), two(b2)),
    )
    return FP.tighten(CTX, fp12_stack(c0, c1))


def fp12_conj(x):
    """Conjugation; output tightened (it feeds squaring chains in fexp)."""
    return FP.tighten(CTX, fp12_stack(_h(x, 0), fp6_neg(_h(x, 1), 22)))


def fp12_inv(x):
    a, b = _h(x, 0), _h(x, 1)
    t0, t1 = fp6_mul_many([(a, a), (b, b)])
    d = FP.tighten(CTX, fp6_sub(t0, fp6_mul_by_v(t1, 22), 26))
    di = fp6_inv(d)
    o0, o1 = fp6_mul_many([(a, di), (b, di)])
    return fp12_stack(o0, fp6_neg(o1))


def fp12_add(x, y):
    return FP.add(CTX, x, y)


def fp12_eq(x, y):
    a = FP.reduce_full(CTX, x)
    b = FP.reduce_full(CTX, y)
    return jnp.all(a == b, axis=(-1, -2, -3, -4))


def fp12_is_one(x):
    return fp12_eq(x, fp12_one(x.shape[:-4]))


def fp12_zero(batch=()):
    return FP.zero(CTX, batch + (2, 3, 2))


def fp12_one(batch=()):
    return fp12_stack(fp6_one(batch), fp6_zero(batch))


# --------------------------------------------------------------- w-basis


def fp12_coeffs_w(x):
    """6 Fp2 coefficients over the w-basis: C0=a.c0, C1=b.c0, C2=a.c1,
    C3=b.c1, C4=a.c2, C5=b.c2."""
    a, b = _h(x, 0), _h(x, 1)
    return [_c(a, 0), _c(b, 0), _c(a, 1), _c(b, 1), _c(a, 2), _c(b, 2)]


def fp12_from_coeffs_w(cs):
    a = fp6_stack(cs[0], cs[2], cs[4])
    b = fp6_stack(cs[1], cs[3], cs[5])
    return fp12_stack(a, b)


# ------------------------------------------------------------- Frobenius


@functools.lru_cache(maxsize=None)
def _frob_gammas(n: int) -> np.ndarray:
    """gamma_{n,k} = xi^(k*(p^n-1)/6) for k=0..5 as (6, 2, L) Montgomery
    limbs (host-computed once with exact ints)."""
    e = (pow(P, n) - 1) // 6
    base = (1, 1)

    def fp2_pow(x, k):  # exact-int Fp2 powering
        r = (1, 0)
        while k:
            if k & 1:
                r = PF.fp2_mul(r, x)
            x = PF.fp2_sqr(x)
            k >>= 1
        return r

    gamma = fp2_pow(base, e)
    acc = (1, 0)
    rows = []
    for k in range(6):
        rows.append(
            np.stack([FP.mont_const(CTX, acc[0]), FP.mont_const(CTX, acc[1])])
        )
        acc = PF.fp2_mul(acc, gamma)
    return np.stack(rows)


def fp12_frob(x, n: int = 1):
    """x -> x^(p^n): C_k -> conj^n(C_k) * gamma_{n,k}."""
    cs = fp12_coeffs_w(x)
    gammas = jnp.asarray(_frob_gammas(n))
    outs = []
    for k in range(6):
        c = fp2_conj(cs[k]) if n % 2 == 1 else cs[k]
        outs.append(fp2_mul(c, jnp.broadcast_to(gammas[k], c.shape)))
    return fp12_from_coeffs_w(outs)


# ----------------------------------------------------- host conversions


def fp12_from_pyref(v, batch=False):
    """pyref Fp12 tuple -> device array (single element)."""
    cs = PF.fp12_coeffs_w(v)
    arrs = []
    for re, im in cs:
        arrs.append(
            jnp.stack(
                [FP.from_int(CTX, re), FP.from_int(CTX, im)], axis=-2
            )
        )
    return fp12_from_coeffs_w(arrs)


def fp12_to_pyref(x):
    """device array (single element, no batch dims) -> pyref Fp12 tuple."""
    cs = fp12_coeffs_w(x)
    out = []
    for c in cs:
        re = int(FP.to_int(CTX, c[..., 0, :]))
        im = int(FP.to_int(CTX, c[..., 1, :]))
        out.append((re, im))
    return PF.fp12_from_coeffs_w(tuple(out))
