"""Fused multi-product Pallas kernels for the fp32 engine — tower ops and
curve adds as SINGLE kernel invocations.

Round-2 ablations of the one-product kernel (fields/fp32.py) measured ~34%
fixed per-tile overhead + ~8% input normalization on top of the product
FMAs: a pairing step was paying that tax once per *stacked multiplication
round* (fp2_mul_many etc.) plus HBM round-trips for every add/sub between
rounds.  This module executes a whole tower operation (Fp2/Fp6/Fp12
multiply, square, cyclotomic square, sparse Miller multiply) or a complete
curve addition as ONE kernel:

  * every product operand is normalized in-kernel (`_norm`) and shared
    between products (one norm per unique operand instead of one per
    product-side);
  * all of the operation's Fp products run as grouped lane-shifted FMA
    loops on (TILE, 128) f32 registers (VPU), with the pre-shifted operand
    copies cached per unique multiplicand;
  * ALL products REDC together: the two constant multiplies of Montgomery
    reduction become two large stacked bf16 MXU matmuls
    ((n_products*TILE, 64) @ (64, 64/128)) instead of n small ones;
  * Karatsuba combines, xi-multiplies and output tightening happen on
    in-register values — no HBM traffic between products.

The SAME program code runs in two contexts: inside the Pallas kernel on
TPU, and as plain XLA ops on CPU (the fallback is digit-identical by
construction — it is literally the same function).  Value/limb budget
discipline is inherited 1:1 from fields/fp32.py: each program transcribes
the corresponding fields/tower.py op with a `_norm` wherever the XLA path
had a mont_mul input normalization and a `_tighten` wherever it called
FP.tighten, so every bound proved there holds here unchanged.

Reference counterparts: FP2_mul/FP4/FP12 units
(3rd-party/miracl-core/fp{2,4,12}_BLS12381.cpp), FP12_usqr
(fp12_BLS12381.cpp:236-282), the sparse Miller multiply FP12_ssmul
(fp12_BLS12381.cpp:303-497), and ECP/ECP2 addition
(ecp_BLS12381.cpp:550-751) — all re-designed around the TPU's VPU/MXU
split rather than ported.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import fp32 as F8

CTX = F8.FP_CTX
L = CTX.L           # 50 digits, base 2^8
LP = CTX.pad_in     # 64: REDC matmul lane padding
BASE = F8.BASE
INV_BASE = F8.INV_BASE

#: rows per kernel program, per op name (tunable; VMEM-bound).  The
#: 2-round madd/add programs exceed the 16M scoped-VMEM cap at 256 rows;
#: swept on-device: g1_madd 170-180 ms per 2^19 rows at 176 (vs 227 ms
#: for the 3-round predecessor at 256), g1_add 134 ms per 2^18 at 176
#: (vs 154 ms), g1_dbl fits 256 (87 ms per 2^18, vs 94 ms).
_TILE = {
    "default": 256,
    "g1_madd": 176,
    "g1_add": 176,
}
#: product-loop grouping (see fields/fp32.py _PROD_G).
_G = 8
_COL_ROUNDS = 3


def tile_for(name: str) -> int:
    return _TILE.get(name, _TILE["default"])


# ---------------------------------------------------------------------------
# Constants bundle
# ---------------------------------------------------------------------------


class K:
    """Per-call constants, as (.., 128)-lane arrays (kernel refs or jnp)."""

    __slots__ = ("toep_n", "toep_p", "off", "carry_w", "fold", "maskL", "aux")

    def __init__(self, toep_n, toep_p, off, carry_w, fold, maskL, aux=None):
        self.toep_n = toep_n      # (LP, LP)
        self.toep_p = toep_p      # (LP, 128)
        self.off = off            # (1, 128): C_OFF digits (zeros above L)
        self.carry_w = carry_w    # (1, 128)
        self.fold = fold          # (L - fold_i0, 128) tighten fold rows
        self.maskL = maskL        # (1, 128) float: lane < L
        self.aux = aux            # (2, 128) per-program constant (e.g. b3)


@functools.lru_cache(maxsize=None)
def _host_consts():
    off = np.zeros((1, 128), np.float32)
    off[0, :L] = CTX.off_limbs
    cw = CTX.carry_w.reshape(1, 128).astype(np.float32)
    i0 = CTX.fold_i0
    fold = np.zeros((L - i0, 128), np.float32)
    fold[:, :L] = CTX.fold_rows
    maskL = (np.arange(128) < L).astype(np.float32).reshape(1, 128)
    return (
        CTX.toep_np.astype(np.float32),
        CTX.toep_p.astype(np.float32),
        off,
        cw,
        fold,
        maskL,
    )


def _k_from_arrays(tn, tp, off, cw, fold, maskL) -> K:
    return K(tn, tp, off, cw, fold, maskL)


# ---------------------------------------------------------------------------
# Register helpers — run identically inside the kernel and under plain XLA.
# A "reg" is a (rows, 128) f32 array; raw values occupy lanes [0, L).
# ---------------------------------------------------------------------------


def _shift_up1(x):
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], 1)


def _carry(c, rounds):
    for _ in range(rounds):
        q = jnp.floor(c * INV_BASE)
        c = (c - q * BASE) + _shift_up1(q)
    return c


def _norm(k: K, x):
    """Loose signed reg -> digits in [-1, 256] (value += C_OFF; exact for
    |value| <= 2^BUDGET * p, |limb| < 2^23 — fields/fp32._norm_in)."""
    return _carry(x + k.off, 4)


def _tighten(k: K, x):
    """fields/fp32.tighten on regs: norm, then fold digits at lanes >= i0
    back in as digit * (2^(8i) mod p)."""
    xn = _norm(k, x)
    i0 = CTX.fold_i0
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lo = xn * (lane < i0).astype(jnp.float32)
    out = lo
    for j in range(L - i0):
        out = out + xn[:, i0 + j : i0 + j + 1] * k.fold[j : j + 1, :]
    return out


class _MulBatch:
    """Collects products; REDCs them all in two stacked MXU matmuls.

    Usage: q = mb.mul(a, b) returns a *handle*; after mb.run(), q() yields
    the REDC'd digits.  Operands must be normalized digit regs (or sums of
    at most two of them — column exactness: 50 * da * db < 2^24).
    """

    def __init__(self, k: K):
        self.k = k
        self._shift_cache: dict[int, list] = {}
        self._ts: list = []
        self._outs: list = []

    def _shifts(self, a):
        # sc[0] is `a` itself, so the cache entry keeps the key object
        # alive (no id-reuse aliasing).
        sc = self._shift_cache.get(id(a))
        if sc is None or sc[0] is not a:
            sc = [a]
            for _ in range(1, _G):
                sc.append(_shift_up1(sc[-1]))
            self._shift_cache[id(a)] = sc
        return sc

    def mul(self, a, b):
        """Queue REDC(a*b); returns an index handle resolved after run().
        Either operand may have 1 row (a broadcast constant like 3b)."""
        sh = self._shifts(a)
        rows = max(a.shape[0], b.shape[0])
        cols = jnp.zeros((rows, 128), jnp.float32)
        for j0 in range(0, L, _G):
            tacc = sh[0] * b[:, j0 : j0 + 1]
            for g in range(1, min(_G, L - j0)):
                tacc = tacc + sh[g] * b[:, j0 + g : j0 + g + 1]
            if j0:
                tacc = jnp.concatenate(
                    [jnp.zeros((rows, j0), jnp.float32), tacc[:, : 128 - j0]], 1
                )
            cols = cols + tacc
        self._ts.append(_carry(cols, _COL_ROUNDS))
        return len(self._ts) - 1

    def run(self):
        k = self.k
        n = len(self._ts)
        t = jnp.concatenate(self._ts, 0)          # (n*rows, 128)
        tl = t * k.maskL
        m_raw = jax.lax.dot_general(
            tl[:, :LP].astype(jnp.bfloat16),
            k.toep_n.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (n*rows, LP)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)
        m = _carry(m_raw, _COL_ROUNDS) * (lane_p < L).astype(jnp.float32)
        mp = jax.lax.dot_general(
            m.astype(jnp.bfloat16),
            k.toep_p.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (n*rows, 128)
        s_lo = tl + mp * k.maskL
        carry = jnp.round(jnp.sum(s_lo * k.carry_w, axis=1, keepdims=True))
        rows_all = t.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows_all, 128), 1)
        onehot0 = (lane == 0).astype(jnp.float32)
        zpadL = jnp.zeros((rows_all, L), jnp.float32)
        hi = (
            jnp.concatenate([t[:, L:], zpadL], 1)
            + jnp.concatenate([mp[:, L:], zpadL], 1)
            + carry * onehot0
        )
        out = _carry(hi, _COL_ROUNDS) * self.k.maskL
        rows = out.shape[0] // n
        self._outs = [out[i * rows : (i + 1) * rows] for i in range(n)]

    def get(self, h):
        return self._outs[h]


# ---------------------------------------------------------------------------
# Program building blocks over component regs
# ---------------------------------------------------------------------------
# An Fp2 value is a pair (re, im) of regs; Fp6 a triple of Fp2; Fp12 a pair
# of Fp6.  All linear ops are raw (loose digits); `_norm` happens exactly
# where fields/tower.py's stacked mont_mul normalized, via `nrm` caching.


def _xi(a2):
    """xi = 1+i multiply: (re, im) -> (re - im, re + im)."""
    re, im = a2
    return (re - im, re + im)


def _a2(x, y):
    return (x[0] + y[0], x[1] + y[1])


def _s2(x, y):
    return (x[0] - y[0], x[1] - y[1])


def _n2(x):
    return (-x[0], -x[1])


class _P:
    """Program context: norm cache + product batch over one K bundle."""

    def __init__(self, k: K):
        self.k = k
        self.mb = _MulBatch(k)
        self._norms: dict[int, jnp.ndarray] = {}

    def nrm(self, x):
        # key on id(x) but RETAIN x in the cache entry: temporaries must
        # stay alive or a freed tracer's id could be reused by a new one
        # and alias a stale normalization.
        got = self._norms.get(id(x))
        if got is None or got[0] is not x:
            got = (x, _norm(self.k, x))
            self._norms[id(x)] = got
        return got[1]

    def nrm2(self, x2):
        return (self.nrm(x2[0]), self.nrm(x2[1]))

    def fp2_mul(self, a2, b2):
        """Queue a Karatsuba Fp2 product of loose Fp2 values; returns a
        resolver () -> (re, im) valid after run()."""
        a0, a1 = self.nrm2(a2)
        b0, b1 = self.nrm2(b2)
        h0 = self.mb.mul(a0, b0)
        h1 = self.mb.mul(a1, b1)
        hs = self.mb.mul(a0 + a1, b0 + b1)

        def resolve():
            t0, t1, t2 = self.mb.get(h0), self.mb.get(h1), self.mb.get(hs)
            return (t0 - t1, t2 - (t0 + t1))

        return resolve

    def fp2_sqr(self, a2):
        """(a0+a1)(a0-a1), a0 * 2a1 — matches tower.fp2_sqr_many."""
        a0r, a1r = a2
        x0 = self.nrm(a0r + a1r)
        y0 = self.nrm(a0r - a1r)
        x1 = self.nrm(a0r)
        y1 = self.nrm(a1r + a1r)
        h0 = self.mb.mul(x0, y0)
        h1 = self.mb.mul(x1, y1)

        def resolve():
            return (self.mb.get(h0), self.mb.get(h1))

        return resolve

    def fp6_mul(self, a6, b6):
        """Queue the 6 Fp2 Karatsuba products of an Fp6 product; resolver
        returns the combined (tightened) Fp6 (tower._fp6_pairs/_combine)."""
        a0, a1, a2_ = a6
        b0, b1, b2_ = b6
        rs = [
            self.fp2_mul(a0, b0),
            self.fp2_mul(a1, b1),
            self.fp2_mul(a2_, b2_),
            self.fp2_mul(_a2(a0, a1), _a2(b0, b1)),
            self.fp2_mul(_a2(a1, a2_), _a2(b1, b2_)),
            self.fp2_mul(_a2(a0, a2_), _a2(b0, b2_)),
        ]

        def resolve():
            t0, t1, t2, m01, m12, m02 = [r() for r in rs]
            c0 = _a2(t0, _xi(_s2(m12, _a2(t1, t2))))
            c1 = _a2(_s2(m01, _a2(t0, t1)), _xi(t2))
            c2 = _a2(_s2(m02, _a2(t0, t2)), t1)
            return self.tighten6((c0, c1, c2))

        return resolve

    def tighten2(self, x2):
        return (_tighten(self.k, x2[0]), _tighten(self.k, x2[1]))

    def tighten6(self, x6):
        return tuple(self.tighten2(c) for c in x6)

    def tighten12(self, x12):
        return (self.tighten6(x12[0]), self.tighten6(x12[1]))

    def run(self):
        self.mb.run()


def _v6(a6):
    """fp6_mul_by_v: (c0, c1, c2) -> (xi c2, c0, c1)."""
    return (_xi(a6[2]), a6[0], a6[1])


def _a6(x6, y6):
    return tuple(_a2(a, b) for a, b in zip(x6, y6))


def _s6(x6, y6):
    return tuple(_s2(a, b) for a, b in zip(x6, y6))


# ---------------------------------------------------------------------------
# Fused op programs: list[reg] -> list[reg]
# ---------------------------------------------------------------------------
# Component layouts (flat lists of regs):
#   fp2  : [re, im]
#   fp6  : [c0re, c0im, c1re, c1im, c2re, c2im]
#   fp12 : fp6 || fp6  (a + b w)


def _to6(xs):
    return ((xs[0], xs[1]), (xs[2], xs[3]), (xs[4], xs[5]))


def _from6(a6):
    return [a6[0][0], a6[0][1], a6[1][0], a6[1][1], a6[2][0], a6[2][1]]


def prog_fp2_mul(k: K, xs):
    p = _P(k)
    r = p.fp2_mul((xs[0], xs[1]), (xs[2], xs[3]))
    p.run()
    re, im = r()
    return [re, im]


def prog_fp6_mul(k: K, xs):
    p = _P(k)
    r = p.fp6_mul(_to6(xs[:6]), _to6(xs[6:]))
    p.run()
    return _from6(r())


def prog_fp12_mul(k: K, xs):
    """tower.fp12_mul: 3 Fp6 Karatsuba products = 54 Fp products, one REDC."""
    p = _P(k)
    a, b = _to6(xs[:6]), _to6(xs[6:12])
    c, d = _to6(xs[12:18]), _to6(xs[18:24])
    r0 = p.fp6_mul(a, c)
    r1 = p.fp6_mul(b, d)
    rm = p.fp6_mul(_a6(a, b), _a6(c, d))
    p.run()
    t0, t1, m = r0(), r1(), rm()
    c0 = _a6(t0, _v6(t1))
    c1 = _s6(m, _a6(t0, t1))
    out = p.tighten12((c0, c1))
    return _from6(out[0]) + _from6(out[1])


def prog_fp12_sqr(k: K, xs):
    """tower.fp12_sqr: t = (a+b)(a + v b), m = a b."""
    p = _P(k)
    a, b = _to6(xs[:6]), _to6(xs[6:12])
    rt = p.fp6_mul(_a6(a, b), _a6(a, _v6(b)))
    rm = p.fp6_mul(a, b)
    p.run()
    t, m = rt(), rm()
    c0 = _s6(t, _a6(m, _v6(m)))
    c1 = _a6(m, m)
    out = p.tighten12((c0, c1))
    return _from6(out[0]) + _from6(out[1])


def prog_fp12_usqr(k: K, xs):
    """tower.fp12_usqr: 9 Fp2 squares + cyclotomic reassembly."""
    p = _P(k)
    a, b = _to6(xs[:6]), _to6(xs[6:12])
    a0, a1, a2_ = a
    b0, b1, b2_ = b
    sq = [
        p.fp2_sqr(b1), p.fp2_sqr(a0), p.fp2_sqr(_a2(b1, a0)),
        p.fp2_sqr(a2_), p.fp2_sqr(b0), p.fp2_sqr(_a2(a2_, b0)),
        p.fp2_sqr(b2_), p.fp2_sqr(a1), p.fp2_sqr(_a2(b2_, a1)),
    ]
    p.run()
    t0, t1, s01, t2, t3, s23, t4, t5, s45 = [r() for r in sq]
    t6 = _s2(s01, _a2(t0, t1))
    t7 = _s2(s23, _a2(t2, t3))
    t8 = _xi(_s2(s45, _a2(t4, t5)))
    u0 = _a2(_xi(t0), t1)
    u2 = _a2(_xi(t2), t3)
    u4 = _a2(_xi(t4), t5)

    def three(x2):
        return (x2[0] + x2[0] + x2[0], x2[1] + x2[1] + x2[1])

    def two(x2):
        return (x2[0] + x2[0], x2[1] + x2[1])

    c0 = (
        _s2(three(u0), two(a0)),
        _s2(three(u2), two(a1)),
        _s2(three(u4), two(a2_)),
    )
    c1 = (
        _a2(three(t8), two(b0)),
        _a2(three(t6), two(b1)),
        _a2(three(t7), two(b2_)),
    )
    out = p.tighten12((c0, c1))
    return _from6(out[0]) + _from6(out[1])


def prog_fp12_sparse_mul(k: K, xs):
    """pairing._mul_sparse: f * (c0 + c3 w^3 + c5 w^5), 15 Fp2 products."""
    p = _P(k)
    a, b = _to6(xs[:6]), _to6(xs[6:12])
    c0, c3, c5 = (xs[12], xs[13]), (xs[14], xs[15]), (xs[16], xs[17])
    a0, a1, a2_ = a
    b0, b1, b2_ = b
    s0, s1, s2 = _a2(a0, b0), _a2(a1, b1), _a2(a2_, b2_)
    rs = [
        p.fp2_mul(a0, c0), p.fp2_mul(a1, c0), p.fp2_mul(a2_, c0),
        p.fp2_mul(b1, c5), p.fp2_mul(b2_, c3), p.fp2_mul(b0, c3),
        p.fp2_mul(b2_, c5), p.fp2_mul(b0, c5), p.fp2_mul(b1, c3),
        p.fp2_mul(s0, c0), p.fp2_mul(s1, c3), p.fp2_mul(s2, c5),
        p.fp2_mul(_a2(s0, s1), _a2(c0, c3)),
        p.fp2_mul(_a2(s1, s2), _a2(c3, c5)),
        p.fp2_mul(_a2(s0, s2), _a2(c0, c5)),
    ]
    p.run()
    (t00, t01, t02, u0, u1, u2, u3, u4, u5,
     v0, v1, v2, v01, v12, v02) = [r() for r in rs]
    t1_0 = _xi(_a2(u0, u1))
    t1_1 = _a2(u2, _xi(u3))
    t1_2 = _a2(u4, u5)
    m_0 = _a2(v0, _xi(_s2(v12, _a2(v1, v2))))
    m_1 = _a2(_s2(v01, _a2(v0, v1)), _xi(v2))
    m_2 = _a2(_s2(v02, _a2(v0, v2)), v1)
    t0_6 = (t00, t01, t02)
    t1_6 = (t1_0, t1_1, t1_2)
    m_6 = (m_0, m_1, m_2)
    c0_out = _a6(t0_6, _v6(t1_6))
    c1_out = _s6(m_6, _a6(t0_6, t1_6))
    out = p.tighten12((c0_out, c1_out))
    return _from6(out[0]) + _from6(out[1])


def _out3(p: _P, coords, fp2: bool):
    """Tighten the three output coordinates of a deferred-3b curve
    program, after adding the 2^16 p protective offset (k.aux row 0 —
    see _offp_row: scaled-negative combines can reach ~-47000 p, far
    below _norm's own -4096 p floor)."""
    offp = p.k.aux[0:1]
    if fp2:
        return tuple(
            p.tighten2((c[0] + offp, c[1] + offp)) for c in coords
        )
    return tuple(_tighten(p.k, c + offp) for c in coords)


def _rcb_add_generic(p: _P, P1, P2, fp2: bool):
    """RCB15 complete addition over Fp (fp2=False) or Fp2 (fp2=True).

    P1/P2: (X, Y, Z) with each coordinate an Fp reg or an Fp2 pair.
    Unlike the mixed add, every 3b multiplicand here (t2 = Z1*Z2, t5) is
    REDC-derived (~27 p, Fp2 components ~54 p), so the scaled operands
    bt2 = 12*t2 / bt5 = 12*t5 and the combos t1 ± bt2 stay within
    ~±1950 p — inside _norm's -4096 p floor with >2x margin, no offsets
    needed.  The weierstrass.add round-3 product set survives verbatim;
    only the 2-product b3 round disappears: TWO rounds, 6 + 6 = 12 base
    products (the transcription spent 14 in three rounds)."""
    if fp2:
        mk_add, mk_sub = _a2, _s2

        def muls(pairs):
            return [p.fp2_mul(a, b) for a, b in pairs]
    else:
        def mk_add(x, y):
            return x + y

        def mk_sub(x, y):
            return x - y

        def muls(pairs):
            out = []
            for a, b in pairs:
                h = p.mb.mul(p.nrm(a), p.nrm(b))
                out.append(lambda h=h: p.mb.get(h))
            return out

    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    r1 = muls(
        [
            (X1, X2), (Y1, Y2), (Z1, Z2),
            (mk_add(X1, Y1), mk_add(X2, Y2)),
            (mk_add(Y1, Z1), mk_add(Y2, Z2)),
            (mk_add(X1, Z1), mk_add(X2, Z2)),
        ]
    )
    p.run()
    t0, t1, t2, m3, m4, m5 = [r() for r in r1]
    t3 = mk_sub(m3, mk_add(t0, t1))
    t4 = mk_sub(m4, mk_add(t1, t2))
    t5 = mk_sub(m5, mk_add(t0, t2))
    w = mk_add(mk_add(t0, t0), t0)
    bt2 = _sc12(p, t2, fp2)
    bt5 = _sc12(p, t5, fp2)
    z3a = mk_add(t1, bt2)
    t1m = mk_sub(t1, bt2)
    p.mb = _MulBatch(p.k)
    p._norms = {}
    r2 = muls(
        [(t1m, t3), (t1m, z3a), (bt5, t4), (bt5, w), (z3a, t4), (w, t3)]
    )
    p.run()
    c = [r() for r in r2]
    X3 = mk_sub(c[0], c[2])
    Y3 = mk_add(c[1], c[3])
    Z3 = mk_add(c[4], c[5])
    return _out3(p, (X3, Y3, Z3), fp2)


def _sc12(p: _P, x, fp2: bool, off: bool = False):
    """b3 * x as a digit scaling: 12*x on G1, 12*xi(x) on the twist
    (b3 = 3b = 12 resp. 12(1+u) — tiny integers, never worth a
    Montgomery product).  `off=True` adds the 2^16 p protective row
    (a mod-p no-op) for operands whose scaled components could dip
    below _norm's -2^BUDGET_BITS p floor; POSITIVE excursions are
    harmless up to the ~2^400/p ~ 4e5 p lane-spill ceiling, which is
    what makes operand-side scaling budget-legal at all."""
    o = p.k.aux[0:1] if off else 0.0
    if fp2:
        return ((x[0] - x[1]) * 12.0 + o, (x[0] + x[1]) * 12.0 + o)
    return x * 12.0 + o


def _rcb_madd_generic(p: _P, P1, Q2, fp2: bool):
    """Mixed complete addition (Z2 = 1) — weierstrass.madd with the two
    3b products replaced by digit scalings on the OPERAND side: 5 + 6 =
    11 base products in TWO rounds (the transcription spent 13 in three,
    two of them multiplying by the constant 3b = 12 resp. 12(1+u)).

    The scaled operands t1m = t1 - 12*Z1, z3a = t1 + 12*Z1 and
    bt5 = 12*t5 involve tighten-bounded INPUT coordinates (~520 p), so
    they can dip to ~-6200 p (Fp2 components ~-7500 p) — below _norm's
    -2^BUDGET_BITS p = -4096 p floor.  Each gets the 2^16 p protective
    row added (a mod-p no-op; see _offp_row): positive excursions are
    harmless to ~4e5 p, which is exactly what makes operand-side
    constant folding budget-legal."""
    if fp2:
        mk_add, mk_sub = _a2, _s2

        def muls(pairs):
            return [p.fp2_mul(a, b) for a, b in pairs]

        def prot(x2):
            offp = p.k.aux[0:1]
            return (x2[0] + offp, x2[1] + offp)
    else:
        def mk_add(x, y):
            return x + y

        def mk_sub(x, y):
            return x - y

        def muls(pairs):
            out = []
            for a, b in pairs:
                h = p.mb.mul(p.nrm(a), p.nrm(b))
                out.append(lambda h=h: p.mb.get(h))
            return out

        def prot(x):
            return x + p.k.aux[0:1]

    X1, Y1, Z1 = P1
    X2, Y2 = Q2
    r1 = muls(
        [
            (X1, X2), (Y1, Y2),
            (mk_add(X1, Y1), mk_add(X2, Y2)),
            (X2, Z1), (Y2, Z1),
        ]
    )
    p.run()
    t0, t1, m3, zx, zy = [r() for r in r1]
    t3 = mk_sub(m3, mk_add(t0, t1))          # X1Y2 + X2Y1
    t4 = mk_add(zy, Y1)                      # Y1Z2 + Y2Z1
    t5 = mk_add(zx, X1)                      # X1Z2 + X2Z1
    w = mk_add(mk_add(t0, t0), t0)           # 3 X1X2
    bt2 = _sc12(p, Z1, fp2)
    bt5 = prot(_sc12(p, t5, fp2))
    z3a = prot(mk_add(t1, bt2))
    t1m = prot(mk_sub(t1, bt2))
    p.mb = _MulBatch(p.k)
    p._norms = {}
    r2 = muls(
        [(t1m, t3), (t1m, z3a), (bt5, t4), (bt5, w), (z3a, t4), (w, t3)]
    )
    p.run()
    c = [r() for r in r2]
    X3 = mk_sub(c[0], c[2])
    Y3 = mk_add(c[1], c[3])
    Z3 = mk_add(c[4], c[5])
    return _out3(p, (X3, Y3, Z3), fp2)


def prog_g1_madd(k: K, xs):
    """Mixed RCB G1 addition: ins (X1,Y1,Z1,X2,Y2) -> (X3,Y3,Z3)."""
    p = _P(k)
    out = _rcb_madd_generic(p, (xs[0], xs[1], xs[2]), (xs[3], xs[4]), False)
    return list(out)


def prog_g2_madd(k: K, xs):
    """Mixed RCB G2 addition over Fp2: 10 ins -> 6 outs."""
    p = _P(k)
    P1 = ((xs[0], xs[1]), (xs[2], xs[3]), (xs[4], xs[5]))
    Q2 = ((xs[6], xs[7]), (xs[8], xs[9]))
    out = _rcb_madd_generic(p, P1, Q2, True)
    return [r for c in out for r in c]


def _rcb_dbl_generic(p: _P, P1, fp2: bool):
    """Dedicated exception-free doubling (RCB15 Alg. 9,
    weierstrass.double algebra) with the single b3 product replaced by
    the digit scaling t2 = 12*z2 (xi-rotated on the twist): TWO product
    rounds, 4 + 4 = 8 base products (the transcription spent 9 in three
    rounds).  Sign budget: z2 is REDC-derived, so t0m = t0 - 3*t2
    bottoms at ~-950 p on G1 and ~-3950 p on the twist — the latter sits
    4% from _norm's -4096 p floor, so t0m is offset-protected there."""
    if fp2:
        mk_add, mk_sub = _a2, _s2

        def muls(pairs):
            return [p.fp2_mul(a, b) for a, b in pairs]

        def sc(x2, f):
            return (x2[0] * f, x2[1] * f)
    else:
        def mk_add(x, y):
            return x + y

        def mk_sub(x, y):
            return x - y

        def muls(pairs):
            out = []
            for a, b in pairs:
                h = p.mb.mul(p.nrm(a), p.nrm(b))
                out.append(lambda h=h: p.mb.get(h))
            return out

        def sc(x, f):
            return x * f

    X, Y, Z = P1
    r1 = muls([(Y, Y), (Y, Z), (X, Y), (Z, Z)])
    p.run()
    t0, t1, xy, z2 = [r() for r in r1]
    t2 = _sc12(p, z2, fp2)
    t0_2 = mk_add(t0, t0)
    t0_4 = mk_add(t0_2, t0_2)
    z3_8y2 = mk_add(t0_4, t0_4)
    y3a = mk_add(t0, t2)
    t0m = mk_sub(t0, mk_add(mk_add(t2, t2), t2))
    if fp2:  # -3950 p floor excursion: protect (mod-p no-op)
        offp = p.k.aux[0:1]
        t0m = (t0m[0] + offp, t0m[1] + offp)
    p.mb = _MulBatch(p.k)
    p._norms = {}
    r2 = muls(
        [(z3_8y2, t2), (z3_8y2, t1), (t0m, y3a), (t0m, xy)]
    )
    p.run()
    x3a, z3, y3b, x3b = [r() for r in r2]
    X3 = mk_add(x3b, x3b)
    Y3 = mk_add(y3b, x3a)
    return _out3(p, (X3, Y3, z3), fp2)


def prog_g1_dbl(k: K, xs):
    """Dedicated RCB G1 doubling: ins (X,Y,Z) -> (X3,Y3,Z3)."""
    p = _P(k)
    out = _rcb_dbl_generic(p, (xs[0], xs[1], xs[2]), False)
    return list(out)


def prog_g2_dbl(k: K, xs):
    """Dedicated RCB G2 doubling over Fp2: 6 ins -> 6 outs."""
    p = _P(k)
    out = _rcb_dbl_generic(
        p, ((xs[0], xs[1]), (xs[2], xs[3]), (xs[4], xs[5])), True
    )
    return [r for c in out for r in c]


@functools.lru_cache(maxsize=None)
def _offp_row() -> np.ndarray:
    """(1, 128) digit row of 2^16 * p — the protective offset the curve
    programs add to every output coordinate before the final tighten.

    The deferred-3b combines scale REDC outputs (measured value ~27 p,
    Fp2 Karatsuba components ~54 p) by constants up to 432 (x2 through a
    xi rotation), so an output coordinate can sit as low as ~-47000 p/...
    ~-46656 p — far below the -2^BUDGET_BITS p = -4096 p floor that
    _norm's built-in offset can absorb (values more negative than that
    leave residual digits above lane L-1, which the tighten fold then
    DROPS).  Adding 2^16 p = 65536 p first makes every output positive;
    the ceiling is safe by >3x: 65536 p + ~47000 p + 4096 p < 2^17.1 p
    << 2^400 / p ~ 4*10^5 p (the lane-spill limit)."""
    row = np.zeros((1, 128), np.float32)
    row[0, :L] = np.asarray(
        CTX.params.to_limbs((1 << 16) * CTX.params.modulus), np.float32
    )
    return row


def prog_g1_add(k: K, xs):
    """Complete RCB G1 addition: ins (X1,Y1,Z1,X2,Y2,Z2) -> (X3,Y3,Z3).
    (3b is folded into constant digit scalings — k.aux is unused.)"""
    p = _P(k)
    out = _rcb_add_generic(
        p, (xs[0], xs[1], xs[2]), (xs[3], xs[4], xs[5]), False
    )
    return list(out)


def prog_g2_add(k: K, xs):
    """Complete RCB G2 addition over Fp2: 12 ins -> 6 outs."""
    p = _P(k)
    P1 = ((xs[0], xs[1]), (xs[2], xs[3]), (xs[4], xs[5]))
    P2 = ((xs[6], xs[7]), (xs[8], xs[9]), (xs[10], xs[11]))
    out = _rcb_add_generic(p, P1, P2, True)
    return [r for c in out for r in c]


def prog_fp2_sqr(k: K, xs):
    p = _P(k)
    r = p.fp2_sqr((xs[0], xs[1]))
    p.run()
    re, im = r()
    return [re, im]


#: name -> (n_in, n_out, program).  Entries marked [xla-only] have program
#: bodies too large for a single Mosaic compile (the monolithic fp12_mul
#: kernel sat in the remote compiler >18 min on the v5e) — they remain for
#: CPU differential testing, while the TPU path uses the row-stacked
#: composites below (fp12_mul_c etc.), which reuse the small kernels.
PROGRAMS = {
    "fp2_mul": (4, 2, prog_fp2_mul),
    "fp2_sqr": (2, 2, prog_fp2_sqr),
    "fp6_mul": (12, 6, prog_fp6_mul),
    "fp12_mul": (24, 12, prog_fp12_mul),            # [xla-only]
    "fp12_sqr": (12, 12, prog_fp12_sqr),            # [xla-only]
    "fp12_usqr": (12, 12, prog_fp12_usqr),          # [xla-only]
    "fp12_sparse_mul": (18, 12, prog_fp12_sparse_mul),  # [xla-only]
    "g1_add": (6, 3, prog_g1_add),
    "g2_add": (12, 6, prog_g2_add),                 # [xla-only]
    "g1_madd": (5, 3, prog_g1_madd),
    "g2_madd": (10, 6, prog_g2_madd),               # [xla-only]
    "g1_dbl": (3, 3, prog_g1_dbl),
    "g2_dbl": (6, 6, prog_g2_dbl),                  # [xla-only]
}

#: programs small enough to compile as single Pallas kernels on TPU
KERNEL_OPS = {"fp2_mul", "fp2_sqr", "fp6_mul", "g1_add", "g1_madd", "g1_dbl"}


# ---------------------------------------------------------------------------
# Kernel wrapper / dispatch
# ---------------------------------------------------------------------------


def _pad128(x):
    """(rows, L) -> (rows, 128) with zero lanes above L."""
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (128 - L,), jnp.float32)], -1
    )


def _aux_for(name: str) -> np.ndarray:
    """(2, 128) per-program constant rows (the 2^16 p protective offset
    for the curve adds — see _offp_row)."""
    aux = np.zeros((2, 128), np.float32)
    if name in ("g1_add", "g1_madd", "g1_dbl", "g2_add", "g2_madd",
                "g2_dbl"):
        aux[0] = _offp_row()[0]
    return aux


@functools.lru_cache(maxsize=None)
def _fused_pallas(name: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_in, n_out, prog = PROGRAMS[name]
    T = tile_for(name)

    def kernel(*refs):
        in_refs = refs[:n_in]
        tn, tp, off, cw, fold, aux = refs[n_in : n_in + 6]
        out_refs = refs[n_in + 6 :]
        maskL = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < L
        ).astype(jnp.float32)
        k = K(tn[:], tp[:], off[:], cw[:], fold[:], maskL, aux[:])
        xs = [_pad128(r[:]) for r in in_refs]
        outs = prog(k, xs)
        for o_ref, o in zip(out_refs, outs):
            o_ref[:] = o[:, :L]

    @jax.jit
    def run(*ins):
        n = ins[0].shape[0]
        grid = (n // T,)
        tn, tp, off, cw, fold, _ = _host_consts()
        aux = _aux_for(name)
        data_spec = pl.BlockSpec(
            (T, L), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        const_specs = [
            pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for c in (tn, tp, off, cw, fold, aux)
        ]
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((n, L), jnp.float32) for _ in range(n_out)
            ],
            grid=grid,
            in_specs=[data_spec] * n_in + const_specs,
            out_specs=[data_spec] * n_out,
        )(*ins, jnp.asarray(tn), jnp.asarray(tp), jnp.asarray(off),
          jnp.asarray(cw), jnp.asarray(fold), jnp.asarray(aux))

    return run


def _fused_xla(name: str, ins):
    """Digit-identical fallback: the same program on (B, 128) arrays."""
    tn, tp, off, cw, fold, maskL = _host_consts()
    k = K(
        jnp.asarray(tn), jnp.asarray(tp), jnp.asarray(off),
        jnp.asarray(cw), jnp.asarray(fold), jnp.asarray(maskL),
        jnp.asarray(_aux_for(name)),
    )
    _, _, prog = PROGRAMS[name]
    xs = [_pad128(x) for x in ins]
    return [o[:, :L] for o in prog(k, xs)]


def enabled() -> bool:
    """Fused kernels are the default on TPU (fp32 engine).  On CPU the
    scan-based XLA paths compile far smaller graphs, so the (digit-exact)
    unrolled fallback here is opt-in via CRYPTO12381_FUSED=1 — the
    dedicated differential tests use that to cover the program code."""
    if os.environ.get("CRYPTO12381_NO_FUSED"):
        return False
    from . import active as ACT

    if ACT.ENGINE != "fp32":
        return False
    if os.environ.get("CRYPTO12381_FUSED"):
        return True
    return F8._use_pallas()


# ---------------------------------------------------------------------------
# Composite fp12 / G2 ops: row-stacked small kernels + XLA combines
# ---------------------------------------------------------------------------
# One Mosaic program per *small* op (fp2_mul / fp2_sqr / fp6_mul), with the
# instances of an fp12-level operation stacked along the batch axis into a
# single kernel launch; the cross-instance Karatsuba combines are cheap XLA
# elementwise ops.  Same algebra and tighten placement as fields/tower.py.


def _cat(arrs):
    return jnp.concatenate(arrs, 0)


def _splitk(arr, k):
    n = arr.shape[0] // k
    return [arr[i * n : (i + 1) * n] for i in range(k)]


def _xi_c(c):
    """xi-multiply on a [re, im] component pair."""
    return [c[0] - c[1], c[0] + c[1]]


def _v6_c(t):
    """fp6 mul-by-v on a 6-component list: (c0,c1,c2) -> (xi c2, c0, c1)."""
    x = _xi_c(t[4:6])
    return [x[0], x[1], t[0], t[1], t[2], t[3]]


def _tighten_x(a):
    return F8.tighten(CTX, a)


def fp12_mul_c(xs, ys):
    """tower.fp12_mul as ONE fp6_mul kernel launch (3 instances stacked:
    a*c, b*d, (a+b)*(c+d)) + XLA combine.  xs/ys: 12 comps (B..., L)."""
    a, b = xs[:6], xs[6:]
    c, d = ys[:6], ys[6:]
    lhs = [_cat([a[j], b[j], a[j] + b[j]]) for j in range(6)]
    rhs = [_cat([c[j], d[j], c[j] + d[j]]) for j in range(6)]
    outs = fused("fp6_mul", *lhs, *rhs)
    t0, t1, m = zip(*[_splitk(o, 3) for o in outs])  # 3 x 6-comp
    t0, t1, m = list(t0), list(t1), list(m)
    v1 = _v6_c(t1)
    c0 = [t0[j] + v1[j] for j in range(6)]
    c1 = [m[j] - (t0[j] + t1[j]) for j in range(6)]
    return [_tighten_x(x) for x in c0 + c1]


def fp12_sqr_c(xs):
    """tower.fp12_sqr as one 2-instance fp6_mul launch."""
    a, b = xs[:6], xs[6:]
    avb = _v6_c(b)
    lhs = [_cat([a[j] + b[j], a[j]]) for j in range(6)]
    rhs = [_cat([a[j] + avb[j], b[j]]) for j in range(6)]
    outs = fused("fp6_mul", *lhs, *rhs)
    t, m = zip(*[_splitk(o, 2) for o in outs])
    t, m = list(t), list(m)
    vm = _v6_c(m)
    c0 = [t[j] - (m[j] + vm[j]) for j in range(6)]
    c1 = [m[j] + m[j] for j in range(6)]
    return [_tighten_x(x) for x in c0 + c1]


def fp12_usqr_c(xs):
    """tower.fp12_usqr as one 9-instance fp2_sqr launch."""
    a0, a1, a2 = [xs[0:2], xs[2:4], xs[4:6]]
    b0, b1, b2 = [xs[6:8], xs[8:10], xs[10:12]]
    sq_ops = [
        b1, a0, [b1[0] + a0[0], b1[1] + a0[1]],
        a2, b0, [a2[0] + b0[0], a2[1] + b0[1]],
        b2, a1, [b2[0] + a1[0], b2[1] + a1[1]],
    ]
    re = _cat([o[0] for o in sq_ops])
    im = _cat([o[1] for o in sq_ops])
    o_re, o_im = fused("fp2_sqr", re, im)
    sq = [[r, i] for r, i in zip(_splitk(o_re, 9), _splitk(o_im, 9))]
    t0, t1, s01, t2, t3, s23, t4, t5, s45 = sq

    def sub2(x, y):
        return [x[0] - y[0], x[1] - y[1]]

    def add2(x, y):
        return [x[0] + y[0], x[1] + y[1]]

    t6 = sub2(s01, add2(t0, t1))
    t7 = sub2(s23, add2(t2, t3))
    t8 = _xi_c(sub2(s45, add2(t4, t5)))
    u0 = add2(_xi_c(t0), t1)
    u2 = add2(_xi_c(t2), t3)
    u4 = add2(_xi_c(t4), t5)

    def three(x):
        return [x[0] + x[0] + x[0], x[1] + x[1] + x[1]]

    def two(x):
        return [x[0] + x[0], x[1] + x[1]]

    c0 = sub2(three(u0), two(a0)) + sub2(three(u2), two(a1)) + \
        sub2(three(u4), two(a2))
    c1 = add2(three(t8), two(b0)) + add2(three(t6), two(b1)) + \
        add2(three(t7), two(b2))
    return [_tighten_x(x) for x in c0 + c1]


def sparse_mul_c(fs, lcs):
    """pairing._mul_sparse as one 15-instance fp2_mul launch.
    fs: 12 comps; lcs: 6 comps (c0, c3, c5)."""
    a0, a1, a2 = [fs[0:2], fs[2:4], fs[4:6]]
    b0, b1, b2 = [fs[6:8], fs[8:10], fs[10:12]]
    c0, c3, c5 = [lcs[0:2], lcs[2:4], lcs[4:6]]

    def add2(x, y):
        return [x[0] + y[0], x[1] + y[1]]

    def sub2(x, y):
        return [x[0] - y[0], x[1] - y[1]]

    s0, s1, s2 = add2(a0, b0), add2(a1, b1), add2(a2, b2)
    pairs = [
        (a0, c0), (a1, c0), (a2, c0),
        (b1, c5), (b2, c3), (b0, c3), (b2, c5), (b0, c5), (b1, c3),
        (s0, c0), (s1, c3), (s2, c5),
        (add2(s0, s1), add2(c0, c3)),
        (add2(s1, s2), add2(c3, c5)),
        (add2(s0, s2), add2(c0, c5)),
    ]
    outs = fused(
        "fp2_mul",
        _cat([p[0][0] for p in pairs]), _cat([p[0][1] for p in pairs]),
        _cat([p[1][0] for p in pairs]), _cat([p[1][1] for p in pairs]),
    )
    prods = [[r, i] for r, i in zip(_splitk(outs[0], 15), _splitk(outs[1], 15))]
    (t00, t01, t02, u0, u1, u2, u3, u4, u5,
     v0, v1, v2, v01, v12, v02) = prods
    t1_0 = _xi_c(add2(u0, u1))
    t1_1 = add2(u2, _xi_c(u3))
    t1_2 = add2(u4, u5)
    m_0 = add2(v0, _xi_c(sub2(v12, add2(v1, v2))))
    m_1 = add2(sub2(v01, add2(v0, v1)), _xi_c(v2))
    m_2 = add2(sub2(v02, add2(v0, v2)), v1)
    t0_6 = t00 + t01 + t02
    t1_6 = t1_0 + t1_1 + t1_2
    m_6 = m_0 + m_1 + m_2
    v1_6 = _v6_c(t1_6)
    c0_out = [t0_6[j] + v1_6[j] for j in range(6)]
    c1_out = [m_6[j] - (t0_6[j] + t1_6[j]) for j in range(6)]
    return [_tighten_x(x) for x in c0_out + c1_out]


def _g2_round(pairs):
    """Stacked fp2_mul round for the G2 composite adds.  pairs: list of
    ([re,im], [re,im])."""
    outs = fused(
        "fp2_mul",
        _cat([p[0][0] for p in pairs]), _cat([p[0][1] for p in pairs]),
        _cat([p[1][0] for p in pairs]), _cat([p[1][1] for p in pairs]),
    )
    k = len(pairs)
    return [[r, i] for r, i in zip(_splitk(outs[0], k), _splitk(outs[1], k))]


@functools.lru_cache(maxsize=None)
def _b3_mont_g2():
    """Montgomery digit rows of 3*b' on the M-twist (b' = 4(1+i) —
    params.B_G2, ref rom_curve_BLS12381.cpp); used only by the composite
    g2_add_c path (the fused register programs fold 3b into constant
    digit scalings instead)."""
    from ..params import B_G2

    re = np.asarray(F8.mont_const(CTX, 3 * B_G2[0]), np.float32)
    im = np.asarray(F8.mont_const(CTX, 3 * B_G2[1]), np.float32)
    return re, im


def _b3_c(shape):
    re_np, im_np = _b3_mont_g2()
    re = jnp.broadcast_to(jnp.asarray(re_np), shape)
    im = jnp.broadcast_to(jnp.asarray(im_np), shape)
    return [re, im]


def g2_add_c(P1, P2):
    """Complete RCB G2 add via 3 stacked fp2_mul rounds (weierstrass.add
    algebra).  P1/P2: ((X re/im), (Y..), (Z..)) 2-comp lists."""

    def add2(x, y):
        return [x[0] + y[0], x[1] + y[1]]

    def sub2(x, y):
        return [x[0] - y[0], x[1] - y[1]]

    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    b3 = _b3_c(X1[0].shape)
    r1 = _g2_round(
        [
            (X1, X2), (Y1, Y2), (Z1, Z2),
            (add2(X1, Y1), add2(X2, Y2)),
            (add2(Y1, Z1), add2(Y2, Z2)),
            (add2(X1, Z1), add2(X2, Z2)),
        ]
    )
    t0, t1, t2, m3, m4, m5 = r1
    t3 = sub2(m3, add2(t0, t1))
    t4 = sub2(m4, add2(t1, t2))
    t5 = sub2(m5, add2(t0, t2))
    w = add2(add2(t0, t0), t0)
    bt2, bt5 = _g2_round([(b3, t2), (b3, t5)])
    z3a = add2(t1, bt2)
    t1m = sub2(t1, bt2)
    c = _g2_round(
        [(t3, t1m), (t4, bt5), (bt5, w), (t1m, z3a), (w, t3), (z3a, t4)]
    )
    X3 = sub2(c[0], c[1])
    Y3 = add2(c[3], c[2])
    Z3 = add2(c[5], c[4])
    return tuple([_tighten_x(u[0]), _tighten_x(u[1])] for u in (X3, Y3, Z3))


def g2_madd_c(P1, Q2):
    """Mixed RCB G2 add (Z2=1) via 3 stacked fp2_mul rounds
    (weierstrass.madd algebra)."""

    def add2(x, y):
        return [x[0] + y[0], x[1] + y[1]]

    def sub2(x, y):
        return [x[0] - y[0], x[1] - y[1]]

    X1, Y1, Z1 = P1
    X2, Y2 = Q2
    b3 = _b3_c(X1[0].shape)
    r1 = _g2_round(
        [
            (X1, X2), (Y1, Y2),
            (add2(X1, Y1), add2(X2, Y2)),
            (X2, Z1), (Y2, Z1),
        ]
    )
    t0, t1, m3, zx, zy = r1
    t3 = sub2(m3, add2(t0, t1))
    t4 = add2(zy, Y1)
    t5 = add2(zx, X1)
    w = add2(add2(t0, t0), t0)
    bt2, bt5 = _g2_round([(b3, Z1), (b3, t5)])
    z3a = add2(t1, bt2)
    t1m = sub2(t1, bt2)
    c = _g2_round(
        [(t3, t1m), (t4, bt5), (bt5, w), (t1m, z3a), (w, t3), (z3a, t4)]
    )
    X3 = sub2(c[0], c[1])
    Y3 = add2(c[3], c[2])
    Z3 = add2(c[5], c[4])
    return tuple([_tighten_x(u[0]), _tighten_x(u[1])] for u in (X3, Y3, Z3))


def g2_dbl_c(P1):
    """Dedicated RCB G2 doubling via 3 stacked fp2_mul rounds
    (weierstrass.double algebra)."""

    def add2(x, y):
        return [x[0] + y[0], x[1] + y[1]]

    def sub2(x, y):
        return [x[0] - y[0], x[1] - y[1]]

    X, Y, Z = P1
    b3 = _b3_c(X[0].shape)
    r1 = _g2_round([(Y, Y), (Y, Z), (X, Y), (Z, Z)])
    t0, t1, xy, z2 = r1
    (t2,) = _g2_round([(b3, z2)])
    t0_2 = add2(t0, t0)
    t0_4 = add2(t0_2, t0_2)
    z3_8y2 = add2(t0_4, t0_4)
    y3a = add2(t0, t2)
    t0m = sub2(t0, add2(add2(t2, t2), t2))
    r3 = _g2_round([(t2, z3_8y2), (t1, z3_8y2), (t0m, y3a), (t0m, xy)])
    x3a, z3, y3b, x3b = r3
    Y3 = add2(y3b, x3a)
    X3 = add2(x3b, x3b)
    return tuple([_tighten_x(u[0]), _tighten_x(u[1])] for u in (X3, Y3, z3))


def fused(name: str, *ins):
    """Run a fused op.  ins: (B..., L) f32 loose digit arrays (|value| <=
    2^11 * p, the tightened-output tier).  Returns list of (B..., L) digit
    arrays, each tightened/fresh per the program's contract."""
    n_in, n_out, _ = PROGRAMS[name]
    assert len(ins) == n_in, (name, len(ins))
    batch = ins[0].shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    flat = [x.reshape(n, L) for x in ins]
    if F8._use_pallas() and name in KERNEL_OPS:
        T = tile_for(name)
        pad = (-n) % T
        if pad:
            flat = [
                jnp.concatenate([x, jnp.zeros((pad, L), jnp.float32)], 0)
                for x in flat
            ]
        outs = _fused_pallas(name)(*flat)
        if pad:
            outs = [o[:n] for o in outs]
    else:
        outs = _fused_xla(name, flat)
    return [o.reshape(batch + (L,)) for o in outs]
