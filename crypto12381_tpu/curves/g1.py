"""Batched G1 = E(Fp): y^2 = x^3 + 4 on TPU.

Capability counterpart of the reference's ECP unit + G1Point wrapper
(ecp_BLS12381.cpp, include/crypto12381/g1_point.hpp), rebuilt on the
complete homogeneous formulas in curves/weierstrass.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields import active as FP
from ..params import B_G1, G1_GEN_X, G1_GEN_Y, H_EFF_G1, R
from . import weierstrass as W

CTX = FP.FP_CTX


def _mul_many(pairs):
    X = jnp.stack([a for a, _ in pairs], axis=-2)
    Y = jnp.stack([b for _, b in pairs], axis=-2)
    T = FP.mont_mul(CTX, X, Y)
    return [T[..., i, :] for i in range(len(pairs))]


def _select(mask, a, b):
    return jnp.where(mask[..., None], a, b)


def _fused_add(p, q):
    """Whole RCB addition as one Pallas kernel (fields/fp32k)."""
    from ..fields import fp32k as FK

    arrs = jnp.broadcast_arrays(*p, *q)
    return tuple(FK.fused("g1_add", *arrs))


def _fused_madd(p, q):
    from ..fields import fp32k as FK

    arrs = jnp.broadcast_arrays(*p, *q)
    return tuple(FK.fused("g1_madd", *arrs))


def _fused_dbl(p):
    from ..fields import fp32k as FK

    arrs = jnp.broadcast_arrays(*p)
    return tuple(FK.fused("g1_dbl", *arrs))


@functools.lru_cache(maxsize=1)
def ops() -> W.FieldOps:
    # host-side Montgomery constant: lru-cached closures must never capture
    # traced arrays (ops() may first be called inside a jit trace)
    b3 = FP.mont_const(CTX, 3 * B_G1)
    return W.FieldOps(
        add=lambda a, b: FP.add(CTX, a, b),
        sub=lambda a, b: FP.sub(CTX, a, b),
        neg=lambda a: FP.neg(CTX, a),
        mul_many=_mul_many,
        is_zero=lambda a: FP.is_zero(CTX, a),
        eq=lambda a, b: FP.eq(CTX, a, b),
        zero=lambda batch=(): FP.zero(CTX, batch),
        one=lambda batch=(): FP.one(CTX, batch),
        select=_select,
        tighten=lambda a: FP.tighten(CTX, a),
        b3_const=b3,
        elem_ndim=1,
        fused_add=_fused_add if FP.ENGINE == "fp32" else None,
        fused_madd=_fused_madd if FP.ENGINE == "fp32" else None,
        fused_dbl=_fused_dbl if FP.ENGINE == "fp32" else None,
        inv=lambda a: FP.inv(CTX, a),
    )


# -- constructors ------------------------------------------------------------


def generator(batch=()):
    x = FP.from_int(CTX, G1_GEN_X)
    y = FP.from_int(CTX, G1_GEN_Y)
    o = ops()
    return (
        jnp.broadcast_to(x, batch + x.shape),
        jnp.broadcast_to(y, batch + y.shape),
        o.one(batch),
    )


def identity(batch=()):
    return W.identity(ops(), batch)


def from_affine_ints(xs, ys):
    """Host ints (scalars or lists) -> batched device points."""
    x = FP.from_int(CTX, xs)
    y = FP.from_int(CTX, ys)
    return (x, y, FP.one(CTX, x.shape[:-1]))


# -- group ops ---------------------------------------------------------------


def add(p, q):
    return W.add(ops(), p, q)


def double(p):
    return W.double(ops(), p)


def neg(p):
    return W.negate(ops(), p)


def eq(p, q):
    return W.eq(ops(), p, q)


def is_identity(p):
    return W.is_identity(ops(), p)


def on_curve(p):
    return W.on_curve(ops(), p)


def scalar_mul(p, e_std, n_bits: int = 255):
    """[e]P; e_std: standard-domain Fr limbs (..., 18).  Uses the 2-dim GLV
    ladder (128 doubles + 128 adds) — the plain double-and-add remains as
    scalar_mul_plain for differential tests."""
    from . import endo

    return endo.glv_mul_g1(ops(), p, e_std)


def scalar_mul_plain(p, e_std, n_bits: int = 255):
    return W.scalar_mul(ops(), p, e_std, n_bits)


def mul_int(p, k: int):
    """Multiply by a host integer (no mod-r reduction; used for cofactors)."""
    if k == 0:
        return identity(p[0].shape[:-1])
    bits = np.array([int(b) for b in bin(k)[2:]], np.int32)
    import jax

    def body(acc, bit):
        acc = double(acc)
        acc = W.select_point(ops(), bit != 0, add(acc, p), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, identity(p[0].shape[:-1]), jnp.asarray(bits))
    return acc


def clear_cofactor(p):
    """Effective-cofactor clearing by 1+|x| (ref ECP_cfp + rom CURVE_Cof)."""
    return mul_int(p, H_EFF_G1)


def in_subgroup(p):
    """Endomorphism subgroup check (PAIR_G1member,
    ref pair_BLS12381.cpp:1034-1065): for P on the curve,
    phi(P) == [-x^2]P with phi(X,Y,Z) = (beta*X, Y, Z), plus the
    low-order rejection [x]P != P — two 64-bit |x| chains (63 dbl +
    5 add each) instead of the old 255-step [r]P ladder.  The identity
    counts as a member (it IS in the subgroup; the reference returns
    false there only because callers treat infinity separately)."""
    from ..params import X_ABS
    from . import endo

    o = ops()
    xp = W.mul_const_chain(o, p, X_ABS)
    low = W.eq(o, xp, p)
    # our GLV beta (curves/endo.py) is the cube root with eigenvalue
    # lambda = x^2 - 1 (the reference's CRu pairs with -x^2; both are
    # roots of z^2 + z + 1 mod r): phi(P) == [x^2]P - P
    x2p = W.mul_const_chain(o, xp, X_ABS)
    t = W.add(o, x2p, W.negate(o, p))                    # [x^2 - 1]P
    w = endo.phi_g1(p)
    member = jnp.logical_and(W.eq(o, w, t), jnp.logical_not(low))
    member = jnp.logical_and(member, on_curve(p))
    return jnp.logical_or(member, is_identity(p))


def in_subgroup_slow(p):
    """Full order check [r]P == O (differential oracle for in_subgroup)."""
    return jnp.logical_and(is_identity(mul_int(p, R)), on_curve(p))


# -- affine / host conversion ------------------------------------------------


def to_affine(p):
    """Returns (x, y, inf_mask) with x,y canonical only through FP domain
    (still Montgomery limbs); inf handled by mask."""
    X, Y, Z = p
    zi = FP.inv(CTX, Z)
    x, y = _mul_many([(X, zi), (Y, zi)])
    return x, y, is_identity(p)


def to_affine_ints(p):
    """Host conversion: numpy object arrays (x, y) and None-mask for
    infinity (single point -> tuple or None)."""
    x, y, inf = to_affine(p)
    xi = FP.to_int(CTX, x)
    yi = FP.to_int(CTX, y)
    inf = np.asarray(inf)
    if inf.shape == ():
        return None if bool(inf) else (int(xi), int(yi))
    out = np.empty(inf.shape, object)
    it = np.nditer(inf, flags=["multi_index"])
    for v in it:
        idx = it.multi_index
        out[idx] = None if bool(v) else (int(xi[idx]), int(yi[idx]))
    return out
