"""Batched G2 = E'(Fp2): y^2 = x^3 + 4(1+i) (M-type twist) on TPU.

Capability counterpart of the reference's ECP2 unit + G2Point wrapper
(ecp2_BLS12381.cpp, include/crypto12381/g2_point.hpp), sharing the complete
homogeneous formulas with G1 via the pluggable field-ops table.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields import active as FP
from ..fields import tower as TW
from ..params import B_G2, G2_GEN_X, G2_GEN_Y, R
from . import weierstrass as W

CTX = FP.FP_CTX


def _fp2_from_ints(v):
    return jnp.stack(
        [FP.from_int(CTX, v[0]), FP.from_int(CTX, v[1])], axis=-2
    )


def _select(mask, a, b):
    return jnp.where(mask[..., None, None], a, b)


def _c2(x):
    return [x[..., 0, :], x[..., 1, :]]


def _fused_point_op(fn, coords, n_pt1):
    """Run a fused composite G2 point op over broadcast coords."""
    coords = jnp.broadcast_arrays(*coords)
    scalar = coords[0].ndim == 2
    if scalar:
        coords = [c[None] for c in coords]
    p1 = tuple(_c2(c) for c in coords[:n_pt1])
    p2 = tuple(_c2(c) for c in coords[n_pt1:])
    out = fn(p1, p2)
    res = tuple(jnp.stack(u, axis=-2) for u in out)
    return tuple(r[0] for r in res) if scalar else res


def _fused_add(p, q):
    """Whole RCB Fp2 addition via stacked fp2_mul kernels (fields/fp32k)."""
    from ..fields import fp32k as FK

    return _fused_point_op(FK.g2_add_c, list(p) + list(q), 3)


def _fused_madd(p, q):
    from ..fields import fp32k as FK

    return _fused_point_op(FK.g2_madd_c, list(p) + list(q), 3)


def _fused_dbl(p):
    from ..fields import fp32k as FK

    coords = jnp.broadcast_arrays(*p)
    scalar = coords[0].ndim == 2
    if scalar:
        coords = [c[None] for c in coords]
    out = FK.g2_dbl_c(tuple(_c2(c) for c in coords))
    res = tuple(jnp.stack(u, axis=-2) for u in out)
    return tuple(r[0] for r in res) if scalar else res


@functools.lru_cache(maxsize=1)
def ops() -> W.FieldOps:
    # host-side Montgomery constant (see g1.ops note on lru-cached tracers)
    def mont(v):
        return FP.mont_const(FP.FP_CTX, v)

    b3 = np.stack([mont(3 * B_G2[0]), mont(3 * B_G2[1])])
    return W.FieldOps(
        add=TW.fp2_add,
        sub=TW.fp2_sub,
        neg=TW.fp2_neg,
        mul_many=TW.fp2_mul_many,
        is_zero=TW.fp2_is_zero,
        eq=TW.fp2_eq,
        zero=TW.fp2_zero,
        one=TW.fp2_one,
        select=_select,
        tighten=lambda a: FP.tighten(FP.FP_CTX, a),
        b3_const=b3,
        elem_ndim=2,
        fused_add=_fused_add if FP.ENGINE == "fp32" else None,
        fused_madd=_fused_madd if FP.ENGINE == "fp32" else None,
        fused_dbl=_fused_dbl if FP.ENGINE == "fp32" else None,
        inv=TW.fp2_inv,
    )


# -- constructors ------------------------------------------------------------


def generator(batch=()):
    x = _fp2_from_ints(G2_GEN_X)
    y = _fp2_from_ints(G2_GEN_Y)
    return (
        jnp.broadcast_to(x, batch + x.shape),
        jnp.broadcast_to(y, batch + y.shape),
        TW.fp2_one(batch),
    )


def identity(batch=()):
    return W.identity(ops(), batch)


def from_affine_fp2(x_pair, y_pair):
    """Host Fp2 int pairs (re, im) — scalars or lists — to device points."""
    x = _fp2_from_ints(x_pair)
    return (x, _fp2_from_ints(y_pair), TW.fp2_one(x.shape[:-2]))


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
    """[e]Q via the 4-dim Galbraith-Scott ladder (64 doubles + 64 adds);
    scalar_mul_plain keeps the generic ladder for differential tests."""
    from . import endo

    return endo.gs_mul_g2(ops(), p, e_std)


def scalar_mul_plain(p, e_std, n_bits: int = 255):
    return W.scalar_mul(ops(), p, e_std, n_bits)


def mul_int(p, k: int):
    """Multiply by a host integer (no mod-r reduction; cofactor/member
    arithmetic)."""
    import jax

    if k == 0:
        return identity(p[0].shape[:-2])
    bits = np.array([int(b) for b in bin(k)[2:]], np.int32)

    def body(acc, bit):
        acc = W.double(ops(), acc)
        acc = W.select_point(ops(), bit != 0, W.add(ops(), acc, p), acc)
        return acc, None

    acc, _ = jax.lax.scan(
        body, identity(p[0].shape[:-2]), jnp.asarray(bits)
    )
    return acc


def in_subgroup(p):
    """Batched device G2 membership: psi(Q) == [x]Q, i.e.
    psi(Q) + [|x|]Q == O for the negative BLS parameter x — one 64-bit
    ladder + one endomorphism instead of a full [r]Q (TPU counterpart of
    PAIR_G2member, ref pair_BLS12381.cpp:1132-1160)."""
    from . import endo
    from ..params import X_ABS

    chk = W.add(ops(), endo.psi_g2(p), W.mul_const_chain(ops(), p, X_ABS))
    return jnp.logical_and(W.is_identity(ops(), chk), on_curve(p))


def clear_cofactor(p):
    """Batched device cofactor clearing (Budroni-Pintore fast method):
    h(Q) = [x^2 - x - 1]Q + [x - 1]psi(Q) + psi^2([2]Q), with the two
    [|x|]-ladders shared (x = -|x|)."""
    from . import endo
    from ..params import X_ABS

    o = ops()
    t0 = mul_int(p, X_ABS)                 # [|x|]Q = [-x]Q
    t1 = mul_int(t0, X_ABS)                # [x^2]Q
    # [x^2 - x - 1]Q = t1 + t0 - Q
    a = W.add(o, W.add(o, t1, t0), W.negate(o, p))
    # [x - 1]psi(Q) = psi([x - 1]Q) = psi(-(t0) - Q)
    b = endo.psi_g2(W.negate(o, W.add(o, t0, p)))
    # psi^2([2]Q)
    c = endo.psi_g2(endo.psi_g2(W.double(o, p)))
    return W.add(o, W.add(o, a, b), c)


def to_affine(p):
    X, Y, Z = p
    zi = TW.fp2_inv(Z)
    x, y = TW.fp2_mul_many([(X, zi), (Y, zi)])
    return x, y, is_identity(p)


def to_affine_ints(p):
    """Host conversion -> ((xr, xi), (yr, yi)) tuples or None (infinity)."""
    x, y, inf = to_affine(p)

    def fp2_ints(c):
        return (
            FP.to_int(CTX, c[..., 0, :]),
            FP.to_int(CTX, c[..., 1, :]),
        )

    xr, xi_ = fp2_ints(x)
    yr, yi_ = fp2_ints(y)
    inf = np.asarray(inf)
    if inf.shape == ():
        if bool(inf):
            return None
        return ((int(xr), int(xi_)), (int(yr), int(yi_)))
    out = np.empty(inf.shape, object)
    it = np.nditer(inf, flags=["multi_index"])
    for v in it:
        idx = it.multi_index
        out[idx] = (
            None
            if bool(v)
            else ((int(xr[idx]), int(xi_[idx])), (int(yr[idx]), int(yi_[idx])))
        )
    return out
