"""Generic batched short-Weierstrass group law (y^2 = x^3 + b, a = 0).

TPU-native replacement for the reference's ECP/ECP2 Jacobian case-split
arithmetic (ecp_BLS12381.cpp:550-751, ecp2_BLS12381.cpp): instead of
branching on infinity/equal/negated points (impossible under jit on batched
data), we use the *complete* homogeneous-projective addition formulas of
Renes-Costello-Batina 2015 (Alg. 7 for j-invariant-0 curves) — one
exception-free formula covers add, double, identity and inverses, perfectly
branchless for batch execution.

Points are (X, Y, Z) homogeneous: x = X/Z, y = Y/Z; identity = (0, 1, 0).
The field is pluggable (Fp for G1, Fp2 for G2) through a small ops table, so
one implementation serves both curves.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class FieldOps:
    """Field operation table for one coefficient field."""

    add: Callable
    sub: Callable
    neg: Callable
    mul_many: Callable            # list[(a,b)] -> list[product]
    is_zero: Callable             # -> bool array over batch
    eq: Callable
    zero: Callable                # (batch_shape) -> element
    one: Callable
    select: Callable              # (mask, a, b) with batch-shaped mask
    tighten: Callable             # value/limb re-tightening (fp.tighten)
    b3_const: Any                 # field element: 3*b (broadcastable)
    #: element ndim past batch dims (1 for Fp (L,), 2 for Fp2 (2,L))
    elem_ndim: int = 1
    #: optional fused single-kernel complete add (fields/fp32k); takes
    #: (p, q) point tuples and returns the sum — used when available
    fused_add: Any = None
    #: optional fused mixed add: (p, (X2, Y2)) with implicit Z2 = 1
    fused_madd: Any = None
    #: optional fused dedicated doubling
    fused_dbl: Any = None
    #: batched single-element inversion (Fermat ladder); used once per
    #: Montgomery batch-inversion block in msm.force_affine
    inv: Any = None


def identity(ops: FieldOps, batch=()):
    return (ops.zero(batch), ops.one(batch), ops.zero(batch))


def is_identity(ops: FieldOps, p):
    return ops.is_zero(p[2])


def negate(ops: FieldOps, p):
    return (p[0], ops.neg(p[1]), p[2])


def add(ops: FieldOps, p, q):
    """Complete addition (RCB15 Alg. 7, b3 = 3b): 14 field muls in three
    stacked multiplication rounds on this XLA fallback; the fused kernel
    program (fields/fp32k._rcb_add_generic, taken when the fp32 engine's
    fused path is on) folds 3b into digit scalings — 12 muls, two
    rounds, one kernel launch."""
    if ops.fused_add is not None:
        from ..fields import fp32k as FK

        if FK.enabled():
            return ops.fused_add(p, q)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    b3 = ops.b3_const
    m = ops.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (ops.add(X1, Y1), ops.add(X2, Y2)),
            (ops.add(Y1, Z1), ops.add(Y2, Z2)),
            (ops.add(X1, Z1), ops.add(X2, Z2)),
        ]
    )
    t0, t1, t2, m3, m4, m5 = m
    t3 = ops.sub(m3, ops.add(t0, t1))        # X1Y2 + X2Y1
    t4 = ops.sub(m4, ops.add(t1, t2))        # Y1Z2 + Y2Z1
    t5 = ops.sub(m5, ops.add(t0, t2))        # X1Z2 + X2Z1
    w = ops.add(ops.add(t0, t0), t0)         # 3 X1X2
    bt2, bt5 = ops.mul_many([(b3, t2), (b3, t5)])
    z3a = ops.add(t1, bt2)                   # Y1Y2 + 3b Z1Z2
    t1m = ops.sub(t1, bt2)                   # Y1Y2 - 3b Z1Z2
    c = ops.mul_many(
        [(t3, t1m), (t4, bt5), (bt5, w), (t1m, z3a), (w, t3), (z3a, t4)]
    )
    X3 = ops.sub(c[0], c[1])
    Y3 = ops.add(c[3], c[2])
    Z3 = ops.add(c[5], c[4])
    # re-tighten so coordinate values/limbs stay bounded across scan steps
    return (ops.tighten(X3), ops.tighten(Y3), ops.tighten(Z3))


def double(ops: FieldOps, p):
    """Dedicated exception-free doubling (RCB15 Alg. 9, j-inv 0): 8 field
    muls + one b3 multiply instead of add(p, p)'s 14 — still complete
    (identity doubles to identity; no branches).

    X3 = 2XY(Y^2-9bZ^2); Y3 = (Y^2-9bZ^2)(Y^2+3bZ^2) + 24bY^2Z^2;
    Z3 = 8Y^3Z."""
    if ops.fused_dbl is not None:
        from ..fields import fp32k as FK

        if FK.enabled():
            return ops.fused_dbl(p)
    X, Y, Z = p
    b3 = ops.b3_const
    t0, t1, xy, z2 = ops.mul_many([(Y, Y), (Y, Z), (X, Y), (Z, Z)])
    (t2,) = ops.mul_many([(b3, z2)])
    z3_8y2 = ops.add(ops.add(ops.add(t0, t0), ops.add(t0, t0)),
                     ops.add(ops.add(t0, t0), ops.add(t0, t0)))  # 8 Y^2
    y3a = ops.add(t0, t2)                       # Y^2 + 3bZ^2
    t0m = ops.sub(t0, ops.add(ops.add(t2, t2), t2))  # Y^2 - 9bZ^2
    x3a, z3, y3b, x3b = ops.mul_many(
        [(t2, z3_8y2), (t1, z3_8y2), (t0m, y3a), (t0m, xy)]
    )
    Y3 = ops.add(y3b, x3a)
    X3 = ops.add(x3b, x3b)
    return (ops.tighten(X3), ops.tighten(Y3), ops.tighten(z3))


def madd(ops: FieldOps, p, q):
    """Mixed complete addition p + (X2 : Y2 : 1) — RCB15 Alg. 7 with
    Z2 = 1 folded in: 13 field muls instead of 14 on this XLA fallback
    (the fused program folds 3b into digit scalings: 11 muls, two
    rounds — fields/fp32k._rcb_madd_generic), and exception-free for
    every p (q must NOT be the identity, which has no Z=1 representative;
    MSM guarantees that by padding with the generator at scalar 0).

    This is the Pippenger bucket-phase workhorse (the reference's ECP_muln
    accumulates affine points the same way, ecp_BLS12381.cpp:1112-1148).
    """
    if ops.fused_madd is not None:
        from ..fields import fp32k as FK

        if FK.enabled():
            return ops.fused_madd(p, q)
    X1, Y1, Z1 = p
    X2, Y2 = q
    b3 = ops.b3_const
    m = ops.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (ops.add(X1, Y1), ops.add(X2, Y2)),
            (X2, Z1),
            (Y2, Z1),
        ]
    )
    t0, t1, m3, zx, zy = m
    t3 = ops.sub(m3, ops.add(t0, t1))        # X1Y2 + X2Y1
    t4 = ops.add(zy, Y1)                     # Y1Z2 + Y2Z1
    t5 = ops.add(zx, X1)                     # X1Z2 + X2Z1
    w = ops.add(ops.add(t0, t0), t0)         # 3 X1X2
    bt2, bt5 = ops.mul_many([(b3, Z1), (b3, t5)])
    z3a = ops.add(t1, bt2)
    t1m = ops.sub(t1, bt2)
    c = ops.mul_many(
        [(t3, t1m), (t4, bt5), (bt5, w), (t1m, z3a), (w, t3), (z3a, t4)]
    )
    X3 = ops.sub(c[0], c[1])
    Y3 = ops.add(c[3], c[2])
    Z3 = ops.add(c[5], c[4])
    return (ops.tighten(X3), ops.tighten(Y3), ops.tighten(Z3))


def select_point(ops: FieldOps, mask, p, q):
    return tuple(ops.select(mask, a, b) for a, b in zip(p, q))


def eq(ops: FieldOps, p, q):
    """Projective equality: X1Z2 == X2Z1 and Y1Z2 == Y2Z1, with identity
    handled via Z == 0."""
    m = ops.mul_many([(p[0], q[2]), (q[0], p[2]), (p[1], q[2]), (q[1], p[2])])
    cross = jnp.logical_and(ops.eq(m[0], m[1]), ops.eq(m[2], m[3]))
    i1 = is_identity(ops, p)
    i2 = is_identity(ops, q)
    return jnp.where(
        jnp.logical_or(i1, i2), jnp.logical_and(i1, i2), cross
    )


def on_curve(ops: FieldOps, p):
    """Y^2 Z == X^3 + b Z^3 (identity passes)."""
    X, Y, Z = p
    m = ops.mul_many([(Y, Y), (X, X), (Z, Z)])
    y2, x2, z2 = m
    m2 = ops.mul_many([(y2, Z), (x2, X), (z2, Z)])
    y2z, x3, z3 = m2
    (bz3,) = ops.mul_many([(ops.b3_const, z3)])  # 3b Z^3
    # compare 3*(Y^2 Z) == 3 X^3 + 3b Z^3
    lhs = ops.add(ops.add(y2z, y2z), y2z)
    rhs = ops.add(ops.add(ops.add(x3, x3), x3), bz3)
    return ops.eq(lhs, rhs)


def scalar_bits(e_std: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """Standard-domain Fr limbs (..., 16) -> bit array (..., n_bits),
    LSB first."""
    idx = jnp.arange(n_bits)
    limb = e_std[..., idx // 16]
    return jnp.bitwise_and(jnp.right_shift(limb, idx % 16), 1)


def scalar_mul_bits(ops: FieldOps, p, bits: jnp.ndarray):
    """Double-and-add over an explicit bit array (..., n) — MSB-first scan.

    The per-bit point add is selected branchlessly; identity start makes the
    whole ladder exception-free.  (Windowed/GLV versions live in msm/.)
    """
    n = bits.shape[-1]
    bits_msb = jnp.moveaxis(bits[..., ::-1], -1, 0)  # (n, ...)

    def body(acc, bit):
        acc = double(ops, acc)
        added = add(ops, acc, p)
        acc = select_point(ops, bit != 0, added, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, identity(ops, bits.shape[:-1]), bits_msb)
    return acc


def scalar_mul(ops: FieldOps, p, e_std: jnp.ndarray, n_bits: int = 255):
    return scalar_mul_bits(ops, p, scalar_bits(e_std, n_bits))


def mul_const_chain(ops: FieldOps, p, k: int, unroll: int = 4):
    """[k]P for a HOST constant k as a static double-and-add chain: zero
    runs compile to scans of pure doublings and only k's set bits pay an
    addition (k = |x| has Hamming weight 6: 63 dbl + 5 add instead of the
    generic ladder's select-add per bit).  Exception-free (complete adds).
    """
    assert k > 0
    bits = bin(k)[2:]
    add_at = [i for i, b in enumerate(bits) if i and b == "1"]
    runs = []
    prev = 0
    for off in add_at:
        runs.append((off - prev, True))
        prev = off
    if prev < len(bits) - 1:
        runs.append((len(bits) - 1 - prev, False))

    acc = p
    for n, add_after in runs:
        ng, rem = divmod(n, unroll)
        if ng >= 2:
            def body(a, _):
                for _ in range(unroll):
                    a = double(ops, a)
                return a, None

            acc, _ = jax.lax.scan(body, acc, None, length=ng)
        else:
            rem = n
        for _ in range(rem):
            acc = double(ops, acc)
        if add_after:
            acc = add(ops, acc, p)
    return acc
