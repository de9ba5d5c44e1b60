"""Shamir secret sharing over Zp.

Counterpart of the reference's examples/shamir-secret-sharing
(src/sss.cpp:5-23): polynomial sharing + Lagrange reconstruction.  Batched
large-n sharing on TPU lives in parallel/ (Fr polynomial evaluation is a
batched Horner over the device scalar field).
"""

from __future__ import annotations

from ..api.algebra import algebraic, symbols
from ..api.sets import (Zp, make_Zp, parse, polynomial, product_, select_in,
                        serialize)
from ..api.elements import ZpNumber

__all__ = ["share", "reconstruct"]


def share(t: int, n: int, secret: bytes, random) -> list[bytes]:
    """t-of-n sharing: shares are p(1..n) for a degree t-1 polynomial with
    constant term = secret."""
    s = parse(Zp, secret)
    a = select_in(Zp, random, t - 1)
    return [serialize(polynomial(x, s, a)) for x in range(1, n + 1)]


def reconstruct(indexes, shares) -> bytes:
    """Lagrange interpolation at 0 over the given share subset, in the
    reference's symbolic notation Σ[i](y_i · Π[j.in[t].except(i)](
    -x_j/(x_i-x_j))) (src/sss.cpp:14-21)."""
    t = len(indexes)
    x = algebraic([make_Zp(i) for i in indexes])
    y = algebraic([parse(Zp, s) for s in shares])
    acc = ZpNumber(0)
    j_, = symbols("j_")
    for i in range(t):
        if t == 1:
            lam = ZpNumber(1)
        else:
            lam = product_(-(x[j_]) / (x[i] - x[j_]), j_.in_[t].except_(i))
        acc = acc + y[i] * lam
    return serialize(acc)
