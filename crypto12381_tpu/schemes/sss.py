"""Shamir secret sharing over Zp.

Counterpart of the reference's examples/shamir-secret-sharing
(src/sss.cpp:5-23): polynomial sharing + Lagrange reconstruction.  Batched
large-n sharing on TPU lives in parallel/ (Fr polynomial evaluation is a
batched Horner over the device scalar field).
"""

from __future__ import annotations

from ..api.sets import Zp, make_Zp, parse, polynomial, select_in, serialize
from ..api.elements import ZpNumber

__all__ = ["share", "reconstruct"]


def share(t: int, n: int, secret: bytes, random) -> list[bytes]:
    """t-of-n sharing: shares are p(1..n) for a degree t-1 polynomial with
    constant term = secret."""
    s = parse(Zp, secret)
    a = select_in(Zp, random, t - 1)
    return [serialize(polynomial(x, s, a)) for x in range(1, n + 1)]


def reconstruct(indexes, shares) -> bytes:
    """Lagrange interpolation at 0 over the given share subset."""
    t = len(indexes)
    x = [make_Zp(i) for i in indexes]
    y = [parse(Zp, s) for s in shares]
    acc = ZpNumber(0)
    for i in range(t):
        lam = ZpNumber(1)
        for j in range(t):
            if j == i:
                continue
            lam = lam * (-x[j] / (x[i] - x[j]))
        acc = acc + y[i] * lam
    return serialize(acc)
