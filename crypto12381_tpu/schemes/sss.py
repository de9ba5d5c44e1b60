"""Shamir secret sharing over Zp.

Counterpart of the reference's examples/shamir-secret-sharing
(src/sss.cpp:5-23): polynomial sharing + Lagrange reconstruction.  The
scalar paths below match the reference byte-for-byte; `share_batch` /
`reconstruct_batch` are the device paths for large n (BASELINE.json
configs[3]: 10k shares) — a batched Horner ladder over Fr and a single
Montgomery batch inversion for the Lagrange denominators.
"""

from __future__ import annotations

from ..api.algebra import algebraic, symbols
from ..api.sets import (Zp, make_Zp, parse, polynomial, product_, select_in,
                        serialize)
from ..api.elements import ZpNumber

__all__ = ["share", "reconstruct", "share_batch", "reconstruct_batch"]


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


def share_batch(t: int, n: int, secret: bytes, random) -> list[bytes]:
    """Device t-of-n sharing: identical bytes to `share` (same CSPRNG
    draws), but the n polynomial evaluations run as ONE batched Horner
    ladder over Fr on device — t-1 batched muls total instead of the
    scalar path's n*(t-1) host muls.  Built for the 10k-share config."""
    from ..api import batch as BT

    s = parse(Zp, secret)
    a = select_in(Zp, random, t - 1)  # coefficients a_1 .. a_{t-1}
    coeffs = [s] + list(a)
    xs = BT.ZpVec.from_ints(range(1, n + 1))
    acc = BT.ZpVec.from_ints([coeffs[-1].value])  # (1,) broadcasts over n
    for c in reversed(coeffs[:-1]):
        acc = acc * xs + BT.ZpVec.from_ints([c.value])
    return acc.serialize()


def reconstruct_batch(indexes, shares) -> bytes:
    """Device Lagrange reconstruction at 0: the t denominators
    Π[j!=i](x_i - x_j) invert in ONE Montgomery batch inversion
    (fields/fp.batch_inv — 1 inversion + 3(t-1) muls) instead of t host
    inversions; same bytes as `reconstruct`."""
    import jax.numpy as jnp

    from ..api import batch as BT
    from ..fields import fp as FP

    FR = FP.FR_CTX
    t = len(indexes)
    ys = BT.ZpVec.from_ints([parse(Zp, s).value for s in shares])
    if t == 1:
        return serialize(ZpNumber(int(ys.to_ints()[0])))
    xm = FP.to_mont(FR, BT.ZpVec.from_ints(indexes).std)   # (t, L) mont
    # pairwise differences x_i - x_j with the diagonal replaced by 1
    diff = FP.sub(FR, xm[:, None, :], xm[None, :, :], 17)  # (t, t, L)
    eye = jnp.eye(t, dtype=bool)[:, :, None]
    diff = jnp.where(eye, FP.one(FR, (t, t)), diff)
    # denominator_i = Π_j diff[i, j]  (tree product along j)
    den = jnp.moveaxis(diff, 1, 0)
    while den.shape[0] > 1:
        half = den.shape[0] // 2
        merged = FP.mont_mul(FR, den[:half], den[half : 2 * half])
        if den.shape[0] % 2:
            merged = jnp.concatenate([merged, den[-1:]], 0)
        den = merged
    den_inv = FP.batch_inv(FR, den[0])                     # (t, L)
    # numerator_i = Π_{j!=i}(-x_j) = Π_j(-x_j) / (-x_i)
    neg_xm = FP.neg(FR, xm, 17)
    num_all = neg_xm
    while num_all.shape[0] > 1:
        half = num_all.shape[0] // 2
        merged = FP.mont_mul(FR, num_all[:half], num_all[half : 2 * half])
        if num_all.shape[0] % 2:
            merged = jnp.concatenate([merged, num_all[-1:]], 0)
        num_all = merged
    num = FP.mont_mul(
        FR, jnp.broadcast_to(num_all[0], neg_xm.shape), FP.batch_inv(FR, neg_xm)
    )
    lam = FP.mont_mul(FR, num, den_inv)
    terms = FP.mont_mul(FR, lam, FP.to_mont(FR, ys.std))
    # tree-sum the t canonical terms with the exact ZpVec addition
    tv = BT.ZpVec(FP.from_mont(FR, terms))
    while tv.std.shape[0] > 1:
        half = tv.std.shape[0] // 2
        merged = BT.ZpVec(tv.std[:half]) + BT.ZpVec(tv.std[half : 2 * half])
        if tv.std.shape[0] % 2:
            merged = BT.ZpVec(jnp.concatenate([merged.std, tv.std[-1:]], 0))
        tv = merged
    return tv.serialize()[0]
