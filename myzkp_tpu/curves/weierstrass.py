"""Batched short-Weierstrass curve arithmetic in homogeneous projective
coordinates with *complete* formulas (branchless — ideal for XLA/TPU).

For curves y^2 = x^3 + b (a = 0: BN254 G1, G2 and the Fq12 curve), we use the
complete addition/doubling formulas of Renes–Costello–Batina 2016
(eprint 2015/1060, Algorithms 7 & 9).  Complete means the same straight-line
code handles P+Q, P+P, P+O, O+Q and P+(-P) — no data-dependent control flow,
so a whole batch of heterogeneous cases is one vector program.

This replaces the reference's affine chord/tangent formulas with per-op field
inversions and Option<>-based infinity branching
(myzkp/src/modules/algebra/curve/curve.rs:56-161) and its per-scalar
double-and-add (curve.rs:163-191) — both hostile to batching.

A point batch is ``Point(x, y, z)`` where each coordinate is a field-element
pytree for the supplied ops object (see field_ops.py); infinity is (0,1,0).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Point(NamedTuple):
    """Homogeneous projective point batch; coords are field pytrees."""

    x: Any
    y: Any
    z: Any


def infinity(F, batch_shape=()) -> Point:
    return Point(F.zeros(batch_shape), F.one(batch_shape), F.zeros(batch_shape))


def from_affine(F, x, y) -> Point:
    return Point(x, y, F.one(F.batch_shape(x)))


def is_infinity(F, p: Point):
    return F.is_zero(p.z)


def padd(F, b3, p: Point, q: Point) -> Point:
    """Complete addition, a=0 (RCB16 Algorithm 7). b3 = 3*b as field const.

    Large batches on TPU route to the fused Pallas kernel (curve_pallas.py),
    which replays this exact formula on tile-level field ops in VMEM.
    """
    from . import curve_pallas

    fused = curve_pallas.try_padd(F, b3, p, q)
    if fused is not None:
        return fused
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
    t4 = F.sub(t4, F.add(t1, t2))
    X3 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
    Y3 = F.sub(X3, F.add(t0, t2))
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = F.mul(b3, t2)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul(b3, Y3)
    X3 = F.mul(t4, Y3)
    X3 = F.sub(F.mul(t3, t1), X3)
    Y3 = F.mul(Y3, t0)
    Y3 = F.add(F.mul(t1, Z3), Y3)
    t0 = F.mul(t0, t3)
    Z3 = F.add(F.mul(Z3, t4), t0)
    return Point(X3, Y3, Z3)


def padd_sel(F, b3, p: Point, q: Point, keep_q) -> Point:
    """select(keep_q, q, p + q) — the segmented-accumulation body, fused into
    one kernel launch on TPU."""
    from . import curve_pallas

    fused = curve_pallas.try_padd(F, b3, p, q, h=keep_q)
    if fused is not None:
        return fused
    return pselect(F, keep_q, q, padd(F, b3, p, q))


def padd_mixed(F, b3, p: Point, qx, qy) -> Point:
    """Complete MIXED addition P + (qx, qy, 1), a=0 (RCB16 Algorithm 8).

    Specializes padd's Z2 = 1: t2 = Z1 for free, and the two pair-products
    involving Z2 collapse to Z1*qy + Y1 and Z1*qx + X1 — 13 field muls
    instead of 14 plus fewer adds.  Used by the fused Pallas G2/mixed-add
    paths (curve_pallas.try_padd_mixed); the G1 MSM bucket scan itself now
    runs the full projective complete add on a row-major point table, so it
    no longer routes through here.  Q must not be the point at infinity
    (affine form can't express it).
    """
    from . import curve_pallas

    fused = curve_pallas.try_padd_mixed(F, b3, p, qx, qy)
    if fused is not None:
        return fused
    X1, Y1, Z1 = p
    t0 = F.mul(X1, qx)
    t1 = F.mul(Y1, qy)
    t3 = F.mul(F.add(X1, Y1), F.add(qx, qy))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.add(F.mul(Z1, qy), Y1)
    Y3 = F.add(F.mul(Z1, qx), X1)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = F.mul(b3, Z1)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul(b3, Y3)
    X3 = F.mul(t4, Y3)
    X3 = F.sub(F.mul(t3, t1), X3)
    Y3 = F.mul(Y3, t0)
    Y3 = F.add(F.mul(t1, Z3), Y3)
    t0 = F.mul(t0, t3)
    Z3 = F.add(F.mul(Z3, t4), t0)
    return Point(X3, Y3, Z3)


def padd_mixed_sel(F, b3, p: Point, qx, qy, keep_q) -> Point:
    """select(keep_q, (qx, qy, 1), P + Q) — the mixed MSM bucket-scan body,
    fused into one kernel launch on TPU."""
    from . import curve_pallas

    fused = curve_pallas.try_padd_mixed(F, b3, p, qx, qy, h=keep_q)
    if fused is not None:
        return fused
    q = Point(qx, qy, F.one(F.batch_shape(qx)))
    return pselect(F, keep_q, q, padd_mixed(F, b3, p, qx, qy))


def pdbl(F, b3, p: Point) -> Point:
    """Complete doubling, a=0 (RCB16 Algorithm 9)."""
    from . import curve_pallas

    fused = curve_pallas.try_pdbl(F, b3, p)
    if fused is not None:
        return fused
    X, Y, Z = p
    t0 = F.sqr(Y)
    Z3 = F.add(t0, t0)
    Z3 = F.add(Z3, Z3)
    Z3 = F.add(Z3, Z3)
    t1 = F.mul(Y, Z)
    t2 = F.sqr(Z)
    t2 = F.mul(b3, t2)
    X3 = F.mul(t2, Z3)
    Y3 = F.add(t0, t2)
    Z3 = F.mul(t1, Z3)
    t1 = F.add(t2, t2)
    t2 = F.add(t1, t2)
    t0 = F.sub(t0, t2)
    Y3 = F.mul(t0, Y3)
    Y3 = F.add(X3, Y3)
    t1 = F.mul(X, Y)
    X3 = F.mul(t0, t1)
    X3 = F.add(X3, X3)
    return Point(X3, Y3, Z3)


def pneg(F, p: Point) -> Point:
    return Point(p.x, F.neg(p.y), p.z)


def pselect(F, mask, p: Point, q: Point) -> Point:
    return Point(
        F.select(mask, p.x, q.x), F.select(mask, p.y, q.y), F.select(mask, p.z, q.z)
    )


def peq(F, b3, p: Point, q: Point):
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 (both inf ok)."""
    both_inf = is_infinity(F, p) & is_infinity(F, q)
    ex = F.eq(F.mul(p.x, q.z), F.mul(q.x, p.z))
    ey = F.eq(F.mul(p.y, q.z), F.mul(q.y, p.z))
    one_inf = is_infinity(F, p) ^ is_infinity(F, q)
    return both_inf | (ex & ey & ~one_inf)


def to_affine(F, p: Point, axis: int = -1):
    """(x, y, inf_mask) with batch inversion of z along a batch axis."""
    zinv = F.batch_inv(p.z, axis=axis)
    return F.mul(p.x, zinv), F.mul(p.y, zinv), is_infinity(F, p)


# ---------------------------------------------------------------------------
# Scalar multiplication
# ---------------------------------------------------------------------------

def scalar_mul_const(F, b3, p: Point, e: int) -> Point:
    """[e]P for a static host int e >= 0 (unrolled-free: scan over bits)."""
    if e == 0:
        return infinity(F, F.batch_shape(p.x))
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    )

    def body(carry, bit):
        acc, base = carry
        mask = bit > 0
        acc = pselect(F, mask, padd(F, b3, acc, base), acc)
        base = pdbl(F, b3, base)
        return (acc, base), None

    acc0 = infinity(F, F.batch_shape(p.x))
    (acc, _), _ = jax.lax.scan(body, (acc0, p), bits)
    return acc


def scalar_mul_bits(F, b3, p: Point, bits) -> Point:
    """[e]P where e is given as a traced LSB-first bit array.

    bits: uint32 (nbits, *batch) broadcastable against the point batch.
    """

    def body(carry, bit):
        acc, base = carry
        acc = pselect(F, bit > 0, padd(F, b3, acc, base), acc)
        base = pdbl(F, b3, base)
        return (acc, base), None

    acc0 = infinity(F, F.batch_shape(p.x))
    (acc, _), _ = jax.lax.scan(body, (acc0, p), bits)
    return acc


def tree_sum(F, b3, p: Point, axis: int = 0,
             fuse_min_elems: int = 0) -> Point:
    """EC sum of a point batch along an axis: halving reduction, O(n) adds.

    Each level adds the top half onto the bottom half (one batched
    complete-add per level, fused into one kernel launch on TPU), so total
    work is n + n/2 + ... = 2n adds — not the n log n of a full-width
    roll-reduce.  Non-power-of-two sizes are padded with infinity.

    ``fuse_min_elems`` > 0 routes levels whose batch drops below that many
    elements through the pure-JAX path: every fused-kernel SHAPE costs
    Mosaic lowering + remote-compile time, and a halving tree mints one
    shape per level — capping fusion at the wide levels keeps ~all the
    runtime win at a fraction of the compile cost (the narrow levels'
    math is microseconds either way).
    """
    ax = _leaf_axis(axis)
    leaf0 = jax.tree_util.tree_leaves(p)[0]
    n = leaf0.shape[ax]
    if n == 1:
        return jax.tree_util.tree_map(lambda a: jnp.squeeze(a, axis=ax), p)
    n2 = 1 << (n - 1).bit_length()
    if n2 != n:
        inf = infinity(F, ())
        p = jax.tree_util.tree_map(
            lambda a, i: jnp.concatenate(
                [a, jnp.broadcast_to(
                    i.reshape(i.shape[:1] + (1,) * (a.ndim - 1)),
                    a.shape[:ax] + (n2 - n,) + a.shape[ax + 1:])],
                axis=ax),
            p, inf)

    import contextlib
    import math

    from . import curve_pallas

    if curve_pallas.enabled():
        # TPU: halving levels, each ONE fused-kernel complete-add; total
        # work 2n adds.
        other = math.prod(leaf0.shape[1:]) // max(1, n)
        m = n2
        while m > 1:
            m //= 2
            lo = jax.tree_util.tree_map(
                lambda a: jax.lax.slice_in_dim(a, 0, m, axis=ax), p)
            hi = jax.tree_util.tree_map(
                lambda a: jax.lax.slice_in_dim(a, m, 2 * m, axis=ax), p)
            ctx = (curve_pallas.no_fuse()
                   if 0 < m * other < fuse_min_elems
                   else contextlib.nullcontext())
            with ctx:
                p = padd(F, b3, Point(*lo), Point(*hi))
        return jax.tree_util.tree_map(
            lambda a: jax.lax.index_in_dim(a, 0, axis=ax, keepdims=False), p)

    # CPU golden path: single traced complete-add iterated by fori_loop with
    # a shrinking stride (compile-lean; n log n work is fine off-TPU).
    steps = n2.bit_length() - 1

    def body(k, pt):
        stride = n2 >> (k + 1)
        rolled = jax.tree_util.tree_map(
            lambda a: jnp.roll(a, -stride, axis=ax), pt)
        return padd(F, b3, pt, rolled)

    out = jax.lax.fori_loop(0, steps, body, p)
    return jax.tree_util.tree_map(
        lambda a: jax.lax.index_in_dim(a, 0, axis=ax, keepdims=False), out)


def _leaf_axis(axis: int) -> int:
    # leaves are limb arrays (L, *batch); batch axis k is leaf axis k+1
    assert axis >= 0
    return axis + 1
