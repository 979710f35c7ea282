"""Multi-scalar multiplication (MSM) on TPU: batched Pippenger.

The reference computes every MSM as a per-coefficient affine double-and-add
(myzkp/src/modules/algebra/polynomial.rs:156-165 `eval_with_powers_on_curve`,
zksnark/utils.rs:83-92 `accumulate_curve_points`, over curve.rs:163-191) —
O(n * 256) sequential group ops with a field inversion per addition.

TPU-first re-design:
  * complete projective formulas (weierstrass.py) — branchless, batched;
  * Pippenger windowed buckets with the bucket accumulation expressed as a
    sort + *blocked segmented reduction*: sort points by digit (XLA sort),
    split the sorted array into B lanes of K contiguous elements, and run one
    lax.scan of K steps where each step performs ONE batched complete-add
    across all B lanes.  Segment boundaries are handled branchlessly: a lane
    whose element starts a new digit resets its accumulator and flushes the
    finished partial into its bucket via a masked scatter (indices are
    provably unique per step — a digit can end mid-lane in at most one lane).
    Work: n + O(B) EC adds per window (vs n·log n for a naive segmented
    associative scan).
  * bucket combination  sum_b b*B_b  via the bit-decomposition identity
    sum_j 2^j * (sum_{b: bit j set} B_b): c masked log-depth tree sums over
    the full bucket array — wide VPU work instead of a 2^c-long serial chain.

Scalars enter as standard-domain 16-bit-limb arrays (L, n) uint32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec
from . import weierstrass as wst
from .weierstrass import Point


# ---------------------------------------------------------------------------
# Scalar digit / bit extraction
# ---------------------------------------------------------------------------

def scalar_bits(s_limbs, nbits: int | None = None):
    """uint32 (L, n) 16-bit limbs -> (nbits, n) LSB-first bit array."""
    L, n = s_limbs.shape[0], s_limbs.shape[1:]
    nbits = nbits or 16 * L
    rows = []
    for b in range(nbits):
        rows.append((s_limbs[b // 16] >> (b % 16)) & np.uint32(1))
    return jnp.stack(rows)


def scalar_digits(s_limbs, c: int):
    """uint32 (L, n) 16-bit limbs -> (W, n) int32 window digits, W=ceil(16L/c).

    Each digit is bits [w*c, (w+1)*c). Requires c <= 16.
    """
    assert 1 <= c <= 16
    L = s_limbs.shape[0]
    nbits = 16 * L
    W = (nbits + c - 1) // c
    out = []
    for w in range(W):
        lo = w * c
        li, off = lo // 16, lo % 16
        val = s_limbs[li] >> np.uint32(off)
        have = 16 - off
        j = li + 1
        while have < c and j < L:
            val = val | (s_limbs[j] << np.uint32(have))
            have += 16
            j += 1
        out.append(val & np.uint32((1 << c) - 1))
    return jnp.stack(out).astype(jnp.int32)  # (W, n)


# ---------------------------------------------------------------------------
# Naive batched MSM (golden model for pippenger; fine for small n)
# ---------------------------------------------------------------------------

def msm_naive(F, b3, points: Point, s_limbs) -> Point:
    """sum_i [s_i] P_i via batched per-point double-and-add + tree sum."""
    bits = scalar_bits(s_limbs)
    per_point = wst.scalar_mul_bits(F, b3, points, bits)
    return wst.tree_sum(F, b3, per_point, axis=0)


# ---------------------------------------------------------------------------
# Pippenger
# ---------------------------------------------------------------------------

def default_window(n: int) -> int:
    """Bucket window size: c ~ log2(n) - 3, clamped to [4, 16]."""
    return int(min(16, max(4, round(math.log2(max(n, 2))) - 3)))


def _point_map(f, *pts):
    return jax.tree_util.tree_map(f, *pts)


def _gather_point(pt: Point, idx) -> Point:
    return _point_map(lambda a: jnp.take(a, idx, axis=1), pt)


def _bucket_accumulate(F, b3, pts_sorted: Point, d_sorted, num_buckets: int,
                       K: int) -> Point:
    """Bucket sums for one window.

    pts_sorted: (n,) point batch in digit-sorted order; d_sorted: (n,) int32.
    Returns bucket point batch (num_buckets,) (bucket 0 = garbage/unused).
    """
    n = d_sorted.shape[0]
    assert n % K == 0
    B = n // K
    DUMMY = num_buckets  # scatter target for masked-off lanes

    d2 = d_sorted.reshape(B, K)
    prev = jnp.concatenate([d2[:, :1], d2[:, :-1]], axis=1)  # prev within lane
    head = jnp.concatenate(
        [jnp.ones((B, 1), bool), d2[:, 1:] != d2[:, :-1]], axis=1
    )

    # xs for the scan: step-major
    pts_seq = _point_map(
        lambda a: jnp.moveaxis(a.reshape(a.shape[0], B, K), 2, 0), pts_sorted
    )  # leaves (K, L, B)
    head_seq = jnp.moveaxis(head, 1, 0)  # (K, B)
    prev_seq = jnp.moveaxis(prev, 1, 0)  # (K, B)
    step_idx = jnp.arange(K)

    acc0 = wst.infinity(F, (B,))

    def body(acc, xs):
        e, h, pd, t = xs
        flush = h & (t > 0)
        tgt = jnp.where(flush, pd, DUMMY)
        out = (acc, tgt)  # finished partial (if any) + its bucket index
        acc = wst.pselect(F, h, e, wst.padd(F, b3, acc, e))
        return acc, out

    acc, (flush_pts, flush_tgt) = jax.lax.scan(
        body, acc0, (pts_seq, head_seq, prev_seq, step_idx)
    )
    # One scatter for all mid-segment flushes.  Real targets are unique over
    # the whole scan (a digit segment ends strictly inside at most one lane,
    # at one step); dummies collide harmlessly on the DUMMY slot.
    tgt_flat = flush_tgt.reshape(-1)  # (K*B,)
    buckets0 = wst.infinity(F, (num_buckets + 1,))
    buckets = _point_map(
        lambda bk, fp: bk.at[:, tgt_flat].set(
            jnp.moveaxis(fp, 0, 1).reshape(fp.shape[1], -1), mode="drop"),
        buckets0, wst.Point(*flush_pts))

    # End-of-lane partials: segmented sum across lanes (sorted order), then
    # merge unique segment-end totals into buckets.
    d_end = d2[:, -1]  # (B,)
    seg_head = jnp.concatenate(
        [jnp.ones((1,), bool), d_end[1:] != d_end[:-1]]
    ).reshape(1, B)

    def comb(a, b):
        v1, f1 = a[:-1], a[-1]
        v2, f2 = b[:-1], b[-1]
        added = wst.padd(F, b3, Point(*v1), Point(*v2))
        v = wst.pselect(F, f2[0] > 0, Point(*v2), added)
        return tuple(v) + (f1 | f2,)

    leaves = tuple(acc) + (seg_head.astype(jnp.uint32),)
    scanned = jax.lax.associative_scan(comb, leaves, axis=1)
    seg_total = Point(*scanned[:-1])
    is_end = jnp.concatenate([d_end[:-1] != d_end[1:], jnp.ones((1,), bool)])
    tgt = jnp.where(is_end, d_end, DUMMY)
    cur = _point_map(lambda bk: jnp.take(bk, tgt, axis=1), buckets)
    merged = wst.padd(F, b3, Point(*cur), seg_total)
    buckets = _point_map(
        lambda bk, mg: bk.at[:, tgt].set(mg, mode="drop"), buckets, merged
    )
    return _point_map(lambda bk: bk[:, :num_buckets], buckets)


def _weighted_bucket_sum(F, b3, buckets: Point, c: int) -> Point:
    """sum_{b=1}^{2^c-1} b * B_b via bit-decomposition tree sums.

    Compile-lean: ONE batched tree-sum over a (c, 2^c) masked stack (bit j of
    the bucket index selects the bucket into row j), then a fori_loop
    double-and-add over the c per-bit totals.
    """
    num = 1 << c
    idx = jnp.arange(num)
    bitmask = ((idx[None, :] >> jnp.arange(c)[:, None]) & 1) == 1  # (c, num)
    stacked = _point_map(
        lambda a: jnp.broadcast_to(a[:, None, :], a.shape[:1] + (c, num)),
        buckets)
    inf_wide = wst.infinity(F, (c, num))
    sel = wst.pselect(F, bitmask, stacked, inf_wide)
    totals = wst.tree_sum(F, b3, sel, axis=1)  # (c,) per-bit sums T_j

    def body(k, acc):
        j = c - 1 - k  # high bit first
        tj = _point_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, j, axis=1, keepdims=False),
            totals)
        return wst.padd(F, b3, wst.pdbl(F, b3, acc), Point(*tj))

    return jax.lax.fori_loop(0, c, body, wst.infinity(F, ()))


def msm_pippenger(F, b3, points: Point, s_limbs, c: int | None = None,
                  K: int | None = None) -> Point:
    """sum_i [s_i] P_i. points: (n,) batch; s_limbs: uint32 (L, n) standard
    domain. Returns a single (unbatched) projective point."""
    n = s_limbs.shape[1]
    if c is None:
        c = default_window(n)
    if K is None:
        K = int(min(n, max(8, 1 << int(math.ceil(math.log2(max(n, 1)) / 2)))))
    # pad n to a multiple of K with digit-0 (bucket 0 is dropped)
    n_pad = ((n + K - 1) // K) * K
    if n_pad != n:
        pad = n_pad - n
        points = _point_map(
            lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:, :1], a.shape[:1] + (pad,))], axis=1
            ),
            points,
        )
        s_limbs = jnp.pad(s_limbs, ((0, 0), (0, pad)))

    digits = scalar_digits(s_limbs, c)  # (W, n_pad)
    W = digits.shape[0]
    perms = jnp.argsort(digits, axis=1)  # (W, n_pad)
    d_sorted = jnp.take_along_axis(digits, perms, axis=1)

    def window_body(carry, xs):
        perm, dsort = xs
        pts = _gather_point(points, perm)
        buckets = _bucket_accumulate(F, b3, pts, dsort, 1 << c, K)
        s_w = _weighted_bucket_sum(F, b3, buckets, c)
        return carry, s_w

    _, window_sums = jax.lax.scan(window_body, 0, (perms, d_sorted))
    # window_sums leaves: (W, L) — combine MSB window first
    res = wst.infinity(F, ())

    def final_body(res, s_w):
        for _ in range(c):
            res = wst.pdbl(F, b3, res)
        return wst.padd(F, b3, res, Point(*s_w)), None

    rev = _point_map(lambda a: jnp.flip(a, axis=0), window_sums)
    # move window axis to scan position: leaves are (W, L, ...)
    res, _ = jax.lax.scan(
        lambda r, s: final_body(r, s), res, tuple(rev)
    )
    return res


# ---------------------------------------------------------------------------
# Convenience wrappers (G1 over BN254 etc.)
# ---------------------------------------------------------------------------

def msm(F, b3, points: Point, s_limbs, method: str = "pippenger", **kw) -> Point:
    if method == "naive":
        return msm_naive(F, b3, points, s_limbs)
    return msm_pippenger(F, b3, points, s_limbs, **kw)


def scalars_from_int(spec: FieldSpec, values) -> jax.Array:
    """Host ints -> standard-domain limb array (L, n) for MSM."""
    return limb.from_int(spec, list(values))
