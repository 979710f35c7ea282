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
  * bucket combination  sum_b b*B_b  via a hierarchical split b = hi*2^k+lo
    (row/column tree-sums + two recursive half-width weighted sums, ~2*2^c
    adds) — wide VPU work instead of a 2^c-long serial chain, and cheap
    enough that the cost model picks large windows (fewer windows overall).

Scalars enter as standard-domain 16-bit-limb arrays (L, n) uint32.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec
from . import curve_pallas, weierstrass as wst
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

    Each digit is bits [w*c, (w+1)*c). Requires c <= 31.
    """
    assert 1 <= c <= 31
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


def signed_digits(digits, c: int):
    """Unsigned window digits (W, n) -> signed-digit form (mag, neg).

    Rewrites each digit d_w into d'_w in [-2^(c-1), 2^(c-1)-1] with a carry
    into the next window, preserving sum_w d'_w 2^(cw).  Returns magnitudes
    (W, n) int32 in [0, 2^(c-1)] and a negation mask (W, n) bool.  Halves the
    Pippenger bucket count: [|d|]P with P negated when d < 0.

    Precondition: the scalar value is < 2^255 (any canonical mod-r scalar),
    so the top window never produces a carry out: with W = ceil(256/c) the
    top digit plus carry stays <= 2^(c-2) + 1 < 2^(c-1).
    """
    half, full = 1 << (c - 1), 1 << c

    def body(carry, d):
        v = d + carry
        over = v >= half
        return over.astype(jnp.int32), jnp.where(over, v - full, v)

    _, signed = jax.lax.scan(body, jnp.zeros_like(digits[0]), digits)
    return jnp.abs(signed), signed < 0


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

def _bucket_sum_cost(c: int) -> int:
    """Modeled EC adds of the hierarchical weighted-bucket sum at window c."""
    if c <= _WSUM_BASE_C:
        return c * (1 << c)  # bit-decomposition base case
    k = c // 2
    return 2 * (1 << c) + _bucket_sum_cost(c - k) + _bucket_sum_cost(k) + k


# Measured cost ratios on a v5e chip (docs/speed_of_light.md, chain-diff
# methodology): one batched-sort index costs ~3.1 ns and one row-gather
# ~11.5 ns, vs ~9 ns per full-width fused EC add -> sort+gather ~1.6 add
# units per (window, point).  The weighted bucket sum is batched across
# ALL windows in one pass, so its halving adds run near wide-add rate.
_SORT_GATHER_W = 1.6
_NARROW_W = 1.0


def default_window(n: int, signed: bool = True) -> int:
    """Bucket window size minimizing modeled work in wide-EC-add units.

    Per window: n * (1 + _SORT_GATHER_W) for the sort, the gather and the
    bucket scan, ~2 * 2^c narrow adds in the hierarchical weighted-bucket
    sum (over 2^(c-1) buckets in signed-digit form), ~c serial ops in the
    Horner tail; W(c) = ceil(256/c) windows total.  With the measured
    chain-diff constants (sort ~3.1 ns/elt + row gather ~11.5 ns vs ~9 ns
    per fused EC add -> _SORT_GATHER_W = 1.6) data movement still rivals
    the EC adds themselves, which pushes the optimum toward larger windows
    than an EC-only model would pick.
    """
    best_c, best_cost = 4, None
    for c in range(4, 20):
        W = -(-256 // c)
        if signed and c >= 2:
            bsum = _bucket_sum_cost(c - 1) + (c - 1) + 1
        else:
            bsum = _bucket_sum_cost(c)
        cost = W * (n * (1 + _SORT_GATHER_W) + _NARROW_W * bsum + 24 * c)
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def _shape_diverse_ctx(F):
    """no_fuse() for Fq2 in the MSM's shape-diverse regions (the log-depth
    segmented-sum levels and bucket-sum recursion), else a null context.

    Each DISTINCT call shape of the fused Fq2 complete-add kernel costs
    minutes of Mosaic lowering at first compile; a dozen level shapes
    stalled the 2^20 G2 MSM's first compile for ~45 min.  The pure-JAX
    path lowers fast, and these regions are a small slice of runtime (the
    wide one-shape K-step scan stays fused).  G1's Fp kernel lowers ~5x
    faster, so G1 keeps the fused path everywhere.
    """
    import contextlib

    from .field_ops import Fq2Ops

    if isinstance(F, Fq2Ops):
        return curve_pallas.no_fuse()
    return contextlib.nullcontext()


def _point_map(f, *pts):
    return jax.tree_util.tree_map(f, *pts)


def _gather_point(pt: Point, idx) -> Point:
    return _point_map(lambda a: jnp.take(a, idx, axis=1), pt)


def _rows_of_point(pt: Point, lanes: int | None = None):
    """Point batch with leaves (L, N) -> row-major (N, lanes) uint32 table
    (one row per point, all coordinate limbs side by side, padded to a
    64-lane multiple).  Returns (rows, treedef, C).  XLA:TPU gathers and
    scatters whole rows at a fixed per-row cost, while moving data along
    the lane axis of a plane-major array is ~3x slower (measured,
    docs/speed_of_light.md) — so every bucket-table access goes through
    this layout."""
    leaves, treedef = jax.tree_util.tree_flatten(pt)
    rows = jnp.concatenate(leaves, axis=0).T  # (N, C)
    C = rows.shape[1]
    lanes = lanes or -(-C // 64) * 64
    if lanes != C:
        rows = jnp.pad(rows, ((0, 0), (0, lanes - C)))
    return rows, treedef, C


def _point_of_rows(rows, treedef, C: int, shape) -> Point:
    """Inverse of _rows_of_point: (N, lanes) -> Point leaves (L, *shape)."""
    planes = rows[:, :C].T.reshape((C,) + tuple(shape))
    nleaves = treedef.num_leaves
    return jax.tree_util.tree_unflatten(
        treedef, jnp.split(planes, nleaves, axis=0))


def _bucket_accumulate(F, b3, q: Point, d_sorted, num_buckets: int,
                       K: int) -> Point:
    """Bucket sums for G windows at once.

    q: PROJECTIVE point batch (G, n) (field pytrees), each window row in
    digit-sorted order; d_sorted: (G, n) int32.  Returns bucket batch
    (G, num_buckets) (bucket 0 = garbage/unused).  Batching the window axis
    through the K-step scan keeps every complete-add wide enough to
    saturate the VPU / hit the Pallas mont_mul tile, instead of scanning
    windows one by one.  Projective inputs (vs a one-time affine
    normalization) add one mul per scan add (complete add, 14 muls, vs the
    mixed add's 13) but remove the 2^20-wide batch inversion from the
    critical path and make infinity inputs need no special casing.
    """
    G, n = d_sorted.shape
    assert n % K == 0
    B = n // K
    slots = num_buckets + 1  # +1 per-window dummy slot, dropped at the end
    w_off = (jnp.arange(G) * slots)[:, None]  # (G, 1)

    def dummy_tgt(real_tgt, flush):
        # global (flattened window-major) bucket index; dummies land on the
        # window's own slot `num_buckets`, sliced off after the scatter
        return jnp.where(flush, real_tgt, num_buckets) + w_off

    d2 = d_sorted.reshape(G, B, K)
    prev = jnp.concatenate([d2[..., :1], d2[..., :-1]], axis=-1)
    head = jnp.concatenate(
        [jnp.ones((G, B, 1), bool), d2[..., 1:] != d2[..., :-1]], axis=-1
    )

    # xs for the scan: step-major
    def step_major(e):
        return _point_map(
            lambda a: jnp.moveaxis(a.reshape(a.shape[0], G, B, K), 3, 0), e
        )  # leaves (K, L, G, B)

    q_seq = step_major(q)
    head_seq = jnp.moveaxis(head, 2, 0)  # (K, G, B)
    prev_seq = jnp.moveaxis(prev, 2, 0)  # (K, G, B)
    step_idx = jnp.arange(K)

    acc0 = wst.infinity(F, (G, B))

    def body(acc, xs):
        ex, ey, ez, h, pd, t = xs
        flush = h & (t > 0)
        tgt = dummy_tgt(pd, flush)
        out = (acc, tgt)  # finished partial (if any) + its bucket index
        acc = wst.padd_sel(F, b3, acc, Point(ex, ey, ez), h)
        return acc, out

    acc, (flush_pts, flush_tgt) = jax.lax.scan(
        body, acc0, (*q_seq, head_seq, prev_seq, step_idx)
    )
    # One ROW scatter for all mid-segment flushes.  Real targets are unique
    # per window over the whole scan (a digit segment ends strictly inside
    # at most one lane, at one step); dummies collide harmlessly per window.
    tgt_flat = flush_tgt.reshape(-1)  # (K*G*B,)
    # flush_pts leaves: (K, L, G, B) -> point batch (K*G*B,)
    flush_flat = _point_map(
        lambda a: jnp.moveaxis(a, 0, 1).reshape(a.shape[1], -1),
        Point(*flush_pts))
    flush_rows, treedef, C = _rows_of_point(flush_flat)
    return _merge_lane_partials(F, b3, acc, d2, flush_rows, tgt_flat,
                                treedef, C, num_buckets, slots, w_off)


def _bucket_accumulate_rows(F, b3, spec, b3c, rows, vsort, dsort,
                            num_buckets: int, K: int,
                            interpret: bool = False) -> Point:
    """Fused row-major variant of _bucket_accumulate (G1 only).

    Gathers point rows in STEP-MAJOR order and runs the whole K-step
    segmented scan as one Pallas kernel (curve_pallas.bucket_scan_rows):
    the gathered copy is read once and the flush stream written once, vs
    ~4 extra full-array relayout passes in the XLA scan formulation
    (rows->planes transpose, step-major moveaxis, per-step carry round
    trip, flush planes->rows transpose)."""
    G, n_pad = dsort.shape
    B = n_pad // K
    slots = num_buckets + 1
    w_off = (jnp.arange(G) * slots)[:, None]

    d2 = dsort.reshape(G, B, K)
    prev = jnp.concatenate([d2[..., :1], d2[..., :-1]], axis=-1)
    head = jnp.concatenate(
        [jnp.ones((G, B, 1), bool), d2[..., 1:] != d2[..., :-1]], axis=-1)

    def sm(x):  # (G, B, K) -> (K, G*B) step-major
        return jnp.moveaxis(x, 2, 0).reshape(K, G * B)

    v2 = vsort.reshape(G, B, K)
    idx_sm = sm(v2 >> 1)
    g_rows = jnp.take(rows, idx_sm.reshape(-1), axis=0, mode="clip")
    tag = (sm(v2 & 1) | (sm(head.astype(jnp.int32)) << 1)).reshape(-1)
    acc_planes, flush_rows = curve_pallas.bucket_scan_rows(
        spec, g_rows, tag, b3c, K, interpret)
    L = spec.L
    acc = Point(acc_planes[:L].reshape(L, G, B),
                acc_planes[L : 2 * L].reshape(L, G, B),
                acc_planes[2 * L :].reshape(L, G, B))
    # flush targets in the same step-major order as flush_rows
    def dummy_tgt(real_tgt, flush):
        return jnp.where(flush, real_tgt, num_buckets) + w_off[:, :, None]

    # No flush at step 0: nothing has ended inside the lane yet — the
    # XLA formulation masks with (step_idx > 0); firing here scattered
    # the freshly-initialized INFINITY accumulator at lanes whose first
    # digit continues a previous lane's segment, colliding with the
    # segment's real flush target (the r5 c=14 mismatch — head-dense
    # digit streams made the collision land on buckets that mattered).
    flush = head & (prev > 0)
    flush = flush.at[..., 0].set(False)
    tgt_flat = sm(dummy_tgt(prev, flush)).reshape(-1)
    _, treedef, C = _rows_of_point(wst.infinity(F, (1,)))
    return _merge_lane_partials(F, b3, acc, d2, flush_rows, tgt_flat,
                                treedef, C, num_buckets, slots, w_off)


def _seg_scan_hs(F, b3, pts: Point, head) -> Point:
    """Segmented inclusive prefix-sum across the lane axis (Hillis-Steele).

    pts: point batch with leaves (L, G, B); head: (G, B) bool segment-head
    flags.  Every level is one FULL-width fused complete-add (one compiled
    shape reused log2(B) times) plus rolls and selects; identity for the
    out-of-range left neighbor is (infinity, no-flag)."""
    leaf0 = jax.tree_util.tree_leaves(pts)[0]
    B = leaf0.shape[-1]
    lane = jnp.arange(B)
    x, flags = pts, head
    d = 1
    while d < B:
        valid = (lane >= d)[None, :]
        xs = _point_map(lambda a: jnp.roll(a, d, axis=-1), x)
        inf = wst.infinity(F, head.shape)
        xs = wst.pselect(F, valid, xs, inf)
        fs = jnp.roll(flags, d, axis=-1) & valid
        added = wst.padd(F, b3, xs, x)
        x = wst.pselect(F, flags, x, added)
        flags = flags | fs
        d *= 2
    return x


def _merge_lane_partials(F, b3, acc: Point, d2, flush_rows, tgt_flat,
                         treedef, C: int, num_buckets: int, slots: int,
                         w_off) -> Point:
    """Shared tail of the bucket accumulation: scatter the mid-segment
    flushes, merge the end-of-lane partials (segmented sum across lanes in
    sorted order), and land the segment-end totals in their buckets."""
    G, B, K = d2.shape

    def dummy_tgt(real_tgt, flush):
        return jnp.where(flush, real_tgt, num_buckets) + w_off

    bk0_rows, _, _ = _rows_of_point(
        wst.infinity(F, (G * slots,)), lanes=flush_rows.shape[1])
    bk_rows = bk0_rows.at[tgt_flat].set(flush_rows, mode="drop")

    # End-of-lane partials: segmented sum across lanes (sorted order), then
    # merge unique segment-end totals into buckets (row gather + row
    # scatter at G*B indices).
    d_end = d2[..., -1]  # (G, B)
    seg_head = jnp.concatenate(
        [jnp.ones((G, 1), bool), d_end[:, 1:] != d_end[:, :-1]], axis=-1
    ).reshape(1, G, B)

    def comb(a, b):
        v1, f1 = a[:-1], a[-1]
        v2, f2 = b[:-1], b[-1]
        added = wst.padd(F, b3, Point(*v1), Point(*v2))
        v = wst.pselect(F, f2[0] > 0, Point(*v2), added)
        return tuple(v) + (f1 | f2,)

    from .field_ops import Fq2Ops

    if (curve_pallas.enabled() and not isinstance(F, Fq2Ops)
            and B >= (1 << 10)):
        # Hillis-Steele segmented scan: log2(B) levels at CONSTANT width —
        # the fused complete-add compiles ONCE, vs one Mosaic lowering per
        # halving level of associative_scan.  Work is B log B adds instead
        # of 2B, a few ms at 2^14 lanes — bought back many times over in
        # (cold) compile time, which measured ~an hour for this program.
        seg_total = _seg_scan_hs(F, b3, acc, seg_head[0] > 0)
    else:
        leaves = tuple(acc) + (seg_head.astype(jnp.uint32),)
        with _shape_diverse_ctx(F):  # log-depth levels: one shape each
            scanned = jax.lax.associative_scan(comb, leaves, axis=2)
        seg_total = Point(*scanned[:-1])
    is_end = jnp.concatenate(
        [d_end[:, :-1] != d_end[:, 1:], jnp.ones((G, 1), bool)], axis=-1)
    tgt = dummy_tgt(d_end, is_end).reshape(-1)  # (G*B,)
    cur = _point_of_rows(jnp.take(bk_rows, tgt, axis=0), treedef, C, (G, B))
    with _shape_diverse_ctx(F):
        merged = wst.padd(F, b3, Point(*cur), seg_total)
    merged_rows, _, _ = _rows_of_point(
        _point_map(lambda a: a.reshape(a.shape[0], -1), merged),
        lanes=bk_rows.shape[1])
    bk_rows = bk_rows.at[tgt].set(merged_rows, mode="drop")
    buckets = _point_of_rows(bk_rows, treedef, C, (G, slots))
    return _point_map(lambda a: a[..., :num_buckets], buckets)


# Below this window size the hierarchical split stops paying for its extra
# kernel launches and the bit-decomposition base case takes over.
_WSUM_BASE_C = 5

# Fused-kernel width floor for the bucket-combination phase: every distinct
# fused-add SHAPE pays Mosaic lowering + remote compile, and the halving
# trees here mint one shape per level.  Below this many batch elements the
# math is microseconds either way, so narrow levels run pure-JAX — capping
# the MSM program's shape count (its cold compile measured ~an hour).
_FUSE_MIN_ELEMS = 1 << 13


def _maybe_no_fuse(F, elems: int):
    """no_fuse() below the width floor (or for Fq2, whose kernel lowers in
    minutes per shape), else a null context."""
    import contextlib

    from .field_ops import Fq2Ops

    if isinstance(F, Fq2Ops) or elems < _FUSE_MIN_ELEMS:
        return curve_pallas.no_fuse()
    return contextlib.nullcontext()


def _weighted_bucket_sum(F, b3, buckets: Point, c: int) -> Point:
    """sum_{b=1}^{2^c-1} b * B_b, batched over G windows.

    Hierarchical split: write b = hi * 2^k + lo (k = c//2), so

        sum_b b * B_b = 2^k * sum_hi hi * R_hi  +  sum_lo lo * C_lo,
        R_hi = sum_lo B[hi, lo]   (row sums:    one batched tree-sum),
        C_lo = sum_hi B[hi, lo]   (column sums: one batched tree-sum),

    and the two half-width weighted sums recurse.  Total work ~2*2^c + O(2^
    {c/2}) EC adds — vs c*2^c for flat bit-decomposition — which lets the
    window cost model pick larger c (fewer windows, fewer total scan adds).
    Bucket 0 is garbage by construction; every path weights index 0 by zero
    (inductively down to the base case, whose bit masks exclude it).
    buckets: (G, 2^c) point batch; returns a (G,) point batch.
    """
    Gw = jax.tree_util.tree_leaves(buckets)[0].shape[1]
    if c > _WSUM_BASE_C:
        k = c // 2
        hi_n, lo_n = 1 << (c - k), 1 << k
        grid = _point_map(
            lambda a: a.reshape(a.shape[0], a.shape[1], hi_n, lo_n), buckets)
        fm = _FUSE_MIN_ELEMS
        rows = wst.tree_sum(F, b3, grid, axis=2,
                            fuse_min_elems=fm)  # (G, hi_n): sum over lo
        cols = wst.tree_sum(F, b3, grid, axis=1,
                            fuse_min_elems=fm)  # (G, lo_n): sum over hi
        s_hi = _weighted_bucket_sum(F, b3, rows, c - k)
        s_lo = _weighted_bucket_sum(F, b3, cols, k)
        with _maybe_no_fuse(F, Gw):
            for _ in range(k):
                s_hi = wst.pdbl(F, b3, s_hi)
            return wst.padd(F, b3, s_hi, s_lo)
    num = 1 << c
    idx = jnp.arange(num)
    bitmask = ((idx[None, :] >> jnp.arange(c)[:, None]) & 1) == 1  # (c, num)
    stacked = _point_map(
        lambda a: jnp.broadcast_to(
            a[:, :, None, :], a.shape[:2] + (c, num)), buckets)
    with _maybe_no_fuse(F, Gw * c * num):
        inf_wide = wst.infinity(F, (Gw, c, num))
        sel = wst.pselect(F, bitmask[None], stacked, inf_wide)
        totals = wst.tree_sum(F, b3, sel, axis=2,
                              fuse_min_elems=_FUSE_MIN_ELEMS)

    def body(k, acc):
        j = c - 1 - k  # high bit first
        tj = _point_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, j, axis=2, keepdims=False),
            totals)
        return wst.padd(F, b3, wst.pdbl(F, b3, acc), Point(*tj))

    with _maybe_no_fuse(F, Gw):
        return jax.lax.fori_loop(0, c, body, wst.infinity(F, (Gw,)))


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _group_size(n_pad: int, W: int, slots: int = 0) -> int:
    """Windows per bucket-accumulation pass: cap gathered-copy memory at
    ~2^21 gathered elements (leaves are (L, G, n_pad) uint32), and bucket
    arrays at ~2^21 (L, G*slots) elements likewise."""
    cap = (1 << 21) // max(n_pad, slots, 1)
    return int(min(W, max(1, cap)))


def msm_pippenger(F, b3, points: Point, s_limbs, c: int | None = None,
                  K: int | None = None, G: int | None = None,
                  signed: bool = True, _rows_scan: bool | None = None
                  ) -> Point:
    """sum_i [s_i] P_i. points: (n,) batch; s_limbs: uint32 (L, n) standard
    domain. Returns a single (unbatched) projective point.

    All W = ceil(256/c) windows are processed in groups of G: one
    key-value sort per window (XLA sort_key_val: digit magnitude -> packed
    (index << 1 | sign)), then a single K-step scan accumulates buckets for
    the whole group at VPU-saturating batch width (G * n/K lanes).  With
    ``signed`` (default) digits are rewritten to [-2^(c-1), 2^(c-1)]:
    points whose digit is negative enter the scan negated, halving the
    bucket count and the weighted-bucket-sum work.

    Data-movement design (the measured bottleneck is the per-window point
    gather and the bucket-table scatter, not EC math): points stay
    PROJECTIVE and are laid out ROW-MAJOR — one (n, 64*k) uint32 row per
    point holding all coordinate limbs — because XLA:TPU gathers/scatters
    whole rows at a fixed per-row cost (~11.5 ns gather), while moving
    data along the lane axis of a plane-major (C, n) array is ~3x slower
    (measured on v5e, docs/speed_of_light.md).  Each window group issues a
    single row-gather + one transpose back to limb-major, the negation bit
    rides inside the sort value (no second gather), the scan uses the
    fused complete-add kernel, and bucket flushes land via one row
    scatter."""
    n = s_limbs.shape[1]
    if c is None:
        c = default_window(n, signed)
    if c < 2:
        signed = False
    half = (1 << (c - 1)) if signed else None
    num_buckets = (half + 1) if signed else (1 << c)
    W = -(-16 * s_limbs.shape[0] // c)
    if G is None:
        G = _group_size(n, W, num_buckets + 1)
    G = min(G, W)
    if K is None:
        # few, wide scan steps: per-step batch is G * n/K lanes; target
        # ~2^15 lanes (where the fused-add kernel saturates, see
        # docs/speed_of_light.md) — smaller K costs B log B lane-merge adds,
        # larger K leaves the per-step batch too narrow.
        K = int(min(n, max(8, _next_pow2(G * n // (1 << 15)))))
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

    # ROW-MAJOR projective point table: one uint32 row per point (see
    # docstring).  No affine normalization: the complete formulas take
    # arbitrary-z inputs (infinity included) and the 2^20-wide batch
    # inversion it would need costs more than the one extra mul per scan
    # add (full vs mixed complete add).
    rows, xy_def, C = _rows_of_point(points)

    digits = scalar_digits(s_limbs, c)  # (W, n_pad)
    if signed:
        digits, dneg = signed_digits(digits, c)
    else:
        dneg = jnp.zeros(digits.shape, bool)
    W = digits.shape[0]
    W_pad = ((W + G - 1) // G) * G
    if W_pad != W:
        # zero-digit filler windows: their sum is infinity, and they sit at
        # the MSB end of the Horner combine where doubling infinity is a no-op
        digits = jnp.pad(digits, ((0, W_pad - W), (0, 0)))
        dneg = jnp.pad(dneg, ((0, W_pad - W), (0, 0)))
    # pack (point index, sign) into the sort value: one sort, no extra gather
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    vals = jnp.broadcast_to(iota[None] << 1, digits.shape) | dneg.astype(
        jnp.int32)
    d_sorted, v_sorted = jax.lax.sort_key_val(digits, vals, dimension=1)

    # Fused row-major scan path (G1): the gathered copy is consumed
    # directly by one Pallas kernel, skipping ~4 full-array relayout
    # passes per group.  Requires Fp coordinates (3 leaves), the fused
    # kernels enabled, and a lane count filling whole (8, 128) tiles.
    lanes_ok = (len(jax.tree_util.tree_leaves(points)) == 3
                and (G * n_pad // K) % curve_pallas._SCAN_LANES == 0)
    # _rows_scan: None = auto (on TPU with fused kernels), True = force
    # (interpret mode off-TPU, the test seam), False = never
    if _rows_scan is None:
        use_rows_scan = lanes_ok and ROWS_SCAN_AUTO and curve_pallas.enabled()
        scan_interpret = curve_pallas.interpret_mode()
    else:
        use_rows_scan = lanes_ok and _rows_scan
        scan_interpret = _rows_scan and (curve_pallas.interpret_mode()
                                         or not curve_pallas.enabled())

    def group_body(carry, xs):
        dsort, vsort = xs  # (G, n_pad)
        if use_rows_scan:
            buckets = _bucket_accumulate_rows(
                F, b3, F.spec, b3, rows, vsort, dsort, num_buckets, K,
                scan_interpret)
            return carry, tuple(buckets)
        perm = vsort >> 1
        g_rows = jnp.take(rows, perm.reshape(-1), axis=0, mode="clip")
        # back to limb-major planes: one XLA relayout of the gathered copy
        q = _point_of_rows(g_rows, xy_def, C, (G, n_pad))
        if signed:
            nsort = (vsort & 1) > 0
            q = Point(q.x, F.select(nsort, F.neg(q.y), q.y), q.z)
        buckets = _bucket_accumulate(F, b3, q, dsort, num_buckets, K)
        return carry, tuple(buckets)

    _, group_buckets = jax.lax.scan(
        group_body, 0,
        (d_sorted.reshape(W_pad // G, G, n_pad),
         v_sorted.reshape(W_pad // G, G, n_pad)))
    # group_buckets leaves: (W_pad//G, L, G, num_buckets) -> batch ALL
    # windows into one weighted-bucket-sum pass (L, W_pad, num_buckets).
    # Summing per group wasted W/G x launch overhead: at small per-level
    # widths the sum's halving adds are launch-bound, so batching the
    # window axis is nearly free and removes it from the critical path.
    buckets = _point_map(
        lambda a: jnp.moveaxis(a, 1, 0).reshape(
            a.shape[1], W_pad, num_buckets),
        Point(*group_buckets))
    with _shape_diverse_ctx(F):  # bucket-sum recursion: many narrow shapes
        if signed:
            # magnitudes span [0, half]; the power-of-two-sized weighted
            # sum covers [1, half-1], the top bucket adds half * B_half
            main = _point_map(lambda a: a[..., :half], buckets)
            top = _point_map(lambda a: a[..., half], buckets)
            s_w = _weighted_bucket_sum(F, b3, main, c - 1)
            with _maybe_no_fuse(F, W_pad):  # (W_pad,)-narrow tail ops
                for _ in range(c - 1):
                    top = wst.pdbl(F, b3, top)
                s_w = wst.padd(F, b3, s_w, top)
        else:
            s_w = _weighted_bucket_sum(F, b3, buckets, c)  # (W_pad,) batch
    # leaves (L, W_pad) -> (W_pad, L) so the Horner scan walks windows
    window_sums = _point_map(lambda a: a.T, s_w)
    # combine MSB window first: res = sum_w 2^{c w} S_w (Horner)
    res = wst.infinity(F, ())

    def final_body(res, s_w):
        for _ in range(c):
            res = wst.pdbl(F, b3, res)
        return wst.padd(F, b3, res, Point(*s_w)), None

    rev = _point_map(lambda a: jnp.flip(a, axis=0), window_sums)
    with _maybe_no_fuse(F, 1):  # single-point Horner chain: never fuse
        res, _ = jax.lax.scan(
            lambda r, s: final_body(r, s), res, tuple(rev)
        )
    return res


# ---------------------------------------------------------------------------
# Convenience wrappers (G1 over BN254 etc.)
# ---------------------------------------------------------------------------

# Fused rows-scan path: default ON (r5).  The r4 quarantine's root cause
# was a spurious step-0 flush in _bucket_accumulate_rows (see the comment
# there and tools/rows_scan_bug.md): fixed and re-validated on-chip at
# every previously-failing configuration, including the 2^16 auto params
# (c=14, G=19, K=64, 19 tiles) that produced the rejected proof.
# MYZKP_MSM_ROWS=0 disables (falls back to the XLA-scan formulation);
# bench.py golden-checks single-tile, multi-tile, AND the full
# headline-shape output against host ground truth every run.
ROWS_SCAN_AUTO = os.environ.get("MYZKP_MSM_ROWS", "1") != "0"

# Below this size the bucket machinery can't beat one 256-step double-and-add
# ladder, and its much larger XLA program isn't worth compiling (deep-unrolled
# Pippenger compiles have also hit LLVM crashes on the CPU backend for tiny n).
_PIPPENGER_MIN_N = 128


def msm(F, b3, points: Point, s_limbs, method: str = "pippenger", **kw) -> Point:
    if method == "naive" or (
            method == "pippenger" and not kw and
            s_limbs.shape[1] < _PIPPENGER_MIN_N):
        return msm_naive(F, b3, points, s_limbs)
    return msm_pippenger(F, b3, points, s_limbs, **kw)


def scalars_from_int(spec: FieldSpec, values) -> jax.Array:
    """Host ints -> standard-domain limb array (L, n) for MSM."""
    return limb.from_int(spec, list(values))
