"""Pallas TPU kernel for Montgomery limb multiplication.

The hottest op in the library: every curve add/double, NTT butterfly, and
field product funnels through ``mont_mul``.  The pure-JAX path in limb.py
(outer product -> two segment_sums -> lax.scan REDC) materializes an
``(L*L, batch)`` intermediate in HBM and walks the REDC scan through XLA's
loop machinery.  This kernel instead computes the whole CIOS-style product +
column-lazy REDC for a batch tile entirely in VMEM with statically unrolled
limb loops: per element it reads 2*4L bytes, writes 4L bytes, and never
round-trips an intermediate through HBM.

TPU-native counterpart of the reference's CUDA Montgomery kernel
(myzkp/src/modules/algebra/cuda/kernels/field.hpp:214-312 — 64-bit-limb
schoolbook ``mul_512`` + ``mont_reduce``); same algorithm family, re-shaped
for the VPU: 16-bit limbs in uint32 lanes, lazy carries bounded by
~4L*2^16 << 2^32, batch tiled (S, 128) to match the (8, 128) vreg layout.

Dispatch: limb.mont_mul routes here at trace time when running on a TPU
backend and the (broadcast) batch is large enough to fill a tile; the
pure-JAX path remains the reference/golden fallback (and serves CPU tests,
which also exercise this kernel via ``interpret=True``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spec import MASK, W, FieldSpec

_MASK = np.uint32(MASK)
_S = 32  # sublane rows per batch tile; tile = (S, 128) lanes


@functools.lru_cache(maxsize=None)
def _make_kernel(spec: FieldSpec, interpret: bool = False):
    from .tile_ops import TileFp

    tF = TileFp(spec, use_scratch=True)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = tF.mul(a_ref[...], b_ref[...])

    return kernel


@functools.lru_cache(maxsize=None)
def _make_butterfly_kernel(spec: FieldSpec, dit: bool, interpret: bool = False):
    from .tile_ops import TileFp

    tF = TileFp(spec, use_scratch=True)

    def kernel(u_ref, v_ref, t_ref, su_ref, sv_ref):
        u = tF.load(u_ref)
        v = tF.load(v_ref)
        tw = tF.load(t_ref)
        if dit:
            tv = tF.mul(v, tw)
            su, sv = tF.add(u, tv), tF.sub(u, tv)
        else:
            su = tF.add(u, v)
            sv = tF.mul(tF.sub(u, v), tw)
        tF.store(su_ref, su)
        tF.store(sv_ref, sv)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def butterfly_pallas(spec: FieldSpec, u, v, tw, dit: bool,
                     interpret: bool = False):
    """Fused radix-2 NTT butterfly: one launch per stage instead of three
    field ops with HBM round-trips between them.

    DIF: (u + v, (u - v) * tw);  DIT: (u + v*tw, u - v*tw).
    u, v, tw must share shape (L, *batch) (broadcast tw before calling).
    """
    L = spec.L
    assert u.shape == v.shape == tw.shape and u.shape[0] == L
    bshape = u.shape[1:]
    n = math.prod(bshape) if bshape else 1
    tile = _S * 128
    npad = max(tile, -(-n // tile) * tile)
    grid = npad // tile

    def flat(x):
        x = x.reshape((L, n))
        if npad != n:
            x = jnp.pad(x, ((0, 0), (0, npad - n)))
        return x.reshape((L, npad // 128, 128))

    bspec = pl.BlockSpec((L, _S, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    su, sv = pl.pallas_call(
        _make_butterfly_kernel(spec, dit, interpret),
        grid=(grid,),
        in_specs=[bspec] * 3,
        out_specs=(bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct((L, npad // 128, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((L, npad // 128, 128), jnp.uint32)),
        interpret=interpret,
    )(flat(u), flat(v), flat(tw))

    def unflat(x):
        return x.reshape((L, npad))[:, :n].reshape((L,) + bshape)

    return unflat(su), unflat(sv)


# Trailing in-place stages per leaf: sub-transforms of this length pair
# rows closer than 8 apart, where slab slicing would force sub-sublane
# Mosaic relayouts (measured 10x slower than the math itself).
_NTT_TAIL = 3


def _tail_transposed(m: int) -> bool:
    """m >= 64: run the tail as half-width slab stages after ONE in-VMEM
    (g, 8) -> (8, g) sublane transpose — the three stage distances become
    m/2, m/4, m/8 >= 8 rows, so the (u - v) * tw multiply touches only the
    half that needs it (the roll+select tail multiplied full-width and
    discarded half the products — its own mul bound, docs/speed_of_light.md).
    Below m = 64 the transposed distances drop under 8 rows; keep rolls."""
    return m >= 64


def ntt_leaf_row_perm(m: int) -> np.ndarray:
    """Static row permutation mapping the leaf kernel's output to natural
    order: out_natural[k] = kernel_out[perm[k]].

    After S = log2(m)-3 Stockham slab stages, block g of the (m/8, 8)-row
    structure holds output residue class k = g (mod m/8), and the in-place
    DIF tail produces each group's local length-8 transform in bit-reversed
    order r = bitrev3(local frequency).  Roll tail (m < 64): kernel row
    g*8 + r, hence perm[k] = (k mod m/8)*8 + bitrev3(k div m/8).
    Transposed tail (m >= 64): kernel row r*(m/8) + g, hence
    perm[k] = bitrev3(k div m/8)*(m/8) + (k mod m/8).
    """
    g8 = m // 8
    rev3 = [int(f"{r:03b}"[::-1], 2) for r in range(8)]
    perm = np.empty(m, dtype=np.int32)
    for k in range(m):
        if _tail_transposed(m):
            perm[k] = rev3[k // g8] * g8 + (k % g8)
        else:
            perm[k] = (k % g8) * 8 + rev3[k // g8]
    return perm


@functools.lru_cache(maxsize=None)
def _make_ntt_leaf_kernel(spec: FieldSpec, m: int, interpret: bool = False):
    from .tile_ops import TileFp

    # interpret mode (CPU tests): the unrolled mul — run_scoped scratch
    # emulation makes XLA:CPU compiles of multi-mul kernels ~10x slower
    tF = TileFp(spec, use_scratch=not interpret)
    L = spec.L
    stages = m.bit_length() - 1
    assert stages > _NTT_TAIL, "leaf kernel needs m >= 16"
    S = stages - _NTT_TAIL  # slab (Stockham) stages; the rest run in place

    def kernel(x_ref, t_ref, o_ref):
        # x block: (L, 1, m, 128) — the full length-m transform axis on
        # sublanes, one 128-lane batch tile.  All log2(m) stages run here
        # with every intermediate in VMEM/vregs; the only HBM traffic for
        # the whole sub-transform is one read + one write.
        #
        # Stages with h >= 8 are Stockham slab stages (contiguous half-slab
        # split + concat — cheap).  The last three (pairs inside 8-row
        # sublane groups) are in-place DIF butterflies via sublane rolls and
        # a row-parity select: no sub-8 slicing, no cross-group movement.
        # Output rows are therefore in the statically-known permuted order
        # ntt_leaf_row_perm(m); the wrapper (or caller) unpermutes.
        x = x_ref[...].reshape(L, 1, m, 128)  # (L, blocks=1, c=m, lanes)
        off, c = 0, m
        for _ in range(S):
            h = c // 2
            u = x[:, :, :h, :]
            v = x[:, :, h:, :]
            tw = t_ref[:, off : off + h, :].reshape(L, 1, h, 1)
            su = tF.add(u, v)
            sv = tF.mul(tF.sub(u, v), tw)
            x = jnp.concatenate([su, sv], axis=1)
            off += h
            c = h
        x = x.reshape(L, m, 128)
        if _tail_transposed(m):
            # ONE sublane transpose turns the within-8-group pairings into
            # slab pairings at distances m/2, m/4, m/8 — each remaining
            # stage multiplies only its v half (vs the roll tail's
            # full-width mul with half the products discarded).
            g8 = m // 8
            x = jnp.swapaxes(x.reshape(L, g8, 8, 128), 1, 2)  # (L,8,g8,128)
            x = x.reshape(L, m, 128)
            # stage c=8: pairs (j, j+4) -> halves; v-row twiddle w8^(j-4)
            u, v = x[:, : m // 2, :], x[:, m // 2 :, :]
            t1 = t_ref[:, off : off + m // 2, :].reshape(L, m // 2, 1)
            off += m // 2
            x = jnp.concatenate(
                [tF.add(u, v), tF.mul(tF.sub(u, v), t1)], axis=1)
            # stage c=4: pairs (j, j+2) within each half; twiddle w4^(j&1)
            x = x.reshape(L, 2, 2, m // 4, 128)
            u, v = x[:, :, 0], x[:, :, 1]
            t2 = t_ref[:, off : off + m // 4, :].reshape(L, 1, m // 4, 1)
            off += m // 4
            x = jnp.stack(
                [tF.add(u, v), tF.mul(tF.sub(u, v), t2)], axis=2)
            # stage c=2: pairs (j, j+1); twiddle w2^0 = 1 (no mul)
            x = x.reshape(L, 4, 2, m // 8, 128)
            u, v = x[:, :, 0], x[:, :, 1]
            x = jnp.stack([tF.add(u, v), tF.sub(u, v)], axis=2)
            o_ref[...] = x.reshape(L, 1, m, 128)
            return
        # m < 64 tail: in-place DIF inside each 8-row group (c = 8, 4, 2)
        # via sublane rolls + row-parity select (full-width mul; the
        # transposed-slab pairings would drop under 8 rows here)
        row = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0)
        for cc in (8, 4, 2):
            h = cc // 2
            is_u = (row % cc) < h
            fwd = pltpu.roll(x, m - h, axis=1)  # x[j+h] at row j (cyclic)
            bwd = pltpu.roll(x, h, axis=1)      # x[j-h] at row j
            su = tF.add(x, fwd)              # valid at u rows
            diff = tF.sub(bwd, x)            # (u - v) at v rows
            if cc > 2:
                twt = t_ref[:, off : off + m, :].reshape(L, m, 1)
                diff = tF.mul(diff, twt)
                off += m
            # c = 2 twiddle is w_2^0 = 1: no mul
            x = tF.select(is_u[None], su, diff)
        o_ref[...] = x.reshape(L, 1, m, 128)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def ntt_leaf_pallas(spec: FieldSpec, x, tw, m: int, interpret: bool = False):
    """Full length-m (16 <= m <= ~128, power of two) NTT over axis -2 of
    ``x: (L, E, m, B)``, batched over E and B, natural order in/out.

    One fused kernel runs all log2(m) butterfly stages per (m, 128) batch
    tile entirely in VMEM — versus one kernel launch (plus a
    broadcast-twiddle materialization and a concatenate round-trip through
    HBM) *per stage* in the unfused path.  ``tw`` is the concatenated
    twiddle table from ops.ntt._leaf_twiddles_np: per-stage Stockham slab
    twiddles for the first log2(m)-3 stages, then two full-height in-place
    tables for the 8- and 4-block tail stages.

    This is the HBM-pass eliminator for the large-n recursive NTT
    (ops/ntt.py): a 2^20 transform becomes 3 such passes + 1 transpose +
    twiddle scalings instead of 20 full-array stage round-trips.
    """
    L = spec.L
    assert x.shape[0] == L and x.shape[2] == m
    E, B = x.shape[1], x.shape[3]
    Bp = -(-B // 128) * 128
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Bp - B)))
    bspec = pl.BlockSpec((L, 1, m, 128), lambda e, i: (0, e, 0, i),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(tw.shape, lambda e, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_ntt_leaf_kernel(spec, m, interpret),
        grid=(E, Bp // 128),
        in_specs=[bspec, tspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((L, E, m, Bp), jnp.uint32),
        # the slab-stage run_scoped mul scratches stack past the default
        # 16M scoped-vmem budget; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, tw)
    # undo the tail stages' static row permutation -> natural order
    out = jnp.take(out, jnp.asarray(ntt_leaf_row_perm(m)), axis=2)
    return out[..., :B]


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(spec: FieldSpec, a, b, interpret: bool = False):
    """(a * b * R^{-1}) mod p on a TPU batch tile grid.

    ``a`` and ``b`` must already share shape ``(L, *batch)`` (canonical
    Montgomery-domain limbs).  Arbitrary batch shapes are flattened, padded
    to a multiple of the (S, 128) tile, and unpadded on the way out.
    """
    L = spec.L
    assert a.shape == b.shape and a.shape[0] == L
    bshape = a.shape[1:]
    n = math.prod(bshape) if bshape else 1
    tile = _S * 128
    npad = max(tile, -(-n // tile) * tile)
    grid = npad // tile

    def flat(x):
        x = x.reshape((L, n))
        if npad != n:
            x = jnp.pad(x, ((0, 0), (0, npad - n)))
        return x.reshape((L, npad // 128, 128))

    out = pl.pallas_call(
        _make_kernel(spec, interpret),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, _S, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, _S, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, _S, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, npad // 128, 128), jnp.uint32),
        interpret=interpret,
    )(flat(a), flat(b))

    return out.reshape((L, npad))[:, :n].reshape((L,) + bshape)
