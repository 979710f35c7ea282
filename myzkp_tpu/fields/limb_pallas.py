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
