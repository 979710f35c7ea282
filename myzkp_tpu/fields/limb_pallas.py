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


def _make_kernel(spec: FieldSpec):
    L = spec.L
    n0 = np.uint32(spec.n0)
    p_limbs = tuple(np.uint32(v) for v in spec.p_limbs)

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        zero = jnp.zeros_like(a[0])
        t = [zero] * (2 * L + 1)

        # ---- operand product into 2L+1 lazy uint32 columns ----
        for i in range(L):
            ai = a[i]
            for j in range(L):
                pr = ai * b[j]  # < 2^32
                t[i + j] = t[i + j] + (pr & _MASK)
                t[i + j + 1] = t[i + j + 1] + (pr >> W)

        # ---- column-lazy Montgomery REDC ----
        # At step i every carry from columns < i has been folded into t[i],
        # so (t[i] & MASK) is the true column value mod 2^16.
        for i in range(L):
            m = ((t[i] & _MASK) * n0) & _MASK
            for j in range(L):
                pr = m * p_limbs[j]
                t[i + j] = t[i + j] + (pr & _MASK)
                t[i + j + 1] = t[i + j + 1] + (pr >> W)
            # column i is now ≡ 0 mod 2^16; fold its carry upward
            t[i + 1] = t[i + 1] + (t[i] >> W)

        # ---- final carry propagation over columns L..2L-1 ----
        res = []
        c = zero
        for i in range(L):
            u = t[L + i] + c
            res.append(u & _MASK)
            c = u >> W
        top = c + t[2 * L]

        # ---- conditional subtract p (result < 2p, maybe with overflow bit) --
        borrow = zero
        sub = []
        for i in range(L):
            d = res[i] - p_limbs[i] - borrow  # wraps in uint32
            sub.append(d & _MASK)
            borrow = (d >> W) & np.uint32(1)
        need = (borrow == 0) | (top > 0)
        for i in range(L):
            o_ref[i] = jnp.where(need, sub[i], res[i])

    return kernel


def _make_butterfly_kernel(spec: FieldSpec, dit: bool):
    from .tile_ops import TileFp

    tF = TileFp(spec)

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
        _make_butterfly_kernel(spec, dit),
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
        _make_kernel(spec),
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
