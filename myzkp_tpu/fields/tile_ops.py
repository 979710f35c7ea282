"""Tile-level prime-field arithmetic for use *inside* Pallas kernels.

A field element batch inside a kernel is a single ``uint32`` array of shape
``(L, *tile)`` (limb axis leading, e.g. tile = (S, 128)).  Per-limb loops
are unrolled at trace time but each iteration operates on whole limb
*planes* (`t.at[i:i+L].add(...)` etc.), so a full Montgomery multiply
traces to ~20 ops per limb rather than ~L ops per limb — keeping trace,
lowering, and Mosaic compile time linear in L (a 254-bit mul is ~300 traced
ops; a complete EC add ~4k) while the whole op chain fuses into one kernel
with every intermediate in VMEM/vregs.

The algorithms mirror fields/limb.py (the golden pure-JAX path) exactly:
operand-scanning product + column-lazy Montgomery REDC with uint32 lazy
columns bounded by ~4L*2^16 << 2^32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .spec import MASK, W, FieldSpec

_MASK = np.uint32(MASK)
_ONE = np.uint32(1)


class TileFp:
    """Field ops on (L, *tile) uint32 limb arrays inside a Pallas kernel."""

    def __init__(self, spec: FieldSpec, use_scratch: bool = True):
        self.spec = spec
        self.L = spec.L
        self.p_limbs = tuple(np.uint32(v) for v in spec.p_limbs)
        self.one_limbs = tuple(np.uint32(v) for v in spec.one_limbs)
        self.n0 = np.uint32(spec.n0)
        # Mosaic path: lazy-column scratch in VMEM via pl.run_scoped (O(L)
        # traced ops).  Interpret/CPU path: fully unrolled per-column lists —
        # run_scoped scratch emulation makes XLA:CPU compiles of the fused
        # curve kernels ~10x slower, and the unrolled O(L^2) trace is cheap
        # off-TPU.
        self.use_scratch = use_scratch

    # -- helpers ------------------------------------------------------------

    def _limb_vec(self, limbs, tshape):
        """(L, *tshape) per-limb constant planes, built from scalar
        literals at full tile shape (Pallas kernels may not capture array
        constants, and Mosaic cannot broadcast across sublanes AND lanes)."""
        return jnp.stack([jnp.full(tshape, np.uint32(v), jnp.uint32)
                          for v in limbs])

    def load(self, ref):
        return ref[...]

    def store(self, ref, a):
        ref[...] = a

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return self._limb_vec(self.one_limbs, a.shape[1:])

    def const(self, x: int, template):
        limbs = self.spec.to_limbs(self.spec.to_mont_int(x))
        return self._limb_vec(limbs, template.shape[1:])

    # -- carry machinery ----------------------------------------------------

    def _cond_sub_p(self, res, top=None):
        L = self.L
        borrow = jnp.zeros_like(res[0])
        sub = []
        for i in range(L):
            d = res[i] - self.p_limbs[i] - borrow  # wraps in uint32
            sub.append(d & _MASK)
            borrow = (d >> W) & _ONE
        need = borrow == 0
        if top is not None:
            need = need | (top > 0)
        return jnp.where(need, jnp.stack(sub), jnp.stack(res))

    def _carry_rows(self, rows):
        """Propagate carries across a list of L lazy rows (< 2^32 each)."""
        c = jnp.zeros_like(rows[0])
        out = []
        for i in range(self.L):
            u = rows[i] + c
            out.append(u & _MASK)
            c = u >> W
        return out, c

    # -- ring ops ------------------------------------------------------------

    def add(self, a, b):
        out, c = self._carry_rows([a[i] + b[i] for i in range(self.L)])
        return self._cond_sub_p(out, top=c)

    def sub(self, a, b):
        L = self.L
        borrow = jnp.zeros_like(a[0])
        d = []
        for i in range(L):
            t = a[i] - b[i] - borrow
            d.append(t & _MASK)
            borrow = (t >> W) & _ONE
        plus, _ = self._carry_rows([d[i] + self.p_limbs[i] for i in range(L)])
        return jnp.where(borrow > 0, jnp.stack(plus), jnp.stack(d))

    def neg(self, a):
        return self.sub(self.zero_like(a), a)

    def mul(self, a, b):
        """Operand-scanning product + column-lazy Montgomery REDC.

        The 2L+1 lazy columns live in a scoped VMEM scratch ref; each step
        accumulates a whole (L, *tile) limb plane in place via static-slice
        stores (the Pallas-native idiom — Mosaic has no scatter-add on
        values).  ~20 traced ops per limb instead of ~5L, keeping kernel
        trace/compile time linear in L.
        """
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = self.L
        tshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (L,) + tshape)
        b = jnp.broadcast_to(b, (L,) + tshape)
        if not self.use_scratch:
            return self._mul_unrolled(a, b)
        p_vec = self._limb_vec(self.p_limbs, tshape)

        def body(t_ref):
            t_ref[...] = jnp.zeros((2 * L + 1,) + tshape, jnp.uint32)
            for i in range(L):
                pr = a[i][None] * b  # (L, *tile), each < 2^32
                t_ref[i : i + L] = t_ref[i : i + L] + (pr & _MASK)
                t_ref[i + 1 : i + L + 1] = t_ref[i + 1 : i + L + 1] + (pr >> W)
            for i in range(L):
                m = ((t_ref[i] & _MASK) * self.n0) & _MASK
                mp = m[None] * p_vec
                t_ref[i : i + L] = t_ref[i : i + L] + (mp & _MASK)
                t_ref[i + 1 : i + L + 1] = t_ref[i + 1 : i + L + 1] + (mp >> W)
                # column i is now ≡ 0 mod 2^16; fold its carry upward
                t_ref[i + 1] = t_ref[i + 1] + (t_ref[i] >> W)
            res, c = self._carry_rows([t_ref[L + i] for i in range(L)])
            return self._cond_sub_p(res, top=c + t_ref[2 * L])

        return pl.run_scoped(
            body, pltpu.VMEM((2 * L + 1,) + tshape, jnp.uint32))

    def _mul_unrolled(self, a, b):
        """Per-column unrolled Montgomery multiply (no scratch ref)."""
        L = self.L
        zero = jnp.zeros_like(a[0])
        t = [zero] * (2 * L + 1)
        for i in range(L):
            ai = a[i]
            for j in range(L):
                pr = ai * b[j]
                t[i + j] = t[i + j] + (pr & _MASK)
                t[i + j + 1] = t[i + j + 1] + (pr >> W)
        for i in range(L):
            m = ((t[i] & _MASK) * self.n0) & _MASK
            for j in range(L):
                pr = m * self.p_limbs[j]
                t[i + j] = t[i + j] + (pr & _MASK)
                t[i + j + 1] = t[i + j + 1] + (pr >> W)
            # column i is now ≡ 0 mod 2^16; fold its carry upward
            t[i + 1] = t[i + 1] + (t[i] >> W)
        res, c = self._carry_rows(t[L : 2 * L])
        return self._cond_sub_p(res, top=c + t[2 * L])

    def sqr(self, a):
        return self.mul(a, a)

    def select(self, mask, a, b):
        return jnp.where(mask, a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)


class TileFq2:
    """Fq2 = Fq[u]/(u^2+1) on pairs of limb arrays (Karatsuba mul)."""

    def __init__(self, spec: FieldSpec, use_scratch: bool = True):
        self.base = TileFp(spec, use_scratch=use_scratch)

    def load(self, ref0, ref1):
        return (self.base.load(ref0), self.base.load(ref1))

    def add(self, a, b):
        return (self.base.add(a[0], b[0]), self.base.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.base.sub(a[0], b[0]), self.base.sub(a[1], b[1]))

    def neg(self, a):
        return (self.base.neg(a[0]), self.base.neg(a[1]))

    def mul(self, a, b):
        f = self.base
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        return (f.sub(t0, t1), f.sub(t2, f.add(t0, t1)))

    def sqr(self, a):
        f = self.base
        c0 = f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        t = f.mul(a[0], a[1])
        return (c0, f.add(t, t))

    def select(self, mask, a, b):
        s = self.base.select
        return (s(mask, a[0], b[0]), s(mask, a[1], b[1]))
