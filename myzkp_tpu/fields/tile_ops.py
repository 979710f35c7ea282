"""Tile-level prime-field arithmetic for use *inside* Pallas kernels.

A field element batch inside a kernel is a Python list of ``L`` uint32
arrays (one per 16-bit limb), each of the same tile shape (e.g. (S, 128)).
All loops are over the static limb count, fully unrolled at trace time, so a
whole chain of field ops (a complete EC addition, an NTT butterfly) fuses
into ONE kernel with every intermediate in VMEM/vregs.

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
    """Field ops on unrolled limb lists inside a Pallas kernel."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.L
        self.p_limbs = tuple(np.uint32(v) for v in spec.p_limbs)
        self.one_limbs = tuple(np.uint32(v) for v in spec.one_limbs)
        self.n0 = np.uint32(spec.n0)

    # -- helpers ------------------------------------------------------------

    def load(self, ref):
        return [ref[i] for i in range(self.L)]

    def store(self, ref, a):
        for i in range(self.L):
            ref[i] = a[i]

    def zero_like(self, a):
        return [jnp.zeros_like(a[0]) for _ in range(self.L)]

    def one_like(self, a):
        z = jnp.zeros_like(a[0])
        return [z + c for c in self.one_limbs]

    def const(self, x: int, template):
        limbs = self.spec.to_limbs(self.spec.to_mont_int(x))
        z = jnp.zeros_like(template[0])
        return [z + np.uint32(v) for v in limbs]

    # -- carry machinery ----------------------------------------------------

    def _cond_sub_p(self, res, top=None):
        borrow = jnp.zeros_like(res[0])
        sub = []
        for i in range(self.L):
            d = res[i] - self.p_limbs[i] - borrow  # wraps in uint32
            sub.append(d & _MASK)
            borrow = (d >> W) & _ONE
        need = borrow == 0
        if top is not None:
            need = need | (top > 0)
        return [jnp.where(need, sub[i], res[i]) for i in range(self.L)]

    # -- ring ops ------------------------------------------------------------

    def add(self, a, b):
        c = jnp.zeros_like(a[0])
        out = []
        for i in range(self.L):
            u = a[i] + b[i] + c
            out.append(u & _MASK)
            c = u >> W
        return self._cond_sub_p(out, top=c)

    def sub(self, a, b):
        borrow = jnp.zeros_like(a[0])
        d = []
        for i in range(self.L):
            t = a[i] - b[i] - borrow
            d.append(t & _MASK)
            borrow = (t >> W) & _ONE
        # add p back where borrowed
        c = jnp.zeros_like(a[0])
        plus = []
        for i in range(self.L):
            u = d[i] + self.p_limbs[i] + c
            plus.append(u & _MASK)
            c = u >> W
        wrap = borrow > 0
        return [jnp.where(wrap, plus[i], d[i]) for i in range(self.L)]

    def neg(self, a):
        return self.sub(self.zero_like(a), a)

    def mul(self, a, b):
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
            t[i + 1] = t[i + 1] + (t[i] >> W)
        res = []
        c = zero
        for i in range(L):
            u = t[L + i] + c
            res.append(u & _MASK)
            c = u >> W
        return self._cond_sub_p(res, top=c + t[2 * L])

    def sqr(self, a):
        return self.mul(a, a)

    def select(self, mask, a, b):
        return [jnp.where(mask, a[i], b[i]) for i in range(self.L)]

    def is_zero(self, a):
        z = a[0] == 0
        for i in range(1, self.L):
            z = z & (a[i] == 0)
        return z


class TileFq2:
    """Fq2 = Fq[u]/(u^2+1) on pairs of limb lists (Karatsuba mul)."""

    def __init__(self, spec: FieldSpec):
        self.base = TileFp(spec)

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
