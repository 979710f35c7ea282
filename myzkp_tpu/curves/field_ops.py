"""Generic field-operation bundles for curve arithmetic.

The projective Weierstrass formulas in ``weierstrass.py`` are written against a
small duck-typed interface (``add/sub/mul/sqr/neg/zeros/one/select/is_zero``)
so the same code instantiates G1 (coordinates in F_q) and G2 (coordinates in
F_q2).  Elements are pytrees: a bare ``(L, *batch)`` limb array for Fp, and a
2-tuple of such arrays for Fq2 = F_q[u]/(u^2+1).

Capability parity: the reference's generic ``EllipticCurvePoint<F, E>`` over
any ``Field`` (myzkp/src/modules/algebra/curve/curve.rs:17-22) and its Fq2
extension (myzkp/src/modules/algebra/curve/bn128.rs:33-49) — re-designed as
batched Montgomery-limb arrays instead of scalar BigInt objects.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import limb
from ..fields.spec import FieldSpec


class FpOps:
    """Prime-field ops on Montgomery limb arrays of shape (L, *batch)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec

    def add(self, a, b):
        return limb.add(self.spec, a, b)

    def sub(self, a, b):
        return limb.sub(self.spec, a, b)

    def mul(self, a, b):
        return limb.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return limb.mont_mul(self.spec, a, a)

    def neg(self, a):
        return limb.neg(self.spec, a)

    def zeros(self, batch_shape=()):
        return limb.zeros(self.spec, batch_shape)

    def one(self, batch_shape=()):
        return limb.one_mont(self.spec, batch_shape)

    def const(self, x: int, batch_shape=()):
        """Host int -> Montgomery limb array broadcast over batch."""
        arr = limb.const(self.spec, self.spec.to_mont_int(x), batch_shape)
        return arr

    def select(self, mask, a, b):
        return limb.select(mask, a, b)

    def is_zero(self, a):
        return limb.is_zero(self.spec, a)

    def eq(self, a, b):
        return limb.eq(self.spec, a, b)

    def inv(self, a):
        return limb.inv(self.spec, a)

    def batch_inv(self, a, axis=-1):
        ax = axis + 1 if axis >= 0 else axis
        return limb.batch_inv(self.spec, a, axis=ax)

    def batch_shape(self, a):
        return a.shape[1:]

    def stack(self, elems, axis=0):
        ax = axis + 1 if axis >= 0 else axis
        return jnp.stack(elems, axis=ax)

    def index(self, a, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return a[(slice(None),) + idx]

    def dyn_index(self, a, i, axis=0):
        import jax

        return jax.lax.dynamic_index_in_dim(a, i, axis=axis + 1, keepdims=False)

    def take(self, a, indices, axis=0):
        return jnp.take(a, indices, axis=axis + 1)


class Fq2Ops:
    """F_q[u]/(u^2 + 1) ops; elements are 2-tuples (c0, c1) of limb arrays.

    The non-residue is -1 (reference: bn128.rs:33-49, Fq2 modulus x^2 + 1), so
    (a0 + a1 u)(b0 + b1 u) = (a0 b0 - a1 b1) + ((a0+a1)(b0+b1) - a0 b0 - a1 b1) u
    — Karatsuba, 3 base multiplications.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.base = FpOps(spec)

    def add(self, a, b):
        return (self.base.add(a[0], b[0]), self.base.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.base.sub(a[0], b[0]), self.base.sub(a[1], b[1]))

    def mul(self, a, b):
        f = self.base
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        return (f.sub(t0, t1), f.sub(t2, f.add(t0, t1)))

    def sqr(self, a):
        # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
        f = self.base
        c0 = f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        t = f.mul(a[0], a[1])
        return (c0, f.add(t, t))

    def neg(self, a):
        return (self.base.neg(a[0]), self.base.neg(a[1]))

    def zeros(self, batch_shape=()):
        return (self.base.zeros(batch_shape), self.base.zeros(batch_shape))

    def one(self, batch_shape=()):
        return (self.base.one(batch_shape), self.base.zeros(batch_shape))

    def const(self, x, batch_shape=()):
        """x: int (embedded F_q) or (c0, c1) int pair."""
        if isinstance(x, tuple):
            return (
                self.base.const(x[0], batch_shape),
                self.base.const(x[1], batch_shape),
            )
        return (self.base.const(x, batch_shape), self.base.zeros(batch_shape))

    def select(self, mask, a, b):
        s = self.base.select
        return (s(mask, a[0], b[0]), s(mask, a[1], b[1]))

    def is_zero(self, a):
        return self.base.is_zero(a[0]) & self.base.is_zero(a[1])

    def eq(self, a, b):
        return self.base.eq(a[0], b[0]) & self.base.eq(a[1], b[1])

    def inv(self, a):
        # (a0 - a1 u) / (a0^2 + a1^2)
        f = self.base
        norm = f.add(f.sqr(a[0]), f.sqr(a[1]))
        ninv = f.inv(norm)
        return (f.mul(a[0], ninv), f.neg(f.mul(a[1], ninv)))

    def batch_inv(self, a, axis=-1):
        f = self.base
        norm = f.add(f.sqr(a[0]), f.sqr(a[1]))
        ninv = f.batch_inv(norm, axis=axis)  # base translates to leaf axis
        return (f.mul(a[0], ninv), f.neg(f.mul(a[1], ninv)))

    def batch_shape(self, a):
        return a[0].shape[1:]

    def stack(self, elems, axis=0):
        b = self.base
        return (
            b.stack([e[0] for e in elems], axis),
            b.stack([e[1] for e in elems], axis),
        )

    def index(self, a, idx):
        return (self.base.index(a[0], idx), self.base.index(a[1], idx))

    def dyn_index(self, a, i, axis=0):
        return (self.base.dyn_index(a[0], i, axis), self.base.dyn_index(a[1], i, axis))

    def take(self, a, indices, axis=0):
        return (self.base.take(a[0], indices, axis), self.base.take(a[1], indices, axis))
