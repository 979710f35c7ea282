"""Fp: user-facing batched prime-field element (a thin pytree over limb.py).

An ``Fp`` holds a Montgomery-domain limb array of shape ``(L, *batch)`` plus a
static ``FieldSpec``.  Arithmetic operators broadcast over batch dims exactly
like jnp arrays.  Everything is jit/vmap/scan-compatible.

Capability parity: the reference's ``FiniteFieldElement<M>`` + ``Ring``/``Field``
traits (myzkp/src/modules/algebra/field.rs:69-110, ring.rs:6-38), re-designed
as batched arrays rather than scalar objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limb
from .spec import FieldSpec


@jax.tree_util.register_pytree_node_class
class Fp:
    """Batched element(s) of F_p in Montgomery form."""

    __slots__ = ("spec", "mont")

    def __init__(self, spec: FieldSpec, mont):
        self.spec = spec
        self.mont = mont  # uint32 (L, *batch), Montgomery domain

    # -- pytree ---------------------------------------------------------------
    def tree_flatten(self):
        return (self.mont,), self.spec

    @classmethod
    def tree_unflatten(cls, spec, children):
        return cls(spec, children[0])

    # -- constructors -----------------------------------------------------------
    @classmethod
    def from_int(cls, spec: FieldSpec, x) -> "Fp":
        return cls(spec, limb.to_mont(spec, limb.from_int(spec, x)))

    @classmethod
    def zeros(cls, spec: FieldSpec, batch_shape=()) -> "Fp":
        return cls(spec, limb.zeros(spec, batch_shape))

    @classmethod
    def ones(cls, spec: FieldSpec, batch_shape=()) -> "Fp":
        return cls(spec, limb.one_mont(spec, batch_shape))

    @classmethod
    def arange(cls, spec: FieldSpec, n: int) -> "Fp":
        return cls.from_int(spec, np.arange(n, dtype=object))

    @classmethod
    def random(cls, spec: FieldSpec, key, batch_shape=()) -> "Fp":
        return cls(spec, limb.to_mont(spec, limb.random(spec, key, batch_shape)))

    # -- host round-trip ----------------------------------------------------------
    def to_int(self):
        """numpy object array of Python ints (standard domain)."""
        out = limb.to_int(self.spec, np.asarray(limb.from_mont(self.spec, self.mont)))
        return out

    def item(self) -> int:
        v = self.to_int()
        return int(np.asarray(v).reshape(()))

    # -- shape helpers -------------------------------------------------------------
    @property
    def shape(self):
        return self.mont.shape[1:]

    @property
    def ndim(self):
        return self.mont.ndim - 1

    def reshape(self, *shape) -> "Fp":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return Fp(self.spec, self.mont.reshape((self.spec.L,) + tuple(shape)))

    def broadcast_to(self, shape) -> "Fp":
        """Broadcast batch dims to ``shape`` (numpy-style, right-aligned).

        The limb axis is leading, so the current batch shape must first be
        left-padded with singleton dims before ``jnp.broadcast_to`` — naive
        broadcasting of the raw ``(L, *batch)`` array would right-align the
        limb axis itself against ``shape`` (it only "worked" when the last
        batch dim happened to equal L)."""
        shape = tuple(shape)
        cur = self.shape
        if len(shape) < len(cur):
            raise ValueError(f"cannot broadcast batch {cur} to {shape}")
        m = self.mont.reshape(
            (self.spec.L,) + (1,) * (len(shape) - len(cur)) + cur)
        return Fp(self.spec, jnp.broadcast_to(m, (self.spec.L,) + shape))

    @classmethod
    def full(cls, spec: FieldSpec, batch_shape, value: int) -> "Fp":
        return cls.from_int(spec, value).broadcast_to(tuple(batch_shape))

    def __getitem__(self, idx) -> "Fp":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Fp(self.spec, self.mont[(slice(None),) + idx])

    def at_set(self, idx, value: "Fp") -> "Fp":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Fp(self.spec, self.mont.at[(slice(None),) + idx].set(value.mont))

    def concat(self, other: "Fp", axis: int = 0) -> "Fp":
        ax = axis + 1 if axis >= 0 else axis
        return Fp(self.spec, jnp.concatenate([self.mont, other.mont], axis=ax))

    @staticmethod
    def stack(xs, axis: int = 0) -> "Fp":
        ax = axis + 1 if axis >= 0 else axis
        return Fp(xs[0].spec, jnp.stack([x.mont for x in xs], axis=ax))

    def take(self, indices, axis: int = 0) -> "Fp":
        return Fp(self.spec, jnp.take(self.mont, indices, axis=axis + 1))

    def flip(self, axis: int = 0) -> "Fp":
        return Fp(self.spec, jnp.flip(self.mont, axis=axis + 1))

    def sum(self, axis: int = 0) -> "Fp":
        """Field sum along a batch axis via log-depth pairwise reduction.

        Negative axes refer to trailing batch dims (same index as leaf)."""
        ax = axis + 1 if axis >= 0 else self.mont.ndim + axis
        m = self.mont
        n = m.shape[ax]
        spec = self.spec
        while n > 1:
            half = n // 2
            lo = jax.lax.slice_in_dim(m, 0, half, axis=ax)
            hi = jax.lax.slice_in_dim(m, half, 2 * half, axis=ax)
            s = limb.add(spec, lo, hi)
            if n % 2:
                tail = jax.lax.slice_in_dim(m, 2 * half, n, axis=ax)
                s = jnp.concatenate([s, tail], axis=ax)
            m = s
            n = m.shape[ax]
        return Fp(spec, jnp.squeeze(m, axis=ax))

    # -- arithmetic -------------------------------------------------------------
    def _coerce(self, other):
        if isinstance(other, Fp):
            return other
        if isinstance(other, (int, np.integer)):
            return Fp.from_int(self.spec, int(other))
        return NotImplemented

    def __add__(self, other):
        o = self._coerce(other)
        return Fp(self.spec, limb.add(self.spec, self.mont, o.mont))

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        return Fp(self.spec, limb.sub(self.spec, self.mont, o.mont))

    def __rsub__(self, other):
        o = self._coerce(other)
        return Fp(self.spec, limb.sub(self.spec, o.mont, self.mont))

    def __mul__(self, other):
        o = self._coerce(other)
        return Fp(self.spec, limb.mont_mul(self.spec, self.mont, o.mont))

    __rmul__ = __mul__

    def __neg__(self):
        return Fp(self.spec, limb.neg(self.spec, self.mont))

    def __pow__(self, e: int):
        if e < 0:
            return self.inv() ** (-e)
        return Fp(self.spec, limb.pow_const(self.spec, self.mont, e))

    def __truediv__(self, other):
        o = self._coerce(other)
        return self * o.inv()

    def inv(self) -> "Fp":
        return Fp(self.spec, limb.inv(self.spec, self.mont))

    def batch_inv(self, axis: int = -1) -> "Fp":
        ax = axis + 1 if axis >= 0 else axis
        return Fp(self.spec, limb.batch_inv(self.spec, self.mont, axis=ax))

    def square(self) -> "Fp":
        return Fp(self.spec, limb.mont_sqr(self.spec, self.mont))

    # -- predicates ------------------------------------------------------------
    def is_zero(self):
        return limb.is_zero(self.spec, self.mont)

    def equals(self, other) -> jax.Array:
        o = self._coerce(other)
        return limb.eq(self.spec, self.mont, o.mont)

    @staticmethod
    def select(mask, a: "Fp", b: "Fp") -> "Fp":
        return Fp(a.spec, limb.select(mask, a.mont, b.mont))

    def __repr__(self):
        try:
            return f"Fp(p={self.spec.p}, shape={self.shape}, value={self.to_int()})"
        except Exception:
            return f"Fp(p={self.spec.p}, shape={self.shape}, traced)"
