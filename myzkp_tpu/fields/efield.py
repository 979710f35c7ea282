"""Generic batched extension fields F_p[x]/(m(x)) on device.

Capability parity with myzkp/src/modules/algebra/efield.rs (the
`define_extension_field!` macro + `ExtendedFieldElement<M, P>`): a degree-k
extension over any limb FieldSpec, with the irreducible modulus polynomial
fixed at trace time.  The reference instantiates Fq2/Fq12 (BN254,
bn128.rs:33-81), GF(2^8) (reedsolomon.rs:352-394) and the M64 Goldilocks
cubic extension used for FRI challenges (fri.rs:410-421); here BN254's Fq2
has a dedicated fast path (curves/field_ops.py) and GF(2^8) lives in
codes/reedsolomon.py — this module provides the general machinery (arbitrary
k, arbitrary modulus), TPU-first: an element batch is a single uint32 array
of shape (k, L, *batch), every op a fixed unrolled sequence of full-batch
limb kernels.

Multiplication is schoolbook convolution (k^2 base muls) followed by static
reduction by m(x): x^(k+i) rewritten via a precomputed reduction table, all
unrolled at trace time.  Inversion is Fermat: a^(p^k - 2), a lax.scan of
square-and-multiply over the exponent bits (matching the library's
branchless inv(0) = 0 convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limb
from .spec import FieldSpec


class ExtFieldSpec:
    """Static description of F_p[x]/(m(x)), m monic of degree k.

    ``modulus_coeffs``: tuple of k ints — coefficients (c_0 .. c_{k-1}) of
    m(x) = x^k + c_{k-1} x^{k-1} + ... + c_0.
    """

    _cache: dict = {}

    def __new__(cls, base: FieldSpec, modulus_coeffs: tuple):
        key = (base, tuple(int(c) % base.p for c in modulus_coeffs))
        inst = cls._cache.get(key)
        if inst is None:
            inst = super().__new__(cls)
            inst._init(key[0], key[1])
            cls._cache[key] = inst
        return inst

    def _init(self, base: FieldSpec, modulus_coeffs: tuple):
        self.base = base
        self.m = tuple(modulus_coeffs)
        self.k = len(modulus_coeffs)
        # reduction table: x^(k+i) = sum_j R[i][j] x^j  for i = 0..k-2,
        # computed host-side with Python ints.
        p, k = base.p, self.k
        rows = []
        cur = [(-c) % p for c in modulus_coeffs]  # x^k
        rows.append(tuple(cur))
        for _ in range(k - 2):
            # multiply by x, reduce
            top = cur[-1]
            cur = [0] + cur[:-1]
            cur = [(cur[j] + top * rows[0][j]) % p for j in range(k)]
            rows.append(tuple(cur))
        self.red_rows = tuple(rows)  # (k-1) rows of k coeffs
        # Montgomery-domain device constants for the reduction rows
        self._red_dev = None

    def __hash__(self):
        return hash((self.base, self.m))

    def __eq__(self, other):
        return self is other

    def _red_mont(self):
        if self._red_dev is None:
            rows = np.zeros((max(1, self.k - 1), self.k, self.base.L),
                            dtype=np.uint32)
            for i, row in enumerate(self.red_rows):
                for j, c in enumerate(row):
                    for l, v in enumerate(
                            self.base.to_limbs(self.base.to_mont_int(c))):
                        rows[i, j, l] = v
            self._red_dev = rows
        return self._red_dev


# ---------------------------------------------------------------------------
# Element construction (elements: uint32 (k, L, *batch), Montgomery domain)
# ---------------------------------------------------------------------------

def from_int_coeffs(es: ExtFieldSpec, coeff_lists) -> jax.Array:
    """Host ints [[c_0..c_{k-1}], ...] -> device batch (k, L, n), Montgomery."""
    arr = np.asarray(coeff_lists, dtype=object)  # (..., k)
    moved = np.moveaxis(arr, -1, 0)  # (k, ...)
    std = limb.from_int(es.base, moved)  # (L, k, ...)
    return limb.to_mont(es.base, std).swapaxes(0, 1)


def to_int_coeffs(es: ExtFieldSpec, a) -> np.ndarray:
    """Device batch -> numpy object array (..., k) of Python ints."""
    std = limb.from_mont(es.base, jnp.swapaxes(a, 0, 1))  # (L, k, ...)
    ints = limb.to_int(es.base, np.asarray(std))  # (k, ...)
    return np.moveaxis(ints, 0, -1)


def zeros(es: ExtFieldSpec, batch_shape=()) -> jax.Array:
    return jnp.zeros((es.k, es.base.L) + tuple(batch_shape), dtype=jnp.uint32)


def one(es: ExtFieldSpec, batch_shape=()) -> jax.Array:
    o = limb.one_mont(es.base, batch_shape)
    return zeros(es, batch_shape).at[0].set(o)


# ---------------------------------------------------------------------------
# Arithmetic
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def add(es: ExtFieldSpec, a, b):
    return jnp.stack([limb.add(es.base, a[i], b[i]) for i in range(es.k)])


@functools.partial(jax.jit, static_argnums=0)
def sub(es: ExtFieldSpec, a, b):
    return jnp.stack([limb.sub(es.base, a[i], b[i]) for i in range(es.k)])


@functools.partial(jax.jit, static_argnums=0)
def neg(es: ExtFieldSpec, a):
    return jnp.stack([limb.neg(es.base, a[i]) for i in range(es.k)])


@functools.partial(jax.jit, static_argnums=0)
def mul(es: ExtFieldSpec, a, b):
    """Schoolbook convolution + static reduction by m(x), fully unrolled."""
    k, bs = es.k, es.base
    # convolution columns 0..2k-2
    cols: list = [None] * (2 * k - 1)
    for i in range(k):
        for j in range(k):
            t = limb.mont_mul(bs, a[i], b[j])
            c = i + j
            cols[c] = t if cols[c] is None else limb.add(bs, cols[c], t)
    if k == 1:
        return jnp.stack(cols[:1])
    red = es._red_mont()  # (k-1, k, L) standard numpy
    out = cols[:k]
    for i in range(k - 1):  # reduce column k+i
        hi = cols[k + i]
        for j in range(k):
            coef = red[i, j]
            if not coef.any():
                continue
            cvec = jnp.asarray(coef).reshape((bs.L,) + (1,) * (hi.ndim - 1))
            out[j] = limb.add(bs, out[j], limb.mont_mul(bs, hi, cvec))
    return jnp.stack(out)


def sqr(es: ExtFieldSpec, a):
    return mul(es, a, a)


def eq(es: ExtFieldSpec, a, b):
    z = limb.eq(es.base, a[0], b[0])
    for i in range(1, es.k):
        z = z & limb.eq(es.base, a[i], b[i])
    return z


def is_zero(es: ExtFieldSpec, a):
    z = limb.is_zero(es.base, a[0])
    for i in range(1, es.k):
        z = z & limb.is_zero(es.base, a[i])
    return z


def select(mask, a, b):
    return jnp.where(mask[None, None], a, b)


def scale(es: ExtFieldSpec, a, s):
    """Multiply by a base-field element batch s (L, *batch)."""
    return jnp.stack([limb.mont_mul(es.base, a[i], s) for i in range(es.k)])


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_const(es: ExtFieldSpec, a, e: int):
    """a^e for a static int exponent (lax.scan over bits, LSB first)."""
    if e == 0:
        return one(es, a.shape[2:])
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(e.bit_length())],
                 dtype=np.uint32))

    def body(carry, bit):
        acc, base = carry
        acc = select(bit > 0, mul(es, acc, base), acc)
        base = sqr(es, base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (one(es, a.shape[2:]), a), bits)
    return acc


@functools.partial(jax.jit, static_argnums=0)
def inv(es: ExtFieldSpec, a):
    """Fermat inverse a^(p^k - 2); branchless, inv(0) = 0."""
    return pow_const(es, a, es.base.p ** es.k - 2)


# ---------------------------------------------------------------------------
# Reference instantiations
# ---------------------------------------------------------------------------

def m64_cubic() -> ExtFieldSpec:
    """Goldilocks cubic extension, parity with the reference's Ip3 modulus
    x^3 - x + 1 i.e. coefficients (1, -1) -> (c0, c1, c2) = (1, p-1, 0)
    (myzkp/src/modules/zkstark/fri.rs:410-421)."""
    from .spec import M64

    base = FieldSpec.make(M64)
    return ExtFieldSpec(base, (1, M64 - 1, 0))


def bn254_fq2() -> ExtFieldSpec:
    """Fq2 = Fq[u]/(u^2 + 1) via the generic machinery (bn128.rs:33-49);
    the curve layer uses the dedicated Karatsuba path in field_ops.py."""
    from .spec import BN254_Q

    return ExtFieldSpec(FieldSpec.make(BN254_Q), (1, 0))
