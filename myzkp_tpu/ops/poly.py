"""Dense univariate polynomials over Fp, batched and jit-friendly.

Capability parity with myzkp/src/modules/algebra/polynomial.rs (Polynomial<F>:
eval 120-128, multi-point eval 130-136, interpolate 177-199, from_monomials
202-212, schoolbook mul 302-316, div_rem 371-405, pow 338-369) — re-designed:

  * coefficients are a low-first Fp array with a *static* capacity (the last
    axis); semantic degree may be smaller (trailing zeros), matching jit's
    static-shape requirement instead of the reference's dynamically-trimmed
    Vec<F>.
  * evaluation is a Horner lax.scan (no per-coefficient Python looping);
  * multiplication dispatches to the NTT for large sizes;
  * long division is a fixed-trip-count scan (divisor degree is static);
  * Lagrange interpolation is formulated with batch inversion + zerofier
    synthetic division so the O(n^2) work is n full-width vector steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.fp import Fp
from ..fields.spec import FieldSpec
from . import ntt as _ntt


class Poly:
    """Polynomial with Fp coefficients, low-first, static capacity."""

    __slots__ = ("coef",)

    def __init__(self, coef: Fp):
        self.coef = coef

    # -- constructors ----------------------------------------------------------
    @classmethod
    def from_int_coeffs(cls, spec: FieldSpec, coeffs) -> "Poly":
        return cls(Fp.from_int(spec, list(coeffs)))

    @classmethod
    def zero(cls, spec: FieldSpec, capacity: int = 1) -> "Poly":
        return cls(Fp.zeros(spec, (capacity,)))

    @classmethod
    def one(cls, spec: FieldSpec, capacity: int = 1) -> "Poly":
        return cls(Fp.ones(spec, (1,)).concat(Fp.zeros(spec, (capacity - 1,))) if capacity > 1 else Fp.ones(spec, (1,)))

    @classmethod
    def x(cls, spec: FieldSpec) -> "Poly":
        return cls.from_int_coeffs(spec, [0, 1])

    @property
    def spec(self) -> FieldSpec:
        return self.coef.spec

    @property
    def capacity(self) -> int:
        return self.coef.shape[-1]

    def degree(self) -> int:
        """Host-side semantic degree (-1 for the zero polynomial)."""
        vals = self.coef.to_int()
        for i in range(len(vals) - 1, -1, -1):
            if int(vals[i]) != 0:
                return i
        return -1

    def to_int(self):
        return self.coef.to_int()

    def trim(self) -> "Poly":
        d = self.degree()
        return Poly(self.coef[: max(1, d + 1)])

    def pad_to(self, n: int) -> "Poly":
        return Poly(_pad(self.coef, n))

    # -- arithmetic ------------------------------------------------------------
    def __add__(self, other: "Poly") -> "Poly":
        n = max(self.capacity, other.capacity)
        return Poly(_pad(self.coef, n) + _pad(other.coef, n))

    def __sub__(self, other: "Poly") -> "Poly":
        n = max(self.capacity, other.capacity)
        return Poly(_pad(self.coef, n) - _pad(other.coef, n))

    def __neg__(self) -> "Poly":
        return Poly(-self.coef)

    def __mul__(self, other) -> "Poly":
        if isinstance(other, (int, Fp)):
            return self.scale_const(other)
        na, nb = self.capacity, other.capacity
        if na * nb <= 256:
            return Poly(_mul_schoolbook(self.coef, other.coef))
        return Poly(_ntt.fast_multiply(self.coef, other.coef))

    __rmul__ = __mul__

    def scale_const(self, c) -> "Poly":
        if isinstance(c, int):
            c = Fp.from_int(self.spec, c)
        return Poly(self.coef * c)

    def __pow__(self, e: int) -> "Poly":
        result = Poly.one(self.spec)
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    # -- evaluation --------------------------------------------------------------
    def __call__(self, x: Fp) -> Fp:
        return poly_eval(self.coef, x)

    def eval_domain(self, xs: Fp) -> Fp:
        return poly_eval(self.coef, xs)

    def scale(self, c) -> "Poly":
        """p(c*x): coef[i] *= c^i (parity: polynomial.rs:167-174)."""
        if isinstance(c, Fp):
            pows = _powers(c, self.capacity)
        else:
            pows = _ntt.geometric_series(self.spec, int(c), self.capacity)
        return Poly(self.coef * pows)

    # -- division ---------------------------------------------------------------
    def divmod(self, divisor: "Poly", divisor_degree: int | None = None):
        dd = divisor.degree() if divisor_degree is None else divisor_degree
        q, r = poly_divmod(self.coef, divisor.coef, dd)
        return Poly(q), Poly(r)

    def __truediv__(self, other: "Poly") -> "Poly":
        q, _ = self.divmod(other)
        return q

    def __mod__(self, other: "Poly") -> "Poly":
        _, r = self.divmod(other)
        return r

    def __repr__(self):
        try:
            return f"Poly({list(self.to_int())})"
        except Exception:
            return f"Poly(capacity={self.capacity}, traced)"


# ---------------------------------------------------------------------------
# Functional kernels
# ---------------------------------------------------------------------------

def _pad(a: Fp, n: int) -> Fp:
    cur = a.shape[-1]
    if cur >= n:
        return a
    pad = [(0, 0)] * a.mont.ndim
    pad[-1] = (0, n - cur)
    return Fp(a.spec, jnp.pad(a.mont, pad))


def poly_eval(coef: Fp, x: Fp) -> Fp:
    """Horner evaluation; coef (..., n), x any batch shape.

    Parity: polynomial.rs:120-136 (eval + eval_domain).
    """
    spec = coef.spec
    n = coef.shape[-1]
    # scan over coefficients high -> low
    rev = jnp.flip(coef.mont, axis=-1)
    rev = jnp.moveaxis(rev, -1, 0)  # (n, L, ...coefbatch)

    acc0 = limb.zeros(spec, jnp.broadcast_shapes(coef.shape[:-1], x.shape))

    def body(acc, c):
        cb = c.reshape(c.shape + (1,) * (acc.ndim - c.ndim))
        cb = jnp.broadcast_to(cb, acc.shape)
        acc = limb.add(spec, limb.mont_mul(spec, acc, x.mont), cb)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, rev)
    return Fp(spec, acc)


def _powers(x: Fp, n: int) -> Fp:
    """[1, x, x^2, ..., x^{n-1}] along a new last axis (log-depth)."""
    spec = x.spec
    out = Fp.ones(spec, x.shape + (1,))
    cur = Fp(spec, x.mont[..., None])
    k = 1
    while k < n:
        nxt = out * Fp(spec, jnp.broadcast_to(cur.mont, out.mont.shape))
        out = Fp(spec, jnp.concatenate([out.mont, nxt.mont], axis=-1))
        cur = cur * cur
        k *= 2
    return Fp(spec, out.mont[..., :n])


def powers(x: Fp, n: int) -> Fp:
    return _powers(x, n)


def _mul_schoolbook(a: Fp, b: Fp) -> Fp:
    """Coefficient convolution via shift-and-add (small sizes)."""
    spec = a.spec
    na, nb = a.shape[-1], b.shape[-1]
    out = limb.zeros(spec, jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]) + (na + nb - 1,))
    for i in range(na):
        ai = Fp(spec, a.mont[..., i : i + 1])
        prod = limb.mont_mul(spec, ai.mont, b.mont)
        out = _add_into(spec, out, prod, i)
    return Fp(spec, out)


def _add_into(spec, acc, vals, offset):
    nb = vals.shape[-1]
    seg = jax.lax.slice_in_dim(acc, offset, offset + nb, axis=acc.ndim - 1)
    seg = limb.add(spec, seg, vals)
    return jax.lax.dynamic_update_slice_in_dim(acc, seg, offset, axis=acc.ndim - 1)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _divmod_kernel(spec: FieldSpec, a, b, bd: int):
    """Long division: a (L, ..., na) by b (L, ..., bd+1), deg(b)=bd exactly.

    Returns (q, r) with q capacity na-bd, r capacity max(bd,1).
    Fixed trip count: na-bd steps of one mul+sub on a bd-wide window.
    """
    na = a.shape[-1]
    steps = na - bd
    lead = limb.inv(spec, b[..., bd])  # (L, ...)
    bl = b[..., :bd]  # low part of divisor

    def body(carry, k):
        rem = carry  # (L, ..., na) with high coefficients progressively cleared
        pos = na - 1 - k  # current leading position
        c = limb.mont_mul(spec, jax.lax.dynamic_index_in_dim(rem, pos, axis=rem.ndim - 1, keepdims=False), lead)
        # rem[pos-bd : pos] -= c * b_low ; rem[pos] = 0
        window = jax.lax.dynamic_slice_in_dim(rem, pos - bd, bd, axis=rem.ndim - 1)
        window = limb.sub(spec, window, limb.mont_mul(spec, c[..., None], bl))
        rem = jax.lax.dynamic_update_slice_in_dim(rem, window, pos - bd, axis=rem.ndim - 1)
        rem = jax.lax.dynamic_update_index_in_dim(
            rem, jnp.zeros_like(c), pos, axis=rem.ndim - 1
        )
        return rem, c

    if steps <= 0:
        return limb.zeros(spec, a.shape[1:-1] + (1,)), a

    rem, qs = jax.lax.scan(body, a, jnp.arange(steps))
    # qs: (steps, L, ...) quotient coeffs high-first -> (L, ..., steps) low-first
    q = jnp.flip(jnp.moveaxis(qs, 0, -1), axis=-1)
    r = rem[..., : max(bd, 1)]
    return q, r


def poly_divmod(a: Fp, b: Fp, b_degree: int):
    """a = q*b + r with deg r < b_degree. b_degree must be the exact degree
    (static). Parity: polynomial.rs:371-405."""
    spec = a.spec
    if b_degree == 0:
        c_inv = limb.inv(spec, b.mont[..., 0])
        q = limb.mont_mul(spec, a.mont, c_inv[..., None])
        return Fp(spec, q), Fp.zeros(spec, a.shape[:-1] + (1,))
    if a.shape[-1] < b_degree + 1:
        a = _pad(a, b_degree + 1)
    q, r = _divmod_kernel(spec, a.mont, _pad(b, b_degree + 1).mont, b_degree)
    return Fp(spec, q), Fp(spec, r)


def from_monomials(xs: Fp) -> Fp:
    """Zerofier prod_i (X - x_i) -> coefficients (n+1 of them).

    Parity: polynomial.rs:202-212.  Sequential scan (n steps, vector work per
    step); for power-of-two root-of-unity domains prefer X^n - offset^n.
    """
    spec = xs.spec
    n = xs.shape[-1]
    coef0 = limb.zeros(spec, (n + 1,)).at[:, 0].set(limb.one_mont(spec))

    def body(coef, x):
        # coef := coef * (X - x) = shift(coef) - x*coef
        shifted = jnp.roll(coef, 1, axis=-1)
        shifted = shifted.at[..., 0].set(jnp.zeros_like(coef[..., 0]))
        return limb.sub(spec, shifted, limb.mont_mul(spec, coef, x[..., None])), None

    xs_seq = jnp.moveaxis(xs.mont, -1, 0)  # (n, L)
    coef, _ = jax.lax.scan(body, coef0, xs_seq)
    return Fp(spec, coef)


def zerofier_poly(xs: Fp) -> Poly:
    return Poly(from_monomials(xs))


def lagrange_interpolate(xs: Fp, ys: Fp) -> Fp:
    """Coefficients of the unique degree<n poly through (xs, ys).

    TPU formulation: master zerofier M(X) = prod (X - x_i) once (scan), then
    every basis numerator M/(X - x_i) by *batched synthetic division* (scan
    over coefficient positions, all i in parallel), weights via batch
    inversion of M'(x_i) = prod_{j!=i}(x_i - x_j).

    Parity: polynomial.rs:177-199 (O(n^2) Lagrange) — same complexity class
    but n vectorized steps instead of n^2 scalar ops.
    """
    spec = xs.spec
    n = xs.shape[-1]
    m = from_monomials(xs)  # (L, n+1)

    # synthetic division of M by (X - x_i) for all i at once:
    # q_{n-1} = m_n;  q_{k-1} = m_k + x_i * q_k   (k = n-1 .. 1)
    m_seq = jnp.flip(jnp.moveaxis(m.mont[..., 1:], -1, 0), axis=0)  # m_n, ..., m_1

    def body(acc, mk):
        # acc: (L, n) current quotient coeff per i
        q = limb.add(
            spec,
            jnp.broadcast_to(mk[..., None], acc.shape),
            limb.mont_mul(spec, xs.mont, acc),
        )
        return q, q

    q0 = limb.zeros(spec, (n,))
    _, qs = jax.lax.scan(body, q0, m_seq)
    # qs[t] = coefficient of X^{n-1-t} of M/(X-x_i): (n, L, n_i)
    numer = jnp.flip(jnp.moveaxis(qs, 0, -1), axis=-1)  # (L, n_i, n_coeff)

    # weights: w_i = y_i / M'(x_i);  M'(x_i) = numer_i(x_i)
    mprime = poly_eval(Fp(spec, numer), Fp(spec, xs.mont[..., None]))  # (n_i, 1)
    mprime = Fp(spec, mprime.mont[..., 0])
    w = ys * mprime.batch_inv(axis=-1)  # ys may carry extra leading batch dims
    return Fp(spec, limb.mont_mul(spec, numer, w.mont[..., None])).sum(axis=-2)


def interpolate_poly(xs: Fp, ys: Fp) -> Poly:
    return Poly(lagrange_interpolate(xs, ys))
