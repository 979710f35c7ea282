"""Sparse multivariate polynomials over F_p.

Capability parity with myzkp/src/modules/algebra/mpolynomials.rs (MPolynomial:
HashMap exponent-vector -> coeff; evaluate :103-123, evaluate_symbolic
:125-141, lift :143-164, partial_evaluate :166-200, pow :76-101, ring ops
:204-350).

TPU split: the *symbolic* algebra (building AIR constraints — tiny dicts)
stays host-side on Python ints; the two heavy consumers run on device:
  - ``evaluate_batch``: evaluate at a whole array of points at once
    (per-variable power tables + gathers + one product/sum reduction), used
    by the STARK verifier-side point checks and the sumcheck prover tables;
  - ``evaluate_symbolic``: compose with univariate device polynomials (the
    AIR -> univariate bridge in the STARK prover), with NTT products.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.fp import Fp
from ..fields.spec import FieldSpec
from .poly import Poly, poly_eval


class MPoly:
    """dictionary: {exponent tuple: int coefficient (mod p)}."""

    __slots__ = ("spec", "d")

    def __init__(self, spec: FieldSpec, d: dict | None = None):
        self.spec = spec
        clean = {}
        for exps, c in (d or {}).items():
            c = c % spec.p
            if c:
                clean[tuple(int(e) for e in exps)] = c
        self.d = clean

    # -- constructors ------------------------------------------------------
    @classmethod
    def constant(cls, spec: FieldSpec, v: int) -> "MPoly":
        return cls(spec, {(): v})

    @classmethod
    def variables(cls, spec: FieldSpec, n: int) -> list:
        """[x_0, ..., x_{n-1}] as MPolys (parity: mpolynomials.rs variables)."""
        out = []
        for i in range(n):
            e = [0] * n
            e[i] = 1
            out.append(cls(spec, {tuple(e): 1}))
        return out

    def num_variables(self) -> int:
        return max((len(e) for e in self.d), default=0)

    def is_zero(self) -> bool:
        return not self.d

    def degree(self) -> int:
        return max((sum(e) for e in self.d), default=0)

    # -- ring ops (host; parity: mpolynomials.rs:204-350) -------------------
    def _pad(self, e, n):
        return tuple(e) + (0,) * (n - len(e))

    def __add__(self, o):
        o = self._coerce(o)
        n = max(self.num_variables(), o.num_variables())
        d = {}
        for src in (self.d, o.d):
            for e, c in src.items():
                k = self._pad(e, n)
                d[k] = (d.get(k, 0) + c) % self.spec.p
        return MPoly(self.spec, d)

    def __sub__(self, o):
        return self + (-self._coerce(o))

    def __neg__(self):
        return MPoly(self.spec, {e: -c for e, c in self.d.items()})

    def __mul__(self, o):
        o = self._coerce(o)
        n = max(self.num_variables(), o.num_variables())
        d = {}
        p = self.spec.p
        for e1, c1 in self.d.items():
            e1p = self._pad(e1, n)
            for e2, c2 in o.d.items():
                e2p = self._pad(e2, n)
                k = tuple(a + b for a, b in zip(e1p, e2p))
                d[k] = (d.get(k, 0) + c1 * c2) % p
        return MPoly(self.spec, d)

    __rmul__ = __mul__
    __radd__ = __add__

    def __pow__(self, k: int) -> "MPoly":
        result = MPoly.constant(self.spec, 1)
        base = self
        while k:
            if k & 1:
                result = result * base
            base = base * base
            k >>= 1
        return result

    def _coerce(self, o):
        if isinstance(o, MPoly):
            return o
        if isinstance(o, int):
            return MPoly.constant(self.spec, o)
        return NotImplemented

    def __eq__(self, o):
        return isinstance(o, MPoly) and self._norm() == o._norm()

    def _norm(self):
        n = self.num_variables()
        return {self._pad(e, n): c for e, c in self.d.items()}

    # -- lift / partial evaluation (parity: mpolynomials.rs:143-200) ---------
    @classmethod
    def lift(cls, coeffs: list[int], spec: FieldSpec, var_index: int) -> "MPoly":
        """Univariate coefficients -> MPoly in variable var_index."""
        d = {}
        for k, c in enumerate(coeffs):
            if c % spec.p:
                e = [0] * (var_index + 1)
                e[var_index] = k
                d[tuple(e)] = c
        return cls(spec, d)

    def partial_evaluate(self, assignments: dict) -> "MPoly":
        """Substitute {var_index: int value} for a subset of variables."""
        p = self.spec.p
        d = {}
        for e, c in self.d.items():
            coef = c
            new_e = list(e)
            for idx, val in assignments.items():
                if idx < len(e) and e[idx]:
                    coef = coef * pow(val % p, e[idx], p) % p
                    new_e[idx] = 0
            k = tuple(new_e)
            d[k] = (d.get(k, 0) + coef) % p
        return MPoly(self.spec, d)

    # -- host evaluation (parity: mpolynomials.rs:103-123) -------------------
    def evaluate(self, point: list[int]) -> int:
        p = self.spec.p
        acc = 0
        for e, c in self.d.items():
            term = c
            for v, k in enumerate(e):
                if k:
                    term = term * pow(point[v] % p, k, p) % p
            acc = (acc + term) % p
        return acc

    # -- device batched evaluation ------------------------------------------
    def evaluate_batch(self, xs: Fp) -> Fp:
        """Evaluate at many points at once.  xs: (V, *batch) Fp (variable
        axis leading).  Returns (*batch) Fp."""
        spec = self.spec
        batch = xs.shape[1:]
        if not self.d:
            return Fp.zeros(spec, batch)
        V = xs.shape[0]
        terms = sorted(self.d.items())
        max_e = [0] * V
        for e, _ in terms:
            for v in range(min(V, len(e))):
                max_e[v] = max(max_e[v], e[v])
        # per-variable power tables: pows[v] has shape (max_e[v]+1, *batch)
        pow_tables = []
        for v in range(V):
            xv = xs[v]
            tab = [Fp.ones(spec, batch)]
            for _ in range(max_e[v]):
                tab.append(tab[-1] * xv)
            pow_tables.append(tab)
        acc = Fp.zeros(spec, batch)
        for e, c in terms:
            term = Fp.from_int(spec, c).broadcast_to(batch)
            for v in range(min(V, len(e))):
                if e[v]:
                    term = term * pow_tables[v][e[v]]
            acc = acc + term
        return acc

    # -- symbolic composition (parity: mpolynomials.rs:125-141) --------------
    def evaluate_symbolic(self, polys: list[Poly], capacity: int | None = None
                          ) -> Poly:
        """Substitute univariate device polynomials for the variables."""
        spec = self.spec
        if not self.d:
            return Poly.zero(spec, capacity or 1)
        if capacity is None:
            deg = 0
            for e, _ in self.d.items():
                d_term = sum(
                    e[v] * max(polys[v].capacity - 1, 0)
                    for v in range(min(len(e), len(polys)))
                )
                deg = max(deg, d_term)
            capacity = deg + 1
        acc = Poly.zero(spec, capacity)
        for e, c in sorted(self.d.items()):
            term = Poly.from_int_coeffs(spec, [c])
            for v in range(min(len(e), len(polys))):
                if e[v]:
                    term = term * (polys[v] ** e[v])
            if term.capacity > capacity:
                term = Poly(term.coef[:capacity])
            acc = acc + term.pad_to(capacity)
        return acc
