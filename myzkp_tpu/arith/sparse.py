"""Sparse R1CS / QAP for large circuits.

The reference's R1CS is dense `Vec<Vec<F>>` matrices
(myzkp/src/modules/arithmetization/r1cs.rs:12-41) — fine for teaching-sized
systems, quadratic memory for real ones.  Production circuits are sparse
(a handful of terms per constraint), so the scale path here stores each of
L/R/O in COO form (rows, cols, vals) and keeps every whole-circuit
operation O(nnz) or O(m log m):

  - matvec L.a         -> one gather + segment_sum            (device)
  - QAP interpolation  -> the matvec IS the evaluation table over the
                          2^k root-of-unity domain; one INTT per poly
  - h = (l r - o)/t    -> pointwise division on a 2m coset    (device)
  - setup's ell_i(s)   -> lagrange-basis vector lam_j(s) (closed form on
                          the rou domain) + one segment_sum per matrix

Duck-compatible with arith/qap.py::QAP where snark/pinocchio.py needs it
(spec / m / d / t / eval_all_at / combine / h_poly), so the same Pinocchio
setup/prove/verify drives dense teaching circuits and sparse 2^18+ ones.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.fp import Fp
from ..fields.spec import FieldSpec
from ..ops.poly import Poly


@dataclass
class SparseMatrix:
    """COO sparse (m x d) matrix over F_p; vals in Montgomery limb form."""

    rows: jax.Array  # (nnz,) int32
    cols: jax.Array  # (nnz,) int32
    vals: Fp         # (nnz,)
    shape: tuple     # (m, d)

    @classmethod
    def from_entries(cls, spec: FieldSpec, m: int, d: int, entries):
        """entries: iterable of (row, col, int value)."""
        entries = list(entries)
        rows = jnp.asarray(np.array([e[0] for e in entries], dtype=np.int32))
        cols = jnp.asarray(np.array([e[1] for e in entries], dtype=np.int32))
        vals = Fp.from_int(spec, [e[2] for e in entries])
        return cls(rows, cols, vals, (m, d))

    def matvec(self, a: Fp) -> Fp:
        """(m,) = M @ a for a: (d,). gather + field segment_sum — O(nnz)."""
        spec = a.spec
        gathered = Fp(spec, jnp.take(a.mont, self.cols, axis=-1))
        prod = self.vals * gathered  # (nnz,) Montgomery
        return Fp(spec, limb.segment_sum_mod(
            spec, prod.mont, self.rows, self.shape[0]))

    def col_accumulate(self, weights: Fp) -> Fp:
        """(d,) = M^T @ weights for weights: (m,) — used by trusted setup."""
        spec = weights.spec
        gathered = Fp(spec, jnp.take(weights.mont, self.rows, axis=-1))
        prod = self.vals * gathered
        return Fp(spec, limb.segment_sum_mod(
            spec, prod.mont, self.cols, self.shape[1]))


@dataclass
class SparseR1CS:
    """Sparse triple; semantics parity with r1cs.rs:12-41 at O(nnz)."""

    left: SparseMatrix
    right: SparseMatrix
    out: SparseMatrix

    @property
    def spec(self) -> FieldSpec:
        return self.left.vals.spec

    @property
    def num_constraints(self) -> int:
        return self.left.shape[0]

    @property
    def witness_len(self) -> int:
        return self.left.shape[1]

    def matvecs(self, assignment: Fp):
        return (self.left.matvec(assignment), self.right.matvec(assignment),
                self.out.matvec(assignment))

    def is_satisfied(self, assignment: Fp) -> bool:
        u, v, w = self.matvecs(assignment)
        lhs = u * v
        return bool(np.all(np.asarray(lhs.mont) == np.asarray(w.mont)))


class SparseQAP:
    """QAP over the 2^k root-of-unity domain, never materializing (d, m).

    t(X) = X^m - 1; column polys exist only implicitly — everything the
    SNARK needs is an O(nnz) or O(m log m) computation.
    """

    def __init__(self, r1cs: SparseR1CS):
        m = r1cs.num_constraints
        assert m & (m - 1) == 0, "rou domain needs power-of-two m"
        self.r1cs = r1cs
        self.m = m
        self.d = r1cs.witness_len

    @property
    def spec(self) -> FieldSpec:
        return self.r1cs.spec

    @property
    def t(self) -> Fp:
        spec = self.spec
        return Fp.from_int(
            spec, [spec.p - 1] + [0] * (self.m - 1) + [1])

    # -- duck interface used by snark/pinocchio.py ---------------------------

    def combine(self, assignment: Fp):
        """Interpolate the combined witness polys: one INTT each."""
        from ..ops import ntt as _ntt

        u, v, w = self.r1cs.matvecs(assignment)  # evaluations over domain
        return (Poly(_ntt.intt(u)), Poly(_ntt.intt(v)), Poly(_ntt.intt(w)))

    def h_poly(self, assignment: Fp) -> Poly:
        from ..ops import ntt as _ntt

        spec, m = self.spec, self.m
        ell, r, o = self.combine(assignment)
        g = _ntt.nth_root_of_unity(spec.p, 4 * m)
        n = 2 * m
        lc = _ntt.coset_evaluate(ell.coef, g, n)
        rc = _ntt.coset_evaluate(r.coef, g, n)
        oc = _ntt.coset_evaluate(o.coef, g, n)
        num = lc * rc - oc
        gm = pow(g, m, spec.p)
        tvals = [(gm if j % 2 == 0 else spec.p - gm) - 1 for j in range(n)]
        t_c = Fp.from_int(spec, [val % spec.p for val in tvals])
        h_c = num * t_c.batch_inv(axis=-1)
        h = _ntt.coset_interpolate(h_c, g)
        return Poly(Fp(spec, h.mont[..., : m + 1]))

    def _lagrange_at(self, s: int) -> Fp:
        """lam_j(s) = w^j (s^m - 1) / (m (s - w^j)) over the rou domain."""
        from ..ops import ntt as _ntt

        spec, m = self.spec, self.m
        p = spec.p
        w = _ntt.nth_root_of_unity(p, m)
        wj = Fp.from_int(spec, [pow(w, j, p) for j in range(m)])
        s_f = Fp.from_int(spec, [s] * m)
        denom = (s_f - wj).batch_inv(axis=-1)
        scale = (pow(s, m, p) - 1) * pow(m, -1, p) % p
        return wj * denom * Fp.from_int(spec, scale)

    def eval_all_at(self, s: int):
        """(ell_i(s), r_i(s), o_i(s)) device (d,) batches + t(s) scalar Fp.

        ell_i(s) = sum_j L[j, i] lam_j(s): one weighted column-accumulate
        per matrix — O(nnz) on device.
        """
        lam = self._lagrange_at(s)
        ell = self.r1cs.left.col_accumulate(lam)
        r = self.r1cs.right.col_accumulate(lam)
        o = self.r1cs.out.col_accumulate(lam)
        t_s = Fp.from_int(self.spec, (pow(s, self.m, self.spec.p) - 1)
                          % self.spec.p)
        return ell, r, o, t_s


# ---------------------------------------------------------------------------
# Benchmark circuit generators
# ---------------------------------------------------------------------------

def square_chain(spec: FieldSpec, m: int, x0: int = 3):
    """m-constraint squaring chain x_{k+1} = x_k^2 (m a power of two).

    Witness layout: [1, x_0, x_1, ..., x_m]  (d = m + 2).
    Returns (SparseR1CS, assignment Fp) with a satisfying assignment.
    """
    assert m & (m - 1) == 0
    d = m + 2
    L = [(k, k + 1, 1) for k in range(m)]
    R = [(k, k + 1, 1) for k in range(m)]
    O = [(k, k + 2, 1) for k in range(m)]
    r1cs = SparseR1CS(
        SparseMatrix.from_entries(spec, m, d, L),
        SparseMatrix.from_entries(spec, m, d, R),
        SparseMatrix.from_entries(spec, m, d, O),
    )
    xs = [1, x0 % spec.p]
    for _ in range(m):
        xs.append(xs[-1] * xs[-1] % spec.p)
    return r1cs, Fp.from_int(spec, xs)
