"""QAP: quadratic arithmetic programs from R1CS.

Capability parity with myzkp/src/modules/arithmetization/qap.rs:5-41:
interpolate every witness column of L/R/O over x = 1..m and build the target
t(x) = prod_i (x - i).

TPU re-design: all 3*d column interpolations happen in ONE batched Lagrange
interpolation (the (d, m) evaluation matrix rides as a leading batch dim
through the shared-zerofier synthetic-division formulation in ops/poly.py) —
the reference interpolates each column separately with the O(m^2) scalar
algorithm (qap.rs:21-34 via polynomial.rs:177-199).
"""

from __future__ import annotations

from ..fields.fp import Fp
from ..ops.poly import Poly, from_monomials, lagrange_interpolate, poly_eval
from .r1cs import R1CS


class QAP:
    """ell/r/o: (d, m) coefficient batches; target t of degree m."""

    __slots__ = ("ell", "r", "o", "t", "m", "d")

    def __init__(self, ell: Fp, r: Fp, o: Fp, t: Fp, m: int, d: int):
        self.ell = ell  # (d, m) coefficients, one poly per witness index
        self.r = r
        self.o = o
        self.t = t  # (m+1,) coefficients
        self.m = m
        self.d = d

    @property
    def spec(self):
        return self.ell.spec

    @classmethod
    def from_r1cs(cls, r1cs: R1CS, domain: str = "natural") -> "QAP":
        """Parity: qap.rs:15-41 (interpolation domain x = 1..m).

        domain="natural": x = 1..m with batched Lagrange (matches reference).
        domain="rou": x = powers of an m-th root of unity — interpolation is
        one batched INTT and t(X) = X^m - 1; O(m log m), the right choice for
        large circuits (m must be a power of two).
        """
        spec = r1cs.spec
        m, d = r1cs.num_constraints, r1cs.witness_len
        # transpose to (d, m): one row per witness column
        ell_ev = Fp(spec, r1cs.left.mont.swapaxes(1, 2))
        r_ev = Fp(spec, r1cs.right.mont.swapaxes(1, 2))
        o_ev = Fp(spec, r1cs.out.mont.swapaxes(1, 2))
        if domain == "rou":
            from ..ops import ntt as _ntt

            assert m & (m - 1) == 0, "rou domain needs power-of-two m"
            ell = _ntt.intt(ell_ev).mont
            r = _ntt.intt(r_ev).mont
            o = _ntt.intt(o_ev).mont
            t = Fp.from_int(spec, [spec.p - 1] + [0] * (m - 1) + [1])
            return cls(Fp(spec, ell), Fp(spec, r), Fp(spec, o), t, m, d)
        xs = Fp.from_int(spec, list(range(1, m + 1)))
        ell = lagrange_interpolate(xs, ell_ev)
        r = lagrange_interpolate(xs, r_ev)
        o = lagrange_interpolate(xs, o_ev)
        t = from_monomials(xs)
        return cls(ell, r, o, t, m, d)

    # -- assignment combinations ------------------------------------------------

    def combine(self, assignment: Fp):
        """(sum_i a_i ell_i, sum_i a_i r_i, sum_i a_i o_i) coefficient arrays.

        assignment: (d,) Fp.  Each result: (m,) coefficients.
        """
        a = Fp(self.spec, assignment.mont[..., None])  # (d, 1)
        ell = (self.ell * a).sum(axis=-2)
        r = (self.r * a).sum(axis=-2)
        o = (self.o * a).sum(axis=-2)
        return Poly(ell), Poly(r), Poly(o)

    def h_poly(self, assignment: Fp) -> Poly:
        """h = (ell*r - o) / t; exact iff the R1CS is satisfied.

        Parity: zksnark/utils.rs:127-132 (`get_h`).  For the rou domain
        (t = X^m - 1) the division is pointwise on a 2m coset — O(m log m) —
        instead of the O(m^2) long-division scan.
        """
        ell, r, o = self.combine(assignment)
        if self._is_rou_target():
            return self._h_poly_coset(ell, r, o)
        num = ell * r - o.pad_to(2 * self.m - 1)
        q, _ = num.divmod(Poly(self.t), divisor_degree=self.m)
        return q

    def _is_rou_target(self) -> bool:
        if self.m & (self.m - 1):
            return False
        import numpy as np

        t = self.t.to_int()
        return (
            len(t) == self.m + 1
            and int(t[0]) == self.spec.p - 1
            and int(t[-1]) == 1
            and all(int(v) == 0 for v in t[1:-1])
        )

    def _h_poly_coset(self, ell: Poly, r: Poly, o: Poly) -> Poly:
        """(ell*r - o) / (X^m - 1) via pointwise division on a 2m coset."""
        from ..ops import ntt as _ntt

        spec = self.spec
        m = self.m
        g = _ntt.nth_root_of_unity(spec.p, 4 * m)  # coset offset: not in <w_2m>
        n = 2 * m
        lc = _ntt.coset_evaluate(ell.coef, g, n)
        rc = _ntt.coset_evaluate(r.coef, g, n)
        oc = _ntt.coset_evaluate(o.coef, g, n)
        num = lc * rc - oc
        # t(g w^j) = g^m (-1)^j - 1
        gm = pow(g, m, spec.p)
        tvals = [(gm if j % 2 == 0 else spec.p - gm) - 1 for j in range(n)]
        t_c = Fp.from_int(spec, [v % spec.p for v in tvals])
        h_c = num * t_c.batch_inv(axis=-1)
        h = _ntt.coset_interpolate(h_c, g)
        return Poly(Fp(spec, h.mont[..., : m + 1]))

    def eval_all_at(self, s: int):
        """(ell_i(s), r_i(s), o_i(s)) for all i, plus t(s) — host toxic-waste
        evaluation used by trusted setups."""
        s_fp = Fp.from_int(self.spec, s)
        ell = poly_eval(self.ell, s_fp)
        r = poly_eval(self.r, s_fp)
        o = poly_eval(self.o, s_fp)
        t = poly_eval(self.t, s_fp)
        return ell, r, o, t
