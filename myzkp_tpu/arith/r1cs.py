"""R1CS: rank-1 constraint systems as dense Fp tensors.

Capability parity with myzkp/src/modules/arithmetization/r1cs.rs:12-41
(`R1CS{left,right,out}` + `is_satisfied` row-by-row dot products) —
re-designed as three dense (m, d) field matrices so satisfaction checking is
three batched matvecs (one fused reduction per matrix), ideal for the
TPU's vector/matrix units.
"""

from __future__ import annotations

from ..fields.fp import Fp
from ..fields.spec import FieldSpec


class R1CS:
    """Constraint system: for every row i, <L_i,a> * <R_i,a> == <O_i,a>."""

    __slots__ = ("left", "right", "out")

    def __init__(self, left: Fp, right: Fp, out: Fp):
        # each: Fp batch shape (m, d)
        assert left.shape == right.shape == out.shape
        self.left = left
        self.right = right
        self.out = out

    @classmethod
    def from_ints(cls, spec: FieldSpec, left, right, out) -> "R1CS":
        return cls(
            Fp.from_int(spec, left), Fp.from_int(spec, right), Fp.from_int(spec, out)
        )

    @property
    def spec(self) -> FieldSpec:
        return self.left.spec

    @property
    def num_constraints(self) -> int:  # reference: m (r1cs.rs:17)
        return self.left.shape[0]

    @property
    def witness_len(self) -> int:  # reference: d (r1cs.rs:18)
        return self.left.shape[1]

    def matvecs(self, assignment: Fp):
        """(<L_i,a>, <R_i,a>, <O_i,a>) for all rows i, as (m,) Fp each."""
        a = assignment  # (d,)
        ell = (self.left * a).sum(axis=-1)
        r = (self.right * a).sum(axis=-1)
        o = (self.out * a).sum(axis=-1)
        return ell, r, o

    def is_satisfied(self, assignment: Fp) -> bool:
        """Parity: r1cs.rs:33-40."""
        ell, r, o = self.matvecs(assignment)
        import numpy as np

        return bool(np.all(np.asarray((ell * r).equals(o))))
