"""Divide-and-conquer fast polynomial ops vs direct evaluation.

Mirrors myzkp/src/modules/algebra/ntt.rs tests (fast_zerofier/fast_evaluate/
fast_interpolate/fast_coset_divide equivalence with the naive algorithms,
ntt.rs:332-375).
"""

import random

import pytest

from myzkp_tpu.fields.fp import Fp
from myzkp_tpu.fields.spec import FieldSpec
from myzkp_tpu.ops import ntt
from myzkp_tpu.ops.poly import Poly

P = 3221225473  # 2-adic 32-bit prime (fast to compile/test on CPU)


@pytest.mark.parametrize("n", [8, 13, 1, 5, 32])
def test_fast_zerofier_evaluate_interpolate(n):
    spec = FieldSpec.make(P)
    rng = random.Random(3)
    xs_i = rng.sample(range(1, 10 ** 6), n)
    ys_i = [rng.randrange(P) for _ in range(n)]
    xs, ys = Fp.from_int(spec, xs_i), Fp.from_int(spec, ys_i)
    z = ntt.fast_zerofier(xs)
    assert all(int(v) == 0 for v in ntt.fast_evaluate(z, xs).to_int())
    coef = ntt.fast_interpolate(xs, ys)
    assert [int(v) for v in ntt.fast_evaluate(coef, xs).to_int()] == ys_i


def test_fast_coset_divide():
    spec = FieldSpec.make(P)
    rng = random.Random(3)
    a_i = [rng.randrange(P) for _ in range(7)]
    b_i = [rng.randrange(P) for _ in range(4)]
    A, B = Poly.from_int_coeffs(spec, a_i), Poly.from_int_coeffs(spec, b_i)
    q = ntt.fast_coset_divide((A * B).coef, B.coef, 5, 16)
    assert [int(v) for v in q.to_int()][:7] == a_i
