"""Field-arithmetic tests: limb kernels vs Python-int golden model.

Mirrors the reference's field unit tests (myzkp/src/modules/algebra/field.rs:434-551,
utils.rs tests, efield.rs tests), including the known-answer vectors.
"""

import random

import jax
import numpy as np
import pytest

from myzkp_tpu.fields import limb
from myzkp_tpu.fields.fp import Fp
from myzkp_tpu.fields.python_field import PyExtField, PyField
from myzkp_tpu.fields.spec import BN254_Q, BN254_R, M64, M128, FieldSpec

PRIMES = [17, 31, 631, 3221225473, M64, M128, BN254_R, BN254_Q]


@pytest.mark.parametrize("p", PRIMES)
def test_ring_ops_match_python(p):
    rng = random.Random(p % 1000)
    spec = FieldSpec.make(p)
    xs = [rng.randrange(p) for _ in range(32)] + [0, 1, p - 1]
    ys = [rng.randrange(p) for _ in range(32)] + [p - 1, 0, p - 1]
    a, b = Fp.from_int(spec, xs), Fp.from_int(spec, ys)
    assert list((a + b).to_int()) == [(x + y) % p for x, y in zip(xs, ys)]
    assert list((a - b).to_int()) == [(x - y) % p for x, y in zip(xs, ys)]
    assert list((a * b).to_int()) == [(x * y) % p for x, y in zip(xs, ys)]
    assert list((-a).to_int()) == [(-x) % p for x in xs]
    assert list((a ** 3).to_int()) == [pow(x, 3, p) for x in xs]


@pytest.mark.parametrize("p", [17, M64, BN254_R])
def test_inverse(p):
    rng = random.Random(1)
    spec = FieldSpec.make(p)
    xs = [rng.randrange(1, p) for _ in range(16)]
    a = Fp.from_int(spec, xs)
    assert list(a.inv().to_int()) == [pow(x, -1, p) for x in xs]
    assert list((a * a.inv()).to_int()) == [1] * len(xs)
    # batch inversion agrees, zeros map to zero
    xs2 = xs + [0]
    b = Fp.from_int(spec, xs2)
    got = list(b.batch_inv(0).to_int())
    assert got == [pow(x, -1, p) for x in xs] + [0]


def test_inverse_known_vector_mod17():
    """7^{-1} mod 17 = 5 (reference: field.rs:491-497)."""
    spec = FieldSpec.make(17)
    assert Fp.from_int(spec, 7).inv().item() == 5


def test_division_and_pow_negative():
    spec = FieldSpec.make(31)
    a, b = Fp.from_int(spec, 12), Fp.from_int(spec, 5)
    assert (a / b).item() == 12 * pow(5, -1, 31) % 31
    assert (a ** -2).item() == pow(12, -2, 31)


@pytest.mark.parametrize("p", [631, M64, BN254_R])
def test_fermat_little(p):
    spec = FieldSpec.make(p)
    a = Fp.from_int(spec, [2, 3, 12345 % p])
    assert list((a ** (p - 1)).to_int()) == [1, 1, 1]


def test_sum_and_select():
    spec = FieldSpec.make(97)
    a = Fp.from_int(spec, list(range(1, 12)))
    assert a.sum(0).item() == sum(range(1, 12)) % 97
    mask = a.equals(Fp.from_int(spec, [5] * 11))
    sel = Fp.select(mask, Fp.zeros(spec, (11,)), a)
    assert list(sel.to_int()) == [v if v != 5 else 0 for v in range(1, 12)]


def test_random_sampling_in_range():
    spec = FieldSpec.make(BN254_R)
    r = Fp.random(spec, jax.random.key(7), (32,))
    vals = r.to_int()
    assert all(0 <= int(v) < BN254_R for v in vals)
    assert len(set(int(v) for v in vals)) > 30  # no collisions in 32 draws


def test_jit_and_vmap_compose():
    spec = FieldSpec.make(BN254_R)

    @jax.jit
    def f(x, y):
        return x * y + x - y

    a = Fp.from_int(spec, [3, 4])
    b = Fp.from_int(spec, [5, 6])
    got = list(f(a, b).to_int())
    want = [(x * y + x - y) % BN254_R for x, y in [(3, 5), (4, 6)]]
    assert got == want


def test_montgomery_roundtrip_edges():
    for p in [17, M64, BN254_R]:
        spec = FieldSpec.make(p)
        edge = [0, 1, p - 1, p // 2]
        arr = limb.from_int(spec, edge)
        rt = limb.to_int(spec, np.asarray(limb.from_mont(spec, limb.to_mont(spec, arr))))
        assert list(rt) == edge


# ---------------------------------------------------------------------------
# Python golden extension field (used by pairings / FRI extension)
# ---------------------------------------------------------------------------

def test_pyext_fq2_arith():
    """Fq2 = F_p[u]/(u^2+1) sanity (reference: efield.rs tests / bn128.rs:33-49)."""
    F = PyField(BN254_Q)
    Fq2 = PyExtField(F, [1, 0, 1])  # u^2 + 1
    a = Fq2([3, 4])
    b = Fq2([5, 6])
    # (3+4u)(5+6u) = 15 + 38u + 24u^2 = (15-24) + 38u
    assert a * b == Fq2([15 - 24, 38])
    assert (a * a.inv()) == Fq2([1, 0])
    assert (a ** (BN254_Q * BN254_Q - 1)) == Fq2([1, 0])  # Fermat in Fq2


def test_pyext_gf_small():
    F = PyField(2)
    GF8 = PyExtField(F, [1, 1, 0, 1])  # x^3 + x + 1
    x = GF8([0, 1])
    # x generates the multiplicative group of GF(8): order 7
    acc = x
    seen = set()
    for _ in range(7):
        seen.add(acc.c)
        acc = acc * x
    assert len(seen) == 7
    assert acc == x


def test_stage_metrics():
    import jax.numpy as jnp

    from myzkp_tpu.utils.metrics import StageMetrics

    sm = StageMetrics()
    x = jnp.arange(8)
    with sm.stage("square", x):
        y = x * x
    with sm.stage("square", y):
        y = y * y
    assert sm.counts["square"] == 2 and sm.seconds["square"] > 0
    assert "square" in sm.report()
    sm.reset()
    assert not sm.seconds
