"""Sumcheck protocol layer: device/host parity, accept/reject, Gemini tie-in.

Mirrors the reference's sumcheck tests (myzkp/src/modules/algebra/
sumcheck.rs:217-278) and the CPU/GPU parity check of the sumcheck example
(myzkp/examples/sumcheck/src/main.rs:63-70).  Round-2 regression: the
batched hypercube evaluation (MPoly.evaluate_batch) silently only worked
when the trailing batch dim equaled the limb count L=16 — so every size is
exercised here at num_vars in {3, 6, 8}, never just 4.
"""

import random

import pytest

from myzkp_tpu.commit import kzg
from myzkp_tpu.curves import bn254
from myzkp_tpu.fields.fp import Fp
from myzkp_tpu.ops.mpoly import MPoly
from myzkp_tpu.protocols import sumcheck as sc
from myzkp_tpu.protocols.sumcheck_tpu import (
    SumCheckProverHost, SumCheckProverTPU, SumCheckVerifier,
    eval_all_binary_combinations)

R = bn254.R
SPEC = bn254.r_spec()


def _random_multilinear(rng, num_vars, terms=6):
    d = {}
    for _ in range(terms):
        exps = tuple(rng.randint(0, 1) for _ in range(num_vars))
        d[exps] = rng.randrange(R)
    return MPoly(SPEC, d)


# ---------------------------------------------------------------------------
# evaluate_batch: the round-2 broadcast bug surface
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_vars", [1, 3, 4, 6, 8])
def test_evaluate_batch_matches_host(num_vars):
    rng = random.Random(num_vars)
    g = _random_multilinear(rng, num_vars)
    pts = sc.hypercube_points(SPEC, num_vars)
    got = g.evaluate_batch(pts).to_int()
    want = [g.evaluate(c) for c in sc.bit_combinations(num_vars)]
    assert list(got) == want


def test_evaluate_batch_2d_batch():
    """Batch shapes beyond 1D (and with last dim != L=16)."""
    rng = random.Random(9)
    g = _random_multilinear(rng, 3)
    pts = sc.hypercube_points(SPEC, 3)  # (3, 8)
    pts2 = pts.reshape(3, 2, 4)
    got = g.evaluate_batch(pts2).to_int().reshape(8)
    want = [g.evaluate(c) for c in sc.bit_combinations(3)]
    assert list(got) == want


def test_broadcast_to_scalar_to_batch():
    x = Fp.from_int(SPEC, 7)
    for shape in [(3,), (5,), (16,), (2, 3)]:
        b = x.broadcast_to(shape)
        assert b.shape == shape
        assert (b.to_int() == 7).all()
    assert Fp.full(SPEC, (4,), 11).to_int().tolist() == [11] * 4


# ---------------------------------------------------------------------------
# sum_over_boolean_hypercube + table kernels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_vars", [3, 6])
def test_sum_over_boolean_hypercube(num_vars):
    rng = random.Random(17 + num_vars)
    g = _random_multilinear(rng, num_vars)
    got = sc.sum_over_boolean_hypercube(g)
    want = sum(g.evaluate(c) for c in sc.bit_combinations(num_vars)) % R
    assert got == want


def test_sum_over_hypercube_constant():
    g = MPoly.constant(SPEC, 42)
    assert sc.sum_over_boolean_hypercube(g) == 42


def test_eval_table_sizes():
    rng = random.Random(3)
    for v in (2, 5):
        g = _random_multilinear(rng, v)
        tab = eval_all_binary_combinations(g, v).to_int()
        assert len(tab) == 1 << v


# ---------------------------------------------------------------------------
# Product-sumcheck prover: TPU vs host parity + verify accept/reject
# (parity: examples/sumcheck/src/main.rs:63-87)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_vars", [
    3, pytest.param(6, marks=pytest.mark.slow)])
def test_product_sumcheck_parity_and_verify(num_vars):
    rng = random.Random(45)
    factors = [_random_multilinear(rng, num_vars) for _ in range(3)]
    tpu = SumCheckProverTPU(SPEC, 3).prove(factors, num_vars)
    host = SumCheckProverHost(SPEC, 3).prove(factors, num_vars)
    assert tpu.claimed_sum == host.claimed_sum
    assert tpu.round_polys == host.round_polys
    v = SumCheckVerifier(SPEC)
    assert v.verify(tpu, factors)
    # reject: tampered claimed sum
    bad = type(tpu)(el=tpu.el, claimed_sum=(tpu.claimed_sum + 1) % R,
                    round_polys=tpu.round_polys)
    assert not v.verify(bad, factors)
    # reject: tampered round polynomial
    bad_rp = [list(c) for c in tpu.round_polys]
    bad_rp[0][0] = (bad_rp[0][0] + 1) % R
    bad2 = type(tpu)(el=tpu.el, claimed_sum=tpu.claimed_sum,
                     round_polys=bad_rp)
    assert not v.verify(bad2, factors)


@pytest.mark.slow
def test_product_sumcheck_8vars_reference_size():
    """The reference example's exact problem size: 2^8 hypercube, 3 factors
    (myzkp/examples/sumcheck/src/main.rs:24-26), seed 45."""
    rng = random.Random(45)
    factors = [_random_multilinear(rng, 8, terms=8) for _ in range(3)]
    proof = SumCheckProverTPU(SPEC, 3).prove(factors, 8)
    host = SumCheckProverHost(SPEC, 3).prove(factors, 8)
    assert proof.claimed_sum == host.claimed_sum
    assert SumCheckVerifier(SPEC).verify(proof, factors)


# ---------------------------------------------------------------------------
# Gemini-tied non-interactive sumcheck (parity: sumcheck.rs:128-215)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_pk():
    return kzg.setup(15, rng=random.Random(0), full_g2=True)


def test_prove_verify_sumcheck_gemini(small_pk):
    rng = random.Random(103)
    g = _random_multilinear(rng, 3, terms=4)
    h = sc.sum_over_boolean_hypercube(g)
    proof = sc.prove_sumcheck(g, h, small_pk)
    assert sc.verify_sumcheck(proof, small_pk)
    # reject: wrong claimed sum
    bad = sc.prove_sumcheck(g, (h + 1) % R, small_pk)
    assert not sc.verify_sumcheck(bad, small_pk)


@pytest.mark.slow
def test_prove_verify_sumcheck_gemini_2vars(small_pk):
    rng = random.Random(102)
    g = _random_multilinear(rng, 2, terms=4)
    h = sc.sum_over_boolean_hypercube(g)
    proof = sc.prove_sumcheck(g, h, small_pk)
    assert sc.verify_sumcheck(proof, small_pk)


def test_sumcheck_fold_and_coefs():
    rng = random.Random(5)
    g = _random_multilinear(rng, 3)
    g0 = sc.build_gj_from_prefix(g, [])
    want = sum(g.evaluate(c) for c in sc.bit_combinations(3)) % R
    assert sc.sumcheck_fold(g0, 0) == want
    coefs = sc.get_coefs_in_order(g)
    assert len(coefs) == 8
