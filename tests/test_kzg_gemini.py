"""KZG + Gemini end-to-end (device MSMs, host pairings).

Mirrors myzkp/src/modules/algebra/kzg.rs tests (:146-226) and gemini.rs
tests (:236-356): accept, tamper-reject, batch, degree bound, fold identity.
"""

import random

import pytest

from myzkp_tpu.commit import gemini, kzg
from myzkp_tpu.curves import bn254
from myzkp_tpu.fields.fp import Fp
from myzkp_tpu.ops.poly import Poly
from myzkp_tpu.utils import hostpoly as hp

R = bn254.R


@pytest.fixture(scope="module")
def setup_kzg():
    rng = random.Random(0)
    pk = kzg.setup(15, rng=rng, full_g2=True)
    coeffs = [rng.randrange(R) for _ in range(8)]
    p = Poly.from_int_coeffs(bn254.r_spec(), coeffs)
    C = kzg.commit(pk, p)
    return pk, coeffs, p, C


def test_kzg_open_verify(setup_kzg):
    pk, coeffs, p, C = setup_kzg
    y, w = kzg.open(pk, p, 123)
    assert y == hp.evaluate(coeffs, 123, R)
    assert kzg.verify(pk, 123, y, C, w)
    assert not kzg.verify(pk, 123, (y + 1) % R, C, w)


def test_kzg_batch(setup_kzg):
    pk, coeffs, p, C = setup_kzg
    us = [2, 5, 9]
    ys, w = kzg.batch_open(pk, p, us)
    assert ys == [hp.evaluate(coeffs, u, R) for u in us]
    assert kzg.batch_verify(pk, us, ys, C, w)
    bad = list(ys)
    bad[0] = (bad[0] + 1) % R
    assert not kzg.batch_verify(pk, us, bad, C, w)


def test_kzg_degree_bound(setup_kzg):
    pk, coeffs, p, C = setup_kzg
    dp = kzg.prove_degree_bound(pk, p, 8)
    assert kzg.verify_degree_bound(pk, C, dp, 8)


def test_gemini_fold_and_verify(setup_kzg):
    # 2 fold levels: full commit/open/verify path at the smallest
    # shape-diverse instance (each extra level adds ~100 s of XLA:CPU
    # compiles; the 3-level variant runs as a slow test below)
    pk, _, _, _ = setup_kzg
    rng = random.Random(7)
    spec = bn254.r_spec()
    mcoefs = [rng.randrange(R) for _ in range(4)]
    rhos = [rng.randrange(R) for _ in range(2)]
    fs = gemini.split_and_fold(Fp.from_int(spec, mcoefs), rhos)
    mu = 0
    for idx in range(4):
        term = mcoefs[idx]
        for j in range(2):
            if (idx >> j) & 1:
                term = term * rhos[j] % R
        mu = (mu + term) % R
    assert int(fs[-1].coef.to_int()[0]) == mu
    beta = rng.randrange(R)
    assert gemini.debug_verify(rhos, mu, fs, beta)
    cg = gemini.commit_gemini(fs, pk)
    pi = gemini.open_gemini(fs, beta, pk)
    assert gemini.verify_gemini(rhos, mu, beta, cg, pi, pk)
    assert not gemini.verify_gemini(rhos, (mu + 1) % R, beta, cg, pi, pk)


@pytest.mark.slow
def test_gemini_fold_and_verify_3_levels(setup_kzg):
    pk, _, _, _ = setup_kzg
    rng = random.Random(7)
    spec = bn254.r_spec()
    mcoefs = [rng.randrange(R) for _ in range(8)]
    rhos = [rng.randrange(R) for _ in range(3)]
    fs = gemini.split_and_fold(Fp.from_int(spec, mcoefs), rhos)
    mu = 0
    for idx in range(8):
        term = mcoefs[idx]
        for j in range(3):
            if (idx >> j) & 1:
                term = term * rhos[j] % R
        mu = (mu + term) % R
    assert int(fs[-1].coef.to_int()[0]) == mu
    beta = rng.randrange(R)
    assert gemini.debug_verify(rhos, mu, fs, beta)
    cg = gemini.commit_gemini(fs, pk)
    pi = gemini.open_gemini(fs, beta, pk)
    assert gemini.verify_gemini(rhos, mu, beta, cg, pi, pk)
    assert not gemini.verify_gemini(rhos, (mu + 1) % R, beta, cg, pi, pk)


def test_tensor_product():
    """Parity: gemini.rs:248-286."""
    spec = bn254.r_spec()
    a = Fp.from_int(spec, [1, 2])
    b = Fp.from_int(spec, [3, 4])
    tp = gemini.tensor_product(a, b)
    assert [int(v) for v in tp.to_int()] == [3, 6, 4, 8]


def test_split_and_fold_errors():
    spec = bn254.r_spec()
    with pytest.raises(gemini.SplitFoldError):
        gemini.split_and_fold(Fp.from_int(spec, [1, 2, 3]), [1])
    with pytest.raises(gemini.SplitFoldError):
        gemini.split_and_fold(Fp.from_int(spec, [1, 2, 3, 4]), [1])


def test_kzg_verify_paths_reject_invalid_structure(setup_kzg):
    """Verifier hardening (VERDICT r2 #8): structurally invalid inputs must
    return False, never raise (parity: fri.rs reject-don't-panic)."""
    pk, coeffs, p, C = setup_kzg
    dp = kzg.prove_degree_bound(pk, p, 8)
    # claimed bound beyond the SRS degree / negative: reject, don't crash
    assert not kzg.verify_degree_bound(pk, C, dp, pk.degree + 1)
    assert not kzg.verify_degree_bound(pk, C, dp, -1)
    # prover-side misuse raises a clear error
    with pytest.raises(ValueError):
        kzg.prove_degree_bound(pk, p, pk.degree + 5)
    # batch verify: empty points, duplicate points, ys length mismatch
    ys, w = kzg.batch_open(pk, p, [2, 5])
    assert not kzg.batch_verify(pk, [], [], C, w)
    assert not kzg.batch_verify(pk, [2, 2], ys, C, w)
    assert not kzg.batch_verify(pk, [2, 5], ys[:1], C, w)


def test_kzg_batch_verify_minimal_srs_rejects():
    """Minimal-G2 SRS cannot check a vanishing-poly commitment: reject."""
    rng = random.Random(3)
    pk_min = kzg.setup(7, rng=rng, full_g2=False)
    p = Poly.from_int_coeffs(bn254.r_spec(), [rng.randrange(R) for _ in range(4)])
    C = kzg.commit(pk_min, p)
    ys, w = kzg.batch_open(pk_min, p, [2, 5])
    assert not kzg.batch_verify(pk_min, [2, 5], ys, C, w)
