"""Sparse R1CS / QAP: O(nnz) scale path vs dense golden + full SNARK e2e.

The reference has only dense Vec<Vec<F>> R1CS (r1cs.rs:12-41); the sparse
representation is this library's production-scale addition — semantics are
pinned to the dense implementation on the same circuit.
"""

import random

import numpy as np
import pytest

from myzkp_tpu.arith.qap import QAP
from myzkp_tpu.arith.r1cs import R1CS
from myzkp_tpu.arith.sparse import SparseMatrix, SparseR1CS, SparseQAP, square_chain
from myzkp_tpu.curves import bn254
from myzkp_tpu.fields import limb
from myzkp_tpu.fields.fp import Fp


def test_segment_sum_mod_vs_python_ints():
    spec = bn254.r_spec()
    rng = random.Random(2)
    nnz, nseg = 500, 37
    vals = [rng.randrange(spec.p) for _ in range(nnz)]
    segs = [rng.randrange(nseg) for _ in range(nnz)]
    import jax.numpy as jnp

    dev = limb.from_int(spec, vals)  # standard domain: sum is linear anyway
    out = limb.segment_sum_mod(spec, dev, jnp.asarray(np.array(segs)), nseg)
    got = limb.to_int(spec, np.asarray(out))
    exp = [0] * nseg
    for v, s in zip(vals, segs):
        exp[s] = (exp[s] + v) % spec.p
    assert [int(x) for x in got] == exp


def test_sparse_matvec_matches_dense():
    spec = bn254.r_spec()
    rng = random.Random(3)
    m, d = 16, 10
    entries = [(rng.randrange(m), rng.randrange(d), rng.randrange(spec.p))
               for _ in range(40)]
    # duplicates accumulate; build the dense mirror with the same semantics
    dense = [[0] * d for _ in range(m)]
    for r, c, v in entries:
        dense[r][c] = (dense[r][c] + v) % spec.p
    sm = SparseMatrix.from_entries(spec, m, d, entries)
    a = [rng.randrange(spec.p) for _ in range(d)]
    af = Fp.from_int(spec, a)
    got = [int(v) for v in sm.matvec(af).to_int()]
    exp = [sum(dense[r][c] * a[c] for c in range(d)) % spec.p
           for r in range(m)]
    assert got == exp
    # transpose accumulate
    w = [rng.randrange(spec.p) for _ in range(m)]
    wf = Fp.from_int(spec, w)
    gotc = [int(v) for v in sm.col_accumulate(wf).to_int()]
    expc = [sum(dense[r][c] * w[r] for r in range(m)) % spec.p
            for c in range(d)]
    assert gotc == expc


def test_sparse_qap_matches_dense_qap():
    """combine / h_poly / eval_all_at agree with the dense rou-domain QAP."""
    spec = bn254.r_spec()
    m = 8
    r1cs_s, a = square_chain(spec, m)
    assert r1cs_s.is_satisfied(a)
    # dense mirror
    d = r1cs_s.witness_len

    def densify(sm):
        out = [[0] * d for _ in range(m)]
        rows = np.asarray(sm.rows)
        cols = np.asarray(sm.cols)
        vals = sm.vals.to_int()
        for r, c, v in zip(rows, cols, vals):
            out[r][c] = int(v)
        return out

    r1cs_d = R1CS.from_ints(spec, densify(r1cs_s.left),
                            densify(r1cs_s.right), densify(r1cs_s.out))
    qap_d = QAP.from_r1cs(r1cs_d, domain="rou")
    qap_s = SparseQAP(r1cs_s)

    for pd, ps in zip(qap_d.combine(a), qap_s.combine(a)):
        assert np.array_equal(np.asarray(pd.coef.mont), np.asarray(ps.coef.mont))
    hd, hs = qap_d.h_poly(a), qap_s.h_poly(a)
    assert np.array_equal(np.asarray(hd.coef.mont), np.asarray(hs.coef.mont))

    s = 123456789
    ed = qap_d.eval_all_at(s)
    es = qap_s.eval_all_at(s)
    for xd, xs in zip(ed, es):
        assert [int(v) for v in np.atleast_1d(xd.to_int())] == \
            [int(v) for v in np.atleast_1d(xs.to_int())]


@pytest.mark.slow
def test_sparse_pinocchio_end_to_end():
    from myzkp_tpu.snark import pinocchio

    spec = bn254.r_spec()
    r1cs, a = square_chain(spec, 8)
    qap = SparseQAP(r1cs)
    rng = random.Random(7)
    pk, vk = pinocchio.setup(qap, rng=rng)
    proof = pinocchio.prove(a, pk, qap, rng=rng)
    assert pinocchio.verify(proof, vk)
    bad = Fp.from_int(spec, [int(v) for v in np.asarray(a.to_int())][:-1]
                      + [12345])
    proof_bad = pinocchio.prove(bad, pk, qap, rng=rng)
    assert not pinocchio.verify(proof_bad, vk)


def test_groth16_on_sparse_qap():
    """Groth16 consumes the SparseQAP duck interface (eval_all_at/combine/
    h_poly) — the same path that proves at 2^20; pinned here at m=8."""
    import random

    from myzkp_tpu.arith.sparse import SparseQAP, square_chain
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.snark import groth16

    spec = bn254.r_spec()
    r1cs, assignment = square_chain(spec, 8)
    qap = SparseQAP(r1cs)
    rng = random.Random(21)
    pk, vk = groth16.setup(qap, num_public=2, rng=rng)
    proof = groth16.prove(assignment, pk, qap, rng=rng)
    public = [int(v) for v in assignment.to_int()[:2]]
    assert groth16.verify(proof, vk, public)
    bad = list(public)
    bad[1] = (bad[1] + 1) % bn254.R
    assert not groth16.verify(proof, vk, bad)
