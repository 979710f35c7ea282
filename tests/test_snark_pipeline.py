"""R1CS -> QAP -> Pinocchio end-to-end (device MSM prover, host pairing
verifier).

Mirrors myzkp/src/modules/arithmetization/{r1cs,qap}.rs tests and
zksnark/pinocchio.rs:257-391 (accept + wrong-witness reject).
"""

import random

import pytest

from myzkp_tpu.arith.qap import QAP
from myzkp_tpu.arith.r1cs import R1CS
from myzkp_tpu.curves import bn254
from myzkp_tpu.fields.fp import Fp
from myzkp_tpu.ops.poly import Poly
from myzkp_tpu.snark import pinocchio as pin

LEFT = [[0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 1, 0]]
RIGHT = [[0, 0, 0, 1, 0, 0, 0, 0],
         [0, 0, 0, 0, 0, 1, 0, 0],
         [0, 0, 0, 0, 0, 0, 0, 1]]
OUT = [[0, 0, 0, 0, 0, 0, 1, 0],
       [0, 0, 0, 0, 0, 0, 0, 1],
       [0, 1, 0, 0, 0, 0, 0, 0]]
WITNESS = [1, 210, 2, 3, 5, 7, 6, 35]
WRONG = [1, 210, 2, 3, 5, 7, 6, 36]


@pytest.fixture(scope="module")
def r1cs():
    return R1CS.from_ints(bn254.r_spec(), LEFT, RIGHT, OUT)


def test_r1cs_satisfaction(r1cs):
    spec = bn254.r_spec()
    assert r1cs.is_satisfied(Fp.from_int(spec, WITNESS))
    assert not r1cs.is_satisfied(Fp.from_int(spec, WRONG))


def test_qap_divisibility(r1cs):
    spec = bn254.r_spec()
    qap = QAP.from_r1cs(r1cs)
    a = Fp.from_int(spec, WITNESS)
    h = qap.h_poly(a)
    ell, r, o = qap.combine(a)
    lhs = [int(v) for v in (h * Poly(qap.t)).to_int()]
    rhs = [int(v) for v in (ell * r - o.pad_to(2 * qap.m - 1)).to_int()]
    n = max(len(lhs), len(rhs))
    assert lhs + [0] * (n - len(lhs)) == rhs + [0] * (n - len(rhs))


def test_qap_rou_domain():
    """rou-domain QAP: interpolation via INTT, t = X^m - 1, coset h."""
    spec = bn254.r_spec()
    # pad to m=4 constraints (power of two) with a trivially-true constraint
    left = LEFT + [[0] * 8]
    right = RIGHT + [[0] * 8]
    out = OUT + [[0] * 8]
    r1cs4 = R1CS.from_ints(spec, left, right, out)
    qap = QAP.from_r1cs(r1cs4, domain="rou")
    a = Fp.from_int(spec, WITNESS)
    h = qap.h_poly(a)
    ell, r, o = qap.combine(a)
    lhs = [int(v) for v in (h * Poly(qap.t)).to_int()]
    rhs = [int(v) for v in (ell * r - o.pad_to(2 * qap.m - 1)).to_int()]
    n = max(len(lhs), len(rhs))
    assert lhs + [0] * (n - len(lhs)) == rhs + [0] * (n - len(rhs))


def test_pinocchio_accept_reject(r1cs):
    spec = bn254.r_spec()
    qap = QAP.from_r1cs(r1cs)
    rng = random.Random(3)
    pk, vk = pin.setup(qap, rng=rng)
    proof = pin.prove(Fp.from_int(spec, WITNESS), pk, qap, rng=rng)
    assert pin.verify(proof, vk)
    bad = pin.prove(Fp.from_int(spec, WRONG), pk, qap, rng=rng)
    assert not pin.verify(bad, vk)


# ---------------------------------------------------------------------------
# Groth16 (beyond-reference: the production 3-element SNARK on the same QAP)
# ---------------------------------------------------------------------------

def test_groth16_end_to_end(r1cs):
    from myzkp_tpu.snark import groth16 as g16

    spec = bn254.r_spec()
    rng = random.Random(99)
    qap = QAP.from_r1cs(r1cs)
    pk, vk = g16.setup(qap, num_public=2, rng=rng)

    proof = g16.prove(Fp.from_int(spec, WITNESS), pk, qap, rng=rng)
    assert g16.verify(proof, vk, WITNESS[:2])

    # wrong public statement rejects
    assert not g16.verify(proof, vk, [1, 211])

    # wrong (private) witness rejects
    bad = g16.prove(Fp.from_int(spec, WRONG), pk, qap, rng=rng)
    assert not g16.verify(bad, vk, WRONG[:2])


def test_msm_g1_pow2_tail_split():
    """_msm_g1 splits power-of-two-plus-tail batches (the h-commitment
    shape) into a 2^k Pippenger + naive tail; result must match the host."""
    import random as _r

    from myzkp_tpu.curves import msm as _msm, weierstrass as wst
    from myzkp_tpu.snark.pinocchio import _msm_g1

    rng = _r.Random(77)
    n = 513  # 2^9 + 1: exercises the split path
    g = bn254.g1_generator()
    ms = [rng.randrange(1, bn254.R) for _ in range(n)]
    ks = [rng.randrange(0, bn254.R) for _ in range(n)]
    pts = bn254.g1_points_to_device([g * m for m in ms])
    got = _msm_g1(pts, _msm.scalars_from_int(bn254.r_spec(), ks))
    import jax

    host = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, None], got))[0]
    exp = g * (sum(k * m for k, m in zip(ks, ms)) % bn254.R)
    assert host == exp


def test_pinocchio_key_roundtrip(r1cs, tmp_path):
    """Setup -> save -> load -> prove with the LOADED key -> verify.

    Pins the checkpoint path bench.py's north-star phase depends on
    (utils/serialize.py; the reference has no persistence, SURVEY.md §5).
    """
    from myzkp_tpu.utils import serialize

    spec = bn254.r_spec()
    rng = random.Random(7)
    qap = QAP.from_r1cs(r1cs)
    pk, vk = pin.setup(qap, rng=rng)
    pk_path = str(tmp_path / "pk.npz")
    vk_path = str(tmp_path / "vk.json")
    serialize.save_pinocchio_pk(pk_path, pk)
    serialize.save_pinocchio_vk(vk_path, vk)
    pk2 = serialize.load_pinocchio_pk(pk_path)
    vk2 = serialize.load_pinocchio_vk(vk_path)
    proof = pin.prove(Fp.from_int(spec, WITNESS), pk2, qap, rng=rng)
    assert pin.verify(proof, vk2)
    bad = pin.prove(Fp.from_int(spec, WRONG), pk2, qap, rng=rng)
    assert not pin.verify(bad, vk2)
