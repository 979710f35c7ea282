"""Tutorial protocol ladders: honest accept, wrong-witness reject, and the
documented attacks succeeding/failing exactly as in the reference.

Mirrors myzkp/src/modules/zksnark/tutorial_single_polynomial/ and
tutorial_snark/ tests (protocol_2.rs:309-310 attack succeeds,
protocol_3.rs:342-343 attack fails, etc.).
"""

import random

import pytest

from myzkp_tpu.curves import bn254
from myzkp_tpu.protocols import tutorial_single_poly as tsp
from myzkp_tpu.protocols import tutorial_snark as ts
from myzkp_tpu.utils import hostpoly as hp

R = bn254.R


# ---------------------------------------------------------------------------
# Ladder 1: single polynomial
# ---------------------------------------------------------------------------

def test_p1_naive():
    roots = [1, 2, 3, 4, 5]
    p31 = hp.from_monomials(roots, 31)
    t31 = hp.from_monomials(roots[:3], 31)
    assert tsp.naive_protocol(tsp.Prover1(p31, t31, 31),
                              tsp.Verifier1(roots[:3], 31))


def test_p2_schwartz_zippel_and_attack():
    pR = hp.from_monomials([1, 2, 3], R)
    tR = hp.from_monomials([1, 2], R)
    vf = tsp.Verifier2(tR, R, rng=random.Random(0))
    assert tsp.schwartz_zippel_protocol(tsp.Prover2(pR, tR, R), vf)
    assert tsp.malicious_schwartz_zippel_protocol(
        tsp.MaliciousProver2(tR, R, rng=random.Random(1)), vf)


def test_p3_discrete_log_and_attack():
    pS = tsp.signed_from_monomials([1, 2, 3])
    tS = tsp.signed_from_monomials([1, 2])
    vf = tsp.Verifier3(tS, R, 5, rng=random.Random(0))
    assert tsp.discrete_log_protocol(tsp.Prover3(pS, tS, R), vf)
    assert tsp.malicious_discrete_log_protocol(
        tsp.MaliciousProver3(tS, R, rng=random.Random(1)), vf)


def test_p4_p5_kea_zk():
    pS = tsp.signed_from_monomials([1, 2, 3])
    tS = tsp.signed_from_monomials([1, 2])
    assert tsp.knowledge_of_exponent_protocol(
        tsp.Prover4(pS, tS, R), tsp.Verifier4(tS, R, 5, rng=random.Random(0)))
    assert tsp.zk_protocol(
        tsp.Prover5(pS, tS, R, rng=random.Random(2)),
        tsp.Verifier5(tS, R, 5, rng=random.Random(3)))


def test_p6_non_interactive_pairing():
    pR = hp.from_monomials([1, 2, 3], R)
    tR = hp.from_monomials([1, 2], R)
    pk, vk = tsp.setup6(tR, 3, rng=random.Random(0))
    proof = tsp.prove6(pR, tR, pk, rng=random.Random(1))
    assert tsp.verify6(proof, vk)


# ---------------------------------------------------------------------------
# Ladder 2: QAP SNARKs (reference example: 2*3=6, 5*7=35, 6*35=210)
# ---------------------------------------------------------------------------

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
# inconsistent per-matrix assignments (protocol_2.rs:278-309)
V_ELL = [1, 210, 2, 3, 5, 7, 6, 35]
V_R = [1, 1, 1, 1, 1, 1, 1, 1]
V_O = [1, 6, 0, 0, 0, 0, 2, 5]


@pytest.fixture(scope="module")
def host_qap():
    return ts.HostQAP.from_r1cs(LEFT, RIGHT, OUT)


def test_snark_p2_accept_reject_and_attack_succeeds(host_qap):
    rng = random.Random(5)
    pk, vk = ts.setup2(host_qap, rng=rng)
    proof = ts.prove2(pk, host_qap, WITNESS)
    assert ts.verify2(proof, vk)
    wrong = ts.prove2(pk, host_qap, WRONG)
    assert not ts.verify2(wrong, vk)
    bogus = ts.inconsistent_variable_attack(pk, host_qap, V_ELL, V_R, V_O)
    assert ts.verify2(bogus, vk), "P2 attack must succeed"


def test_snark_p3_attack_fails(host_qap):
    rng = random.Random(6)
    pk, vk = ts.setup3(host_qap, rng=rng)
    proof = ts.prove3(pk, host_qap, WITNESS)
    assert ts.verify3(proof, vk)
    bogus = ts.inconsistent_variable_attack(pk, host_qap, V_ELL, V_R, V_O)
    assert not ts.verify3(bogus, vk), "P3 checksum must catch the attack"


def test_snark_p1_accept_reject(host_qap):
    rng = random.Random(7)
    pk, vk = ts.setup1(host_qap, rng=rng)
    assert ts.verify1(ts.prove1(pk, host_qap, WITNESS), vk)
    assert not ts.verify1(ts.prove1(pk, host_qap, WRONG), vk)


def test_snark_p4_p5_accept(host_qap):
    rng = random.Random(8)
    pk4, vk4 = ts.setup4(host_qap, rng=rng)
    assert ts.verify4(ts.prove4(pk4, host_qap, WITNESS), vk4)
    pk5, vk5 = ts.setup5(host_qap, rng=rng)
    assert ts.verify5(ts.prove5(pk5, host_qap, WITNESS), vk5)
    bogus = ts.inconsistent_variable_attack(pk5, host_qap, V_ELL, V_R, V_O)
    assert not ts.verify5(bogus, vk5), "P5 must reject the attack"
