"""Native C++ engine vs pure-Python golden paths.

Mirrors the reference's CUDA-kernel/CPU-twin test discipline
(myzkp/src/modules/algebra/cuda/test_fr.cu, examples/sumcheck/src/utils.rs):
every native routine has a Python mirror and the outputs must be bit-exact.
Skipped wholesale when no C++ toolchain is available.
"""

import hashlib
import random

import pytest

from myzkp_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_sha3_and_batch_merkle_match_hashlib():
    rng = random.Random(3)
    for ln in (0, 1, 135, 136, 137, 500):
        data = bytes(rng.randrange(256) for _ in range(ln))
        assert native.sha3_256(data) == hashlib.sha3_256(data).digest()
    leaves = [bytes(rng.randrange(256) for _ in range(48)) for _ in range(32)]
    levels = native.merkle_levels(leaves)
    cur = leaves
    for level in levels:
        cur = [hashlib.sha3_256(cur[i] + cur[i + 1]).digest()
               for i in range(0, len(cur), 2)]
        assert level == cur


def test_native_pairing_bit_exact_vs_python():
    from myzkp_tpu.curves import bn254

    g1, g2 = bn254.g1_generator(), bn254.g2_generator()
    e_native = native.pairing_coeffs(g1 * 7, g2 * 3)
    e_py = bn254._optimal_ate_pairing_py(g1 * 7, g2 * 3)
    py_coeffs = [int(x) for x in e_py.c] + [0] * (12 - len(e_py.c))
    assert e_native == py_coeffs


def test_native_pairing_bilinearity_and_gt_pow():
    from myzkp_tpu.curves import bn254

    g1, g2 = bn254.g1_generator(), bn254.g2_generator()
    e_ab = native.pairing_coeffs(g1 * 6, g2 * 11)
    e = native.pairing_coeffs(g1, g2)
    assert native.gt_pow_coeffs(e, 66) == e_ab
    # inverse exponent round-trips: e^(k) * e^(-k) = 1
    ek = native.gt_pow_coeffs(e, 5)
    eki = native.gt_pow_coeffs(e, -5)
    from myzkp_tpu.curves.bn254 import Fq12
    assert Fq12(ek) * Fq12(eki) == Fq12([1])


def test_multi_pairing_matches_product():
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.curves.bn254 import Fq12

    g1, g2 = bn254.g1_generator(), bn254.g2_generator()
    pairs = [(g1 * 2, g2 * 3), (g1 * 5, g2 * 7), (g1, g2 * 4)]
    prod = Fq12([1])
    for p, q in pairs:
        prod = prod * Fq12(native.pairing_coeffs(p, q))
    multi = Fq12(native.multi_pairing_coeffs(pairs))
    assert multi == prod


def test_infinity_conventions():
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.curves.bn254 import Fq12

    g1, g2 = bn254.g1_generator(), bn254.g2_generator()
    inf1 = bn254.curve_g1.infinity()
    inf2 = bn254.curve_g2.infinity()
    assert Fq12(native.pairing_coeffs(inf1, g2)) == Fq12([1])
    assert Fq12(native.pairing_coeffs(g1, inf2)) == Fq12([1])
