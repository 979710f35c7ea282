"""Generic device extension field vs the host PyExtField golden mirror.

Parity target: myzkp/src/modules/algebra/efield.rs (ExtendedFieldElement +
define_extension_field!), with the reference's Ip3 = Goldilocks cubic
extension x^3 - x + 1 (fri.rs:410-421) as the flagship instantiation.
"""

import random

import numpy as np

from myzkp_tpu.fields import efield, limb
from myzkp_tpu.fields.python_field import PyExtField, PyField
from myzkp_tpu.fields.spec import M64, FieldSpec


def _setup(n=40, seed=1):
    es = efield.m64_cubic()
    host = PyExtField(PyField(M64), [1, M64 - 1, 0, 1])  # c0..c3 monic
    rng = random.Random(seed)
    av = [[rng.randrange(M64) for _ in range(3)] for _ in range(n)]
    bv = [[rng.randrange(M64) for _ in range(3)] for _ in range(n)]
    return es, host, av, bv


def test_ext_mul_matches_host():
    es, host, av, bv = _setup()
    a = efield.from_int_coeffs(es, av)
    b = efield.from_int_coeffs(es, bv)
    got = efield.to_int_coeffs(es, efield.mul(es, a, b))
    for i, (ac, bc) in enumerate(zip(av, bv)):
        exp = host(ac) * host(bc)
        expc = [int(c) for c in exp.c] + [0] * (3 - len(exp.c))
        assert [int(x) for x in got[i]] == expc, i


def test_ext_inv_and_pow():
    es, host, av, _ = _setup(n=12, seed=2)
    a = efield.from_int_coeffs(es, av)
    ainv = efield.inv(es, a)
    prod = efield.to_int_coeffs(es, efield.mul(es, a, ainv))
    for i in range(len(av)):
        assert [int(x) for x in prod[i]] == [1, 0, 0], i
    # pow vs host
    e = 12345
    got = efield.to_int_coeffs(es, efield.pow_const(es, a, e))
    for i, ac in enumerate(av):
        exp = host(ac) ** e
        expc = [int(c) for c in exp.c] + [0] * (3 - len(exp.c))
        assert [int(x) for x in got[i]] == expc, i


def test_ext_inv_zero_is_zero():
    es = efield.m64_cubic()
    z = efield.zeros(es, (4,))
    assert np.all(np.asarray(efield.inv(es, z)) == 0)


def test_fq2_generic_matches_karatsuba_path():
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.fields.spec import BN254_Q

    es = efield.bn254_fq2()
    F2 = bn254.g2_ops()
    rng = random.Random(3)
    n = 16
    av = [[rng.randrange(BN254_Q) for _ in range(2)] for _ in range(n)]
    bv = [[rng.randrange(BN254_Q) for _ in range(2)] for _ in range(n)]
    a = efield.from_int_coeffs(es, av)
    b = efield.from_int_coeffs(es, bv)
    got = efield.to_int_coeffs(es, efield.mul(es, a, b))
    spec = FieldSpec.make(BN254_Q)
    a2 = tuple(limb.to_mont(spec, limb.from_int(spec, [v[i] for v in av]))
               for i in range(2))
    b2 = tuple(limb.to_mont(spec, limb.from_int(spec, [v[i] for v in bv]))
               for i in range(2))
    ref = F2.mul(a2, b2)
    ref_ints = [limb.to_int(spec, np.asarray(limb.from_mont(spec, c)))
                for c in ref]
    for i in range(n):
        assert int(got[i][0]) == int(ref_ints[0][i])
        assert int(got[i][1]) == int(ref_ints[1][i])
