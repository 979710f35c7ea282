"""Pallas mont_mul kernel vs the pure-JAX golden path (interpret mode on CPU).

Mirrors the reference's strategy of pairing every CUDA kernel with a CPU twin
plus standalone kernel tests (myzkp/src/modules/algebra/cuda/test.sh,
test_fr.cu; examples/sumcheck/src/utils.rs:83-156).
"""

import random

import numpy as np
import pytest

from myzkp_tpu.fields import limb, limb_pallas
from myzkp_tpu.fields.spec import BN254_Q, BN254_R, M64, M128, MOD17, FieldSpec


@pytest.mark.parametrize("p", [BN254_R, BN254_Q, M128, M64, MOD17])
def test_mont_mul_pallas_matches_golden(p):
    spec = FieldSpec.make(p)
    rng = random.Random(p % 9973)
    n = 300  # forces padding to one (32, 128) tile
    av = [rng.randrange(p) for _ in range(n)]
    bv = [rng.randrange(p) for _ in range(n)]
    a, b = limb.from_int(spec, av), limb.from_int(spec, bv)
    am, bm = limb.to_mont(spec, a), limb.to_mont(spec, b)
    got = limb_pallas.mont_mul_pallas(spec, am, bm, interpret=True)
    ref = limb.mont_mul(spec, am, bm)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    # ground truth in Python ints
    out = limb.to_int(spec, np.asarray(limb.from_mont(spec, got)))
    for i in range(n):
        assert int(out[i]) == av[i] * bv[i] % p


def test_mont_mul_pallas_multidim_batch():
    spec = FieldSpec.make(M64)
    rng = random.Random(7)
    vals_a = [[rng.randrange(M64) for _ in range(9)] for _ in range(5)]
    vals_b = [[rng.randrange(M64) for _ in range(9)] for _ in range(5)]
    a = limb.to_mont(spec, limb.from_int(spec, vals_a))
    b = limb.to_mont(spec, limb.from_int(spec, vals_b))
    got = limb_pallas.mont_mul_pallas(spec, a, b, interpret=True)
    ref = limb.mont_mul(spec, a, b)
    assert got.shape == a.shape
    assert np.array_equal(np.asarray(got), np.asarray(ref))
