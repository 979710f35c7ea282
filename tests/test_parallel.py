"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed layer (SURVEY.md section 2); these validate
our additions: the four-step distributed NTT against the single-chip NTT and
the sharded MSM against the host accumulation.
"""

import random

import jax
import numpy as np
import pytest

from myzkp_tpu.fields.fp import Fp
from myzkp_tpu.fields.spec import FieldSpec
from myzkp_tpu.ops import ntt
from myzkp_tpu.parallel import mesh as pm

P32 = 3221225473


def test_dist_ntt_matches_single_chip():
    spec = FieldSpec.make(P32)
    mesh = pm.make_mesh(8)
    n = 256
    rng = random.Random(0)
    vals = [rng.randrange(P32) for _ in range(n)]
    a = Fp.from_int(spec, vals)
    out, (n1, n2) = pm.dist_ntt(spec, a.mont, mesh)
    nat = pm.dist_ntt_to_natural(spec, out, n1, n2)
    expected = ntt.ntt(a)
    assert np.array_equal(np.asarray(nat), np.asarray(expected.mont))


def test_dist_msm_matches_host():
    from myzkp_tpu.curves import bn254, msm, weierstrass as wst

    mesh = pm.make_mesh(8)
    rng = random.Random(0)
    g1 = bn254.g1_generator()
    npts = 16
    ks = [rng.randrange(1, bn254.R) for _ in range(npts)]
    pts_host = [g1 * rng.randrange(1, bn254.R) for _ in range(npts)]
    exp = bn254.curve_g1.infinity()
    for k, pt in zip(ks, pts_host):
        exp = exp + pt * k
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    dev = bn254.g1_points_to_device(pts_host)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    r = pm.dist_msm(F, b3, dev, sl, mesh)
    got = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, None], r))[0]
    assert got == exp
