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


def test_dist_sumcheck_fold_and_sum_match_single_chip():
    from myzkp_tpu.fields import limb
    from myzkp_tpu.protocols import sumcheck_tpu as st

    spec = FieldSpec.make(P32)
    mesh = pm.make_mesh(8)
    rng = random.Random(3)
    n = 128
    vals = [rng.randrange(P32) for _ in range(n)]
    table = Fp.from_int(spec, vals)
    r_int = rng.randrange(1, P32)
    r = Fp.from_int(spec, [r_int])

    expected_fold = st.fold_into_half(table, Fp(spec, r.mont[:, 0]))
    got_fold = pm.dist_fold_into_half(spec, table.mont, mesh, r.mont[:, 0])
    assert np.array_equal(np.asarray(got_fold), np.asarray(expected_fold.mont))

    expected_sum = sum(vals) % P32
    got_sum = Fp(spec, pm.dist_table_sum(spec, table.mont, mesh))
    assert int(got_sum.to_int()) == expected_sum

    # fold all the way down across rounds, shards staying on-mesh
    cur = table.mont
    cur_ref = table
    while cur.shape[-1] > 16:
        cur = pm.dist_fold_into_half(spec, cur, mesh, r.mont[:, 0])
        cur_ref = st.fold_into_half(cur_ref, Fp(spec, r.mont[:, 0]))
    assert np.array_equal(np.asarray(cur), np.asarray(cur_ref.mont))
