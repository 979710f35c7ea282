"""Curve-layer tests: host pairings vs reference fixtures, device projective
arithmetic vs the Python golden model, MSM (naive + Pippenger).

Mirrors the reference's curve/bn128 test strategy
(myzkp/src/modules/algebra/curve/curve.rs:410-556, bn128.rs:236-361).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from myzkp_tpu.curves import bn254, msm, weierstrass as wst
from myzkp_tpu.fields.python_field import (
    PyCurve, PyField, general_tate_pairing, miller, tate_pairing, weil_pairing)


# ---------------------------------------------------------------------------
# Host: toy-curve pairing fixtures (curve.rs:429-556)
# ---------------------------------------------------------------------------

def _toy():
    F = PyField(631)
    curve = PyCurve(F(30), F(34))
    P = curve.point(F(36), F(60))
    Q = curve.point(F(121), F(387))
    S = curve.point(F(0), F(36))
    return F, curve, P, Q, S


def test_weil_pairing_known_vectors():
    F, curve, P, Q, S = _toy()
    fp_qs, _ = miller(P, Q + S, 5)
    fp_s, _ = miller(P, S, 5)
    assert int(fp_qs) == 103 and int(fp_s) == 219
    assert int(fp_qs / fp_s) == 473
    fq_ps, _ = miller(Q, P + (-S), 5)
    fq_s, _ = miller(Q, -S, 5)
    assert int(fq_ps) == 284 and int(fq_s) == 204 and int(fq_ps / fq_s) == 88
    w = weil_pairing(P, Q, 5, S)
    assert int(w) == 242
    Pp = curve.point(F(617), F(5))
    Qp = curve.point(F(121), F(244))
    assert P * 3 == Pp and Q * 4 == Qp
    wp = weil_pairing(Pp, Qp, 5, S)
    assert int(wp) == 512 and int(w ** 12) == 512
    assert int(weil_pairing(Pp, Pp, 5, S)) == 1


def test_tate_pairing_compatibility():
    F, curve, P, Q, S = _toy()
    Pp, Qp = P * 3, Q * 4
    t = general_tate_pairing(P, Q, 5, 1, 631, S)
    tp = general_tate_pairing(Pp, Qp, 5, 1, 631, S)
    assert t ** 12 == tp
    t2 = tate_pairing(P, Q, 5, 1, 631)
    t2p = tate_pairing(Pp, Qp, 5, 1, 631)
    assert t2 ** 12 == t2p


# ---------------------------------------------------------------------------
# Host: BN254 group laws + optimal ate pairing (bn128.rs:236-361)
# ---------------------------------------------------------------------------

def test_bn254_generators_and_order():
    g1, g2 = bn254.g1_generator(), bn254.g2_generator()
    assert bn254.curve_g1.contains(g1.x, g1.y)
    assert bn254.curve_g2.contains(g2.x, g2.y)
    assert (g1 * bn254.R).inf
    assert (g2 * bn254.R).inf


def test_bn254_pairing_bilinearity():
    g1, g2 = bn254.g1_generator(), bn254.g2_generator()
    e = bn254.optimal_ate_pairing
    p1 = e(g1, g2)
    assert p1 != bn254.Fq12([1])
    assert p1 * p1 == e(g1 * 2, g2) == e(g1, g2 * 2)
    assert e(bn254.curve_g1.infinity(), g2) == bn254.Fq12([1])


# ---------------------------------------------------------------------------
# Device: projective complete formulas vs host golden model
# ---------------------------------------------------------------------------

def test_g1_device_ops_match_host():
    g1 = bn254.g1_generator()
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    rng = random.Random(0)
    ks = [rng.randrange(1, bn254.R) for _ in range(4)]
    host_pts = [g1 * k for k in ks]
    dev = bn254.g1_points_to_device(host_pts)
    back = bn254.g1_points_to_host(wst.pdbl(F, b3, dev))
    for hp, k in zip(back, ks):
        assert hp == g1 * (2 * k)
    rolled = wst.Point(*[jnp.roll(c, 1, axis=1) for c in dev])
    back2 = bn254.g1_points_to_host(wst.padd(F, b3, dev, rolled))
    for i in range(4):
        assert back2[i] == host_pts[i] + host_pts[(i - 1) % 4]
    # complete-formula edge cases
    inf = wst.infinity(F, (4,))
    assert bn254.g1_points_to_host(wst.padd(F, b3, dev, inf)) == host_pts
    doubled = bn254.g1_points_to_host(wst.padd(F, b3, dev, dev))
    assert doubled == [p + p for p in host_pts]
    cancelled = bn254.g1_points_to_host(wst.padd(F, b3, dev, wst.pneg(F, dev)))
    assert all(p.inf for p in cancelled)


def test_g2_device_scalar_mul():
    g2 = bn254.g2_generator()
    F2 = bn254.g2_ops()
    rng = random.Random(7)
    ks = [rng.randrange(1, bn254.R) for _ in range(3)]
    dev = bn254.g2_points_to_device([g2] * 3)
    bits = msm.scalar_bits(msm.scalars_from_int(bn254.r_spec(), ks))
    res = wst.scalar_mul_bits(F2, bn254.g2_b3(()), dev, bits)
    back = bn254.g2_points_to_host(res)
    for k, hp in zip(ks, back):
        assert hp == g2 * k


# ---------------------------------------------------------------------------
# MSM: naive and Pippenger vs host accumulation
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def msm_instance():
    g1 = bn254.g1_generator()
    rng = random.Random(1)
    n = 37
    ks = [rng.randrange(1, bn254.R) for _ in range(n)]
    pts_host = [g1 * rng.randrange(1, bn254.R) for _ in range(n)]
    exp = bn254.curve_g1.infinity()
    for k, p in zip(ks, pts_host):
        exp = exp + p * k
    dev = bn254.g1_points_to_device(pts_host)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    return dev, sl, exp


def _to_host_single(pt):
    return bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, None], pt))[0]


def test_msm_naive(msm_instance):
    dev, sl, exp = msm_instance
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    assert _to_host_single(msm.msm_naive(F, b3, dev, sl)) == exp


def test_msm_pippenger(msm_instance):
    dev, sl, exp = msm_instance
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    assert _to_host_single(msm.msm_pippenger(F, b3, dev, sl)) == exp


@pytest.mark.parametrize("c", [6, 9])
def test_msm_pippenger_large_windows(msm_instance, c):
    """Windows above _WSUM_BASE_C exercise the hierarchical weighted
    bucket sum (row/column split + recursive half-width sums)."""
    dev, sl, exp = msm_instance
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    assert _to_host_single(msm.msm_pippenger(F, b3, dev, sl, c=c)) == exp


def test_msm_pippenger_edge_scalars():
    """Zero scalars, tiny scalars, duplicate digits."""
    g1 = bn254.g1_generator()
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    ks = [0, 1, 1, 2, bn254.R - 1, 0, 7, 7]
    pts_host = [g1 * (i + 1) for i in range(8)]
    exp = bn254.curve_g1.infinity()
    for k, p in zip(ks, pts_host):
        exp = exp + p * k
    dev = bn254.g1_points_to_device(pts_host)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    assert _to_host_single(msm.msm_pippenger(F, b3, dev, sl)) == exp


def test_msm_pippenger_g2():
    """Signed-digit + hierarchical bucket sum over Fq2 coordinates."""
    g2 = bn254.g2_generator()
    F2, b3 = bn254.g2_ops(), bn254.g2_b3(())
    rng = random.Random(13)
    n = 24
    ks = [rng.randrange(0, bn254.R) for _ in range(n)]
    pts_host = [g2 * rng.randrange(1, bn254.R) for _ in range(n)]
    exp = pts_host[0].curve.infinity()
    for k, p in zip(ks, pts_host):
        exp = exp + p * k
    dev = bn254.g2_points_to_device(pts_host)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    got = bn254.g2_points_to_host(jax.tree_util.tree_map(
        lambda a: a[:, None], msm.msm_pippenger(F2, b3, dev, sl, c=6)))[0]
    assert got == exp


# ---------------------------------------------------------------------------
# MSM: production-shape coverage off-TPU (VERDICT r1 item 4)
#
# The correctness-critical sort + scan + masked-scatter bucket machinery
# (msm.py:_bucket_accumulate) only reaches production shapes (K > 8, window
# grouping, n_pad/W_pad padding) at n >= 512.  Expected values cost O(1)
# host EC work: points are generated ON DEVICE as P_i = [m_i]G for known
# m_i, so  sum_i k_i P_i = [sum_i k_i m_i mod r] G  — one host scalar mul.
# ---------------------------------------------------------------------------

def _known_multiple_points(n, seed, g2=False):
    rng = random.Random(seed)
    ms = [rng.randrange(1, bn254.R) for _ in range(n)]
    if g2:
        F, b3 = bn254.g2_ops(), bn254.g2_b3(())
        base = bn254.g2_points_to_device([bn254.g2_generator()] * n)
    else:
        F, b3 = bn254.g1_ops(), bn254.g1_b3(())
        base = bn254.g1_points_to_device([bn254.g1_generator()] * n)
    bits = msm.scalar_bits(msm.scalars_from_int(bn254.r_spec(), ms))
    return ms, wst.scalar_mul_bits(F, b3, base, bits)


@pytest.mark.parametrize("n,c,K,G", [
    (512, None, None, None),   # auto cost model end-to-end
    pytest.param(512, 8, 8, 2, marks=pytest.mark.slow),   # small K + grouping
    (509, 8, 64, None),        # odd n: n_pad pad + scatter uniqueness (CI)
    pytest.param(512, 13, None, 3, marks=pytest.mark.slow),  # W_pad % G != 0
])
def test_msm_pippenger_midsize(n, c, K, G):
    ms, pts = _known_multiple_points(n, seed=n + (c or 0))
    rng = random.Random(1000 + n + (K or 0))
    ks = [rng.randrange(0, bn254.R) for _ in range(n)]
    # mix in edge scalars: zeros and duplicates
    ks[0] = 0
    ks[1] = ks[2] = 5
    exp = bn254.g1_generator() * (
        sum(k * m for k, m in zip(ks, ms)) % bn254.R)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    got = _to_host_single(msm.msm_pippenger(F, b3, pts, sl, c=c, K=K, G=G))
    assert got == exp


@pytest.mark.slow
def test_msm_pippenger_midsize_equal_scalars():
    """All-equal scalars: every window's points land in ONE bucket, the
    worst case for the scatter-uniqueness argument in _bucket_accumulate."""
    n = 512
    ms, pts = _known_multiple_points(n, seed=77)
    k = 1234567891234567891
    exp = bn254.g1_generator() * (k * sum(ms) % bn254.R)
    sl = msm.scalars_from_int(bn254.r_spec(), [k] * n)
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    got = _to_host_single(msm.msm_pippenger(F, b3, pts, sl, c=8, K=16))
    assert got == exp


@pytest.mark.slow
def test_msm_pippenger_midsize_4096_auto():
    n = 4096
    ms, pts = _known_multiple_points(n, seed=4096)
    rng = random.Random(9)
    ks = [rng.randrange(0, bn254.R) for _ in range(n)]
    exp = bn254.g1_generator() * (
        sum(k * m for k, m in zip(ks, ms)) % bn254.R)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    got = _to_host_single(msm.msm_pippenger(F, b3, pts, sl))
    assert got == exp


@pytest.mark.slow
def test_msm_pippenger_midsize_g2():
    n = 512
    ms, pts = _known_multiple_points(n, seed=512, g2=True)
    rng = random.Random(11)
    ks = [rng.randrange(0, bn254.R) for _ in range(n)]
    exp = bn254.g2_generator() * (
        sum(k * m for k, m in zip(ks, ms)) % bn254.R)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    F2, b3 = bn254.g2_ops(), bn254.g2_b3(())
    got = bn254.g2_points_to_host(jax.tree_util.tree_map(
        lambda a: a[:, None], msm.msm_pippenger(F2, b3, pts, sl, c=8)))[0]
    assert got == exp


def test_msm_resumable_checkpoint(tmp_path, msm_instance):
    """Chunked MSM with a simulated crash: partial run, then resume."""
    from myzkp_tpu.utils import checkpoint as ckpt

    dev, sl, exp = msm_instance
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    path = str(tmp_path / "msm.npz")

    # run only the first two chunks, then "crash"
    class _Stop(Exception):
        pass

    orig = ckpt._save_state
    calls = {"n": 0}

    def hooked(p, i, a):
        orig(p, i, a)
        calls["n"] += 1
        if calls["n"] == 2:
            raise _Stop

    ckpt._save_state = hooked
    try:
        ckpt.msm_resumable(F, b3, dev, sl, path, chunk=16)
        assert False, "should have crashed after 2 chunks"
    except _Stop:
        pass
    finally:
        ckpt._save_state = orig
    assert calls["n"] == 2

    got = ckpt.msm_resumable(F, b3, dev, sl, path, chunk=16)
    assert _to_host_single(got) == exp
    assert not (tmp_path / "msm.npz").exists()  # cleaned up on completion


def test_fixed_base_multi_matches_host():
    """Windowed-table fixed-base multiplier (the trusted-setup engine) vs
    host double-and-add, both groups, incl. 0 / 1 / r-1 edge scalars."""
    import os

    from myzkp_tpu.curves import bn254, fixed_base, msm

    os.environ.setdefault("MYZKP_TABLE_CACHE", "/tmp/myzkp_fixed_base")
    rng = random.Random(31)
    ks = [0, 1, 2, bn254.R - 1] + [rng.randrange(bn254.R) for _ in range(4)]
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    for which, gen, to_host in (
            ("g1", bn254.g1_generator(), bn254.g1_points_to_host),
            ("g2", bn254.g2_generator(), bn254.g2_points_to_host)):
        got = to_host(fixed_base.fixed_base_multi(which, sl))
        exp = [gen * k for k in ks]
        for g, e in zip(got, exp):
            assert g == e
