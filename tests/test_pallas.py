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


@pytest.mark.slow  # ~221s interpret-mode; Mosaic lowering is bit-checked on-chip each bench run
def test_fused_padd_pdbl_matches_golden():
    import jax.numpy as jnp

    from myzkp_tpu.curves import bn254, curve_pallas, weierstrass as wst

    rng = random.Random(11)
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    g = bn254.g1_generator()
    n = 20
    pts_a = bn254.g1_points_to_device([g * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    pts_b = bn254.g1_points_to_device([g * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    spec = bn254.q_spec()
    b3v = curve_pallas._b3_vec(F, b3)
    got = curve_pallas.padd_fused(
        spec, pts_a.x, pts_a.y, pts_a.z, pts_b.x, pts_b.y, pts_b.z, b3v,
        interpret=True)
    ref = wst.padd(F, b3, pts_a, pts_b)
    for g_, r_ in zip(got, ref):
        assert np.array_equal(np.asarray(g_), np.asarray(r_))

    gotd = curve_pallas.pdbl_fused(spec, pts_a.x, pts_a.y, pts_a.z, b3v,
                                   interpret=True)
    refd = wst.pdbl(F, b3, pts_a)
    for g_, r_ in zip(gotd, refd):
        assert np.array_equal(np.asarray(g_), np.asarray(r_))

    # fused select variant
    h = jnp.asarray(np.array([i % 2 for i in range(n)], dtype=bool))
    gots = curve_pallas.padd_sel_fused(
        spec, pts_a.x, pts_a.y, pts_a.z, pts_b.x, pts_b.y, pts_b.z, h, b3v,
        interpret=True)
    refs = wst.pselect(F, h, pts_b, wst.padd(F, b3, pts_a, pts_b))
    for g_, r_ in zip(gots, refs):
        assert np.array_equal(np.asarray(g_), np.asarray(r_))


def test_padd_mixed_formula_complete():
    """The mixed formula (RCB16 Alg 8) agrees with the full complete add on
    generic and edge inputs — pure-JAX paths, no Pallas interpret cost."""
    from myzkp_tpu.curves import bn254, weierstrass as wst

    rng = random.Random(19)
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    g = bn254.g1_generator()
    n = 8
    pts_p = bn254.g1_points_to_device([g * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    pts_q = bn254.g1_points_to_device([g * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    qx, qy, _ = wst.to_affine(F, pts_q, axis=0)
    qproj = wst.Point(qx, qy, F.one((n,)))
    got = wst.padd_mixed(F, b3, pts_p, qx, qy)
    ref = wst.padd(F, b3, pts_p, qproj)
    assert bool(np.all(np.asarray(wst.peq(F, b3, got, ref))))
    # edge cases of completeness: P = inf, P = Q (doubling), P = -Q (inf out)
    inf = wst.infinity(F, (n,))
    got_inf = wst.padd_mixed(F, b3, inf, qx, qy)
    assert bool(np.all(np.asarray(wst.peq(F, b3, got_inf, qproj))))
    got_dbl = wst.padd_mixed(F, b3, qproj, qx, qy)
    refd = wst.pdbl(F, b3, qproj)
    assert bool(np.all(np.asarray(wst.peq(F, b3, got_dbl, refd))))
    negq = wst.pneg(F, qproj)
    got_zero = wst.padd_mixed(F, b3, negq, qx, qy)
    assert bool(np.all(np.asarray(wst.is_infinity(F, got_zero))))


def test_fused_padd_mixed_matches_golden():
    """Fused kernel (interpret mode) is bit-identical to the pure-JAX
    padd_mixed path — they trace the same formula (single source of truth)."""
    import jax.numpy as jnp

    from myzkp_tpu.curves import bn254, curve_pallas, weierstrass as wst

    rng = random.Random(19)
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    g = bn254.g1_generator()
    n = 16
    pts_p = bn254.g1_points_to_device([g * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    pts_q = bn254.g1_points_to_device([g * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    spec = bn254.q_spec()
    b3v = curve_pallas._b3_vec(F, b3)
    qx, qy, _ = wst.to_affine(F, pts_q, axis=0)
    h = jnp.asarray(np.array([i % 2 for i in range(n)], dtype=bool))
    gots = curve_pallas.padd_mixed_sel_fused(
        spec, pts_p.x, pts_p.y, pts_p.z, qx, qy, h, b3v, interpret=True)
    qproj = wst.Point(qx, qy, F.one((n,)))
    refs = wst.pselect(F, h, qproj, wst.padd_mixed(F, b3, pts_p, qx, qy))
    for g_, r_ in zip(gots, refs):
        assert np.array_equal(np.asarray(g_), np.asarray(r_))


@pytest.mark.slow  # ~272s interpret-mode; Mosaic lowering is bit-checked on-chip each bench run
def test_fused_padd_mixed_g2_matches_golden():
    import jax.numpy as jnp

    from myzkp_tpu.curves import bn254, curve_pallas, weierstrass as wst

    rng = random.Random(23)
    F2, b32 = bn254.g2_ops(), bn254.g2_b3(())
    g2 = bn254.g2_generator()
    n = 8
    pts_p = bn254.g2_points_to_device([g2 * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    pts_q = bn254.g2_points_to_device([g2 * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    spec = bn254.q_spec()
    b3v = curve_pallas._b3_vec(F2, b32)
    qx, qy, _ = wst.to_affine(F2, pts_q, axis=0)
    coords = tuple([c for e in (pts_p.x, pts_p.y, pts_p.z, qx, qy)
                    for c in e])
    h = jnp.asarray(np.array([i % 2 for i in range(n)], dtype=bool))
    outs = curve_pallas.padd_mixed2_sel_fused(spec, coords, h, b3v,
                                              interpret=True)
    qproj = wst.Point(qx, qy, F2.one((n,)))
    refs = wst.pselect(F2, h, qproj,
                       wst.padd_mixed(F2, b32, pts_p, qx, qy))
    ref_flat = [c for e in refs for c in e]
    for g_, r_ in zip(outs, ref_flat):
        assert np.array_equal(np.asarray(g_), np.asarray(r_))


@pytest.mark.slow  # ~200s interpret-mode; Mosaic lowering is bit-checked on-chip each bench run
def test_fused_padd_g2_matches_golden():
    from myzkp_tpu.curves import bn254, curve_pallas, weierstrass as wst

    rng = random.Random(13)
    F2, b32 = bn254.g2_ops(), bn254.g2_b3(())
    g2 = bn254.g2_generator()
    n = 8
    pts_a = bn254.g2_points_to_device([g2 * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    pts_b = bn254.g2_points_to_device([g2 * rng.randrange(1, bn254.R)
                                       for _ in range(n)])
    spec = bn254.q_spec()
    b3v = curve_pallas._b3_vec(F2, b32)
    flat = [c for e in (pts_a.x, pts_a.y, pts_a.z,
                        pts_b.x, pts_b.y, pts_b.z) for c in e]
    out = curve_pallas.padd2_fused(spec, tuple(flat), b3v, interpret=True)
    ref = wst.padd(F2, b32, pts_a, pts_b)
    ref_flat = [c for e in ref for c in e]
    for g_, r_ in zip(out, ref_flat):
        assert np.array_equal(np.asarray(g_), np.asarray(r_))


def test_fused_butterfly_matches_golden():
    import jax.numpy as jnp

    from myzkp_tpu.fields import limb_pallas

    spec = FieldSpec.make(M128)
    rng = random.Random(17)
    n = 64
    u = limb.to_mont(spec, limb.from_int(spec, [rng.randrange(M128)
                                                for _ in range(n)]))
    v = limb.to_mont(spec, limb.from_int(spec, [rng.randrange(M128)
                                                for _ in range(n)]))
    tw = limb.to_mont(spec, limb.from_int(spec, [rng.randrange(M128)
                                                 for _ in range(n)]))
    for dit in (False, True):
        su, sv = limb_pallas.butterfly_pallas(spec, u, v, tw, dit,
                                              interpret=True)
        if dit:
            tv = limb.mont_mul(spec, v, tw)
            ru, rv = limb.add(spec, u, tv), limb.sub(spec, u, tv)
        else:
            ru = limb.add(spec, u, v)
            rv = limb.mont_mul(spec, limb.sub(spec, u, v), tw)
        assert np.array_equal(np.asarray(su), np.asarray(ru))
        assert np.array_equal(np.asarray(sv), np.asarray(rv))


@pytest.mark.parametrize("m,E,B", [(16, 2, 64), (64, 1, 128), (128, 1, 130)])
def test_ntt_leaf_pallas_matches_stockham(m, E, B):
    """Fused multi-stage leaf NTT kernel (all log2(m) Stockham stages in one
    VMEM pass) vs the per-stage golden path, forward and inverse."""
    import jax.numpy as jnp

    from myzkp_tpu.fields.fp import Fp
    from myzkp_tpu.ops import ntt as nt

    p = 3221225473
    spec = FieldSpec.make(p)
    rng = random.Random(m * 1000 + B)
    vals = [[[rng.randrange(p) for _ in range(B)] for _ in range(m)]
            for _ in range(E)]
    x = Fp.from_int(spec, vals).mont  # (L, E, m, B)
    for inv in (False, True):
        tw = jnp.asarray(nt._leaf_twiddles_np(spec, m, inv))
        got = limb_pallas.ntt_leaf_pallas(spec, x, tw, m, True)
        want = nt._stockham_axis(spec, x, m, inv)
        assert np.array_equal(np.asarray(got), np.asarray(want))


def test_ntt_recursive_core_matches_single_level():
    """Recursive four-step core (fused-leaf decomposition) vs one-level
    Stockham at a size above _FOURSTEP_MIN_N, including batched lead dims."""
    from myzkp_tpu.fields.fp import Fp
    from myzkp_tpu.ops import ntt as nt

    p = 3221225473
    spec = FieldSpec.make(p)
    rng = random.Random(42)
    n = 1 << 14
    a = Fp.from_int(spec, [rng.randrange(p) for _ in range(n)]).mont
    for inv in (False, True):
        got = nt._ntt_core_recursive(spec, a, inv)
        want = nt._ntt_core_small(spec, a, inv)
        assert np.array_equal(np.asarray(got), np.asarray(want))
    b = Fp.from_int(
        spec, [[rng.randrange(p) for _ in range(n)] for _ in range(2)]).mont
    assert np.array_equal(
        np.asarray(nt._ntt_core_recursive(spec, b, False)),
        np.asarray(nt._ntt_core_small(spec, b, False)))


@pytest.mark.slow  # interpret-mode padd emulation; the lowering is golden-
# checked on-chip by bench.py's rows-path msm golden each run
@pytest.mark.parametrize("N", [1024, 2048])
def test_bucket_scan_rows_kernel_matches_host(N):
    """curve_pallas.bucket_scan_rows (interpret mode) vs a host-simulated
    segmented scan: per-lane accumulators and the flush stream must match
    as group elements (projective representations differ by construction,
    so compare affine via the host conversion).  N=2048 exercises the
    multi-tile (T=2) grid — the shape class of the r4 double-buffered-
    accumulator bug (tools/rows_scan_bug.md)."""
    import jax.numpy as jnp

    from myzkp_tpu.curves import bn254, curve_pallas, msm as m, \
        weierstrass as wst

    rng = random.Random(23)
    qspec = bn254.q_spec()
    g1 = bn254.g1_generator()
    K = 2
    mults = [rng.randrange(1, 1 << 30) for _ in range(K * N)]
    host_pts = [g1 * v for v in mults]
    dev_pts = bn254.g1_points_to_device(host_pts)
    rows, treedef, C = m._rows_of_point(dev_pts)
    # step-major layout: step k, lane l at index k*N + l (already so)
    tags = [rng.randrange(4) for _ in range(K * N)]
    tags[:7] = [0, 1, 2, 3, 2, 1, 0]  # pin all combinations early

    acc_p, flush = curve_pallas.bucket_scan_rows(
        bn254.q_spec(), rows, jnp.asarray(tags, jnp.int32),
        bn254.g1_b3(()), K, True)

    # host simulation
    inf = bn254.curve_g1.infinity()
    acc_h = [inf] * N
    flush_h = []
    for k in range(K):
        for l in range(N):
            t = tags[k * N + l]
            flush_h.append(acc_h[l])
            q = host_pts[k * N + l]
            if t & 1:
                q = -q
            acc_h[l] = q if (t >> 1) & 1 else acc_h[l] + q
    L = qspec.L
    got_acc = bn254.g1_points_to_host(wst.Point(
        acc_p[:L], acc_p[L:2 * L], acc_p[2 * L:]))
    assert got_acc == acc_h
    got_flush = bn254.g1_points_to_host(
        m._point_of_rows(flush, treedef, C, (K * N,)))
    assert got_flush == flush_h


def test_force_fused_interpret_seam_dispatches_kernels():
    """force_fused("interpret") routes curve group ops through the fused
    Pallas kernels in interpret mode on CPU — the test seam that lets
    off-TPU tests exercise Mosaic kernel logic (the gap that let the r4
    rows-scan bug reach a chip prove, VERDICT r4 weak#1).  Uses the mixed
    add (the cheapest fused kernel to compile in interpret mode)."""
    import jax

    from myzkp_tpu.curves import bn254, curve_pallas, weierstrass as wst

    g1 = bn254.g1_generator()
    pa = bn254.g1_points_to_device([g1 * (3 + i) for i in range(8)])
    qaff = [g1 * (11 + i) for i in range(8)]
    qdev = bn254.g1_points_to_device(qaff)
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    with curve_pallas.force_fused("interpret"):
        assert curve_pallas.enabled() and curve_pallas.interpret_mode()
        got = wst.padd_mixed(F, b3, pa, qdev.x, qdev.y)
    with curve_pallas.force_fused(False):
        assert not curve_pallas.enabled()
        want = wst.padd_mixed(F, b3, pa, qdev.x, qdev.y)
    assert curve_pallas.forced_mode() is None  # context restored
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert np.array_equal(np.asarray(g), np.asarray(w))
