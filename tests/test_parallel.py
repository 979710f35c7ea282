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


def test_dist_intt_matches_single_chip():
    spec = FieldSpec.make(P32)
    mesh = pm.make_mesh(8)
    n = 512
    rng = random.Random(5)
    vals = [rng.randrange(P32) for _ in range(n)]
    a = Fp.from_int(spec, vals)
    evals = ntt.ntt(a)  # natural-order evaluations
    out, (n1, n2) = pm.dist_intt(spec, evals.mont, mesh)
    nat = pm.dist_ntt_to_natural(spec, out, n1, n2)
    # inverse of the forward transform recovers the coefficients exactly
    assert np.array_equal(np.asarray(nat), np.asarray(a.mont))
    # and bit-matches the single-chip intt
    expected = ntt.intt(evals)
    assert np.array_equal(np.asarray(nat), np.asarray(expected.mont))


def test_dist_ntt_batch_axis_2d_mesh():
    spec = FieldSpec.make(P32)
    mesh = pm.make_mesh_2d(2, 4)
    rng = random.Random(6)
    B, n = 4, 128
    rows = [[rng.randrange(P32) for _ in range(n)] for _ in range(B)]
    a = Fp.from_int(spec, rows)  # (B, n)
    out, (n1, n2) = pm.dist_ntt(spec, a.mont, mesh, axis="ici",
                                batch_axis="dcn")
    nat = pm.dist_ntt_to_natural(spec, out, n1, n2)
    expected = ntt.ntt(a)
    assert np.array_equal(np.asarray(nat), np.asarray(expected.mont))


def test_dist_fri_fold_matches_single_chip():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from myzkp_tpu.stark.fri import fold_codeword

    spec = FieldSpec.make(P32)
    mesh = pm.make_mesh(8)
    n = 256
    rng = random.Random(7)
    cw = Fp.from_int(spec, [rng.randrange(P32) for _ in range(n)])
    omega = ntt.nth_root_of_unity(P32, n)
    offset, alpha = 5, rng.randrange(1, P32)
    sharded = jax.device_put(cw.mont, NamedSharding(mesh, P(None, "shard")))
    # two consecutive rounds, codeword staying sharded between them
    got1 = pm.dist_fri_fold(spec, sharded, mesh, alpha, offset, omega)
    exp1 = fold_codeword(spec, cw.mont, alpha, offset, omega)
    assert np.array_equal(np.asarray(got1), np.asarray(exp1))
    alpha2 = rng.randrange(1, P32)
    got2 = pm.dist_fri_fold(spec, got1, mesh, alpha2,
                            offset * offset % P32, omega * omega % P32)
    exp2 = fold_codeword(spec, exp1, alpha2,
                         offset * offset % P32, omega * omega % P32)
    assert np.array_equal(np.asarray(got2), np.asarray(exp2))


def test_dist_merkle_tree_matches_monolithic():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from myzkp_tpu.fields import limb
    from myzkp_tpu.utils import merkle

    spec = FieldSpec.make(P32)
    mesh = pm.make_mesh(8)
    n = 64
    rng = random.Random(8)
    vals = [rng.randrange(P32) for _ in range(n)]
    std = limb.from_int(spec, vals)
    sharded = jax.device_put(std, NamedSharding(mesh, P(None, "shard")))
    dt = pm.dist_merkle_tree(spec, sharded, mesh)
    leaves = limb.to_bytes_batch(spec, np.asarray(std))
    mono = merkle.MerkleTree(leaves)
    assert dt.root == mono.root
    assert dt.n_shards == 8
    for idx in (0, 1, 7, 8, 33, 63):
        assert dt.open(idx) == mono.open(idx)
        assert merkle.verify(dt.root, idx, dt.open(idx), leaves[idx])


def test_dist_merkle_tree_host_shards():
    from myzkp_tpu.utils.merkle import DistMerkleTree, MerkleTree, verify

    rng = random.Random(9)
    leaves = [rng.randbytes(32) for _ in range(128)]
    for shards in (1, 4, 128):
        dt = DistMerkleTree(leaves, shards)
        mono = MerkleTree(leaves)
        assert dt.root == mono.root
        for idx in (0, 63, 127):
            assert dt.open(idx) == mono.open(idx)
            assert verify(dt.root, idx, dt.open(idx), leaves[idx])


def test_dist_batch_shards_independent_instances():
    from myzkp_tpu.fields import limb

    spec = FieldSpec.make(P32)
    mesh = pm.make_mesh(8)
    rng = random.Random(10)
    B, n = 8, 32
    rows = [[rng.randrange(P32) for _ in range(n)] for _ in range(B)]
    a = Fp.from_int(spec, rows)  # mont (L, B, n)
    # leading-axis batch layout for dist_batch: (B, L, n)
    batched = np.moveaxis(np.asarray(a.mont), 1, 0)

    def one(x):  # x: (1, L, n) shard -> pointwise square of the instance
        return limb.mont_mul(spec, x[0], x[0])[None]

    got = pm.dist_batch(one, mesh)(batched)
    expected = np.moveaxis(
        np.asarray(limb.mont_mul(spec, a.mont, a.mont)), 1, 0)
    assert np.array_equal(np.asarray(got), expected)


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


@pytest.mark.slow
def test_dist_pinocchio_prove_matches_single_chip():
    """Mesh-distributed prove (sharded MSMs + dist_ntt h-pipeline) produces
    the same group elements as the single-chip prover under the same rng,
    and the proof verifies."""
    from myzkp_tpu.arith.sparse import SparseQAP, square_chain
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.snark import pinocchio

    mesh = pm.make_mesh(4)
    spec = bn254.r_spec()
    r1cs, assignment = square_chain(spec, 16)  # m=16 >= D^2=16
    qap = SparseQAP(r1cs)
    pk, vk = pinocchio.setup(qap, rng=random.Random(11))
    proof_1 = pinocchio.prove(assignment, pk, qap, rng=random.Random(5))
    proof_m = pinocchio.prove(assignment, pk, qap, rng=random.Random(5),
                              mesh=mesh)
    for name in ("g1_ell", "g2_r", "g1_o", "g1_ell_prime", "g2_r_prime",
                 "g1_o_prime", "g1_h", "g1_z"):
        assert getattr(proof_m, name) == getattr(proof_1, name), name
    assert pinocchio.verify(proof_m, vk)


@pytest.mark.slow
def test_dist_groth16_prove_matches_single_chip():
    """Groth16 with mesh-sharded MSMs == single-chip proof, and verifies."""
    from myzkp_tpu.arith.sparse import SparseQAP, square_chain
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.snark import groth16

    mesh = pm.make_mesh(4)
    spec = bn254.r_spec()
    r1cs, assignment = square_chain(spec, 16)
    qap = SparseQAP(r1cs)
    pk, vk = groth16.setup(qap, num_public=2, rng=random.Random(3))
    p1 = groth16.prove(assignment, pk, qap, rng=random.Random(9))
    pm_proof = groth16.prove(assignment, pk, qap, rng=random.Random(9),
                             mesh=mesh)
    assert p1.a == pm_proof.a and p1.b == pm_proof.b and p1.c == pm_proof.c
    pub = [int(v) for v in assignment.to_int()[:2]]
    assert groth16.verify(pm_proof, vk, pub)


def test_dist_msm_pippenger_path_with_forced_params():
    """dist_msm now takes a naive-ladder fallback for tiny shards (the
    driver dry run's 2-points-per-device case compiled the full bucket
    machinery otherwise, VERDICT r4 weak#2); forcing window params keeps
    the distributed Pippenger path itself covered."""
    from myzkp_tpu.curves import bn254, msm, weierstrass as wst

    mesh = pm.make_mesh(8)
    rng = random.Random(2)
    g1 = bn254.g1_generator()
    npts = 256
    ks = [rng.randrange(1, bn254.R) for _ in range(npts)]
    pts_host = [g1 * rng.randrange(1, bn254.R) for _ in range(npts)]
    exp = bn254.curve_g1.infinity()
    for k, pt in zip(ks, pts_host):
        exp = exp + pt * k
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    dev = bn254.g1_points_to_device(pts_host)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    r = pm.dist_msm(F, b3, dev, sl, mesh, c=8, K=8)
    got = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, None], r))[0]
    assert got == exp


def test_dist_msm_cpu_mesh_with_tpu_default_backend(monkeypatch):
    """Regression (VERDICT r4 weak#1): on a TPU-registered host, tracing a
    dist op for a forced-CPU mesh must NOT select the fused Pallas kernels
    ('Only interpret mode is supported on CPU backend').  Kernel-path
    selection must follow the executing mesh, which mesh_dispatch pins."""
    from myzkp_tpu.curves import bn254, msm

    mesh = pm.make_mesh(4)
    rng = random.Random(7)
    g1 = bn254.g1_generator()
    npts = 8
    ks = [rng.randrange(1, bn254.R) for _ in range(npts)]
    pts_host = [g1 * (i + 2) for i in range(npts)]
    exp = bn254.curve_g1.infinity()
    for k, pt in zip(ks, pts_host):
        exp = exp + pt * k
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    dev = bn254.g1_points_to_device(pts_host)
    sl = msm.scalars_from_int(bn254.r_spec(), ks)
    # simulate the TPU-registered host: the process default backend lies
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    r = pm.dist_msm(F, b3, dev, sl, mesh)
    got = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, None], r))[0]
    assert got == exp


@pytest.mark.slow
def test_prove_mesh_cpu_mesh_with_tpu_default_backend(monkeypatch):
    """The r4 crash repro: prove_mesh on a forced-CPU mesh from a host
    whose default backend reports 'tpu' (traceback was pinocchio.py:470 ->
    mesh.py:337 -> msm.py:616 -> curve_pallas.py:107).  Must run clean and
    verify now that the whole prover traces under mesh_dispatch."""
    from myzkp_tpu.arith.sparse import SparseQAP, square_chain
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.snark import pinocchio

    mesh = pm.make_mesh(4)
    spec = bn254.r_spec()
    r1cs, assignment = square_chain(spec, 16)
    qap = SparseQAP(r1cs)
    pk, vk = pinocchio.setup(qap, rng=random.Random(11))
    with monkeypatch.context() as mp:
        mp.setattr(jax, "default_backend", lambda: "tpu")
        proof = pinocchio.prove_mesh(assignment, pk, qap, mesh,
                                     rng=random.Random(5))
    assert pinocchio.verify(proof, vk)


@pytest.mark.slow
def test_groth16_mesh_cpu_with_tpu_default_backend(monkeypatch):
    """Groth16's mesh path gets the same executing-mesh dispatch guard as
    pinocchio.prove_mesh (VERDICT r4 weak#1 regression, Groth16 side)."""
    from myzkp_tpu.arith.sparse import SparseQAP, square_chain
    from myzkp_tpu.curves import bn254
    from myzkp_tpu.snark import groth16

    mesh = pm.make_mesh(4)
    spec = bn254.r_spec()
    r1cs, assignment = square_chain(spec, 16)
    qap = SparseQAP(r1cs)
    pk, vk = groth16.setup(qap, num_public=2, rng=random.Random(3))
    with monkeypatch.context() as mp:
        mp.setattr(jax, "default_backend", lambda: "tpu")
        proof = groth16.prove(assignment, pk, qap, rng=random.Random(9),
                              mesh=mesh)
    pub = [int(v) for v in assignment.to_int()[:2]]
    assert groth16.verify(proof, vk, pub)
