"""Benchmark harness: BN254 G1 Pippenger MSM throughput on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md): its only MSM
algorithm is per-coefficient affine double-and-add on host BigInts
(myzkp/src/modules/algebra/polynomial.rs:156-165 + curve.rs:163-191), so
``vs_baseline`` is measured speedup over that algorithm (host Python ints,
timed on a sample here and extrapolated per point).
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# 2^16 by default: the SNARK-scale regime (2^20 reaches ~537k pts/s on a
# v5e chip but takes several minutes of point-generation + compile; 2^16
# hits the same steady-state throughput plateau in a fraction of the time).
N = int(os.environ.get("BENCH_MSM_N", 1 << 16))


def main():
    from myzkp_tpu.curves import bn254, msm, weierstrass as wst
    from myzkp_tpu.fields import limb
    from myzkp_tpu.fields.spec import FieldSpec

    rng = random.Random(42)
    g1 = bn254.g1_generator()
    rspec, qspec = bn254.r_spec(), bn254.q_spec()
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())

    # random points: [k_i]G for random k_i, generated ON DEVICE (batched
    # double-and-add), so host setup stays cheap
    ks_gen = [rng.randrange(1, bn254.R) for _ in range(N)]
    base = bn254.g1_points_to_device([g1] * N)
    bits = msm.scalar_bits(msm.scalars_from_int(rspec, ks_gen))
    points = wst.scalar_mul_bits(F, b3, base, bits)
    jax.block_until_ready(points.x)

    scalars = msm.scalars_from_int(
        rspec, [rng.randrange(1, bn254.R) for _ in range(N)])

    run = jax.jit(lambda px, py, pz, s: tuple(
        msm.msm_pippenger(F, b3, wst.Point(px, py, pz), s)))
    out = run(points.x, points.y, points.z, scalars)  # compile + warm
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(points.x, points.y, points.z, scalars)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    pps = N / dt

    # reference-equivalent naive host double-and-add, sampled
    sample = 8
    host_pts = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, :sample], points))
    t0 = time.perf_counter()
    acc = bn254.curve_g1.infinity()
    for k, p in zip(ks_gen[:sample], host_pts):
        acc = acc + p * k
    host_dt = time.perf_counter() - t0
    host_pps = sample / host_dt

    print(json.dumps({
        "metric": "bn254_g1_msm_pippenger",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / host_pps, 2),
    }))


if __name__ == "__main__":
    main()
