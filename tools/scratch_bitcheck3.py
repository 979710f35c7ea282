"""Isolate the msm_naive mismatch: per-point scalar mul vs tree_sum."""
import os, sys, random
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from myzkp_tpu.fields.spec import bn254_q_spec, bn254_r_spec
from myzkp_tpu.curves import bn254, msm, weierstrass as wst

qspec, rspec = bn254_q_spec(), bn254_r_spec()
F, b3 = bn254.g1_ops(), bn254.g1_b3(())

rng = random.Random(1)
nn = 512
ms = [rng.randrange(1, bn254.R) for _ in range(nn)]
base = bn254.g1_points_to_device([bn254.g1_generator()] * nn)
bits = msm.scalar_bits(msm.scalars_from_int(rspec, ms))
pts = wst.Point(*jax.jit(lambda px, py, pz, b: tuple(
    wst.scalar_mul_bits(F, b3, wst.Point(px, py, pz), b)))(
        base.x, base.y, base.z, bits))
ks = [rng.randrange(0, bn254.R) for _ in range(nn)]
sl = msm.scalars_from_int(rspec, ks)

# stage 1: per-point [k_i]P_i on device
per = wst.Point(*jax.jit(lambda px, py, pz, b: tuple(
    wst.scalar_mul_bits(F, b3, wst.Point(px, py, pz), b)))(
        pts.x, pts.y, pts.z, msm.scalar_bits(sl)))
host_per = bn254.g1_points_to_host(per)
g = bn254.g1_generator()
bad = 0
for i in range(nn):
    expi = g * (ks[i] * ms[i] % bn254.R)
    if host_per[i] != expi:
        bad += 1
        if bad <= 3:
            print(f"per-point {i}: MISMATCH", flush=True)
print(f"per-point stage: {bad}/{nn} bad", flush=True)

# stage 2: tree_sum of the per-point results
tot = wst.Point(*jax.jit(lambda px, py, pz: tuple(wst.tree_sum(
    F, b3, wst.Point(px, py, pz), axis=0)))(per.x, per.y, per.z))
htot = bn254.g1_points_to_host(jax.tree_util.tree_map(
    lambda c: c[:, None], tot))[0]
exp = g * (sum(k * m for k, m in zip(ks, ms)) % bn254.R)
print(f"tree_sum stage: {'OK' if htot == exp else 'MISMATCH'}", flush=True)

# stage 2b: host sum of device per-point results (checks tree_sum input)
acc = bn254.curve_g1.infinity()
for p in host_per:
    acc = acc + p
print(f"host-sum of per-point: {'OK' if acc == exp else 'MISMATCH'}",
      flush=True)
