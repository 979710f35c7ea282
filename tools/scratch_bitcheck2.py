"""Bit-check padd_fused / padd_sel_fused / tree_sum on the real chip."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from myzkp_tpu.fields.spec import bn254_q_spec, bn254_r_spec
from myzkp_tpu.fields import limb
from myzkp_tpu.curves import bn254, msm, weierstrass as wst, curve_pallas

qspec, rspec = bn254_q_spec(), bn254_r_spec()
L = qspec.L
F, b3 = bn254.g1_ops(), bn254.g1_b3(())
b3v = b3.reshape(L, -1)[:, 0]


def check(name, got, want):
    g, w = np.asarray(got), np.asarray(want)
    ok = (g == w).all()
    print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.argwhere(g != w)
        print(f"  {bad.shape[0]} / {g.size} mismatched; first {bad[:5]}")
    return ok


# valid points with z != 1: [k]G then doubled (z grows)
ks = [3, 5, 7, 11]
base = bn254.g1_points_to_device([bn254.g1_generator()] * 4)
bits = msm.scalar_bits(msm.scalars_from_int(rspec, ks))
os.environ["MYZKP_PALLAS"] = "0"
pts = wst.Point(*jax.jit(lambda px, py, pz, b: tuple(wst.scalar_mul_bits(
    F, b3, wst.Point(px, py, pz), b)))(base.x, base.y, base.z, bits))
n = 1 << 12
reps = n // 4
big = jax.tree_util.tree_map(lambda c: jnp.tile(c, (1, reps)), pts)
big2 = jax.tree_util.tree_map(lambda c: jnp.roll(c, 1, axis=1), big)
# sprinkle infinity points into both operands
inf = wst.infinity(F, (n,))
m1 = (jnp.arange(n) % 13) == 0
m2 = (jnp.arange(n) % 17) == 3
big = wst.pselect(F, m1, inf, big)
big2 = wst.pselect(F, m2, inf, big2)
h = (jnp.arange(n) % 5) == 0

os.environ["MYZKP_PALLAS"] = "0"
want_add = jax.jit(lambda *xs: tuple(wst.padd(
    F, b3, wst.Point(*xs[:3]), wst.Point(*xs[3:]))))(
        big.x, big.y, big.z, big2.x, big2.y, big2.z)
want_add = [np.asarray(c) for c in want_add]
want_sel = jax.jit(lambda *xs: tuple(wst.pselect(
    F, xs[6], wst.Point(*xs[3:6]),
    wst.padd(F, b3, wst.Point(*xs[:3]), wst.Point(*xs[3:6])))))(
        big.x, big.y, big.z, big2.x, big2.y, big2.z, h)
want_sel = [np.asarray(c) for c in want_sel]

bitsw = msm.scalar_bits(msm.scalars_from_int(rspec, [2, 3, 4, 5]))
ts_in = jax.tree_util.tree_map(lambda c: c[:, :64], big)
want_ts = jax.jit(lambda px, py, pz: tuple(wst.tree_sum(
    F, b3, wst.Point(px, py, pz), axis=0)))(ts_in.x, ts_in.y, ts_in.z)
want_ts = [np.asarray(c) for c in want_ts]

os.environ["MYZKP_PALLAS"] = "1"
got = jax.jit(lambda *xs: curve_pallas.padd_fused(qspec, *xs, b3v))(
    big.x, big.y, big.z, big2.x, big2.y, big2.z)
for i, nm in enumerate("xyz"):
    check(f"padd_fused {nm}", got[i], want_add[i])

got = jax.jit(lambda *xs: curve_pallas.padd_sel_fused(qspec, *xs, b3v))(
    big.x, big.y, big.z, big2.x, big2.y, big2.z, h)
for i, nm in enumerate("xyz"):
    check(f"padd_sel_fused {nm}", got[i], want_sel[i])

got = jax.jit(lambda px, py, pz: tuple(wst.tree_sum(
    F, b3, wst.Point(px, py, pz), axis=0)))(ts_in.x, ts_in.y, ts_in.z)
for i, nm in enumerate("xyz"):
    check(f"tree_sum {nm}", got[i], want_ts[i])

# scalar_mul_bits fused vs golden
got = jax.jit(lambda px, py, pz, b: tuple(wst.scalar_mul_bits(
    F, b3, wst.Point(px, py, pz), b)))(base.x, base.y, base.z, bits)
os.environ["MYZKP_PALLAS"] = "0"
want = jax.jit(lambda px, py, pz, b: tuple(wst.scalar_mul_bits(
    F, b3, wst.Point(px, py, pz), b)))(base.x, base.y, base.z, bits)
for i, nm in enumerate("xyz"):
    check(f"scalar_mul_bits {nm}", np.asarray(got[i]), np.asarray(want[i]))
