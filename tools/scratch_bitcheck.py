"""On-TPU bit checks: Mosaic-compiled kernels vs pure-JAX golden path."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from myzkp_tpu.fields.spec import bn254_q_spec, bn254_r_spec
from myzkp_tpu.fields import limb, limb_pallas
from myzkp_tpu.curves import bn254, msm, weierstrass as wst, curve_pallas

qspec = bn254_q_spec()
rspec = bn254_r_spec()
L = qspec.L

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def check(name, got, want):
    g, w = np.asarray(got), np.asarray(want)
    ok = (g == w).all()
    print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.argwhere(g != w)
        print(f"  {bad.shape[0]} / {g.size} mismatched; first {bad[:3]}")
        idx = tuple(bad[0])
        print(f"  got {g[idx]} want {w[idx]}")
    return ok


n = 1 << 14
key = jax.random.PRNGKey(0)
a = limb.to_mont(qspec, limb.random(qspec, key, (n,)))
b = limb.to_mont(qspec, limb.random(qspec, jax.random.PRNGKey(1), (n,)))

if which in ("all", "mul"):
    os.environ["MYZKP_PALLAS"] = "0"
    want = jax.jit(lambda a, b: limb.mont_mul(qspec, a, b))(a, b)
    want = np.asarray(want)
    os.environ["MYZKP_PALLAS"] = "1"
    got = np.asarray(jax.jit(
        lambda a, b: limb_pallas.mont_mul_pallas(qspec, a, b))(a, b))
    check("mont_mul_pallas vs XLA (2^14)", got, want)

    # butterfly
    tw = limb.to_mont(qspec, limb.random(qspec, jax.random.PRNGKey(2), (n,)))
    got = jax.jit(lambda u, v, t: limb_pallas.butterfly_pallas(
        qspec, u, v, t, dit=False))(a, b, tw)
    os.environ["MYZKP_PALLAS"] = "0"
    def bf(u, v, t):
        return (limb.add(qspec, u, v),
                limb.mont_mul(qspec, limb.sub(qspec, u, v), t))
    want = jax.jit(bf)(a, b, tw)
    os.environ["MYZKP_PALLAS"] = "1"
    check("butterfly DIF su", np.asarray(got[0]), np.asarray(want[0]))
    check("butterfly DIF sv", np.asarray(got[1]), np.asarray(want[1]))

if which in ("all", "curve"):
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    b3v = b3.reshape(L, -1)[:, 0]
    # build valid curve points on device: [k]G batched (uses fused kernels
    # itself, so build with MYZKP_PALLAS=0 golden path)
    os.environ["MYZKP_PALLAS"] = "0"
    ks = [3, 5, 7, 11]
    base = bn254.g1_points_to_device([bn254.g1_generator()] * 4)
    bits = msm.scalar_bits(msm.scalars_from_int(rspec, ks))
    pts = jax.jit(lambda px, py, pz, b: tuple(wst.scalar_mul_bits(
        F, b3, wst.Point(px, py, pz), b)))(base.x, base.y, base.z, bits)
    pts = wst.Point(*[np.asarray(c) for c in pts])
    # replicate to width 2^14 with varying z (multiply coords by random z)
    reps = n // 4
    big = jax.tree_util.tree_map(lambda c: jnp.tile(c, (1, reps)), pts)
    q_aff = jax.tree_util.tree_map(lambda c: jnp.tile(c, (1, reps)), base)
    h = (jnp.arange(n) % 7) == 0

    def fused(px, py, pz, qx, qy, hh):
        return curve_pallas.padd_mixed_sel_fused(qspec, px, py, pz, qx, qy,
                                                 hh, b3v)

    def golden(px, py, pz, qx, qy, hh):
        p, q = wst.Point(px, py, pz), wst.Point(qx, qy, None)
        r = wst.padd_mixed(F, b3, p, qx, qy)
        one = F.one(F.batch_shape(qx))
        qq = wst.Point(qx, qy, one)
        return tuple(wst.pselect(F, hh, qq, r))

    os.environ["MYZKP_PALLAS"] = "0"
    want = jax.jit(golden)(big.x, big.y, big.z, q_aff.x, q_aff.y, h)
    want = [np.asarray(c) for c in want]
    os.environ["MYZKP_PALLAS"] = "1"
    got = jax.jit(fused)(big.x, big.y, big.z, q_aff.x, q_aff.y, h)
    for i, nm in enumerate("xyz"):
        check(f"padd_mixed_sel fused {nm} (2^14)", np.asarray(got[i]), want[i])

    # pdbl + padd fused
    got = jax.jit(lambda *xs: curve_pallas.pdbl_fused(qspec, *xs, b3v))(
        big.x, big.y, big.z)
    os.environ["MYZKP_PALLAS"] = "0"
    want = jax.jit(lambda px, py, pz: tuple(wst.pdbl(
        F, b3, wst.Point(px, py, pz))))(big.x, big.y, big.z)
    want = [np.asarray(c) for c in want]
    os.environ["MYZKP_PALLAS"] = "1"
    for i, nm in enumerate("xyz"):
        check(f"pdbl fused {nm} (2^14)", np.asarray(got[i]), want[i])

if which in ("all", "msm"):
    # small MSM on TPU vs host expectation
    import random
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
    exp = bn254.g1_generator() * (sum(k*m for k, m in zip(ks, ms)) % bn254.R)
    got_pip = wst.Point(*jax.jit(lambda px, py, pz, s: tuple(
        msm.msm_pippenger(F, b3, wst.Point(px, py, pz), s)))(
            pts.x, pts.y, pts.z, sl))
    hp = bn254.g1_points_to_host(jax.tree_util.tree_map(
        lambda c: c[:, None], got_pip))[0]
    print(f"pippenger n=512 TPU vs host: {'OK' if hp == exp else 'MISMATCH'}",
          flush=True)
    got_nv = wst.Point(*jax.jit(lambda px, py, pz, b: tuple(
        msm.msm_naive(F, b3, wst.Point(px, py, pz), b)))(
            pts.x, pts.y, pts.z, msm.scalar_bits(sl)))
    hn = bn254.g1_points_to_host(jax.tree_util.tree_map(
        lambda c: c[:, None], got_nv))[0]
    print(f"naive n=512 TPU vs host: {'OK' if hn == exp else 'MISMATCH'}",
          flush=True)
