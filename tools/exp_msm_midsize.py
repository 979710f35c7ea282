"""r5 probe: 2^16 MSM throughput vs window size (c in 10/12/16).

Finding: ~690 ms at every c — the size-independent merge/bucket/Horner
tail dominates mid sizes (docs/speed_of_light.md mid-size anomaly).
"""
import sys, random, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from myzkp_tpu.curves import bn254, fixed_base, msm as m, weierstrass as wst

rng = random.Random(5)
rspec = bn254.r_spec()
F, b3 = bn254.g1_ops(), bn254.g1_b3(())
n = 1 << 16
ms = [rng.randrange(1, bn254.R) for _ in range(n)]
ks = [rng.randrange(0, bn254.R) for _ in range(n)]
pts = fixed_base.fixed_base_multi("g1", m.scalars_from_int(rspec, ms))
for x in jax.tree_util.tree_leaves(pts): np.asarray(x)
sc = m.scalars_from_int(rspec, ks)
exp = bn254.g1_generator() * (sum(k*mm for k, mm in zip(ks, ms)) % bn254.R)

def fetch(out):
    for c_ in jax.tree_util.tree_leaves(out): np.asarray(c_)

for (c, K) in [(12, 64), (16, 64), (10, 32)]:
    @jax.jit
    def run(px, py, pz, sl, c=c, K=K):
        return tuple(m.msm_pippenger(F, b3, wst.Point(px, py, pz), sl,
                                     c=c, K=K))
    t0 = time.perf_counter()
    out = run(pts.x, pts.y, pts.z, sc); fetch(out)
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = run(pts.x, pts.y, pts.z, sc); fetch(out)
        ts.append(time.perf_counter() - t0)
    h = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, None], wst.Point(*out)))[0]
    print(f"2^16 c={c} K={K}: steady {min(ts)*1e3:.0f} ms "
          f"({n/min(ts)/1e6:.2f} M pts/s) compile {comp:.0f}s "
          f"{'MATCH' if h == exp else 'MISMATCH'}", flush=True)
