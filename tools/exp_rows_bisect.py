"""r5 bisect that isolated the rows-scan bug to window size (c=14), not
grid shape — the decisive negative for the multi-tile hypothesis
(tools/rows_scan_bug.md).  Run on an idle chip.
"""
import sys, random, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from myzkp_tpu.curves import bn254, fixed_base, msm as m, weierstrass as wst

rng = random.Random(7)
rspec = bn254.r_spec()
F, b3 = bn254.g1_ops(), bn254.g1_b3(())
n = 1 << 14
ms = [rng.randrange(1, bn254.R) for _ in range(n)]
ks = [rng.randrange(0, bn254.R) for _ in range(n)]
pts = fixed_base.fixed_base_multi("g1", m.scalars_from_int(rspec, ms))
for x in jax.tree_util.tree_leaves(pts): np.asarray(x)
sc = m.scalars_from_int(rspec, ks)
exp = bn254.g1_generator() * (sum(k*mm for k, mm in zip(ks, ms)) % bn254.R)

def run_cfg(c, G, K):
    t0 = time.perf_counter()
    got = m.msm_pippenger(F, b3, pts, sc, c=c, G=G, K=K, _rows_scan=True)
    h = bn254.g1_points_to_host(
        jax.tree_util.tree_map(lambda a: a[:, None], got))[0]
    lanes = G * n // K
    print(f"c={c} G={G} K={K} T={lanes//1024}: "
          f"{'MATCH' if h == exp else 'MISMATCH'} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

run_cfg(14, 8, 16)   # c=14, even G=8, T=8
run_cfg(8, 19, 16)   # c=8, odd G=19, T=19
run_cfg(8, 6, 32)    # c=8, even G=6, odd T=3
run_cfg(8, 3, 8)     # c=8, odd G=3, even T=6
