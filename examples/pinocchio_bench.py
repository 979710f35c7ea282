"""End-to-end Pinocchio SNARK scaling benchmark on sparse circuits.

Usage: python examples/pinocchio_bench.py [--mesh D] [--g2 naive|pippenger]
                                          [log2_m ...]     (default: 10 12 14)

Generates an m-constraint squaring-chain circuit (arith/sparse.py), runs
trusted setup, proves on device (MSMs + coset NTT h-polynomial), verifies
host-side (native multi-pairing), and prints per-phase wall times — the
"2^k-constraint QAP prove" north-star metric from BASELINE.md.  The
reference cannot express this size: its dense Vec<Vec<F>> R1CS
(r1cs.rs:12-41) and O(m^2) interpolation (qap.rs:21-34) are quadratic.

With ``--mesh D`` the prove runs mesh-distributed (pinocchio.prove_mesh)
over D devices — virtual CPU devices exercise the sharding on a host
(set XLA_FLAGS=--xla_force_host_platform_device_count=D), a pod slice
rides real ICI; requires m >= D^2.  ``--g2`` selects the G2 MSM
implementation (see snark/pinocchio._msm_g2's compile/runtime trade).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from myzkp_tpu.arith.sparse import SparseQAP, square_chain
from myzkp_tpu.curves import bn254
from myzkp_tpu.snark import pinocchio


def bench(log2_m: int, mesh=None, g2_method=None) -> dict:
    m = 1 << log2_m
    spec = bn254.r_spec()
    rng = random.Random(42)
    t0 = time.perf_counter()
    r1cs, assignment = square_chain(spec, m)
    qap = SparseQAP(r1cs)
    t1 = time.perf_counter()
    pk, vk = pinocchio.setup(qap, rng=rng)
    jax.block_until_ready(pk.g1_sj.x)
    t2 = time.perf_counter()
    proof = pinocchio.prove(assignment, pk, qap, rng=rng, mesh=mesh,
                            g2_method=g2_method)
    t3 = time.perf_counter()
    ok = pinocchio.verify(proof, vk)
    t4 = time.perf_counter()
    assert ok, "proof rejected"
    return {
        "m": m,
        "circuit_s": round(t1 - t0, 3),
        "setup_s": round(t2 - t1, 3),
        "prove_s": round(t3 - t2, 3),
        "verify_s": round(t4 - t3, 3),
    }


def main():
    args = sys.argv[1:]
    mesh = None
    g2_method = None
    if "--mesh" in args:
        i = args.index("--mesh")
        d = int(args[i + 1])
        del args[i : i + 2]
        from myzkp_tpu.parallel import mesh as pm

        mesh = pm.make_mesh(d)
    if "--g2" in args:
        i = args.index("--g2")
        g2_method = args[i + 1]
        del args[i : i + 2]
    sizes = [int(a) for a in args] or [10, 12, 14]
    for k in sizes:
        r = bench(k, mesh=mesh, g2_method=g2_method)
        tag = f" (mesh={mesh.shape})" if mesh is not None else ""
        print(f"m=2^{k}{tag}: circuit {r['circuit_s']}s  "
              f"setup {r['setup_s']}s  "
              f"prove {r['prove_s']}s  verify {r['verify_s']}s", flush=True)


if __name__ == "__main__":
    main()
