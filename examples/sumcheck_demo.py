"""Sumcheck demo: TPU table prover vs host mirror, with verification.

Capability parity with myzkp/examples/sumcheck/src/main.rs:18-87 (the
CPU/GPU sumcheck example over a 2^8 hypercube with 3 degree-1 factors,
Algorithm 1 of Bagad-Domb-Thaler): `--host` selects the host mirror the way
the reference's ``is_gpu`` flag selects CUDA vs CPU, and the claimed sums of
both provers are cross-checked like the reference's debug_assert
(main.rs:70).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myzkp_tpu.curves import bn254
from myzkp_tpu.ops.mpoly import MPoly
from myzkp_tpu.protocols.sumcheck_tpu import (
    SumCheckProverHost, SumCheckProverTPU, SumCheckVerifier)


def main() -> None:
    use_host = "--host" in sys.argv
    num_vars = int(os.environ.get("SUMCHECK_VARS", 8))
    num_factors = 3
    spec = bn254.r_spec()
    rng = random.Random(45)  # parity: main.rs:29 seeds 45

    # random multilinear factors over `num_vars` variables
    factors = []
    for _ in range(num_factors):
        d = {}
        for _ in range(8):
            exps = tuple(rng.randint(0, 1) for _ in range(num_vars))
            d[exps] = rng.randrange(bn254.R)
        factors.append(MPoly(spec, d))

    prover = (SumCheckProverHost(spec, num_factors)
              if use_host else SumCheckProverTPU(spec, num_factors))
    t0 = time.perf_counter()
    proof = prover.prove(factors, num_vars)
    prove_time = time.perf_counter() - t0
    print(f"prover={'host' if use_host else 'tpu'} vars={num_vars} "
          f"claimed_sum={proof.claimed_sum} prove_time={prove_time:.3f}s")

    # cross-check the claimed sum against the other prover (main.rs:70)
    other = (SumCheckProverTPU(spec, num_factors)
             if use_host else SumCheckProverHost(spec, num_factors))
    other_proof = other.prove(factors, num_vars)
    assert other_proof.claimed_sum == proof.claimed_sum, "prover mismatch!"

    t0 = time.perf_counter()
    ok = SumCheckVerifier(spec).verify(proof, factors)
    verify_time = time.perf_counter() - t0
    print(f"verified={ok} verify_time={verify_time:.3f}s")
    assert ok


if __name__ == "__main__":
    main()
