"""Probe the mont_mul driver-tail regression (1101 M/s r2 -> ~800 r3/r4).

Hypotheses: (a) chain amortization (n_long) interacting with relay
scheduling, (b) batch-shape / tile-count effects, (c) a platform-side
change.  Run on an otherwise-idle chip.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from myzkp_tpu.fields import limb, limb_pallas
from myzkp_tpu.fields.spec import bn254_q_spec


def _fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def chain(step, init, n_long, n_short, consts=()):
    @jax.jit
    def run(R, x0, *cs):
        x = jax.lax.fori_loop(0, R, lambda i, x: step(i, x, *cs), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]

    def t(Rv):
        f = functools.partial(run, Rv)
        _fetch(f(init, *consts))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(f(init, *consts))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_long) - t(n_short)) / (n_long - n_short)


def main():
    spec = bn254_q_spec()
    for logn in (20, 21):
        n = 1 << logn
        a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(0), (n,)))
        b = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (n,)))
        for (nl, ns) in ((8, 1), (32, 4), (64, 8)):
            dt = chain(lambda i, x, b: limb_pallas.mont_mul_pallas(spec, x, b),
                       a, nl, ns, consts=(b,))
            print(f"n=2^{logn} chain({nl},{ns}): {n/dt/1e6:7.1f} M muls/s "
                  f"({dt*1e3:.3f} ms)", flush=True)

    # HBM stream reference: elementwise u32 multiply on the same footprint
    x = jnp.arange(1 << 26, dtype=jnp.uint32)

    def stream(i, v):
        return v * jnp.uint32(2654435761) + jnp.uint32(1)

    dt = chain(stream, x, 16, 2)
    nbytes = x.size * 4 * 2
    print(f"stream u32 256MB r+w: {nbytes/dt/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
