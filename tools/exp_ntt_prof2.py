"""Profile _stockham_axis cost vs transform length m (B = n/m wide).

Hypothesis: per-stage cost is ~constant (~0.5 ms at 2^20) when the trailing
batch axis is wide, so total time ~ log2(n) stages regardless of how n is
factored — and the old 18.7 ms came from twiddle-broadcast + concat
overheads at (blocks, c, B=1024) shapes, not from radix-2 itself.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myzkp_tpu.fields import limb
from myzkp_tpu.fields.spec import bn254_r_spec
from myzkp_tpu.ops import ntt as nt

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

spec = bn254_r_spec()
N = 1 << 20


def _fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def chain(step, init, n_long=6, n_short=1, consts=()):
    @jax.jit
    def run(R, x0, *cs):
        x = jax.lax.fori_loop(0, R, lambda i, x: step(i, x, *cs), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]

    def t(Rv):
        f = functools.partial(run, Rv)
        _fetch(f(init, *consts))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            _fetch(f(init, *consts))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_long) - t(n_short)) / (n_long - n_short)


def main():
    a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(3), (N,)))
    L = spec.L
    for m in (4, 16, 32, 64, 256, 1024):
        x = a.reshape(L, m, N // m)
        dt = chain(lambda i, v: nt._stockham_axis(spec, v, m, False), x)
        st = m.bit_length() - 1
        print(f"stockham m={m:5d} (B={N//m:6d}): {dt*1e3:6.2f} ms "
              f"({dt/st*1e3:.2f} ms/stage)", flush=True)


if __name__ == "__main__":
    main()
