"""Profile the recursive NTT's pieces on-chip: leaf kernel, twiddle, transpose.

Run: python tools/exp_ntt_prof.py  (on the TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myzkp_tpu.fields import limb, limb_pallas
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

    # (a) one leaf pass over the whole array: (L, 1, 128, 8192)
    m = 128
    x4 = a.reshape(L, 1, m, N // m)
    tw = jnp.asarray(nt._leaf_twiddles_np(spec, m, False))
    dt = chain(lambda i, x, t: limb_pallas.ntt_leaf_pallas(spec, x, t, m),
               x4, consts=(tw,))
    print(f"leaf m=128 full pass: {dt*1e3:.2f} ms", flush=True)

    m = 64
    x4b = a.reshape(L, 1, m, N // m)
    twb = jnp.asarray(nt._leaf_twiddles_np(spec, m, False))
    dtb = chain(lambda i, x, t: limb_pallas.ntt_leaf_pallas(spec, x, t, m),
                x4b, consts=(twb,))
    print(f"leaf m=64  full pass: {dtb*1e3:.2f} ms", flush=True)

    # (b) four-step twiddle (rank-structured, 2 muls) at top level
    x3 = a.reshape(L, 128, N // 128, 1)
    dt2 = chain(lambda i, x: nt._fourstep_twiddle(spec, x, N, 128, N // 128,
                                                  False), x3)
    print(f"twiddle top (2 muls): {dt2*1e3:.2f} ms", flush=True)

    # (c) the transpose
    def tr(i, x):
        y = jnp.swapaxes(x, -3, -2)
        return jnp.swapaxes(y, -3, -2)

    dt3 = chain(tr, x3) / 2
    print(f"transpose (128, 8192, 1): {dt3*1e3:.2f} ms", flush=True)

    # (d) plain butterfly stage (old path cost reference): one stage
    half = a.reshape(L, 2, N // 2)
    twf = jnp.asarray(nt._stage_twiddle(spec, N, 0, False))[:, : N // 2]

    def st(i, x, t):
        u, v = x[:, 0], x[:, 1]
        su, sv = limb_pallas.butterfly_pallas(
            spec, u, v, jnp.broadcast_to(t, u.shape), False)
        return jnp.stack([su, sv], axis=1)

    dt4 = chain(st, half, consts=(twf,))
    print(f"single fused butterfly stage (2^19 wide): {dt4*1e3:.2f} ms",
          flush=True)

    # (e) full recursive NTT
    dt5 = chain(lambda i, x: nt._ntt_natural(spec, x, False), a)
    print(f"full _ntt_natural 2^20: {dt5*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
