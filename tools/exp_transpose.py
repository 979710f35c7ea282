"""Measure in-kernel Mosaic sublane<->lane transpose cost on v5e.

Decides the MSM bucket-scan-over-rows design (docs/speed_of_light.md lever
1): per 128-lane tile the kernel must transpose a (128, 64) u32 row block
into (64, 128) limb planes.  If that transpose runs near copy speed, the
row-major scan kernel removes ~4 full-array XLA relayout passes per MSM
group; if it is 10x copy cost (like sub-8 sublane slicing), the lever dies.

Run: python tools/exp_transpose.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def chain(step, init, n_long=8, n_short=1, consts=()):
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


N_TILES = 4096  # 4096 tiles x (128, 64) u32 = 128 MB


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.uint32(1)


def tpose_kernel(x_ref, o_ref):
    # (1, 128, 64) -> (1, 64, 128)
    x = x_ref[...].reshape(128, 64)
    o_ref[...] = jnp.swapaxes(x, 0, 1).reshape(1, 64, 128) + jnp.uint32(1)


def tpose_both_kernel(x_ref, o_ref):
    # transpose there and back (the scan kernel's per-step cost: q rows ->
    # planes AND acc planes -> rows)
    x = x_ref[...].reshape(128, 64)
    y = jnp.swapaxes(x, 0, 1) + jnp.uint32(1)
    o_ref[...] = jnp.swapaxes(y, 0, 1).reshape(1, 128, 64)


def main():
    x = jnp.arange(N_TILES * 128 * 64, dtype=jnp.uint32).reshape(
        N_TILES, 128, 64)
    nbytes = x.size * 4

    def mk(kernel, out_tile):
        bspec_in = pl.BlockSpec((1, 128, 64), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        bspec_out = pl.BlockSpec((1,) + out_tile, lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(N_TILES,), in_specs=[bspec_in],
            out_specs=bspec_out,
            out_shape=jax.ShapeDtypeStruct((N_TILES,) + out_tile,
                                           jnp.uint32))

    for name, kern, tile in [("copy", copy_kernel, (128, 64)),
                             ("transpose", tpose_kernel, (64, 128)),
                             ("transpose x2", tpose_both_kernel, (128, 64))]:
        f = mk(kern, tile)
        dt = chain(lambda i, v, f=f: f(v), x)
        print(f"{name:14s}: {dt*1e3:7.2f} ms  "
              f"({nbytes/dt/1e9:6.1f} GB/s eff)", flush=True)

    # XLA reference: the same transpose as a full-array op
    def xla_t(i, v):
        return jnp.swapaxes(v, 1, 2).reshape(N_TILES, 128, 64) + jnp.uint32(1)

    dt = chain(xla_t, x)
    print(f"XLA transpose : {dt*1e3:7.2f} ms  ({nbytes/dt/1e9:6.1f} GB/s eff)")

    # XLA big-transpose reference at MSM shapes: (N, 64) -> (64, N)
    big = x.reshape(-1, 64)
    def xla_big(i, v):
        return (v.T + jnp.uint32(1)).T

    dt = chain(xla_big, big)
    print(f"XLA (N,64)->T : {dt*1e3:7.2f} ms  ({nbytes/dt/1e9:6.1f} GB/s eff)")


if __name__ == "__main__":
    main()
