"""Experiment: can a Pallas DMA-gather beat XLA's row gather (~11.5 ns/row)?

The MSM's measured bottleneck is `jnp.take(rows, perm, axis=0)` at ~11.5
ns/row regardless of row width (docs/speed_of_light.md).  This kernel issues
per-row async copies from an HBM-resident table into the output block with a
D-deep in-flight window, via scalar-prefetched indices.  If the DMA issue
rate beats the XLA gather, it becomes the MSM's gather (and later can fuse
into the bucket scan); if not, the SoL doc records why the gather bound
stands.

Run on TPU: python tools/exp_gather_pallas.py
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 1024  # rows per grid block (1D SMEM blocks must align to 1024)
DEPTH = 8  # DMAs in flight


@functools.partial(jax.jit, static_argnums=(2,))
def gather_pallas(table, idx, interpret=False):
    """table: (Nt, Cw) uint32 rows in HBM; idx: (N,) int32 -> (N, Cw)."""
    N = idx.shape[0]
    Cw = table.shape[1]
    assert N % RB == 0

    def kernel(idx_ref, tbl_ref, out_ref, sems):
        # idx_ref: this block's (RB,) indices in SMEM (blocked input — the
        # full index array at 2^20 would overflow the 1 MB SMEM if
        # scalar-prefetched whole)
        def dma(r):
            return pltpu.make_async_copy(
                tbl_ref.at[idx_ref[r]],
                out_ref.at[r],
                sems.at[r % DEPTH],
            )

        for r in range(DEPTH):
            dma(r).start()
        for r in range(RB):
            if r + DEPTH < RB:
                dma(r + DEPTH).start()
            dma(r).wait()

    return pl.pallas_call(
        kernel,
        grid=(N // RB,),
        in_specs=[
            pl.BlockSpec((RB,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((RB, Cw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
        out_shape=jax.ShapeDtypeStruct((N, Cw), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def _fetch(x):
    return np.asarray(x).ravel()[0]


def chain_time(fn, args, n_long=8, n_short=1):
    @jax.jit
    def run(N, a):
        def body(i, a):
            out = fn(*a)
            # data-dependence: fold one output element back into the index
            return (a[0], (a[1] + out[0, 0].astype(jnp.int32) % 2) % a[0].shape[0])
        return jax.lax.fori_loop(0, N, body, a)[1][0]

    f_long = functools.partial(run, n_long)
    f_short = functools.partial(run, n_short)
    _fetch(f_long(args)); _fetch(f_short(args))
    ts = []
    for f in (f_long, f_short):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); _fetch(f(args)); best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[0] - ts[1]) / (n_long - n_short)


def main():
    # correctness (interpret on CPU or small case on TPU)
    rng = np.random.default_rng(0)
    Nt, Cw, N = 4096, 128, 4096
    tbl = rng.integers(0, 2**32, size=(Nt, Cw), dtype=np.uint32)
    idx = rng.integers(0, Nt, size=(N,), dtype=np.int32)
    interp = jax.default_backend() != "tpu"
    got = np.asarray(gather_pallas(jnp.asarray(tbl), jnp.asarray(idx), interp))
    assert (got == tbl[idx]).all(), "gather mismatch"
    print("correctness OK", flush=True)
    if interp:
        return

    for logN in (18, 20):
        N = 1 << logN
        tbl = jnp.asarray(rng.integers(0, 2**32, size=(N, Cw), dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, N, size=(N,), dtype=np.int32))
        dt_p = chain_time(lambda t, i: gather_pallas(t, i), (tbl, idx))
        dt_x = chain_time(lambda t, i: jnp.take(t, i, axis=0), (tbl, idx))
        print(f"2^{logN}: pallas {dt_p/N*1e9:.1f} ns/row, "
              f"xla take {dt_x/N*1e9:.1f} ns/row", flush=True)


if __name__ == "__main__":
    main()
