"""Exploratory on-chip microbench: where does the MSM time go?"""
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myzkp_tpu.fields.spec import bn254_q_spec
from myzkp_tpu.fields.tile_ops import TileFp
from myzkp_tpu.fields import limb, limb_pallas

spec = bn254_q_spec()
L = spec.L


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def mont_mul_variant(S, use_scratch, nbatch):
    tF = TileFp(spec, use_scratch=use_scratch)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = tF.mul(a_ref[...], b_ref[...])

    tile = S * 128
    npad = -(-nbatch // tile) * tile
    grid = npad // tile
    bspec = pl.BlockSpec((L, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(a, b):
        a = a.reshape(L, npad // 128, 128)
        b = b.reshape(L, npad // 128, 128)
        return pl.pallas_call(
            kernel, grid=(grid,), in_specs=[bspec, bspec], out_specs=bspec,
            out_shape=jax.ShapeDtypeStruct((L, npad // 128, 128), jnp.uint32),
        )(a, b)
    return run, npad


def main():
    key = jax.random.PRNGKey(0)
    n = 1 << 20
    a = limb.random(spec, key, (n,))
    b = limb.random(spec, jax.random.PRNGKey(1), (n,))
    a = limb.to_mont(spec, a); b = limb.to_mont(spec, b)
    jax.block_until_ready((a, b))

    print("== mont_mul variants @ 2^20 ==")
    for S in (8, 16, 32, 64):
        for scratch in (True, False):
            run, npad = mont_mul_variant(S, scratch, n)
            t_c0 = time.perf_counter()
            try:
                dt = timeit(run, a.reshape(L, -1), b.reshape(L, -1))
            except Exception as e:
                print(f"S={S} scratch={scratch}: FAIL {type(e).__name__} {str(e)[:120]}")
                continue
            compile_t = time.perf_counter() - t_c0 - 5 * dt
            print(f"S={S} scratch={scratch}: {n/dt/1e6:.0f} M muls/s  ({dt*1e3:.2f} ms, compile ~{compile_t:.1f}s)")

    # current production path
    dt = timeit(functools.partial(limb_pallas.mont_mul_pallas, spec), a, b)
    print(f"production mont_mul_pallas: {n/dt/1e6:.0f} M muls/s ({dt*1e3:.2f} ms)")

    # pure-JAX XLA path
    os.environ["MYZKP_PALLAS"] = "0"
    # note: limb.mont_mul dispatches at trace time; direct call with env off
    dt = timeit(functools.partial(limb.mont_mul, spec), a, b)
    os.environ["MYZKP_PALLAS"] = "1"
    print(f"pure-JAX mont_mul: {n/dt/1e6:.0f} M muls/s ({dt*1e3:.2f} ms)")

    print("== sort + gather @ 2^20 ==")
    digits = jax.random.randint(key, (1, n), 0, 4096, dtype=jnp.int32)
    vals = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None] << 1, (1, n))
    f_sort = jax.jit(lambda d, v: jax.lax.sort_key_val(d, v, dimension=1))
    dt = timeit(f_sort, digits, vals)
    print(f"sort_key_val (1, 2^20): {dt*1e3:.2f} ms = {dt/n*1e9:.1f} ns/elt")

    stacked = jnp.concatenate([a, b], axis=0)  # (2L, n) = 32 planes
    perm = jax.random.permutation(key, n)[None]

    f_gather = jax.jit(lambda s, p: jnp.take(s, p.reshape(-1), axis=1, mode="clip"))
    dt = timeit(f_gather, stacked, perm)
    print(f"gather 32 planes (2^20 idx): {dt*1e3:.2f} ms = {dt/n*1e9:.1f} ns/idx")

    print("== fused curve kernels ==")
    from myzkp_tpu.curves import bn254, weierstrass as wst, curve_pallas
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    b3v = b3.reshape(L, -1)[:, 0]
    for width in (1 << 13, 1 << 15, 1 << 17):
        px = a[:, :width]; py = b[:, :width]; pz = limb.one_mont(spec, (width,))
        qx = b[:, :width]; qy = a[:, :width]
        h = jnp.zeros((width,), bool)
        f1 = jax.jit(lambda *xs: curve_pallas.padd_fused(spec, *xs, b3v))
        dt = timeit(f1, px, py, pz, qx, qy, pz)
        print(f"padd_fused width 2^{int(math.log2(width))}: {width/dt/1e6:.1f} M adds/s ({dt*1e3:.2f} ms) = {width*14/dt/1e6:.0f} M muls/s eq")
        f2 = jax.jit(lambda *xs: curve_pallas.padd_mixed_sel_fused(spec, *xs, b3v))
        dt = timeit(f2, px, py, pz, qx, qy, h)
        print(f"padd_mixed_sel width 2^{int(math.log2(width))}: {width/dt/1e6:.1f} M adds/s ({dt*1e3:.2f} ms) = {width*13/dt/1e6:.0f} M muls/s eq")


if __name__ == "__main__":
    main()
