"""Chain-diff microbench with fori_loop chains (single compile per op).

Axon tunnel: ~26 ms fixed round-trip per host fetch; block_until_ready does
not block. Timing = diff of two on-device fori_loop chain lengths.
"""
import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myzkp_tpu.fields.spec import bn254_q_spec
from myzkp_tpu.fields.tile_ops import TileFp
from myzkp_tpu.fields import limb, limb_pallas

spec = bn254_q_spec()
L = spec.L


def fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def time_fetch(fn, *args, reps=3):
    out = fn(*args); fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args); fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_time(step, init, n_long=64, n_short=8, reps=3):
    """step: x -> x (same pytree struct/shape). Returns seconds per step."""

    @functools.partial(jax.jit, static_argnums=0)
    def run(N, x0):
        x = jax.lax.fori_loop(0, N, lambda i, x: step(x), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]

    tl = time_fetch(functools.partial(run, n_long), init, reps=reps)
    ts = time_fetch(functools.partial(run, n_short), init, reps=reps)
    return (tl - ts) / (n_long - n_short)


def mont_mul_variant(S, use_scratch):
    tF = TileFp(spec, use_scratch=use_scratch)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = tF.mul(a_ref[...], b_ref[...])

    def call(a, b):
        nbatch = a.shape[1]
        tile = S * 128
        npad = -(-nbatch // tile) * tile
        grid = npad // tile
        bspec = pl.BlockSpec((L, S, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        a = a.reshape(L, npad // 128, 128)
        b = b.reshape(L, npad // 128, 128)
        out = pl.pallas_call(
            kernel, grid=(grid,), in_specs=[bspec, bspec], out_specs=bspec,
            out_shape=jax.ShapeDtypeStruct((L, npad // 128, 128), jnp.uint32),
        )(a, b)
        return out.reshape(L, npad)[:, :nbatch]
    return call


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.PRNGKey(0)
    n = 1 << 20
    a = limb.to_mont(spec, limb.random(spec, key, (n,)))
    b = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (n,)))

    if which in ("all", "mul"):
        print("== mont_mul variants @ 2^20 (chain-diff, fori) ==")
        for S, scratch in ((8, False), (16, False), (32, True), (32, False)):
            call = mont_mul_variant(S, scratch)
            try:
                dt = chain_time(lambda x: call(x, b), a)
            except Exception as e:
                print(f"S={S} scratch={scratch}: FAIL {type(e).__name__} {str(e)[:100]}")
                continue
            print(f"S={S} scratch={scratch}: {dt*1e3:.3f} ms -> {n/dt/1e6:.0f} M muls/s")
        dt = chain_time(lambda x: limb_pallas.mont_mul_pallas(spec, x, b), a)
        print(f"production (S=32 scratch): {dt*1e3:.3f} ms -> {n/dt/1e6:.0f} M muls/s")

    if which in ("all", "sortgather"):
        print("== sort / gather @ 2^20 ==")
        digits = jax.random.randint(key, (1, n), 0, 4096, dtype=jnp.int32)
        vals = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None] << 1,
                                (1, n))
        dt = chain_time(
            lambda dv: jax.lax.sort_key_val(dv[0] + 1, dv[1], dimension=1),
            (digits, vals), n_long=16, n_short=2)
        print(f"sort_key_val (1, 2^20): {dt*1e3:.3f} ms = {dt/n*1e9:.2f} ns/elt")

        stacked = jnp.concatenate([a, b], axis=0)  # 32 planes
        perm = jax.random.permutation(key, n).astype(jnp.int32)
        dt = chain_time(lambda s: jnp.take(s, perm, axis=1, mode="clip"),
                        stacked, n_long=16, n_short=2)
        print(f"gather 32 planes x 2^20: {dt*1e3:.3f} ms = {dt/n*1e9:.2f} ns/idx")

    if which in ("all", "curve"):
        print("== fused curve add (chain-diff, fori) ==")
        from myzkp_tpu.curves import bn254, curve_pallas
        b3 = bn254.g1_b3(())
        b3v = b3.reshape(L, -1)[:, 0]
        for lw in (13, 15, 17, 20):
            width = 1 << lw
            qx = b[:, :width]; qy = a[:, :width]
            h = jnp.zeros((width,), bool)
            init = (a[:, :width], b[:, :width], limb.one_mont(spec, (width,)))

            def step(xyz, qx=qx, qy=qy, h=h):
                return curve_pallas.padd_mixed_sel_fused(
                    spec, *xyz, qx, qy, h, b3v)
            nl, ns = (64, 8) if lw < 18 else (16, 2)
            dt = chain_time(step, init, n_long=nl, n_short=ns)
            print(f"padd_mixed_sel 2^{lw}: {dt*1e3:.3f} ms -> "
                  f"{width/dt/1e6:.1f} M adds/s = {width*13/dt/1e6:.0f} M muls/s eq")


if __name__ == "__main__":
    main()
