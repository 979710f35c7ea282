"""More gather variants + unrolled curve kernel compile/runtime."""
import functools
import sys, os, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from myzkp_tpu.fields.spec import bn254_q_spec
from myzkp_tpu.fields import limb

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


def chain_time(step, init, n_long=16, n_short=2, reps=3):
    @functools.partial(jax.jit, static_argnums=0)
    def run(N, x0):
        x = jax.lax.fori_loop(0, N, lambda i, x: step(x), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]
    tl = time_fetch(functools.partial(run, n_long), init, reps=reps)
    ts = time_fetch(functools.partial(run, n_short), init, reps=reps)
    return (tl - ts) / (n_long - n_short)


which = sys.argv[1] if len(sys.argv) > 1 else "gather"
n = 1 << 20
key = jax.random.PRNGKey(0)
perm = jax.random.permutation(key, n).astype(jnp.int32)

if which == "gather":
    r128_16 = jnp.zeros((n, 128), jnp.uint16)
    dt = chain_time(lambda r: jnp.take(r, perm, axis=0, mode="clip") + 1,
                    r128_16)
    print(f"u16 (n,128) gather: {dt*1e3:.2f} ms", flush=True)
    r64_32 = jnp.zeros((n, 64), jnp.uint32)
    dt = chain_time(lambda r: jnp.take(r, perm, axis=0, mode="clip") + 1,
                    r64_32)
    print(f"u32 (n,64) gather: {dt*1e3:.2f} ms", flush=True)
    r256_16 = jnp.zeros((n, 256), jnp.uint16)
    dt = chain_time(lambda r: jnp.take(r, perm, axis=0, mode="clip") + 1,
                    r256_16)
    print(f"u16 (n,256) gather: {dt*1e3:.2f} ms", flush=True)

if which == "unroll":
    # unrolled (no-scratch) mixed-add-select kernel: compile time + runtime
    from myzkp_tpu.fields.tile_ops import TileFp
    from myzkp_tpu.curves import bn254, weierstrass as wstm
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b3 = bn254.g1_b3(())
    b3v = b3.reshape(L, -1)[:, 0]
    S = 8

    for scratch in (False, True):
        tF = TileFp(spec, use_scratch=scratch)

        def kernel(x1, y1, z1, qx, qy, h, b3r, ox, oy, oz, tF=tF):
            p = tuple(tF.load(r) for r in (x1, y1, z1))
            qxv, qyv = tF.load(qx), tF.load(qy)
            r = wstm.padd_mixed(tF, tF.load(b3r), wstm.Point(*p), qxv, qyv)
            mask = h[0] > 0
            q = (qxv, qyv, tF.one_like(qxv))
            r = tuple(tF.select(mask, qi, ri) for qi, ri in zip(q, r))
            for ref, val in zip((ox, oy, oz), r):
                tF.store(ref, val)

        width = 1 << 15
        npl = width // 128
        bspec = pl.BlockSpec((L, S, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)

        def call(x, y, z, qx, qy, h, kernel=kernel, npl=npl):
            outs = pl.pallas_call(
                kernel, grid=(npl // S,),
                in_specs=[bspec] * 7, out_specs=(bspec,) * 3,
                out_shape=tuple(jax.ShapeDtypeStruct((L, npl, 128), jnp.uint32)
                                for _ in range(3)),
            )(x, y, z, qx, qy, h, jnp.broadcast_to(
                b3v.reshape(L, 1, 1), (L, S, 128)))
            return outs

        a = limb.to_mont(spec, limb.random(spec, key, (npl, 128)))
        b = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1),
                                           (npl, 128)))
        one = limb.one_mont(spec, (npl, 128))
        h = jnp.zeros((L, npl, 128), jnp.uint32)

        t0 = time.perf_counter()
        dt = chain_time(lambda xyz: call(*xyz, a, b, h),
                        (a, b, one), n_long=64, n_short=8)
        total = time.perf_counter() - t0
        print(f"scratch={scratch}: {dt*1e3:.3f} ms -> "
              f"{width/dt/1e6:.1f} M adds/s (wall incl compile {total:.0f}s)",
              flush=True)
