"""Vary the number of fused stages inside the leaf kernel: where do 10 ms go?"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from myzkp_tpu.fields import limb
from myzkp_tpu.fields.spec import bn254_r_spec
from myzkp_tpu.fields.tile_ops import TileFp
from myzkp_tpu.ops import ntt as nt

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
spec = bn254_r_spec()
N = 1 << 20
L = spec.L

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
            t0 = time.perf_counter(); _fetch(f(init, *consts)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(n_long) - t(n_short)) / (n_long - n_short)

def make_kernel(m, nstages):
    tF = TileFp(spec, use_scratch=True)
    def kernel(x_ref, t_ref, o_ref):
        x = x_ref[...].reshape(L, 1, m, 128)
        off, c = 0, m
        for _ in range(nstages):
            h = c // 2
            u = x[:, :, :h, :]; v = x[:, :, h:, :]
            tw = t_ref[:, off:off + h, :].reshape(L, 1, h, 1)
            su = tF.add(u, v); sv = tF.mul(tF.sub(u, v), tw)
            x = jnp.concatenate([su, sv], axis=1)
            off += h; c = h
        o_ref[...] = x.reshape(L, 1, m, 128)
    return kernel

@functools.partial(jax.jit, static_argnums=(1, 2))
def leaf(x, m, nstages, tw):
    E, B = x.shape[1], x.shape[3]
    bspec = pl.BlockSpec((L, 1, m, 128), lambda e, i: (0, e, 0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((L, m, 1), lambda e, i: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(make_kernel(m, nstages), grid=(E, B // 128),
        in_specs=[bspec, tspec], out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(x, tw)

def main():
    a = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(3), (N,)))
    m = 128
    x4 = a.reshape(L, 1, m, N // m)
    tw = jnp.asarray(nt._leaf_twiddles_np(spec, m, False))
    for ns in (1, 2, 3, 5, 7):
        dt = chain(lambda i, x, t: leaf(x, m, ns, t), x4, consts=(tw,))
        print(f"m=128 nstages={ns}: {dt*1e3:6.2f} ms", flush=True)

if __name__ == "__main__":
    main()
