"""Timing with a forced host fetch (device->host of 1 value)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

def timeit_fetch(fn, *args, reps=5):
    """Time fn via fetching a scalar from the output to host each rep."""
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps

f_nop = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8, 128))
print(f"tiny op: {timeit_fetch(f_nop, x)*1e3:.3f} ms")

a = jnp.ones((4096, 4096), jnp.bfloat16)
f_mm = jax.jit(lambda a: (a @ a)[:1, :1])
dt = timeit_fetch(f_mm, a)
print(f"4096^3 bf16 matmul: {dt*1e3:.3f} ms = {2*4096**3/dt/1e12:.1f} TFLOP/s")

f_mm8 = jax.jit(lambda a: ((((a @ a) @ a) @ a @ a) @ a @ a @ a)[:1, :1])
dt = timeit_fetch(f_mm8, a)
print(f"7-chain 4096^3 bf16 matmul: {dt*1e3:.3f} ms = {7*2*4096**3/dt/1e12:.1f} TFLOP/s")

b = jnp.ones((1 << 28,), jnp.float32)
f_cp = jax.jit(lambda b: (b * 2.0).reshape(1 << 14, 1 << 14)[:1, :1])
dt = timeit_fetch(f_cp, b)
print(f"1GiB elementwise: {dt*1e3:.3f} ms = {2*(1<<30)/dt/1e9:.0f} GB/s")

d = jax.random.randint(jax.random.PRNGKey(0), (1, 1 << 20), 0, 4096, jnp.int32)
v = jnp.broadcast_to(jnp.arange(1 << 20, dtype=jnp.int32)[None], (1, 1 << 20))
f_sort = jax.jit(lambda d, v: jax.lax.sort_key_val(d, v, dimension=1)[0][:, :1])
dt = timeit_fetch(f_sort, d, v)
print(f"sort 2^20: {dt*1e3:.3f} ms")

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from myzkp_tpu.fields.spec import bn254_q_spec
from myzkp_tpu.fields import limb, limb_pallas
spec = bn254_q_spec()
n = 1 << 20
a1 = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (n,)))
b1 = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(2), (n,)))
f_m = jax.jit(lambda a, b: limb_pallas.mont_mul_pallas(spec, a, b)[:1, :1])
dt = timeit_fetch(f_m, a1, b1)
print(f"mont_mul 2^20: {dt*1e3:.3f} ms = {n/dt/1e6:.0f} M muls/s")

def mchain(a, b):
    for _ in range(20):
        a = limb_pallas.mont_mul_pallas(spec, a, b)
    return a[:1, :1]
f_mc = jax.jit(mchain)
dt = timeit_fetch(f_mc, a1, b1)
print(f"20x chained mont_mul 2^20: {dt*1e3:.3f} ms = {20*n/dt/1e6:.0f} M muls/s")
