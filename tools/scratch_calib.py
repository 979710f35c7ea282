"""Calibrate timing on the axon TPU: known-cost workloads."""
import time
import jax
import jax.numpy as jnp

def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

# dispatch floor: trivial op
f_nop = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8, 128))
print(f"tiny op: {timeit(f_nop, x)*1e3:.3f} ms")

# known FLOPs: 4096^3 bf16 matmul = 137 GFLOP
a = jnp.ones((4096, 4096), jnp.bfloat16)
f_mm = jax.jit(lambda a: a @ a)
dt = timeit(f_mm, a)
print(f"4096^3 bf16 matmul: {dt*1e3:.3f} ms = {2*4096**3/dt/1e12:.1f} TFLOP/s")

# known bandwidth: copy 1 GiB (read+write 2 GiB)
b = jnp.ones((1 << 28,), jnp.float32)  # 1 GiB
f_cp = jax.jit(lambda b: b * 2.0)
dt = timeit(f_cp, b)
print(f"1GiB elementwise: {dt*1e3:.3f} ms = {2*(1<<30)/dt/1e9:.0f} GB/s")

# sort 2^20 again with more reps
d = jax.random.randint(jax.random.PRNGKey(0), (1, 1 << 20), 0, 4096, jnp.int32)
v = jnp.broadcast_to(jnp.arange(1 << 20, dtype=jnp.int32)[None], (1, 1 << 20))
f_sort = jax.jit(lambda d, v: jax.lax.sort_key_val(d, v, dimension=1))
dt = timeit(f_sort, d, v)
print(f"sort 2^20: {dt*1e3:.3f} ms")

# chain of 20 sorts to amortize dispatch: measures real per-sort cost
def chain(d, v):
    for _ in range(20):
        d, v = jax.lax.sort_key_val(d, v, dimension=1)
        d = d + 1
    return d, v
f_chain = jax.jit(chain)
dt = timeit(f_chain, d, v, reps=5)
print(f"20x chained sort 2^20: {dt*1e3:.3f} ms = {dt/20*1e3:.3f} ms/sort")

# chain of 20 mont_muls
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from myzkp_tpu.fields.spec import bn254_q_spec
from myzkp_tpu.fields import limb, limb_pallas
spec = bn254_q_spec()
a1 = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (1 << 20,)))
b1 = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(2), (1 << 20,)))
def mchain(a, b):
    for _ in range(20):
        a = limb_pallas.mont_mul_pallas(spec, a, b)
    return a
f_mc = jax.jit(mchain)
dt = timeit(f_mc, a1, b1, reps=5)
n = 1 << 20
print(f"20x chained mont_mul 2^20: {dt*1e3:.3f} ms = {20*n/dt/1e6:.0f} M muls/s")
