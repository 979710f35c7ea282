"""Gather / sort layout variants @ 2^20."""
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


n = 1 << 20
key = jax.random.PRNGKey(0)
a = limb.to_mont(spec, limb.random(spec, key, (n,)))
b = limb.to_mont(spec, limb.random(spec, jax.random.PRNGKey(1), (n,)))
stacked = jnp.concatenate([a, b], axis=0)         # (32, n) plane-major
rows = jax.jit(lambda s: s.T.copy() if hasattr(s.T, "copy") else s.T)(stacked)  # (n, 32) on device
rows128 = jnp.pad(rows, ((0, 0), (0, 96)))          # (n, 128)
perm = jax.random.permutation(key, n).astype(jnp.int32)

import sys
print("setup done", flush=True)
print("gather variants @ 2^20, 32 u32 per point:")
dt = chain_time(lambda s: jnp.take(s, perm, axis=1, mode="clip") + 1, stacked)
print(f"  plane-major take axis=1: {dt*1e3:.2f} ms = {dt/n*1e9:.2f} ns/idx")
dt = chain_time(lambda r: jnp.take(r, perm, axis=0, mode="clip") + 1, rows)
print(f"  row-major (n,32) take axis=0: {dt*1e3:.2f} ms = {dt/n*1e9:.2f} ns/idx")
dt = chain_time(lambda r: jnp.take(r, perm, axis=0, mode="clip") + 1, rows128)
print(f"  row-major (n,128) take axis=0: {dt*1e3:.2f} ms = {dt/n*1e9:.2f} ns/idx")

# one-hot matmul gather for comparison at block level is infeasible (n x n)

print("sort variants @ 2^20:")
digits = jax.random.randint(key, (1, n), 0, 1 << 12, dtype=jnp.int32)
vals = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None] << 1, (1, n))
dt = chain_time(lambda dv: jax.lax.sort_key_val(dv[0] + 1, dv[1], dimension=1),
                (digits, vals))
print(f"  sort_key_val i32/i32: {dt*1e3:.2f} ms")
packed = (digits.astype(jnp.uint32) << 20) | jnp.arange(n, dtype=jnp.uint32)[None]
dt = chain_time(lambda p: jnp.sort(p + 1, axis=1), packed)
print(f"  single u32 packed sort: {dt*1e3:.2f} ms")
# batched 4-row sort (amortization check)
d4 = jnp.broadcast_to(digits, (4, n)) + jnp.arange(4, dtype=jnp.int32)[:, None]
v4 = jnp.broadcast_to(vals, (4, n))
dt = chain_time(lambda dv: jax.lax.sort_key_val(dv[0] + 1, dv[1], dimension=1),
                (d4, v4), n_long=8, n_short=2)
print(f"  sort_key_val 4 rows: {dt*1e3:.2f} ms = {dt/4*1e3:.2f} ms/row")

# sort carrying the full 32-plane payload (sort points directly)
ops = [digits[0]] + [stacked[i] for i in range(32)]
def sort_full(xs):
    out = jax.lax.sort(tuple(xs), dimension=0, num_keys=1)
    return (out[0] + 1,) + tuple(out[1:])
dt = chain_time(sort_full, tuple(ops), n_long=6, n_short=2)
print(f"  sort with 32-plane payload: {dt*1e3:.2f} ms")
