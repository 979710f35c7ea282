"""Scatter layout microbench: lane-axis vs row-major at MSM shapes."""
import functools, sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np

def fetch(o):
    return np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]

def time_fetch(fn, *a, reps=3):
    out = fn(*a); fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*a); fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)

def chain(step, init, n_long=10, n_short=2):
    @jax.jit
    def run(N, x0):
        x = jax.lax.fori_loop(0, N, lambda i, x: step(i, x), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]
    tl = time_fetch(functools.partial(run, n_long), init)
    ts = time_fetch(functools.partial(run, n_short), init)
    return (tl - ts) / (n_long - n_short)

L = 16
nidx = 1 << 21          # flush scatter volume per group (G*n)
slots = 2 * 32770       # G * slots at c=16
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (nidx,), 0, slots, dtype=jnp.int32)

# 1. lane-axis scatter of 3 coord planes (current code shape)
vals = jnp.ones((L, nidx), jnp.uint32)
bk = jnp.zeros((L, slots), jnp.uint32)
def s_lane(i, b):
    out = b.at[:, idx].set(vals + i.astype(jnp.uint32), mode="drop")
    for _ in range(2):
        out = out.at[:, idx].set(vals, mode="drop")
    return out
dt = chain(s_lane, bk, n_long=4, n_short=1)
print(f"lane-axis scatter 3x(L,{nidx}): {dt*1e3:.1f} ms", flush=True)

# 2. row-major scatter of one (nidx, 64) row block
rvals = jnp.ones((nidx, 64), jnp.uint32)
rbk = jnp.zeros((slots, 64), jnp.uint32)
def s_row(i, b):
    return b.at[idx].set(rvals + i.astype(jnp.uint32), mode="drop")
dt = chain(s_row, rbk, n_long=6, n_short=1)
print(f"row scatter ({nidx},64): {dt*1e3:.1f} ms", flush=True)

# 3. row gather at merge shape for reference (2^15 idx)
midx = jax.random.randint(key, (1 << 15,), 0, slots, dtype=jnp.int32)
def g_row(i, b):
    g = jnp.take(b, midx, axis=0)
    return b.at[0, 0].set(g[0, 0] + i.astype(jnp.uint32))
dt = chain(g_row, rbk, n_long=10, n_short=2)
print(f"row gather (2^15,64): {dt*1e3:.2f} ms", flush=True)
