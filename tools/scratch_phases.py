"""Phase breakdown of msm_pippenger at 2^20 on the chip (chain-diff)."""
import functools
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from myzkp_tpu.curves import bn254, msm as M, weierstrass as wst
from myzkp_tpu.fields import limb

qspec = bn254.q_spec()
rspec = bn254.r_spec()
F, b3 = bn254.g1_ops(), bn254.g1_b3(())
L = qspec.L

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 20
C = int(sys.argv[2]) if len(sys.argv) > 2 else 0
n = 1 << LOGN


def fetch(o):
    return np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]


def time_fetch(fn, *a, reps=2):
    out = fn(*a); fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*a); fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain(step, init, n_long=6, n_short=1):
    @jax.jit
    def run(N, x0):
        x = jax.lax.fori_loop(0, N, lambda i, x: step(i, x), x0)
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]
    tl = time_fetch(functools.partial(run, n_long), init)
    ts = time_fetch(functools.partial(run, n_short), init)
    return (tl - ts) / (n_long - n_short)


# fake but valid-shape data (timing only; field values irrelevant except
# they must stay < p for termination-free kernels — use random mod p)
key = jax.random.PRNGKey(0)
px = limb.to_mont(qspec, limb.random(qspec, key, (n,)))
py = limb.to_mont(qspec, limb.random(qspec, jax.random.PRNGKey(1), (n,)))
pz = limb.one_mont(qspec, (n,))
s = limb.random(rspec, jax.random.PRNGKey(2), (n,))

c = C or M.default_window(n, True)
half = 1 << (c - 1)
num_buckets = half + 1
W = -(-256 // c)
G = M._group_size(n, W, num_buckets + 1)
G = min(G, W)
K = int(min(n, max(8, M._next_pow2(G * n // (1 << 15)))))
print(f"n=2^{LOGN} c={c} W={W} G={G} K={K} B={n//K}", flush=True)


def phase_digits_sort(i, s_in):
    digits = M.scalar_digits(s_in, c)
    digits, dneg = M.signed_digits(digits, c)
    Wd = digits.shape[0]
    W_pad = ((Wd + G - 1) // G) * G
    if W_pad != Wd:
        digits = jnp.pad(digits, ((0, W_pad - Wd), (0, 0)))
        dneg = jnp.pad(dneg, ((0, W_pad - Wd), (0, 0)))
    iota = jnp.arange(n, dtype=jnp.int32)
    vals = jnp.broadcast_to(iota[None] << 1, digits.shape) | dneg.astype(jnp.int32)
    d_s, v_s = jax.lax.sort_key_val(digits, vals, dimension=1)
    return s_in.at[0, 0].set((d_s[0, 0].astype(jnp.uint32) + v_s[0, 0]
                              .astype(jnp.uint32) + i.astype(jnp.uint32))
                             & jnp.uint32(0x7FFF))

dt = chain(phase_digits_sort, s)
print(f"digits+signed+sort (all {W} windows): {dt*1e3:.1f} ms", flush=True)

# to_affine
def phase_affine(i, xyz):
    ax, ay, inf = wst.to_affine(F, wst.Point(*xyz), axis=0)
    return (ax, ay, xyz[2].at[0, 0].set((xyz[2][0, 0] + i.astype(jnp.uint32))
                                        & jnp.uint32(0x7FFF)))

dt = chain(phase_affine, (px, py, pz), n_long=4)
print(f"to_affine (batch inv 2^20): {dt*1e3:.1f} ms", flush=True)

# full msm for reference
def phase_full(i, carry):
    s2 = s.at[0, 0].set((carry[0][0] + i.astype(jnp.uint32)) & jnp.uint32(0x7FFF))
    return tuple(M.msm_pippenger(F, b3, wst.Point(px, py, pz), s2,
                                 **({"c": C} if C else {})))

init = (px[:, 0] * 0, py[:, 0] * 0, pz[:, 0] * 0)
dt_full = chain(phase_full, init, n_long=4)
print(f"FULL msm: {dt_full*1e3:.1f} ms -> {n/dt_full/1e3:.0f} k pts/s",
      flush=True)

# bucket-accumulate only (gather + scan + scatter + lane merge), one group
rows = jnp.concatenate([px, py], axis=0).T
Cw = rows.shape[1]
lanes = -(-Cw // 64) * 64
if lanes != Cw:
    rows = jnp.pad(rows, ((0, 0), (0, lanes - Cw)))
d_g = jax.random.randint(key, (G, n), 0, half + 1, dtype=jnp.int32)
d_g = jax.lax.sort(d_g, dimension=1)
v_g = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None] << 1, (G, n))


def phase_bucket(i, dv):
    d_s, v_s = dv
    perm = v_s >> 1
    g_rows = jnp.take(rows, perm.reshape(-1), axis=0, mode="clip")
    g = g_rows[:, :Cw].T.reshape(Cw, G, n)
    qx, qy = jnp.split(g, 2, axis=0)
    nsort = (v_s & 1) > 0
    qy = F.select(nsort, F.neg(qy), qy)
    buckets = M._bucket_accumulate(F, b3, qx, qy, d_s, num_buckets, K)
    leaf = buckets[0]
    return (d_s.at[0, 0].set((d_s[0, 0] + leaf[0, 0, 0].astype(jnp.int32)
                              + i.astype(jnp.int32)) % 3),
            v_s)

dt_b = chain(phase_bucket, (d_g, v_g), n_long=5)
print(f"bucket_accumulate 1 group (G={G}): {dt_b*1e3:.1f} ms "
      f"(x{-(-W//G)} groups = {dt_b*(-(-W//G))*1e3:.0f} ms)", flush=True)

# gather-only within group shape
def phase_gather(i, v_s):
    perm = v_s >> 1
    g_rows = jnp.take(rows, perm.reshape(-1), axis=0, mode="clip")
    g = g_rows[:, :Cw].T.reshape(Cw, G, n)
    return v_s.at[0, 0].set((g[0, 0, 0].astype(jnp.int32) + i.astype(jnp.int32)))

dt_g = chain(phase_gather, v_g, n_long=5)
print(f"gather+transpose 1 group: {dt_g*1e3:.1f} ms "
      f"(x{-(-W//G)} groups = {dt_g*(-(-W//G))*1e3:.0f} ms)", flush=True)

# weighted bucket sum per group
bk = wst.infinity(F, (G, num_buckets))
def phase_wsum(i, bkx):
    main = jax.tree_util.tree_map(lambda a: a[..., :half], wst.Point(*bkx))
    sw = M._weighted_bucket_sum(F, b3, main, c - 1)
    return tuple(jax.tree_util.tree_map(
        lambda a, sb: a.at[0, 0, 0].set(sb[0, 0] + i.astype(jnp.uint32)),
        wst.Point(*bkx), sw))

dt_w = chain(phase_wsum, tuple(bk), n_long=4)
print(f"weighted_bucket_sum 1 group: {dt_w*1e3:.1f} ms "
      f"(x{-(-W//G)} groups = {dt_w*(-(-W//G))*1e3:.0f} ms)", flush=True)
