"""r5 probe behind docs/speed_of_light.md's 2^20 MSM cost ledger.

Times (A) the production bucket-scan kernel standalone, (B) a plane-major
variant with XLA-side transposes, (C) a bare K-step scan of the fused
complete-add, all at the 2^20 auto group shape.  Fetch ONE element per
output — fetching the 512 MB flush array measures the relay, not the chip
(the first run of this probe reported 19 s for a 73 ms kernel that way).
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from myzkp_tpu.curves import bn254, curve_pallas as cp, weierstrass as wst
from myzkp_tpu.fields.tile_ops import TileFp

spec = bn254.q_spec()
L = spec.L; C = 3*L
K, T = 64, 32
NL = T * 1024              # 32768 lanes (the 2^20 auto shape)
lanes_pad = 64
rng = np.random.default_rng(0)
# synthetic limb data < 2^16 (valid limb range; values don't matter for timing)
rows = jnp.asarray(rng.integers(0, 1<<16, (K*NL, lanes_pad), dtype=np.uint32))
tag = jnp.asarray(rng.integers(0, 4, (K*NL,), dtype=np.int32))
b3c = bn254.g1_b3(()).reshape(L, -1)[:, 0]

def fetch(o):
    # one element per leaf: forces execution without relaying 512MB to host
    for x in jax.tree_util.tree_leaves(o):
        np.asarray(x).ravel()[:1] if x.ndim == 0 else np.asarray(x[(0,)*x.ndim])

def timeit(name, fn, *args):
    t0=time.perf_counter(); out=fn(*args); fetch(out)
    comp=time.perf_counter()-t0
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); out=fn(*args); fetch(out); ts.append(time.perf_counter()-t0)
    print(f"{name}: steady {min(ts)*1e3:7.1f} ms  compile {comp:5.0f}s", flush=True)
    return out

# A) current kernel
runA = jax.jit(lambda r, t: cp.bucket_scan_rows(spec, r, t, b3c, K))
timeit("A rows-kernel (in-kernel transpose)", runA, rows, tag)

# B) plane-major variant: XLA pre-transpose, kernel without transposes
@functools.lru_cache(maxsize=None)
def make_pm_kernel():
    tF = TileFp(spec, use_scratch=True)
    S = 8
    def kernel(q_ref, tag_ref, b3_ref, acc_ref, flush_ref, carry_ref):
        k = pl.program_id(1)
        one = tF.const(1, jnp.zeros((L, S, 128), jnp.uint32))
        @pl.when(k == 0)
        def _init():
            inf = jnp.concatenate([jnp.zeros((L,S,128), jnp.uint32), one,
                                   jnp.zeros((L,S,128), jnp.uint32)], axis=0)
            carry_ref[...] = inf.reshape(C, S, 128)
        q = q_ref[...].reshape(C, S, 128)
        qx, qy, qz = q[:L], q[L:2*L], q[2*L:]
        tg = tag_ref[...].reshape(S, 128)
        qy = tF.select((tg & 1) > 0, tF.neg(qy), qy)
        acc = carry_ref[...]
        p = (acc[:L], acc[L:2*L], acc[2*L:])
        flush_ref[...] = acc.reshape(1, 1, C, S, 128)
        r = wst.padd(tF, tF.load(b3_ref), wst.Point(*p), wst.Point(qx, qy, qz))
        head = (tg >> 1) > 0
        r = tuple(tF.select(head, qi, ri) for qi, ri in zip((qx,qy,qz), r))
        new_acc = jnp.concatenate(r, axis=0).reshape(C, S, 128)
        carry_ref[...] = new_acc
        @pl.when(k == K - 1)
        def _final():
            acc_ref[...] = new_acc
    return kernel

def run_pm(rows_sm, tg):
    S = 8
    # XLA transpose: (K*NL, lanes_pad) -> planes (K, T, C, S, 128)
    planes = rows_sm[:, :C].T.reshape(C, K, NL).transpose(1, 0, 2)  # (K, C, NL)
    q5 = planes.reshape(K, C, T, S*128).transpose(0, 2, 1, 3).reshape(K, T, C, S, 128)
    tag4 = tg.astype(jnp.int32).reshape(K, T*S, 128)
    b3b = jnp.broadcast_to(b3c.reshape(L,1,1), (L, S, 128))
    acc, flush = pl.pallas_call(
        make_pm_kernel(),
        grid=(T, K),
        in_specs=[
            pl.BlockSpec((1, 1, C, S, 128), lambda t, k: (k, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda t, k: (k, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, S, 128), lambda t, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, S, 128), lambda t, k: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, S, 128), lambda t, k: (k, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, T*8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((K, T, C, S, 128), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((C, 8, 128), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100*1024*1024),
    )(q5, tag4, b3b)
    # transpose flush back to rows for the scatter (include the cost)
    fr = flush.reshape(K*NL//1024, 1024, C)  # wrong-ish but measures traffic
    return acc, fr

runB = jax.jit(run_pm)
timeit("B plane-major (XLA transposes)    ", runB, rows, tag)

# C) floor: same #adds through padd_sel_fused at 32768-lane width, K steps
x = jnp.asarray(rng.integers(0, 1<<16, (L, NL), dtype=np.uint32))
h = jnp.zeros((NL,), bool)
b3v = b3c
def run_floor(px, py, pz):
    def body(carry, _):
        cx, cy, czz = carry
        r = cp.padd_sel_fused(spec, cx, cy, czz, px, py, pz, h, b3v)
        return r, None
    out, _ = jax.lax.scan(body, (px, py, pz), None, length=K)
    return out
runC = jax.jit(run_floor)
timeit("C floor: K-step scan of fused padd", runC, x, x, x)
