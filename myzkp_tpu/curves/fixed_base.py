"""Fixed-base batched scalar multiplication via windowed tables.

The trusted-setup bottleneck: every proving-key vector is [x_i]G for ONE
fixed generator G (pinocchio.rs:65-136 computes these as per-element
double-and-add).  Round-3's device path ran a 256-step double-and-add scan
over the whole batch (~500 wide EC ops per point, 250-490 s at the 2^20-QAP
setup size).  For a FIXED base that is ~16x too much work: precompute the
windowed multiples

    T[j, d] = [d * 2^(c*j)] G          j < W = ceil(256/c),  d < 2^c

once per (group, c) — a host-side table of W * 2^c points, disk-cached —
and each batch element becomes W row-gathers + a (W -> 1) tree of batched
complete adds: ~31 wide EC adds per point at c = 8 instead of ~500.

The same path generates bench.py's random MSM point set ([m_i]G) without
the minutes-long 2^20-wide ladder compile.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import curve_pallas, msm as _msm, weierstrass as wst

_TABLE_C = 8  # window bits: W = 32 windows, 2^8 entries each
# Points per jitted call (one compiled shape, bounded temps).  G2 rows are
# 2x wider than G1's (Fq2 coordinates: 6 limb planes vs 3), and the 2^18
# chunk that fits for G1 is a measured 19.01 GB HBM program for G2 on a
# 15.75 GB v5e — the relay's compile helper surfaces that OOM as an
# opaque "HTTP 500: tpu_compile_helper subprocess exit code 1", which
# blocked every 2^20 trusted setup until diagnosed (2026-08-21).  2^16
# gives G2 a 4x headroom (~4.75 GB).
_CHUNK = {"g1": 1 << 18, "g2": 1 << 16}


def _cache_dir() -> str:
    return os.environ.get("MYZKP_TABLE_CACHE", "/tmp/myzkp_fixed_base")


def _build_host_table(which: str, c: int):
    """[d * 2^(c*j)]G as host PyPoints, row-major (j major, d minor)."""
    from . import bn254

    gen = bn254.g1_generator() if which == "g1" else bn254.g2_generator()
    base = gen
    rows = []
    for _ in range(-(-256 // c)):
        acc = None  # infinity
        rows.append(None)
        for _ in range((1 << c) - 1):
            acc = base if acc is None else acc + base
            rows.append(acc)
        for _ in range(c):
            base = base + base
    return rows


@functools.lru_cache(maxsize=None)
def _device_table(which: str, c: int = _TABLE_C) -> wst.Point:
    """Device point batch (W * 2^c,) of the windowed multiples, disk-cached."""
    from . import bn254

    to_dev = (bn254.g1_points_to_device if which == "g1"
              else bn254.g2_points_to_device)
    path = os.path.join(_cache_dir(), f"{which}_c{c}.npz")
    if os.path.exists(path):
        try:
            data = np.load(path)
            leaves = [jnp.asarray(data[f"l{i}"]) for i in range(len(data.files))]
            if which == "g1":
                return wst.Point(*leaves)
            return wst.Point((leaves[0], leaves[1]), (leaves[2], leaves[3]),
                             (leaves[4], leaves[5]))
        except Exception:
            pass  # rebuild on any cache corruption
    pts = to_dev(_build_host_table(which, c))
    try:
        os.makedirs(_cache_dir(), exist_ok=True)
        leaves = jax.tree_util.tree_leaves(pts)
        tmp = f"{path}.tmp{os.getpid()}.npz"  # np.savez appends .npz itself
        np.savez(tmp, **{f"l{i}": np.asarray(v) for i, v in enumerate(leaves)})
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort
    return pts


@functools.lru_cache(maxsize=None)
def _table_rows(which: str, c: int = _TABLE_C):
    """Row-major (W * 2^c, lanes) uint32 gather table + (treedef, C)."""
    rows, treedef, C = _msm._rows_of_point(_device_table(which, c))
    return rows, treedef, C


@functools.lru_cache(maxsize=None)
def _jitted_gather_sum(which: str, W: int, slots: int):
    """One compiled program per (group, table shape): gather W window rows
    per scalar from the row-major table and tree-sum them."""
    from . import bn254

    if which == "g1":
        F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    else:
        F, b3 = bn254.g2_ops(), bn254.g2_b3(())
    _, treedef, C = _table_rows(which)  # static structure only

    @jax.jit
    def run(rows, digits):
        # digits: (W, n) int32; rows: (W * slots, lanes) row-major table
        n = digits.shape[1]
        idx = digits + (jnp.arange(W, dtype=jnp.int32) * slots)[:, None]
        g = jnp.take(rows, idx.reshape(-1), axis=0)  # (W*n, lanes)
        pts = _msm._point_of_rows(g, treedef, C, (W, n))
        import contextlib

        ctx = (curve_pallas.no_fuse() if which == "g2"
               else contextlib.nullcontext())
        with ctx:
            # G2's fused Fq2 kernel pays minutes of Mosaic lowering per
            # distinct shape; the log2(W) tree levels are 5 such shapes.
            # The pure-JAX path lowers fast and this is setup-side code.
            return tuple(wst.tree_sum(F, b3, pts, axis=0))

    return run


def fixed_base_multi(which: str, scalars_std, c: int = _TABLE_C) -> wst.Point:
    """[x_i]G for the group generator; scalars_std: (L, n) standard-domain
    16-bit limbs.  Returns a projective (n,) point batch.

    Replaces the per-batch 256-step double-and-add (the reference's only
    algorithm, curve.rs:163-191) with table gathers + log2(W) batched adds.
    """
    rows, _, _ = _table_rows(which, c)
    digits = _msm.scalar_digits(scalars_std, c)  # (W, n) int32
    W = digits.shape[0]
    slots = 1 << c
    n = digits.shape[1]
    run = _jitted_gather_sum(which, W, slots)
    chunk = _CHUNK[which]
    if n <= chunk:
        return wst.Point(*run(rows, digits))
    n_pad = -(-n // chunk) * chunk
    digits = jnp.pad(digits, ((0, 0), (0, n_pad - n)))  # d=0 -> infinity
    outs = [wst.Point(*run(rows, digits[:, off:off + chunk]))
            for off in range(0, n_pad, chunk)]
    cat = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=1),
                                 *outs)
    return jax.tree_util.tree_map(lambda a: a[:, :n], cat)
