"""Number-theoretic transform and fast polynomial algebra on TPU.

Capability parity with myzkp/src/modules/algebra/ntt.rs (recursive, clone-heavy
radix-2 at ntt.rs:7-48) — re-designed as an iterative *Stockham self-sorting*
radix-2 transform: log2(n) stages, each ONE full-width fused-butterfly kernel
over contiguous slabs (split the block axis in halves, butterfly, concatenate
— never a strided interleave), with per-stage twiddles precomputed host-side
in Montgomery form.  Stockham autosorts, so natural-order results need no
bit-reversal gather at any point.  Sizes >= 2^15 additionally decompose
four-step (n = n1*n2: column transforms, twiddle, one transpose, row
transforms) so every butterfly stage moves lane-aligned slabs of >= n1
elements.

Root-of-unity discovery runs host-side with Python ints (no factoring needed:
try small generators g and check g^((p-1)/2^k) has exact order 2^k), matching
the reference's hard-coded roots (fri.rs:423-473) as test vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.fp import Fp
from ..fields.spec import FieldSpec


# ---------------------------------------------------------------------------
# Roots of unity (host-side)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def two_adicity(p: int) -> int:
    k = 0
    m = p - 1
    while m % 2 == 0:
        m //= 2
        k += 1
    return k


@functools.lru_cache(maxsize=None)
def max_root_of_unity(p: int) -> int:
    """A 2^k-th primitive root of unity for the maximal k (host Python int)."""
    k = two_adicity(p)
    odd = (p - 1) >> k
    for g in range(2, 1000):
        r = pow(g, odd, p)
        if pow(r, 1 << (k - 1), p) != 1:
            return r
    raise ValueError(f"no generator found for {p}")


@functools.lru_cache(maxsize=None)
def nth_root_of_unity(p: int, n: int) -> int:
    """Primitive n-th root of unity (n a power of two). Parity: fri.rs:423-473."""
    assert n & (n - 1) == 0
    k = n.bit_length() - 1
    adic = two_adicity(p)
    assert k <= adic, f"field 2-adicity {adic} < log2(n)={k}"
    r = max_root_of_unity(p)
    return pow(r, 1 << (adic - k), p)


@functools.lru_cache(maxsize=None)
def _twiddle_table(spec: FieldSpec, n: int, inverse: bool):
    """Montgomery-domain numpy table [1, w, w^2, ..., w^{n/2-1}]."""
    w = nth_root_of_unity(spec.p, n)
    if inverse:
        w = pow(w, -1, spec.p)
    pows = []
    acc = 1
    for _ in range(max(1, n // 2)):
        pows.append(spec.to_mont_int(acc))
        acc = acc * w % spec.p
    out = np.zeros((spec.L, len(pows)), dtype=np.uint32)
    for j, v in enumerate(pows):
        for i in range(spec.L):
            out[i, j] = (v >> (16 * i)) & 0xFFFF
    return out


@functools.lru_cache(maxsize=None)
def _stage_twiddle(spec: FieldSpec, m: int, s: int, inverse: bool) -> np.ndarray:
    """Stage-s Stockham twiddles (L, h): [w_c^0 .. w_c^{h-1}], c = m >> s."""
    full = _twiddle_table(spec, m, inverse)  # (L, m/2)
    h = m >> (s + 1)
    return np.ascontiguousarray(full[:, :: (1 << s)][:, :h])


@functools.lru_cache(maxsize=None)
def _outer_twiddle_np(spec: FieldSpec, w: int, n1: int, cols: int) -> np.ndarray:
    """Montgomery (L, n1, cols) table with entry [k1, j] = w^(k1*j).

    The four-step diagonal twiddle w_n^(k1*i2) factors as
    w^(k1*a) * (w^A)^(k1*b) under i2 = a + A*b, so two of these rank-
    structured tables of total size n1*(A + n2/A) replace the full n1*n2
    table — keeping the trace-time constants ~n^(3/4) instead of n elements
    (a 2^22 BN254 table would otherwise be a 256 MB HLO constant).
    """
    p = spec.p
    out = np.zeros((spec.L, n1, cols), dtype=np.uint32)
    for k1 in range(n1):
        acc = 1
        step = pow(w, k1, p)
        for j in range(cols):
            v = spec.to_mont_int(acc)
            for i in range(spec.L):
                out[i, k1, j] = (v >> (16 * i)) & 0xFFFF
            acc = acc * step % p
    return out


# ---------------------------------------------------------------------------
# Core transforms (limb-level; coefficient axis is the LAST axis)
# ---------------------------------------------------------------------------

def _use_fused_butterfly(shape) -> bool:
    import math

    if not limb.pallas_allowed():
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    return math.prod(shape[1:]) >= 512


def _butterfly(spec: FieldSpec, u, v, tw, dit: bool):
    """One radix-2 stage; fused Pallas kernel on TPU, pure JAX elsewhere."""
    if _use_fused_butterfly(u.shape):
        from ..fields import limb_pallas

        twb = jnp.broadcast_to(tw, u.shape)
        return limb_pallas.butterfly_pallas(spec, u, v, twb, dit)
    if dit:
        tv = limb.mont_mul(spec, v, tw)
        return limb.add(spec, u, tv), limb.sub(spec, u, tv)
    return (limb.add(spec, u, v),
            limb.mont_mul(spec, limb.sub(spec, u, v), tw))


def _stockham_axis(spec: FieldSpec, x, m: int, inverse: bool):
    """Stockham (self-sorting) radix-2 DIF NTT over axis -2 of ``x``.

    x: (*lead, m, B) Montgomery limbs (lead[0] = L); returns the transform in
    NATURAL order over that axis.  Every stage touches only contiguous slabs:
    split the c-axis in halves, butterfly, concatenate on the block axis —
    no strided interleave and no bit-reversal gather (the classic autosort
    property).  The trailing batch axis B keeps every slab >= B elements, so
    on TPU each stage stays one lane-aligned fused-butterfly launch.
    """
    assert m & (m - 1) == 0
    lead = x.shape[:-2]
    B = x.shape[-1]
    if m == 1:
        return x
    stages = m.bit_length() - 1
    x = x.reshape(lead + (1, m, B))
    c = m
    for s in range(stages):
        h = c // 2
        u = x[..., :h, :]
        v = x[..., h:, :]
        tw = jnp.asarray(_stage_twiddle(spec, m, s, inverse))  # (L, h)
        tw = tw.reshape((spec.L,) + (1,) * (len(lead) - 1) + (1, h, 1))
        su, sv = _butterfly(spec, u, v, jnp.broadcast_to(tw, u.shape),
                            dit=False)
        x = jnp.concatenate([su, sv], axis=-3)
        c = h
    return x.reshape(lead + (m, B))


# From this size up, decompose recursively (four-step) so no butterfly stage
# ever moves data in blocks smaller than ~sqrt(n) lanes.  Measured on a v5e
# chip: 2^14 runs ~10x faster decomposed than single-level; below that,
# dispatch latency dominates either path.
_FOURSTEP_MIN_N = 1 << 14

# Leaf sub-transform length for the recursive decomposition.  On TPU a leaf
# runs as ONE fused Pallas kernel: all log2(m) stages per (m, 128) tile in
# VMEM (limb_pallas.ntt_leaf_pallas), so each leaf costs a single HBM
# read+write pass.  m = 128 is the measured sweet spot under the default
# scoped-VMEM budget; larger leaves (fewer levels -> fewer HBM passes) are
# experimentable via MYZKP_NTT_LEAF_M now that the kernel raises its VMEM
# limit — a 2^20 transform with m = 1024 would be 2 leaf passes instead
# of 3.  Off-TPU the leaf is the per-stage Stockham fallback.
import os as _os

_FUSED_LEAF_M = int(_os.environ.get("MYZKP_NTT_LEAF_M", 128))

# Use the fused leaf kernel only when the per-call batch fills tiles.
_FUSED_LEAF_MIN_ELEMS = 1 << 14

# Four-step diagonal twiddle tables up to this many elements are emitted
# directly; larger ones use the rank-structured two-factor form (keeps
# trace-time constants ~n^(3/4), see _outer_twiddle_np).
_DIRECT_TWIDDLE_MAX = 1 << 13


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_core_small(spec: FieldSpec, a, inverse: bool):
    n = a.shape[-1]
    lead = a.shape[:-1]
    return _stockham_axis(
        spec, a.reshape(lead + (n, 1)), n, inverse).reshape(lead + (n,))


@functools.lru_cache(maxsize=None)
def _leaf_twiddles_np(spec: FieldSpec, m: int, inverse: bool) -> np.ndarray:
    """Twiddle tables for the fused leaf kernel, shape (L, T, 1).

    Layout: per-stage Stockham slab twiddles for stages 0..log2(m)-4
    (widths m/2, m/4, ..., 8), then the tail tables.  Transposed tail
    (m >= 64): two half-width v-row tables — (m/2,) with entry w8^(r div
    m/8) and (m/4,) with entry w4^(r div m/8).  Roll tail (m < 64): two
    full-height (m,) in-place tables (row r: w_cc^{(r mod cc)-h} at
    v-rows, 1 at u-rows — the u-row value is discarded by the kernel's
    select).  See limb_pallas._make_ntt_leaf_kernel.
    """
    from ..fields.limb_pallas import _NTT_TAIL, _tail_transposed

    stages = m.bit_length() - 1
    S = stages - _NTT_TAIL
    parts = [_stage_twiddle(spec, m, s, inverse) for s in range(S)]

    def _mont_cols(vals) -> np.ndarray:
        out = np.zeros((spec.L, len(vals)), dtype=np.uint32)
        for j, v in enumerate(vals):
            mv = spec.to_mont_int(v)
            for i in range(spec.L):
                out[i, j] = (mv >> (16 * i)) & 0xFFFF
        return out

    def root(cc: int) -> int:
        w = nth_root_of_unity(spec.p, cc)
        return pow(w, -1, spec.p) if inverse else w

    if _tail_transposed(m):
        g8 = m // 8
        w8, w4 = root(8), root(4)
        parts += [
            _mont_cols([pow(w8, r // g8, spec.p) for r in range(m // 2)]),
            _mont_cols([pow(w4, r // g8, spec.p) for r in range(m // 4)]),
        ]
    else:
        def tail_table(cc: int) -> np.ndarray:
            w = root(cc)
            h = cc // 2
            return _mont_cols([
                pow(w, (r % cc) - h, spec.p) if (r % cc) >= h else 1
                for r in range(m)])

        parts += [tail_table(8), tail_table(4)]
    cat = np.concatenate(parts, axis=1)
    pad = -cat.shape[1] % 8
    if pad:
        cat = np.pad(cat, [(0, 0), (0, pad)])
    return np.ascontiguousarray(cat[..., None])


def _leaf_ntt(spec: FieldSpec, x, inverse: bool):
    """Length-m (m <= _FUSED_LEAF_M) NTT over axis -2 of (lead.., m, B)."""
    import math

    m = x.shape[-2]
    if m == 1:
        return x
    if (m >= 16 and _use_fused_butterfly(x.shape)
            and math.prod(x.shape[1:]) >= _FUSED_LEAF_MIN_ELEMS):
        from ..fields import limb_pallas

        shape = x.shape
        x4 = x.reshape((spec.L, -1) + shape[-2:])
        tw = jnp.asarray(_leaf_twiddles_np(spec, m, inverse))
        out = limb_pallas.ntt_leaf_pallas(spec, x4, tw, m)
        return out.reshape(shape)
    return _stockham_axis(spec, x, m, inverse)


def _fourstep_twiddle(spec: FieldSpec, x, m: int, m1: int, m2: int,
                      inverse: bool, table=None):
    """Multiply x (lead.., m1, m2, B) by the diagonal twiddle w_m^(k1*i2).

    With ``table`` (a process-cached device array from fourstep_tables,
    threaded in as a jit argument) this is ONE mont_mul; otherwise the
    rank-structured two-factor form costs two muls but keeps trace-time
    constants ~n^(3/4) (a 2^22 BN254 table would be a 256 MB HLO constant).
    """
    w = nth_root_of_unity(spec.p, m)
    if inverse:
        w = pow(w, -1, spec.p)
    lead = x.shape[:-3]
    B = x.shape[-1]
    bshape = (1,) * (len(lead) - 1)
    if table is not None:
        t = table.reshape((spec.L,) + bshape + (m1, m2, 1))
        return limb.mont_mul(spec, x, jnp.broadcast_to(t, x.shape))
    if m1 * m2 <= _DIRECT_TWIDDLE_MAX:
        t = jnp.asarray(_outer_twiddle_np(spec, w, m1, m2))
        t = t.reshape((spec.L,) + bshape + (m1, m2, 1))
        return limb.mont_mul(spec, x, jnp.broadcast_to(t, x.shape))
    # rank-structured: i2 = a + A*b, w^(k1*i2) = wa[k1, a] * wb[k1, b]
    A = 1 << (-(-(m2.bit_length() - 1) // 2))
    Bc = m2 // A
    wa = jnp.asarray(_outer_twiddle_np(spec, w, m1, A))
    wb = jnp.asarray(_outer_twiddle_np(spec, pow(w, A, spec.p), m1, Bc))
    x5 = x.reshape(lead + (m1, Bc, A, B))
    x5 = limb.mont_mul(spec, x5, jnp.broadcast_to(
        wa.reshape((spec.L,) + bshape + (m1, 1, A, 1)), x5.shape))
    x5 = limb.mont_mul(spec, x5, jnp.broadcast_to(
        wb.reshape((spec.L,) + bshape + (m1, Bc, 1, 1)), x5.shape))
    return x5.reshape(x.shape)


def _fourstep_splits(m: int) -> list[tuple[int, int, int]]:
    """The (m, m1, m2) of every recursion level of _ntt_axis for length m
    whose diagonal twiddle exceeds _DIRECT_TWIDDLE_MAX (big ones first)."""
    out = []
    while m > _FUSED_LEAF_M:
        m1 = min(_FUSED_LEAF_M, 1 << (m.bit_length() // 2))
        m2 = m // m1
        if m1 * m2 > _DIRECT_TWIDDLE_MAX:
            out.append((m, m1, m2))
        m = m2
    return out


@functools.lru_cache(maxsize=None)
def fourstep_tables(spec: FieldSpec, n: int, inverse: bool) -> tuple:
    """Process-cached DEVICE twiddle-product tables (L, m1, m2), one per
    recursion level of an n-point transform that would otherwise pay the
    two-mul rank-structured build per call.  Built eagerly once (two muls
    over the rank factors); thread into _ntt_natural(..., tables=...) as a
    jit ARGUMENT — never close over them (64-128 MB HLO literals overflow
    remote compiles)."""
    tabs = []
    for (m, m1, m2) in _fourstep_splits(n):
        w = nth_root_of_unity(spec.p, m)
        if inverse:
            w = pow(w, -1, spec.p)
        A = 1 << (-(-(m2.bit_length() - 1) // 2))
        Bc = m2 // A
        wa = jnp.asarray(_outer_twiddle_np(spec, w, m1, A))
        wb = jnp.asarray(_outer_twiddle_np(spec, pow(w, A, spec.p), m1, Bc))
        full = limb.mont_mul(
            spec,
            jnp.broadcast_to(wa[:, :, None, :], (spec.L, m1, Bc, A)),
            jnp.broadcast_to(wb[:, :, :, None], (spec.L, m1, Bc, A)))
        tabs.append(full.reshape(spec.L, m1, m2))
    return tuple(tabs)


def _ntt_axis(spec: FieldSpec, x, inverse: bool, tables=()):
    """Natural-order NTT over axis -2 of (lead.., m, B), recursive four-step.

    m <= _FUSED_LEAF_M: one fused-kernel (or Stockham) pass.  Larger:
    m = m1*m2 — transform the stride-m2*B axis i1 (a free reshape merges
    (m2, B) into the batch), diagonal twiddle w_m^(k1*i2), ONE transpose,
    transform the i2 axis; (k2, k1) flattens row-major to natural k.
    ``tables``: optional precomputed twiddle products (fourstep_tables),
    consumed top-down by the levels whose diagonal exceeds the direct max.
    """
    m = x.shape[-2]
    if m <= _FUSED_LEAF_M:
        return _leaf_ntt(spec, x, inverse)
    lead, B = x.shape[:-2], x.shape[-1]
    m1 = min(_FUSED_LEAF_M, 1 << (m.bit_length() // 2))
    m2 = m // m1
    if m1 * m2 > _DIRECT_TWIDDLE_MAX and tables:
        tab, rest = tables[0], tables[1:]
    else:
        tab, rest = None, tables
    x = x.reshape(lead + (m1, m2 * B))
    x = _ntt_axis(spec, x, inverse)  # k1 in the m1 slot (leaf-sized)
    x = x.reshape(lead + (m1, m2, B))
    x = _fourstep_twiddle(spec, x, m, m1, m2, inverse, table=tab)
    x = jnp.swapaxes(x, -3, -2)  # (lead.., m2, m1, B) — the one transpose
    x = x.reshape(lead + (m2, m1 * B))
    x = _ntt_axis(spec, x, inverse, rest)  # k2 in the m2 slot
    return x.reshape(lead + (m, B))  # k = k2*m1 + k1: natural


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_core_recursive(spec: FieldSpec, a, inverse: bool, *tables):
    n = a.shape[-1]
    lead = a.shape[:-1]
    return _ntt_axis(spec, a.reshape(lead + (n, 1)), inverse, tables
                     ).reshape(lead + (n,))


def _ntt_natural(spec: FieldSpec, a, inverse: bool, tables=None):
    """Natural-order NTT over the last axis of a (L, ..., n) limb array.

    n < 2^14: single Stockham pass.  Larger: recursive four-step
    decomposition n = m1 * m2 * ... with fused-kernel leaves (<= 2^8 each,
    one HBM pass per leaf level plus one transpose per split) — a 2^20
    transform is 3 fused transform passes + 2 transposes + 2 twiddle
    scalings, versus 20 full-array butterfly stage round-trips unfused.
    Replaces the reference's recursive clone-heavy radix-2 (ntt.rs:7-48).

    ``tables``: precomputed device twiddle products (fourstep_tables) —
    halves the top-level twiddle muls.  Auto-fetched for eager (non-traced)
    calls; inside a jit pass them as arguments, or leave None for the
    rank-structured in-trace build (two muls, CSE-shared across transforms
    of one program).
    """
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    if n < _FOURSTEP_MIN_N:
        return _ntt_core_small(spec, a, inverse)
    if (tables is None and not isinstance(a, jax.core.Tracer)
            and _fourstep_splits(n)):
        tables = fourstep_tables(spec, n, inverse)
    return _ntt_core_recursive(spec, a, inverse, *(tables or ()))


def _scale_by_n_inv(spec: FieldSpec, a):
    n = a.shape[-1]
    n_inv = spec.to_mont_int(pow(n, -1, spec.p))
    c = jnp.array(
        [(n_inv >> (16 * i)) & 0xFFFF for i in range(spec.L)], dtype=jnp.uint32
    ).reshape((spec.L,) + (1,) * (a.ndim - 1))
    return limb.mont_mul(spec, a, c)


# ---------------------------------------------------------------------------
# Public API over Fp (coefficient axis = last batch axis)
# ---------------------------------------------------------------------------

def ntt(a: Fp, tables=None) -> Fp:
    """Forward NTT, natural order in and out (evaluations at w^i).

    Parity: ntt.rs:7-48 (which returns natural-order evaluations).  The
    Stockham core autosorts, so no bit-reversal gather is ever applied.
    """
    return Fp(a.spec, _ntt_natural(a.spec, a.mont, False, tables))


def intt(a: Fp, tables=None) -> Fp:
    """Inverse NTT, natural order in/out. Parity: ntt.rs:50-64."""
    out = _ntt_natural(a.spec, a.mont, True, tables)
    return Fp(a.spec, _scale_by_n_inv(a.spec, out))


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pad_last(a: Fp, n: int) -> Fp:
    cur = a.shape[-1]
    if cur == n:
        return a
    pad = [(0, 0)] * a.mont.ndim
    pad[-1] = (0, n - cur)
    return Fp(a.spec, jnp.pad(a.mont, pad))


def fast_multiply(a: Fp, b: Fp, out_len: int | None = None) -> Fp:
    """Polynomial product via NTT (parity: ntt.rs:66-116).

    a, b: coefficient arrays (..., na), (..., nb) low-first.  Returns
    coefficients of length out_len (default na+nb-1).
    """
    na, nb = a.shape[-1], b.shape[-1]
    full = na + nb - 1
    n = _next_pow2(full)
    fa = _ntt_natural(a.spec, _pad_last(a, n).mont, False)
    fb = _ntt_natural(b.spec, _pad_last(b, n).mont, False)
    prod = limb.mont_mul(a.spec, fa, fb)
    out = _scale_by_n_inv(a.spec, _ntt_natural(a.spec, prod, True))
    res = Fp(a.spec, out[..., :full])
    if out_len is not None:
        res = _pad_last(res, out_len) if out_len >= full else Fp(a.spec, res.mont[..., :out_len])
    return res


def coset_evaluate(a: Fp, offset: int, n: int, tables=None) -> Fp:
    """Evaluate poly a on the coset offset * <w_n> (parity: ntt.rs:254-269)."""
    spec = a.spec
    a = _pad_last(a, n)
    offs = _geometric_mont(spec, offset, n)
    scaled = limb.mont_mul(spec, a.mont, offs)
    return ntt(Fp(spec, scaled), tables)


def coset_interpolate(evals: Fp, offset: int, tables=None) -> Fp:
    """Inverse of coset_evaluate: coefficients from coset evaluations."""
    spec = evals.spec
    n = evals.shape[-1]
    coeffs = intt(evals, tables)
    offs = _geometric_mont(spec, pow(offset, -1, spec.p), n)
    return Fp(spec, limb.mont_mul(spec, coeffs.mont, offs))


@functools.lru_cache(maxsize=None)
def _geometric_mont_np(spec: FieldSpec, c: int, n: int) -> np.ndarray:
    out = np.zeros((spec.L, n), dtype=np.uint32)
    acc = 1
    for j in range(n):
        v = spec.to_mont_int(acc)
        for i in range(spec.L):
            out[i, j] = (v >> (16 * i)) & 0xFFFF
        acc = acc * c % spec.p
    return out


# Above this size, build geometric series on device: a host-precomputed
# (L, n) table becomes an HLO constant — at 2^21 that is ~134 MB of
# literals, which crashes/overflows remote compiles (the round-3 QAP bench
# HTTP 500).  The device build is ~n muls, negligible.
_GEOMETRIC_DEVICE_MIN_N = 1 << 15


def _const_mont(spec: FieldSpec, v: int):
    """Montgomery (L, 1) constant from a host int (tiny HLO literal)."""
    mv = spec.to_mont_int(v % spec.p)
    return jnp.array([[(mv >> (16 * i)) & 0xFFFF] for i in range(spec.L)],
                     dtype=jnp.uint32)


def _geometric_mont(spec: FieldSpec, c: int, n: int):
    """[1, c, c^2, ...] as Montgomery limb array (L, n).

    Small n: host-precomputed table (constant-folded).  Large n: log-
    doubling on device — g_{2k} = [g_k, g_k * c^k] — so the only HLO
    constants are log2(n) single elements c^k.
    """
    c = c % spec.p
    if n < _GEOMETRIC_DEVICE_MIN_N:
        return jnp.asarray(_geometric_mont_np(spec, c, n))
    g = limb.one_mont(spec, (1,))
    k = 1
    while k < n:
        step = jnp.broadcast_to(_const_mont(spec, pow(c, k, spec.p)),
                                g.shape)
        g = jnp.concatenate([g, limb.mont_mul(spec, g, step)], axis=-1)
        k *= 2
    return g[:, :n]


def geometric_series(spec: FieldSpec, c: int, n: int) -> Fp:
    return Fp(spec, _geometric_mont(spec, c, n))


def evaluate_on_rou_domain(a: Fp, n: int) -> Fp:
    """Evaluate coefficients on the n-point root-of-unity domain (LDE)."""
    return ntt(_pad_last(a, n))


def interpolate_on_rou_domain(evals: Fp) -> Fp:
    """Coefficients of the unique poly with given values on <w_n>."""
    return intt(evals)


# ---------------------------------------------------------------------------
# Divide-and-conquer fast polynomial algebra over ARBITRARY point sets.
#
# Capability parity with myzkp/src/modules/algebra/ntt.rs: fast_zerofier
# (:118-141), fast_evaluate (:143-183), fast_interpolate (:185-252),
# fast_coset_divide (:271-330).  Re-designed for TPU: the reference recurses
# point-by-point; here every subproduct-tree level is ONE batched NTT multiply
# over all nodes of that level (leading batch axis = tree nodes), and the
# remainder tree is a batched fixed-trip-count division per level.
# ---------------------------------------------------------------------------

def _zerofier_tree(xs: Fp) -> list[Fp]:
    """Subproduct tree for a power-of-two point set.

    levels[k]: batch shape (n/2^k, 2^k + 1) of monic zerofier coefficients.
    """
    spec = xs.spec
    n = xs.shape[-1]
    assert n & (n - 1) == 0
    neg = (-xs).mont  # (L, n)
    ones = limb.one_mont(spec, (n,))
    lvl = Fp(spec, jnp.stack([neg, ones], axis=-1))  # (n, 2)
    levels = [lvl]
    while lvl.shape[0] > 1:
        even = Fp(spec, lvl.mont[:, 0::2])
        odd = Fp(spec, lvl.mont[:, 1::2])
        lvl = fast_multiply(even, odd)
        levels.append(lvl)
    return levels


def _pow2_chunks(n: int) -> list[int]:
    """Binary decomposition of n, largest chunk first."""
    out = []
    b = 1 << (n.bit_length() - 1)
    while n:
        if n >= b:
            out.append(b)
            n -= b
        b >>= 1
    return out


def fast_zerofier(xs: Fp) -> Fp:
    """prod_i (X - x_i) -> (n+1) coefficients (parity: ntt.rs:118-141)."""
    spec = xs.spec
    n = xs.shape[-1]
    chunks = _pow2_chunks(n)
    acc = None
    off = 0
    for c in chunks:
        z = _zerofier_tree(Fp(spec, xs.mont[..., off : off + c]))[-1]
        z = Fp(spec, z.mont[..., 0, :])  # (c+1,)
        acc = z if acc is None else fast_multiply(acc, z)
        off += c
    return acc


def _fast_evaluate_pow2(coef: Fp, xs: Fp, tree: list[Fp] | None = None) -> Fp:
    """Evaluate coef (nc,) at power-of-two point set xs (n,). Returns (n,)."""
    spec = coef.spec
    n = xs.shape[-1]
    if n == 1:
        from .poly import poly_eval

        return poly_eval(coef, Fp(spec, xs.mont))
    tree = tree or _zerofier_tree(xs)
    from .poly import poly_divmod

    # reduce modulo the root zerofier if needed
    r = Fp(spec, coef.mont[:, None, :])  # (1, nc) batched over tree nodes
    root = tree[-1]  # (1, n+1)
    if coef.shape[-1] > n:
        _, rem = poly_divmod(Fp(spec, r.mont), Fp(spec, root.mont), n)
        r = rem
    else:
        pad = n - coef.shape[-1]
        m = r.mont if pad == 0 else jnp.pad(r.mont, [(0, 0), (0, 0), (0, pad)])
        r = Fp(spec, m)
    # walk down the tree: at level k, residues have degree < 2^(k+1)
    for k in range(len(tree) - 2, -1, -1):
        divisors = tree[k]  # (m, 2^k+1)
        width = 1 << k
        r2 = Fp(spec, jnp.repeat(r.mont, 2, axis=1))  # (m, 2^{k+1})
        _, rem = poly_divmod(r2, Fp(spec, divisors.mont), width)
        r = rem  # (m, width)
    return Fp(spec, r.mont[..., 0])  # (n,)


def fast_evaluate(coef: Fp, xs: Fp) -> Fp:
    """Multi-point evaluation at arbitrary points (parity: ntt.rs:143-183)."""
    spec = coef.spec
    n = xs.shape[-1]
    chunks = _pow2_chunks(n)
    outs = []
    off = 0
    for c in chunks:
        outs.append(
            _fast_evaluate_pow2(coef, Fp(spec, xs.mont[..., off : off + c])))
        off += c
    return Fp(spec, jnp.concatenate([o.mont for o in outs], axis=-1))


def _fast_interpolate_pow2(xs: Fp, ys: Fp) -> Fp:
    """Interpolate through a power-of-two point set. Returns (n,) coeffs."""
    spec = xs.spec
    n = xs.shape[-1]
    if n == 1:
        return Fp(spec, ys.mont)
    tree = _zerofier_tree(xs)
    root = Fp(spec, tree[-1].mont[..., 0, :])  # (n+1,)
    # derivative Z'(X): coeff k of Z' = (k+1) * z_{k+1}
    ks = Fp.from_int(spec, list(range(1, n + 1)))
    zp = Fp(spec, root.mont[..., 1:]) * ks  # (n,)
    denom = _fast_evaluate_pow2(zp, xs, tree)  # Z'(x_i)
    w = ys * denom.batch_inv(axis=-1)  # (n,) weights
    # combine up the tree: node polynomials start as constants w_i.
    # ys may carry extra leading batch dims (e.g. one row per register) —
    # the node axis is always second-to-last.
    cur = Fp(spec, w.mont[..., None])  # (..., n, 1)
    for k in range(len(tree) - 1):
        zs = tree[k]  # (m, 2^k+1)
        cur_even = Fp(spec, cur.mont[..., 0::2, :])
        cur_odd = Fp(spec, cur.mont[..., 1::2, :])
        z_even = Fp(spec, zs.mont[..., 0::2, :])
        z_odd = Fp(spec, zs.mont[..., 1::2, :])
        cap = 1 << (k + 1)
        left = fast_multiply(cur_even, z_odd, out_len=cap)
        right = fast_multiply(cur_odd, z_even, out_len=cap)
        cur = left + right
    return Fp(spec, cur.mont[..., 0, :])  # (n,)


def fast_interpolate(xs: Fp, ys: Fp) -> Fp:
    """Interpolation through arbitrary points (parity: ntt.rs:185-252).

    Non-power-of-two sizes fold their binary-decomposition chunks:
    I_{A∪B} = I_A~ * Z_B + I_B~ * Z_A with I_A~ interpolating y_a / Z_B(a).
    """
    spec = xs.spec
    n = xs.shape[-1]
    if n & (n - 1) == 0:
        return _fast_interpolate_pow2(xs, ys)
    c = 1 << (n.bit_length() - 1)
    xa, xb = Fp(spec, xs.mont[..., :c]), Fp(spec, xs.mont[..., c:])
    ya, yb = Fp(spec, ys.mont[..., :c]), Fp(spec, ys.mont[..., c:])
    za = fast_zerofier(xa)
    zb = fast_zerofier(xb)
    ya2 = ya * fast_evaluate(zb, xa).batch_inv(axis=-1)
    yb2 = yb * fast_evaluate(za, xb).batch_inv(axis=-1)
    ia = fast_interpolate(xa, ya2)
    ib = fast_interpolate(xb, yb2)
    out_len = n
    t1 = fast_multiply(ia, zb, out_len=out_len)
    t2 = fast_multiply(ib, za, out_len=out_len)
    return t1 + t2


def fast_coset_evaluate(a: Fp, offset: int, n: int) -> Fp:
    """Alias of coset_evaluate (parity: ntt.rs:254-269)."""
    return coset_evaluate(a, offset, n)


def fast_coset_divide(lhs: Fp, rhs: Fp, offset: int, n: int) -> Fp:
    """Exact polynomial division lhs / rhs via pointwise division on a coset
    of size n (parity: ntt.rs:271-330). n must exceed deg(lhs)."""
    spec = lhs.spec
    lc = coset_evaluate(lhs, offset, n)
    rc = coset_evaluate(rhs, offset, n)
    q = lc * rc.batch_inv(axis=-1)
    return coset_interpolate(q, offset)
