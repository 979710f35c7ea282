"""Vectorized 16-bit-limb prime-field arithmetic in JAX.

Layout: an element batch is a ``uint32`` array of shape ``(L, *batch)`` holding
little-endian 16-bit limbs (each entry < 2^16, except transiently inside
kernels where lazy carries are bounded well below 2^32).  All functions are
jit-friendly: static shapes, no data-dependent Python control flow.

Multiplication is Montgomery (R = 2^(16L)) via an operand-scanning product
followed by a column-lazy REDC: the partial-product accumulation keeps columns
as uint32 "lazy" sums (bounded by ~4*L*2^16 << 2^32 for L<=16) and only
propagates carries once at the end.  This gives sequential depth O(L) instead
of O(L^2) and keeps every step a full-batch VPU op.

TPU-native counterpart of the reference's CUDA Montgomery kernel
(myzkp/src/modules/algebra/cuda/kernels/field.hpp:214-312: 64-bit-limb
schoolbook mul_512 + mont_reduce); the Rust side of the reference has no limb
arithmetic at all (BigInt, myzkp/src/modules/algebra/field.rs:88-110).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import BASE, MASK, W, FieldSpec

U32 = jnp.uint32
_MASK = np.uint32(MASK)


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------

def from_int(spec: FieldSpec, x) -> jax.Array:
    """Python int / iterable of ints (host) -> limb array (standard domain).

    Limb extraction goes through ``int.to_bytes`` + one ``np.frombuffer``
    (C speed) — the per-limb Python shift loop took ~200 us/element and
    dominated benchmark setup at 2^20 scalars.
    """
    xs = np.asarray(x, dtype=object)
    flat = xs.reshape(-1)
    nb = 2 * spec.L
    p = spec.p
    buf = b"".join((int(v) % p).to_bytes(nb, "little") for v in flat.tolist())
    out = (np.frombuffer(buf, dtype="<u2")
           .reshape(flat.size, spec.L).T.astype(np.uint32))
    return jnp.asarray(out.reshape((spec.L,) + xs.shape))


def to_int(spec: FieldSpec, a) -> np.ndarray:
    """Limb array (standard domain) -> numpy object array of Python ints."""
    a = np.asarray(a)
    flat = a.reshape(spec.L, -1)
    out = np.empty(flat.shape[1], dtype=object)
    for k in range(flat.shape[1]):
        out[k] = sum(int(flat[i, k]) << (W * i) for i in range(spec.L)) % spec.p
    return out.reshape(a.shape[1:])


def const(spec: FieldSpec, x: int, batch_shape=()) -> jax.Array:
    """Broadcast a host constant (standard domain) to a limb array."""
    limbs = spec.to_limbs(x)
    arr = jnp.array(limbs, dtype=U32).reshape((spec.L,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(arr, (spec.L,) + tuple(batch_shape))


def zeros(spec: FieldSpec, batch_shape=()) -> jax.Array:
    return jnp.zeros((spec.L,) + tuple(batch_shape), dtype=U32)


# ---------------------------------------------------------------------------
# Carry handling primitives
# ---------------------------------------------------------------------------


def _broadcast_pair(L, a, b):
    """Right-aligned batch broadcast of two (L, *batch) limb arrays."""
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def bc(x):
        bx = x.shape[1:]
        x = x.reshape((L,) + (1,) * (len(bshape) - len(bx)) + bx)
        return jnp.broadcast_to(x, (L,) + bshape)

    return bc(a), bc(b), bshape


def _carry_propagate(t):
    """Fully propagate carries of a lazy column array (limb axis leading).

    Returns (limbs in canonical <2^16 form, final carry-out as uint32 batch).
    """

    def step(c, ti):
        u = ti + c
        return u >> W, u & _MASK

    c, out = jax.lax.scan(step, jnp.zeros(t.shape[1:], dtype=U32), t)
    return out, c


def _geq(a, b_limbs):
    """a >= b (b given as static tuple of limb ints); returns bool batch."""
    # Compare from most-significant limb down, branchlessly.
    bv = jnp.array(np.array(b_limbs, dtype=np.uint32)).reshape(
        (a.shape[0],) + (1,) * (a.ndim - 1))

    def step(carry, x):
        gt, lt = carry
        ai, bi = x
        gt = gt | (~lt & (ai > bi))
        lt = lt | (~gt & (ai < bi))
        return (gt, lt), None

    z = jnp.zeros(a.shape[1:], dtype=jnp.bool_)
    (gt, lt), _ = jax.lax.scan(
        step, (z, z), (jnp.flip(a, 0), jnp.flip(jnp.broadcast_to(bv, a.shape), 0)))
    return ~lt


def _sub_limbs(a, b_limbs):
    """a - b for static b limbs, assuming a >= b. Canonical in, canonical out."""
    bv = jnp.broadcast_to(
        jnp.array(np.array(b_limbs, dtype=np.uint32)).reshape(
            (a.shape[0],) + (1,) * (a.ndim - 1)), a.shape)

    def step(borrow, x):
        ai, bi = x
        t = ai - bi - borrow  # wraps in uint32
        return (t >> W) & np.uint32(1), t & _MASK

    _, out = jax.lax.scan(step, jnp.zeros(a.shape[1:], dtype=U32), (a, bv))
    return out


def _cond_sub_p(spec: FieldSpec, a, top=None):
    """Reduce a (< 2p, canonical limbs, optional overflow bit `top`) to < p."""
    ge = _geq(a, spec.p_limbs)
    if top is not None:
        ge = ge | (top > 0)
    sub = _sub_limbs(a, spec.p_limbs)
    return jnp.where(ge[None], sub, a)


# ---------------------------------------------------------------------------
# Ring ops
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    a, b, _ = _broadcast_pair(spec.L, a, b)
    t, c = _carry_propagate(a + b)  # limb sums < 2^17, safe
    return _cond_sub_p(spec, t, top=c)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    a, b, bshape = _broadcast_pair(spec.L, a, b)

    def step(borrow, x):
        ai, bi = x
        t = ai - bi - borrow
        return (t >> W) & np.uint32(1), t & _MASK

    borrow, d = jax.lax.scan(step, jnp.zeros(bshape, dtype=U32), (a, b))
    # if borrowed, add p back
    pv = jnp.broadcast_to(
        jnp.array(np.array(spec.p_limbs, dtype=np.uint32)).reshape(
            (spec.L,) + (1,) * len(bshape)), d.shape)

    def step2(carry, x):
        di, pi = x
        u = di + pi + carry
        return u >> W, u & _MASK

    _, plus = jax.lax.scan(step2, jnp.zeros(bshape, dtype=U32), (d, pv))
    return jnp.where((borrow > 0)[None], plus, d)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a):
    return sub(spec, zeros(spec, a.shape[1:]), a)


def is_zero(spec: FieldSpec, a):
    return jnp.all(a == 0, axis=0)


def eq(spec: FieldSpec, a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """mask over batch dims: where(mask, a, b) with limb broadcast."""
    return jnp.where(mask[None], a, b)


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

import contextlib as _contextlib
import threading as _threading

_PALLAS_OVERRIDE = _threading.local()


@_contextlib.contextmanager
def force_pallas(on):
    """Trace-time Pallas-dispatch override for code traced inside the
    context: ``False`` forces the pure-JAX golden path, ``True`` restores
    the default dispatch, ``None`` defers to the MYZKP_PALLAS env var.

    Thread-local, and threaded into ``mont_mul``'s jit cache key — unlike
    mutating MYZKP_PALLAS process-wide, a flip can never hit a stale cached
    trace for the same shapes (advisor r2/r3)."""
    prev = getattr(_PALLAS_OVERRIDE, "v", None)
    _PALLAS_OVERRIDE.v = on
    try:
        yield
    finally:
        _PALLAS_OVERRIDE.v = prev


def pallas_allowed() -> bool:
    """Call-time half of the dispatch decision (override + env)."""
    import os

    ov = getattr(_PALLAS_OVERRIDE, "v", None)
    if ov is not None:
        return bool(ov)
    return os.environ.get("MYZKP_PALLAS", "1") != "0"


def _use_pallas(bshape, allowed: bool | None = None) -> bool:
    """Trace-time dispatch: route big batches to the Pallas kernel on TPU."""
    import math

    if not (pallas_allowed() if allowed is None else allowed):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    return math.prod(bshape) >= 512 if bshape else False


def mont_mul(spec: FieldSpec, a, b):
    """(a * b * R^{-1}) mod p for canonical Montgomery-domain inputs < p.

    Dispatches to the fused Pallas VMEM kernel (limb_pallas.py) for large
    batches on TPU; the pure-JAX segment-sum + scanned-REDC path is the
    golden reference and the CPU/small-batch fallback.  The dispatch flag is
    a static jit argument so force_pallas flips never reuse a stale trace.
    """
    return _mont_mul(spec, pallas_allowed(), a, b)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _mont_mul(spec: FieldSpec, pallas: bool, a, b):
    L = spec.L
    a, b, bshape = _broadcast_pair(L, a, b)
    if _use_pallas(bshape, allowed=pallas):
        from . import limb_pallas

        return limb_pallas.mont_mul_pallas(spec, a, b)

    # --- operand product into 2L+1 lazy columns ---------------------------
    # Column k accumulates lo(i,j) for i+j=k and hi(i,j) for i+j+1=k; each
    # contribution < 2^16 and there are <= 4L of them per column (including
    # the REDC phase below): bound ~4L*2^16 ~ 2^22 for L=16 — safe in uint32.
    # One outer product + two segment-sums along the anti-diagonals keeps the
    # traced graph tiny (vs an L-step slice/update loop) and the work in a
    # few wide vector ops.
    prod = a[:, None] * b[None, :]  # (L, L, *batch), each < 2^32
    flat = prod.reshape((L * L,) + bshape)
    seg = np.add.outer(np.arange(L), np.arange(L)).reshape(-1)  # i+j
    t = jax.ops.segment_sum(flat & _MASK, jnp.asarray(seg),
                            num_segments=2 * L + 1)
    t = t + jax.ops.segment_sum(flat >> W, jnp.asarray(seg + 1),
                                num_segments=2 * L + 1)

    # --- column-lazy REDC --------------------------------------------------
    # Sequential in i (m_i depends on the updated column i), but expressed as
    # a lax.scan with dynamic-start slices so the traced body is one step.
    p_vec = jnp.array(spec.p_limbs, dtype=U32).reshape((L,) + (1,) * len(bshape))
    n0 = np.uint32(spec.n0)

    def redc_step(t, i):
        ti = jax.lax.dynamic_index_in_dim(t, i, axis=0, keepdims=False)
        m = ((ti & _MASK) * n0) & _MASK
        mp = m[None] * p_vec  # (L, *batch)
        win = jax.lax.dynamic_slice_in_dim(t, i, L + 1, axis=0)
        add = jnp.concatenate([mp & _MASK, jnp.zeros((1,) + bshape, U32)]) \
            + jnp.concatenate([jnp.zeros((1,) + bshape, U32), mp >> W])
        win = win + add
        # column i is now ≡ 0 mod 2^16; fold its carry into column i+1.
        win = win.at[1].add(win[0] >> W)
        t = jax.lax.dynamic_update_slice_in_dim(t, win, i, axis=0)
        return t, None

    t, _ = jax.lax.scan(redc_step, t, jnp.arange(L))

    res, c = _carry_propagate(t[L : 2 * L])
    top = c + t[2 * L]
    return _cond_sub_p(spec, res, top=top)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


@functools.partial(jax.jit, static_argnums=0)
def to_mont(spec: FieldSpec, a):
    r2 = jnp.array(spec.r2_limbs, dtype=U32).reshape((spec.L,) + (1,) * (a.ndim - 1))
    return mont_mul(spec, a, r2)


@functools.partial(jax.jit, static_argnums=0)
def from_mont(spec: FieldSpec, a):
    one = jnp.zeros_like(a).at[0].set(np.uint32(1))
    return mont_mul(spec, a, one)


def one_mont(spec: FieldSpec, batch_shape=()) -> jax.Array:
    limbs = jnp.array(spec.one_limbs, dtype=U32)
    arr = limbs.reshape((spec.L,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(arr, (spec.L,) + tuple(batch_shape))


# ---------------------------------------------------------------------------
# Exponentiation / inversion (Montgomery domain)
# ---------------------------------------------------------------------------

def _exp_bits(e: int, nbits: int) -> np.ndarray:
    return np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_const(spec: FieldSpec, a, e: int):
    """a^e for a *static* Python-int exponent e >= 0 (Montgomery in/out).

    Uses a lax.scan over the exponent bits (LSB-first square-and-multiply with
    a running power) so the traced graph stays O(L) instead of O(L * nbits).
    """
    if e == 0:
        return one_mont(spec, a.shape[1:])
    nbits = e.bit_length()
    bits = jnp.asarray(_exp_bits(e, nbits))

    def body(carry, bit):
        acc, base = carry
        new_acc = select(bit > 0, mont_mul(spec, acc, base), acc)
        new_base = mont_sqr(spec, base)
        return (new_acc, new_base), None

    acc0 = one_mont(spec, a.shape[1:])
    (acc, _), _ = jax.lax.scan(body, (acc0, a), bits)
    return acc


@functools.partial(jax.jit, static_argnums=0)
def inv(spec: FieldSpec, a):
    """Fermat inverse a^(p-2); branchless & batch-friendly (inv(0) = 0)."""
    return pow_const(spec, a, spec.p - 2)


def pow_dyn(spec: FieldSpec, a, e_bits):
    """a^e where e is a traced uint32 bit array of shape (nbits, *batch)."""

    def body(carry, bit):
        acc, base = carry
        new_acc = select(bit > 0, mont_mul(spec, acc, base), acc)
        new_base = mont_sqr(spec, base)
        return (new_acc, new_base), None

    acc0 = one_mont(spec, a.shape[1:])
    (acc, _), _ = jax.lax.scan(body, (acc0, a), e_bits)
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2))
def batch_inv(spec: FieldSpec, a, axis: int = -1):
    """Montgomery-trick batch inversion along a batch axis.

    Elementwise a^{-1} using one Fermat inversion + O(n) muls:
    inv(a[i]) = prefix[i-1] * suffix[i+1] * inv(total), computed with two
    log-depth associative scans.  Zero entries map to zero.
    """
    ax = axis if axis >= 0 else a.ndim + axis
    assert ax >= 1, "axis must be a batch axis (limb axis is 0)"
    n = a.shape[ax]
    zmask = is_zero(spec, a)
    one_full = one_mont(spec, a.shape[1:])
    safe = select(zmask, one_full, a)

    mul = lambda x, y: mont_mul(spec, x, y)
    prefix = jax.lax.associative_scan(mul, safe, axis=ax)  # prod a[0..i]
    suffix = jax.lax.associative_scan(mul, safe, axis=ax, reverse=True)  # prod a[i..n-1]
    total = jnp.take(prefix, jnp.array(n - 1), axis=ax)
    total_inv = inv(spec, total)

    pos = jnp.arange(n).reshape((1,) * ax + (n,) + (1,) * (a.ndim - ax - 1))
    left = jnp.where(pos == 0, one_full, jnp.roll(prefix, 1, axis=ax))
    right = jnp.where(pos == n - 1, one_full, jnp.roll(suffix, -1, axis=ax))
    out = mul(mul(left, right), jnp.expand_dims(total_inv, ax))
    return select(zmask, zeros(spec, a.shape[1:]), out)


@functools.partial(jax.jit, static_argnums=(0, 3))
def segment_sum_mod(spec: FieldSpec, vals, seg_ids, num_segments: int):
    """Field-correct segment sum of limb arrays: (L, nnz) -> (L, nseg).

    Sums the raw limb planes in 8-bit pieces (uint32-safe for up to 2^24
    entries per segment), then folds lazy columns and final carries back
    into canonical mod-p form.  Works identically for Montgomery- or
    standard-domain inputs (summation is linear in either).  The workhorse
    of sparse matvec / matrix-transpose-vec (arith/sparse.py).
    """
    L = spec.L

    def part_sum(part):  # part: (L, nnz) u32, entries < 2^8
        s = jax.ops.segment_sum(part.swapaxes(0, 1), seg_ids,
                                num_segments=num_segments)  # (nseg, L)
        s = s.swapaxes(0, 1)  # (L, nseg), entries < nnz * 2^8 < 2^32
        canon, carry = _carry_propagate(s)
        # integer value = canon + carry * 2^(16 L) = canon + carry * R
        val = _mod_reduce_canonical(spec, canon)
        if L >= 2:
            carry_limbs = zeros(spec, carry.shape).at[0].set(
                carry & _MASK).at[1].set(carry >> W)
        else:
            carry_limbs = (carry & _MASK)[None]
        # carry * R mod p == to_mont(carry)
        return add(spec, val, to_mont(spec, carry_limbs))

    v0 = part_sum(vals & np.uint32(0xFF))
    v1 = part_sum(vals >> np.uint32(8))
    shift8 = const(spec, spec.to_mont_int(1 << 8), v1.shape[1:])
    return add(spec, v0, mont_mul(spec, v1, shift8))


def to_bytes_batch(spec: FieldSpec, a) -> list:
    """Canonical standard-domain limb array (L, n) -> list of fixed-width
    little-endian byte strings (2L bytes each).  Vectorized via numpy —
    used for Merkle leaves / transcript entries."""
    arr = np.ascontiguousarray(np.asarray(a).astype(np.uint16).T)  # (n, L) u16
    raw = arr.astype("<u2").tobytes()
    w = 2 * spec.L
    return [raw[i * w : (i + 1) * w] for i in range(arr.shape[0])]


def from_bytes(spec: FieldSpec, bs: list) -> jax.Array:
    """Inverse of to_bytes_batch: list of 2L-byte strings -> (L, n) limbs."""
    arr = np.frombuffer(b"".join(bs), dtype="<u2").reshape(len(bs), spec.L)
    return jnp.asarray(arr.T.astype(np.uint32))


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def random(spec: FieldSpec, key, batch_shape=()):
    """Uniform-ish field elements (standard domain) from a JAX PRNG key.

    Samples 2L limbs and Montgomery-reduces: the result is (x * R^{-1}) mod p
    for x uniform in [0, R^2), statistically near-uniform mod p.
    """
    wide = jax.random.randint(
        key, (2 * spec.L,) + tuple(batch_shape), 0, BASE, dtype=jnp.uint32
    )
    lo, hi = wide[: spec.L], wide[spec.L :]
    # value = lo + hi * R; reduce both halves below p, then lo + to_mont(hi)
    # (to_mont multiplies by R in the standard domain).
    lo_f = _mod_reduce_canonical(spec, lo)
    hi_f = _mod_reduce_canonical(spec, hi)
    return add(spec, lo_f, to_mont(spec, hi_f))


def _mod_reduce_canonical(spec: FieldSpec, a):
    """Reduce a canonical-limb value in [0, R) to [0, p): x -> x mod p via a
    Montgomery round-trip (from_mont(to_mont(x))), which tolerates x >= p."""
    return from_mont(spec, to_mont(spec, a))
