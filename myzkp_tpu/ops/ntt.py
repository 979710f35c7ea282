"""Number-theoretic transform and fast polynomial algebra on TPU.

Capability parity with myzkp/src/modules/algebra/ntt.rs (recursive, clone-heavy
radix-2 at ntt.rs:7-48) — re-designed as an *iterative in-place* radix-2
transform: log2(n) stages, each one full-width vectorized butterfly over the
whole (L, ..., n) limb array, with per-stage twiddles sliced statically from a
precomputed Montgomery-domain table.  DIF forward (natural -> bit-reversed)
pairs with DIT inverse (bit-reversed -> natural) so pointwise products need no
bit-reversal permutation at all; coefficient-order outputs apply one static
gather.

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
def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


# ---------------------------------------------------------------------------
# Core transforms (limb-level; coefficient axis is the LAST axis)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_dif(spec: FieldSpec, a, inverse: bool):
    """DIF NTT: natural order in -> bit-reversed out. a: (L, ..., n) mont."""
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    stages = n.bit_length() - 1
    tw_full = jnp.asarray(_twiddle_table(spec, n, inverse))  # (L, n/2)
    lead = a.shape[:-1]
    for s in range(stages):
        half = n >> (s + 1)
        blocks = 1 << s
        x = a.reshape(lead + (blocks, 2, half))
        u = x[..., 0, :]
        v = x[..., 1, :]
        tw = tw_full[..., :: (1 << s)]  # (L, half): w^(blocks * j)
        tw = tw.reshape((spec.L,) + (1,) * (len(lead) - 1) + (1, half))
        su = limb.add(spec, u, v)
        sv = limb.mont_mul(spec, limb.sub(spec, u, v), tw)
        a = jnp.stack([su, sv], axis=-2).reshape(lead + (n,))
    return a


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_dit(spec: FieldSpec, a, inverse: bool):
    """DIT NTT: bit-reversed in -> natural out. a: (L, ..., n) mont."""
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    stages = n.bit_length() - 1
    tw_full = jnp.asarray(_twiddle_table(spec, n, inverse))
    lead = a.shape[:-1]
    for s in range(stages - 1, -1, -1):
        half = n >> (s + 1)
        x = a.reshape(lead + (1 << s, 2, half))
        u = x[..., 0, :]
        v = x[..., 1, :]
        tw = tw_full[..., :: (1 << s)]
        tw = tw.reshape((spec.L,) + (1,) * (len(lead) - 1) + (1, half))
        tv = limb.mont_mul(spec, v, tw)
        su = limb.add(spec, u, tv)
        sv = limb.sub(spec, u, tv)
        a = jnp.stack([su, sv], axis=-2).reshape(lead + (n,))
    return a


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

def ntt(a: Fp) -> Fp:
    """Forward NTT, natural order in and out (evaluations at w^i).

    Parity: ntt.rs:7-48 (which returns natural-order evaluations).
    """
    spec = a.spec
    out = _ntt_dif(spec, a.mont, False)
    perm = jnp.asarray(_bitrev_perm(a.shape[-1]))
    return Fp(spec, jnp.take(out, perm, axis=-1))


def intt(a: Fp) -> Fp:
    """Inverse NTT, natural order in/out. Parity: ntt.rs:50-64."""
    spec = a.spec
    perm = jnp.asarray(_bitrev_perm(a.shape[-1]))
    x = jnp.take(a.mont, perm, axis=-1)  # bit-reverse, then DIT inverse
    out = _ntt_dit(spec, x, True)
    return Fp(spec, _scale_by_n_inv(spec, out))


def ntt_br(a: Fp) -> Fp:
    """Forward NTT, natural in -> bit-reversed out (for pointwise pipelines)."""
    return Fp(a.spec, _ntt_dif(a.spec, a.mont, False))


def intt_br(a: Fp) -> Fp:
    """Inverse NTT, bit-reversed in -> natural out."""
    out = _ntt_dit(a.spec, a.mont, True)
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
    fa = _ntt_dif(a.spec, _pad_last(a, n).mont, False)
    fb = _ntt_dif(b.spec, _pad_last(b, n).mont, False)
    prod = limb.mont_mul(a.spec, fa, fb)
    out = _scale_by_n_inv(a.spec, _ntt_dit(a.spec, prod, True))
    res = Fp(a.spec, out[..., :full])
    if out_len is not None:
        res = _pad_last(res, out_len) if out_len >= full else Fp(a.spec, res.mont[..., :out_len])
    return res


def coset_evaluate(a: Fp, offset: int, n: int) -> Fp:
    """Evaluate poly a on the coset offset * <w_n> (parity: ntt.rs:254-269)."""
    spec = a.spec
    a = _pad_last(a, n)
    offs = _geometric_mont(spec, offset, n)
    scaled = limb.mont_mul(spec, a.mont, offs)
    return ntt(Fp(spec, scaled))


def coset_interpolate(evals: Fp, offset: int) -> Fp:
    """Inverse of coset_evaluate: coefficients from coset evaluations."""
    spec = evals.spec
    n = evals.shape[-1]
    coeffs = intt(evals)
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


def _geometric_mont(spec: FieldSpec, c: int, n: int):
    """[1, c, c^2, ...] as Montgomery limb array (L, n), host-precomputed."""
    return jnp.asarray(_geometric_mont_np(spec, c % spec.p, n))


def geometric_series(spec: FieldSpec, c: int, n: int) -> Fp:
    return Fp(spec, _geometric_mont(spec, c, n))


def evaluate_on_rou_domain(a: Fp, n: int) -> Fp:
    """Evaluate coefficients on the n-point root-of-unity domain (LDE)."""
    return ntt(_pad_last(a, n))


def interpolate_on_rou_domain(evals: Fp) -> Fp:
    """Coefficients of the unique poly with given values on <w_n>."""
    return intt(evals)
