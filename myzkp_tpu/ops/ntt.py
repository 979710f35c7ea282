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

def _use_fused_butterfly(shape) -> bool:
    import math
    import os

    if os.environ.get("MYZKP_PALLAS", "1") == "0":
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
        su, sv = _butterfly(spec, u, v, tw, dit=False)
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
        su, sv = _butterfly(spec, u, v, tw, dit=True)
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
