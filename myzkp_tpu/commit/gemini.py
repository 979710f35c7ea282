"""Gemini multilinear-to-univariate polynomial commitment.

Capability parity with myzkp/src/modules/algebra/gemini.rs:
  - tensor_product                          gemini.rs:39-49
  - split_and_fold  f_i = even(f_{i-1}) + rho_i * odd(f_{i-1})
                                            gemini.rs:51-103
  - commitment = one KZG commitment per fold polynomial  :105-114
  - open: batch-open each fold at {beta, -beta, beta^2} + per-poly
    degree-bound proofs                     :116-144
  - verify: degree checks, batch-KZG checks, and the fold-consistency
    identity 2*beta*e_hat = beta*(e + e_neg) + rho*(e - e_neg)  :146-204
  - debug_verify plaintext variant          :206-232
  - SplitFoldError                          :16-32

TPU re-design: the fold ladder is a vectorized even/odd split (one fused
expression per level on device), the KZG commitments are device MSMs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..fields.fp import Fp
from ..fields.python_field import PyPoint
from ..fields.spec import FieldSpec
from ..ops.poly import Poly, poly_eval
from . import kzg


class SplitFoldError(ValueError):
    """Parity: gemini.rs:16-32."""


def tensor_product(a: Fp, b: Fp) -> Fp:
    """Outer product flattened column-major: out[i*len(a)+j] = a[j] * b[i].

    Parity: gemini.rs:39-49 (their flatten order iterates b's index outer).
    """
    prod = Fp(a.spec, a.mont[..., :, None]) * Fp(b.spec, b.mont[..., None, :])
    # prod[j, i] = a[j] b[i]; reference order: for i in b-index: column i of ab
    return Fp(a.spec, jnp.moveaxis(prod.mont, -1, -2).reshape(
        prod.mont.shape[:-2] + (-1,)))


def split_and_fold(coef: Fp, rhos: list[int]) -> list[Poly]:
    """All log2(n)+1 fold polynomials (parity: gemini.rs:51-103)."""
    spec = coef.spec
    n = coef.shape[-1]
    if n & (n - 1):
        raise SplitFoldError(f"coefs.len() must be a power of two, got {n}")
    log2n = n.bit_length() - 1
    if len(rhos) != log2n:
        raise SplitFoldError(
            f"points.len() must be {log2n}, but got {len(rhos)}")
    f = coef
    fs = [Poly(f)]
    for i in range(log2n):
        rho = Fp.from_int(spec, rhos[i])
        even = Fp(spec, f.mont[..., 0::2])
        odd = Fp(spec, f.mont[..., 1::2])
        f = (even + odd * rho).mont
        f = Fp(spec, f)
        fs.append(Poly(f))
    return fs


@dataclass
class ProofGemini:
    es: list  # list[kzg.BatchProof-like tuples (ys, w)]
    degree_proofs: list  # list[PyPoint]


def commit_gemini(polys: list[Poly], pk: kzg.KZGPublicKey) -> list[PyPoint]:
    """Parity: gemini.rs:112-114."""
    return [kzg.commit(pk, p) for p in polys]


def open_gemini(polys: list[Poly], beta: int, pk: kzg.KZGPublicKey
                ) -> ProofGemini:
    """Parity: gemini.rs:116-144."""
    spec = polys[0].spec
    num = len(polys)
    points = [beta % spec.p, (-beta) % spec.p, beta * beta % spec.p]
    es = [kzg.batch_open(pk, p, points) for p in polys[:-1]]
    degree_proofs = [
        kzg.prove_degree_bound(pk, p, 1 << (num - i - 1))
        for i, p in enumerate(polys)
    ]
    return ProofGemini(es=es, degree_proofs=degree_proofs)


def verify_gemini(rhos: list[int], mu: int, beta: int,
                  commitment: list[PyPoint], proof: ProofGemini,
                  pk: kzg.KZGPublicKey) -> bool:
    """Parity: gemini.rs:146-204."""
    spec = kzg.bn254.r_spec()
    p = spec.p
    log2n = len(rhos)
    if log2n != len(commitment) - 1:
        return False
    for i, (c, dp) in enumerate(zip(commitment, proof.degree_proofs)):
        if not kzg.verify_degree_bound(pk, c, dp, 1 << (log2n - i)):
            return False
    points = [beta % p, (-beta) % p, beta * beta % p]
    for c, bp in zip(commitment[:-1], proof.es):
        ys, w = bp
        if not kzg.batch_verify(pk, points, ys, c, w):
            return False
    es = [bp[0][0] for bp in proof.es]
    es_neg = [bp[0][1] for bp in proof.es]
    es_hat = [bp[0][2] for bp in proof.es][1:] + [mu % p]
    for j in range(log2n):
        lhs = 2 * beta * es_hat[j] % p
        rhs = (beta * (es[j] + es_neg[j]) + rhos[j] * (es[j] - es_neg[j])) % p
        if lhs != rhs:
            return False
    return True


def debug_verify(rhos: list[int], mu: int, polys: list[Poly], beta: int
                 ) -> bool:
    """Plaintext fold-consistency check (parity: gemini.rs:206-232)."""
    spec = polys[0].spec
    p = spec.p
    log2n = len(rhos)
    beta_fp = Fp.from_int(spec, beta % p)
    nbeta_fp = Fp.from_int(spec, (-beta) % p)
    b2_fp = Fp.from_int(spec, beta * beta % p)
    es = [int(f(beta_fp).item()) for f in polys[:log2n]]
    es_neg = [int(f(nbeta_fp).item()) for f in polys[:log2n]]
    es_hat = [int(f(b2_fp).item()) for f in polys[1:log2n]] + [mu % p]
    for j in range(log2n):
        lhs = 2 * beta * es_hat[j] % p
        rhs = (beta * (es[j] + es_neg[j]) + rhos[j] * (es[j] - es_neg[j])) % p
        if lhs != rhs:
            return False
    return True
