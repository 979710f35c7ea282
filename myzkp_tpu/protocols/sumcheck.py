"""Sumcheck protocol over the boolean hypercube, tied to the Gemini PCS.

Capability parity with myzkp/src/modules/algebra/sumcheck.rs:
  - BitCombinations iterator (LSB-first)        sumcheck.rs:16-55
  - sum_over_boolean_hypercube                  sumcheck.rs:57-66
  - build_gj_from_prefix (partial-evaluate prefix at challenges, sum the
    suffix over the hypercube)                  sumcheck.rs:68-87
  - sumcheck_fold g(0)+g(1)                     sumcheck.rs:89-95
  - get_coefs_in_order (multilinear coeff vector)  sumcheck.rs:97-108
  - SumCheckProof {h, el, gs, c_g, pi}          sumcheck.rs:110-116
  - Fiat-Shamir non-interactive prove/verify with the final Gemini
    evaluation check                            sumcheck.rs:128-215

The hypercube sum runs on device (one batched evaluation over all 2^l
points + a log-depth reduction); the per-round g_j construction is symbolic
(host dicts, tiny) exactly like the reference.  The table-based device
prover that mirrors the CUDA kernels lives in sumcheck_tpu.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..commit import gemini, kzg
from ..fields.fp import Fp
from ..fields.spec import FieldSpec
from ..ops.mpoly import MPoly
from ..stark.fri import sample_field
from ..utils.fiat_shamir import FiatShamirTransformer


def bit_combinations(length: int, start: int = 0):
    """LSB-first bit vectors of the hypercube (parity: sumcheck.rs:16-55)."""
    for n in range(start, 1 << length):
        yield [(n >> i) & 1 for i in range(length)]


def hypercube_points(spec: FieldSpec, length: int) -> Fp:
    """(V, 2^V) Fp array: column n = LSB-first bits of n."""
    n = 1 << length
    idx = np.arange(n)
    bits = np.stack([(idx >> i) & 1 for i in range(length)])  # (V, n)
    return Fp.from_int(spec, bits.tolist())


def sum_over_boolean_hypercube(g: MPoly) -> int:
    """Parity: sumcheck.rs:57-66 — one batched evaluation + reduction."""
    el = g.num_variables()
    if el == 0:
        return g.evaluate([])
    pts = hypercube_points(g.spec, el)
    vals = g.evaluate_batch(pts)
    return int(vals.sum(axis=0).item())


def build_gj_from_prefix(g: MPoly, rs: list[int]) -> MPoly:
    """Round polynomial in variable j=len(rs) (parity: sumcheck.rs:68-87)."""
    el = g.num_variables()
    j = len(rs)
    assert el >= 1 and el > j, "invalid sizes for sum-check round"
    g_j = MPoly(g.spec, {})
    for c in bit_combinations(el - 1 - j):
        assignments = {i: v for i, v in enumerate(rs)}
        for i, v in enumerate(c):
            assignments[i + 1 + j] = v
        g_j = g_j + g.partial_evaluate(assignments)
    return g_j


def sumcheck_fold(g_j: MPoly, j: int) -> int:
    """g_j(..,0,..) + g_j(..,1,..) at variable j (parity: sumcheck.rs:89-95)."""
    el = g_j.num_variables()
    one = [0] * el
    one[j] = 1
    zero = [0] * el
    return (g_j.evaluate(one) + g_j.evaluate(zero)) % g_j.spec.p


def get_coefs_in_order(g: MPoly) -> list[int]:
    """Multilinear coefficient vector in LSB-first hypercube order
    (parity: sumcheck.rs:97-108)."""
    el = g.num_variables()
    out = []
    for c in bit_combinations(el):
        out.append(g.d.get(tuple(c), 0))
    return out


def _mpoly_bytes(g: MPoly) -> bytes:
    """Canonical transcript encoding of an MPoly (sorted terms)."""
    items = sorted(g._norm().items())
    out = [struct.pack("<Q", len(items))]
    for exps, c in items:
        out.append(struct.pack("<Q", len(exps)))
        out.extend(struct.pack("<Q", e) for e in exps)
        out.append(c.to_bytes(32, "little"))
    return b"".join(out)


@dataclass
class SumCheckProof:
    h: int
    el: int
    gs: list  # list[MPoly]
    c_g: list  # CommitmentGemini
    pi: gemini.ProofGemini


def commit_sumcheck(g: MPoly, rs: list[int], pk: kzg.KZGPublicKey):
    """Parity: sumcheck.rs:118-126."""
    coefs = get_coefs_in_order(g)
    fs = gemini.split_and_fold(Fp.from_int(g.spec, coefs), rs)
    return gemini.commit_gemini(fs, pk), fs


def prove_sumcheck(g: MPoly, h: int, pk: kzg.KZGPublicKey) -> SumCheckProof:
    """Parity: sumcheck.rs:128-167."""
    spec = g.spec
    proof_stream = FiatShamirTransformer()
    el = g.num_variables()
    proof_stream.push([struct.pack("<Q", el)])
    proof_stream.push([h.to_bytes(32, "little")])

    gs, rs = [], []
    g_0 = build_gj_from_prefix(g, [])
    proof_stream.push([_mpoly_bytes(g_0)])
    gs.append(g_0)
    rs.append(sample_field(spec, proof_stream.prover_fiat_shamir(32)))

    for _ in range(1, el):
        g_j = build_gj_from_prefix(g, rs)
        proof_stream.push([_mpoly_bytes(g_j)])
        rs.append(sample_field(spec, proof_stream.prover_fiat_shamir(32)))
        gs.append(g_j)

    beta = sample_field(spec, proof_stream.prover_fiat_shamir(32))
    c_g, fs = commit_sumcheck(g, rs, pk)
    pi = gemini.open_gemini(fs, beta, pk)
    return SumCheckProof(h=h, el=el, gs=gs, c_g=c_g, pi=pi)


def verify_sumcheck(proof: SumCheckProof, pk: kzg.KZGPublicKey) -> bool:
    """Parity: sumcheck.rs:169-215."""
    spec = kzg.bn254.r_spec()
    p = spec.p
    proof_stream = FiatShamirTransformer()
    proof_stream.push([struct.pack("<Q", proof.el)])
    proof_stream.push([proof.h.to_bytes(32, "little")])

    if proof.h % p != sumcheck_fold(proof.gs[0], 0):
        return False

    rs = []
    proof_stream.push([_mpoly_bytes(proof.gs[0])])
    rs.append(sample_field(spec, proof_stream.prover_fiat_shamir(32)))

    for j in range(1, proof.el):
        prev_point = [0] * proof.el
        prev_point[j - 1] = rs[j - 1]
        if proof.gs[j - 1].evaluate(prev_point) != sumcheck_fold(proof.gs[j], j):
            return False
        proof_stream.push([_mpoly_bytes(proof.gs[j])])
        rs.append(sample_field(spec, proof_stream.prover_fiat_shamir(32)))

    beta = sample_field(spec, proof_stream.prover_fiat_shamir(32))
    last_point = [0] * proof.el
    last_point[proof.el - 1] = rs[proof.el - 1]
    mu = proof.gs[proof.el - 1].evaluate(last_point)
    return gemini.verify_gemini(rs, mu, beta, proof.c_g, proof.pi, pk)
