"""EigenDA-style DAS: RS-extend the whole blob, chunk it, per-chunk KZG
commitment AND precomputed per-chunk proof at a dummy point.

Capability parity with myzkp/src/modules/das/eigenda.rs:34-189:
  - setup: QUORUM_COUNT KZG SRSs of degree chunk_size
  - encode: RS over the whole blob, split into fixed chunks
  - commit: per-chunk commitment + per-chunk opening proof at x = 5
  - verify: one pairing check of the sampled chunk (no data access)
  - reconstruct: RS-decode the concatenated chunks (>= k available)
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

from ..codes import reedsolomon as rs
from ..commit import kzg
from ..curves import bn254
from ..fields.fp import Fp
from ..ops.poly import Poly
from . import utils as du

QUORUM_COUNT = 1  # parity: eigenda.rs:31


@dataclass
class PublicParamsEigenDA:
    expansion_factor: float
    quorums: list  # [KZGPublicKey]
    chunk_size: int


@dataclass
class EncodedDataEigenDA:
    codewords: list  # [chunk][symbol]
    data_size: int


@dataclass
class CommitmentEigenDA:
    chunk_commitments: list
    chunk_proofs: list  # [(y, witness)]
    quorum_id: int


class EigenDA:
    @staticmethod
    def setup(chunk_size: int, expansion_factor: float, data_size: int
              ) -> PublicParamsEigenDA:
        quorums = [kzg.setup(chunk_size) for _ in range(QUORUM_COUNT)]
        return PublicParamsEigenDA(expansion_factor=expansion_factor,
                                   quorums=quorums, chunk_size=chunk_size)

    @staticmethod
    def encode(data: bytes, params: PublicParamsEigenDA) -> EncodedDataEigenDA:
        start = time.perf_counter()
        codeword_size = int(len(data) * math.ceil(params.expansion_factor))
        coder = rs.setup_rs1d(codeword_size, len(data))
        encoded = rs.encode_rs1d(list(data), coder)
        codewords = [encoded[off: off + params.chunk_size]
                     for off in range(0, len(encoded), params.chunk_size)]
        result = EncodedDataEigenDA(codewords=codewords, data_size=len(data))
        du.METRICS.encoding_time += time.perf_counter() - start
        du.METRICS.encoded_size += sum(len(c) for c in codewords)
        return result

    @staticmethod
    def commit(encoded: EncodedDataEigenDA, params: PublicParamsEigenDA
               ) -> CommitmentEigenDA:
        start = time.perf_counter()
        quorum_id = 0
        pk = params.quorums[quorum_id]
        spec = bn254.r_spec()
        polys = [Poly(Fp.from_int(spec, chunk)) for chunk in encoded.codewords]
        chunk_commitments = [kzg.commit(pk, p) for p in polys]
        chunk_proofs = [kzg.open(pk, p, 5) for p in polys]
        du.METRICS.commitment_time += time.perf_counter() - start
        du.METRICS.commitment_size += 64 * len(chunk_commitments)
        du.METRICS.proof_size += 96 * len(chunk_proofs)
        return CommitmentEigenDA(chunk_commitments=chunk_commitments,
                                 chunk_proofs=chunk_proofs,
                                 quorum_id=quorum_id)

    @staticmethod
    def verify(position: du.SamplePosition, encoded: EncodedDataEigenDA,
               commitment: CommitmentEigenDA, params: PublicParamsEigenDA
               ) -> bool:
        start = time.perf_counter()
        pk = params.quorums[0]
        y, w = commitment.chunk_proofs[position.col]
        ok = kzg.verify(pk, 5, y,
                        commitment.chunk_commitments[position.col], w)
        du.METRICS.verification_time += time.perf_counter() - start
        return ok

    @staticmethod
    def reconstruct(encoded: EncodedDataEigenDA, params: PublicParamsEigenDA
                    ) -> bytes:
        start = time.perf_counter()
        codeword_size = int(
            encoded.data_size * math.ceil(params.expansion_factor))
        coder = rs.setup_rs1d(codeword_size, encoded.data_size)
        codeword = [v for chunk in encoded.codewords for v in chunk]
        out = rs.decode_rs1d(codeword, coder)
        du.METRICS.reconstruction_time += time.perf_counter() - start
        return bytes(out)

    @staticmethod
    def metrics() -> du.SystemMetrics:
        return du.get_metrics()
