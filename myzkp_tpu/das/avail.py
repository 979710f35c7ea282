"""Avail-style DAS: 1D RS per row chunk + one KZG commitment per column.

Capability parity with myzkp/src/modules/das/avail.rs:32-164:
  - setup: KZG SRS of degree ceil(data/chunk)
  - encode: RS-extend each chunk_size row to codeword_size
  - commit: column polynomial (coefficients = column bytes) KZG commitment
  - verify: KZG open/verify the sampled column polynomial at the dummy
    point x = 5
  - reconstruct: RS-decode each row
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


@dataclass
class PublicParamsAvail:
    expansion_factor: float
    pk: kzg.KZGPublicKey
    chunk_size: int


@dataclass
class EncodedDataAvail:
    codewords: list  # [chunk_row][symbol]
    data_size: int


@dataclass
class CommitmentAvail:
    commitments: list  # one PyPoint per column


class Avail:
    @staticmethod
    def setup(chunk_size: int, expansion_factor: float, data_size: int
              ) -> PublicParamsAvail:
        pk = kzg.setup(int(math.ceil(data_size / chunk_size)))
        return PublicParamsAvail(expansion_factor=expansion_factor, pk=pk,
                                 chunk_size=chunk_size)

    @staticmethod
    def encode(data: bytes, params: PublicParamsAvail) -> EncodedDataAvail:
        start = time.perf_counter()
        codeword_size = int(params.chunk_size * math.ceil(params.expansion_factor))
        coder = rs.setup_rs1d(codeword_size, params.chunk_size)
        codewords = []
        for off in range(0, len(data), params.chunk_size):
            chunk = list(data[off: off + params.chunk_size])
            chunk += [0] * (params.chunk_size - len(chunk))
            codewords.append(rs.encode_rs1d(chunk, coder))
        result = EncodedDataAvail(codewords=codewords, data_size=len(data))
        du.METRICS.encoding_time += time.perf_counter() - start
        du.METRICS.encoded_size += sum(len(c) for c in codewords)
        return result

    @staticmethod
    def _column_poly(encoded: EncodedDataAvail, col: int) -> Poly:
        spec = bn254.r_spec()
        return Poly(Fp.from_int(spec, [row[col] for row in encoded.codewords]))

    @staticmethod
    def commit(encoded: EncodedDataAvail, params: PublicParamsAvail
               ) -> CommitmentAvail:
        start = time.perf_counter()
        codeword_size = len(encoded.codewords[0])
        commitments = [
            kzg.commit(params.pk, Avail._column_poly(encoded, i))
            for i in range(codeword_size)
        ]
        du.METRICS.commitment_time += time.perf_counter() - start
        du.METRICS.commitment_size += 64 * len(commitments)
        return CommitmentAvail(commitments=commitments)

    @staticmethod
    def verify(position: du.SamplePosition, encoded: EncodedDataAvail,
               commitment: CommitmentAvail, params: PublicParamsAvail) -> bool:
        start = time.perf_counter()
        proof_start = time.perf_counter()
        poly = Avail._column_poly(encoded, position.col)
        y, w = kzg.open(params.pk, poly, 5)
        proof_time = time.perf_counter() - proof_start
        ok = kzg.verify(params.pk, 5, y, commitment.commitments[position.col], w)
        du.METRICS.verification_time += (time.perf_counter() - start) - proof_time
        du.METRICS.proof_time += proof_time
        du.METRICS.proof_size += 64
        return ok

    @staticmethod
    def reconstruct(encoded: EncodedDataAvail, params: PublicParamsAvail
                    ) -> bytes:
        start = time.perf_counter()
        codeword_size = len(encoded.codewords[0])
        coder = rs.setup_rs1d(codeword_size, params.chunk_size)
        out = []
        for row in encoded.codewords:
            dec = rs.decode_rs1d(row, coder)
            out.extend(dec)
        du.METRICS.reconstruction_time += time.perf_counter() - start
        return bytes(out[: encoded.data_size])

    @staticmethod
    def metrics() -> du.SystemMetrics:
        return du.get_metrics()
