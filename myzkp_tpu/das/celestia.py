"""Celestia-style DAS: 2D RS extension + row/column Merkle roots.

Capability parity with myzkp/src/modules/das/celestia.rs:34-185:
  - setup: codeword side = chunk_size * ceil(expansion)
  - encode: 2D RS of the byte square
  - commit: per-row & per-column Merkle roots + root-of-roots
  - verify: row- or column-path Merkle check of one sample
  - reconstruct: 2D RS decode

The bulk 2D encode uses the batched LUT path (all rows in one vectorized
matrix op, then all columns) instead of per-symbol object arithmetic.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

import numpy as np

from ..codes import reedsolomon as rs
from ..utils import merkle
from . import utils as du


@dataclass
class PublicParamsCelestia:
    codeword_size: int
    chunk_size: int


@dataclass
class EncodedDataCelestia:
    codewords: list  # [row][col] -> bytes (single-byte leaves)
    data_size: int


@dataclass
class CommitmentCelestia:
    row_roots: list
    col_roots: list
    data_root: bytes


class Celestia:
    @staticmethod
    def setup(chunk_size: int, expansion_factor: float, data_size: int
              ) -> PublicParamsCelestia:
        codeword_size = int(chunk_size * math.ceil(expansion_factor))
        return PublicParamsCelestia(codeword_size=codeword_size,
                                    chunk_size=chunk_size)

    @staticmethod
    def encode(data: bytes, params: PublicParamsCelestia) -> EncodedDataCelestia:
        start = time.perf_counter()
        coder = rs.setup_rs2d(params.codeword_size, params.codeword_size,
                              len(data))
        encoded = rs.encode_rs2d(list(data), coder)
        codewords = [[bytes([v]) for v in row] for row in encoded]
        result = EncodedDataCelestia(codewords=codewords, data_size=len(data))
        du.METRICS.encoding_time += time.perf_counter() - start
        du.METRICS.encoded_size += sum(len(r) for r in codewords)
        return result

    @staticmethod
    def commit(encoded: EncodedDataCelestia, params: PublicParamsCelestia
               ) -> CommitmentCelestia:
        start = time.perf_counter()
        rows = encoded.codewords
        row_roots = [merkle.commit(row) for row in rows]
        col_roots = [
            merkle.commit([row[i] for row in rows])
            for i in range(len(rows[0]))
        ]
        data_root = merkle.commit(_pad_pow2(row_roots + col_roots))
        result = CommitmentCelestia(row_roots=row_roots, col_roots=col_roots,
                                    data_root=data_root)
        du.METRICS.commitment_time += time.perf_counter() - start
        du.METRICS.commitment_size += sum(
            len(r) for r in row_roots + col_roots) + len(data_root)
        return result

    @staticmethod
    def verify(position: du.SamplePosition, encoded: EncodedDataCelestia,
               commitment: CommitmentCelestia, params: PublicParamsCelestia
               ) -> bool:
        start = time.perf_counter()
        proof_start = time.perf_counter()
        if position.is_row:
            leaves = encoded.codewords[position.row]
            proof = merkle.open(position.col, leaves)
        else:
            leaves = [row[position.col] for row in encoded.codewords]
            proof = merkle.open(position.row, leaves)
        proof_time = time.perf_counter() - proof_start

        leaf = encoded.codewords[position.row][position.col]
        if position.is_row:
            ok = merkle.verify(commitment.row_roots[position.row],
                               position.col, proof, leaf)
        else:
            ok = merkle.verify(commitment.col_roots[position.col],
                               position.row, proof, leaf)
        du.METRICS.verification_time += (time.perf_counter() - start) - proof_time
        du.METRICS.proof_time += proof_time
        du.METRICS.proof_size += sum(len(p) for p in proof)
        return ok

    @staticmethod
    def reconstruct(encoded: EncodedDataCelestia,
                    params: PublicParamsCelestia) -> bytes:
        start = time.perf_counter()
        coder = rs.setup_rs2d(params.codeword_size, params.codeword_size,
                              encoded.data_size)
        matrix = [[cell[0] for cell in row] for row in encoded.codewords]
        out = rs.decode_rs2d(matrix, coder)
        du.METRICS.reconstruction_time += time.perf_counter() - start
        return bytes(out)

    @staticmethod
    def metrics() -> du.SystemMetrics:
        return du.get_metrics()


def _pad_pow2(leaves: list) -> list:
    n = len(leaves)
    n2 = 1 << max(0, (n - 1).bit_length())
    return list(leaves) + [b""] * (n2 - n)
