"""Fiat-Shamir transcript (proof stream) with SHAKE256 challenges.

Capability parity with myzkp/src/modules/algebra/fiat_shamir.rs:11-70:
push/pull of serialized-object lists, prover challenge = SHAKE256 over the
whole serialized stream, verifier challenge = SHAKE256 over the prefix read
so far, and (de)serialization of the stream as the wire-format proof.

The byte format matches the reference's bincode encoding of
``Vec<Vec<Vec<u8>>>`` (u64-LE length prefixes at every level), so challenge
bytes are reproducible across the two implementations for identical pushes.
"""

from __future__ import annotations

import hashlib
import struct


class FiatShamirTransformer:
    def __init__(self, objects: list[list[bytes]] | None = None):
        self.objects: list[list[bytes]] = objects or []
        self.read_index = 0

    # -- stream ops (parity: fiat_shamir.rs:22-36) ---------------------------
    def push(self, obj: list[bytes]) -> None:
        self.objects.append(list(obj))

    def pull(self) -> list[bytes]:
        if self.read_index >= len(self.objects):
            raise IndexError("ProofStream: cannot pull object; queue empty.")
        obj = self.objects[self.read_index]
        self.read_index += 1
        return obj

    # -- serialization (bincode-compatible; fiat_shamir.rs:37-48) ------------
    @staticmethod
    def _ser(objects: list[list[bytes]]) -> bytes:
        out = [struct.pack("<Q", len(objects))]
        for obj in objects:
            out.append(struct.pack("<Q", len(obj)))
            for b in obj:
                out.append(struct.pack("<Q", len(b)))
                out.append(b)
        return b"".join(out)

    def serialize(self) -> bytes:
        return self._ser(self.objects)

    @classmethod
    def deserialize(cls, bb: bytes) -> "FiatShamirTransformer":
        off = 0

        def read_u64():
            nonlocal off
            (v,) = struct.unpack_from("<Q", bb, off)
            off += 8
            return v

        n = read_u64()
        objects = []
        for _ in range(n):
            m = read_u64()
            obj = []
            for _ in range(m):
                k = read_u64()
                obj.append(bb[off : off + k])
                off += k
            objects.append(obj)
        return cls(objects)

    # -- challenges (parity: fiat_shamir.rs:50-69) ---------------------------
    def prover_fiat_shamir(self, num_bytes: int = 32) -> bytes:
        return hashlib.shake_256(self.serialize()).digest(num_bytes)

    def verifier_fiat_shamir(self, num_bytes: int = 32) -> bytes:
        return hashlib.shake_256(self._ser(self.objects[: self.read_index])).digest(
            num_bytes
        )
