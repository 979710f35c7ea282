"""SHA3-256 Merkle tree with stored levels.

Capability parity with myzkp/src/modules/algebra/merkle.rs:15-66, with the
same node semantics (leaves are used raw — the commit of a single leaf is the
leaf itself; interior node = SHA3-256(left || right)) so `verify` accepts the
same (root, index, path, leaf) tuples.

Re-design: the reference's `open` recomputes the sibling subtree commit at
every level — O(n log n) hash work per path (merkle.rs:28-46).  Here the tree
stores all levels at build time: commit is O(n) once, every open is O(log n)
lookups.
"""

from __future__ import annotations

import hashlib


def _h(data: bytes) -> bytes:
    return hashlib.sha3_256(data).digest()


class MerkleTree:
    """Stored-level Merkle tree over a power-of-two list of byte leaves."""

    def __init__(self, leaves: list[bytes]):
        n = len(leaves)
        assert n >= 1 and (n & (n - 1)) == 0, "leaf count must be a power of two"
        self.levels = [list(leaves)]
        from .. import native as _native

        native_levels = _native.merkle_levels(self.levels[0])
        if native_levels is not None:
            self.levels.extend(native_levels)
            return
        cur = self.levels[0]
        while len(cur) > 1:
            nxt = [_h(cur[i] + cur[i + 1]) for i in range(0, len(cur), 2)]
            self.levels.append(nxt)
            cur = nxt

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def open(self, index: int) -> list[bytes]:
        """Auth path, leaf level first (parity: merkle.rs:28-46)."""
        path = []
        for lvl in self.levels[:-1]:
            path.append(lvl[index ^ 1])
            index >>= 1
        return path


class DistMerkleTree:
    """Merkle tree built as D independent subtrees + a top tree (SURVEY §5
    "Merkle subtree parallelism").

    The leaf list is split into ``n_shards`` contiguous power-of-two chunks —
    the layout of a codeword sharded over a device mesh, where each host
    hashes only the leaves it already holds — subtree roots are then gathered
    and reduced by a tiny top tree.  Subtrees hash concurrently (the native
    SHA3 batch kernel releases the GIL via ctypes).  The root and every auth
    path are bit-identical to the monolithic ``MerkleTree`` over the same
    leaves (node semantics of merkle.rs:15-66).
    """

    def __init__(self, leaves: list[bytes], n_shards: int,
                 parallel: bool = True):
        n = len(leaves)
        assert n >= 1 and (n & (n - 1)) == 0, "leaf count must be a power of two"
        assert n_shards >= 1 and (n_shards & (n_shards - 1)) == 0
        assert n % n_shards == 0 and n // n_shards >= 1
        self.n = n
        self.n_shards = n_shards
        self.shard_size = n // n_shards
        chunks = [leaves[i * self.shard_size : (i + 1) * self.shard_size]
                  for i in range(n_shards)]
        if parallel and n_shards > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(n_shards, 8)) as ex:
                self.subtrees = list(ex.map(MerkleTree, chunks))
        else:
            self.subtrees = [MerkleTree(c) for c in chunks]
        self.top = MerkleTree([t.root for t in self.subtrees])

    @property
    def root(self) -> bytes:
        return self.top.root

    def open(self, index: int) -> list[bytes]:
        """Auth path, leaf level first — verifies with ``verify`` against
        ``root`` exactly like a monolithic tree's path."""
        shard, local = divmod(index, self.shard_size)
        return self.subtrees[shard].open(local) + self.top.open(shard)


def commit(leaves: list[bytes]) -> bytes:
    """One-shot root (parity: merkle.rs:15-25)."""
    return MerkleTree(leaves).root


def open(index: int, leaves: list[bytes]) -> list[bytes]:
    """One-shot auth path (parity: merkle.rs:28-46)."""
    return MerkleTree(leaves).open(index)


def verify(root: bytes, index: int, path: list[bytes], leaf: bytes) -> bool:
    """Parity: merkle.rs:49-66."""
    cur = leaf
    for sib in path:
        cur = _h(cur + sib) if index % 2 == 0 else _h(sib + cur)
        index >>= 1
    return cur == root
