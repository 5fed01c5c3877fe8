"""Blocking index — the MultiBlock candidate-generation abstraction.

Semantics follow the reference's ``Index``
(``silk-core/src/main/scala/org/silkframework/entity/Index.scala``):

- an index is a set of multi-dimensional integer vectors plus a
  per-dimension size; two entities are candidate pairs iff their
  indices share at least one vector (``matches``, Index.scala:38);
- ``disjunction`` pads both sides to a common dimensionality and
  offsets the right side's values by the left side's sizes so the key
  spaces cannot collide (Index.scala:68-78);
- ``conjunction`` is the cross-product concatenation (Index.scala:84-89);
- ``merge`` unions two same-dimensional indices (Index.scala:94-101);
- ``flatten`` radix-combines each vector into a scalar (Index.scala:55-62) —
  we use unbounded Python ints during radix combination and then mix
  down to a stable signed-64-bit key (the reference relies on JVM int
  overflow; only the "same vector ⇒ same scalar" property matters for
  correctness, collisions merely add candidate pairs);
- ``continuous`` maps a numeric value to one or two overlapping blocks
  (Index.scala:138-159);
- ``crop`` caps the number of vectors (Index.scala:104) to bound
  index explosion from conjunctions.

Implementation notes: vectors are tuples of ints, sizes a tuple of
ints. All operations are pure; instances are cheap short-lived objects
created per entity inside ``map_batches`` workers.
"""

from __future__ import annotations

import functools

INT_MAX = 2**31 - 1
_MASK64 = (1 << 64) - 1


def _mix64(x: int) -> int:
    """Deterministic splitmix64-style finalizer → non-negative 63-bit int."""
    x &= _MASK64
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & _MASK64
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & _MASK64
    x ^= x >> 31
    return x & 0x7FFFFFFFFFFFFFFF


def stable_str_hash(s: str) -> int:
    """Stable 32-bit-ish hash for blocking keys (crc32: fast C impl).

    Plays the role of Java's ``String.hashCode`` in the reference's
    equality / Jaccard index functions (e.g. EqualityMetric.scala:64,
    JaccardDistance.scala:45). Exact bit-compatibility is not needed —
    only determinism across processes.
    """
    import zlib

    return zlib.crc32(s.encode("utf-8", "surrogatepass"))


@functools.lru_cache(maxsize=1 << 18)
def md5_lower64(s: str) -> int:
    """Lower 64 bits of md5 (little-endian of digest bytes 8..16) —
    equals DuckDB's ``md5_number_lower``. Used wherever a pipeline hash
    must be reproducible by the SQL oracles (kmvTokens sketch order,
    MinHash/SimHash token hashing, jaccardMinhashLSH signatures).

    lru_cache (process-level, so shared across batches within a Ray
    worker): the inputs are natural-language shingles/tokens, whose
    reuse is Zipfian — at corpus scale the per-shingle md5 was the
    dominant CPU of the MinHash/KMV/SimHash family (~10^11 calls at
    100 TB), and most of them are repeats of a small hot vocabulary.
    256k entries of short shingles is a few tens of MB per worker —
    bounded and a pure win; the value is deterministic so caching is
    semantically invisible (the SQL oracles stay exact)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()[8:], "little")


def md5_lower64_batch(arr):
    """``md5_lower64`` over a pyarrow string Array/ChunkedArray →
    uint64 numpy array, via the engine's dictionary-encode idiom
    (cdc/merge._crc_keys): each DISTINCT value is hashed once in one
    tight generator pass (bypassing the LRU — a batch of mostly-unique
    inputs would only churn it), per-row values come from a numpy
    take. md5 has no vectorized kernel in this stack, so the per-unique
    generator is the floor; everything around it is array-at-a-time."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    md5 = hashlib.md5
    h_u = np.fromiter(
        (
            int.from_bytes(md5(s.encode("utf-8", "surrogatepass")).digest()[8:], "little")
            for s in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    if not len(uniq):
        return np.empty(0, np.uint64)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return h_u[idx]


class Index:
    __slots__ = ("indices", "sizes")

    def __init__(self, indices: frozenset[tuple[int, ...]], sizes: tuple[int, ...]):
        self.indices = indices
        self.sizes = sizes

    # -- constructors (Index.scala companion object) --------------------
    @staticmethod
    def empty() -> "Index":
        return Index(frozenset(), (1,))

    @staticmethod
    def default() -> "Index":
        return Index(frozenset({(0,)}), (1,))

    @staticmethod
    def one_dim(values, size: int = INT_MAX) -> "Index":
        return Index(frozenset((v,) for v in values), (size,))

    @staticmethod
    def multi_dim(indices, dim_count: int) -> "Index":
        return Index(frozenset(tuple(i) for i in indices), tuple([INT_MAX] * dim_count))

    @staticmethod
    def blocks(block_ids) -> "Index":
        out = set()
        for b in block_ids:
            if b == -(2**31):
                out.add((0,))
            elif b == INT_MAX:
                out.add((INT_MAX - 1,))
            else:
                out.add((abs(b),))
        return Index(frozenset(out), (INT_MAX,))

    @staticmethod
    def continuous(
        value: float,
        min_value: float,
        max_value: float,
        limit: float | None = None,
        block_count: int | None = None,
        overlap: float = 0.5,
    ) -> "Index":
        """Overlapping-range numeric blocking (Index.scala:138-159)."""
        if block_count is None:
            block_count = int((max_value - min_value) / limit * overlap)
        if block_count <= 0:
            return Index.one_dim(set(), max(block_count, 1))
        block = (value - min_value) / (max_value - min_value) * block_count
        bi = int(block)
        if block <= 0.5:
            ids = {0}
        elif block >= block_count - 0.5:
            ids = {block_count - 1}
        elif block - bi < overlap:
            ids = {bi, bi - 1}
        elif block + 1 - bi < overlap:
            ids = {bi, bi + 1}
        else:
            ids = {bi}
        return Index.one_dim(ids, block_count)

    @staticmethod
    def continuous_empty(min_value: float, max_value: float, limit: float, overlap: float = 0.5) -> "Index":
        block_count = int((max_value - min_value) / limit * overlap)
        return Index.one_dim(set(), max(block_count, 1))

    # -- core ops --------------------------------------------------------
    @property
    def size(self) -> int:
        return len(self.indices)

    @property
    def dimensions(self) -> int:
        return len(self.sizes)

    def is_empty(self) -> bool:
        return not self.indices

    def matches(self, other: "Index") -> bool:
        return not self.indices.isdisjoint(other.indices)

    def disjunction(self, other: "Index") -> "Index":
        dims = max(len(self.sizes), len(other.sizes))
        left = {idx + (0,) * (dims - len(idx)) for idx in self.indices}
        # offset the right side's values by the left side's sizes
        sizes1 = self.sizes + (1,) * (dims - len(self.sizes))
        right = set()
        for idx in other.indices:
            padded = idx + (0,) * (dims - len(idx))
            right.add(tuple(v + s for v, s in zip(padded, sizes1)))
        sizes2 = other.sizes + (1,) * (dims - len(other.sizes))
        combined_sizes = tuple(s1 + s2 for s1, s2 in zip(sizes1, sizes2))
        return Index(frozenset(left | right), combined_sizes)

    def conjunction(self, other: "Index") -> "Index":
        combined = frozenset(i1 + i2 for i1 in self.indices for i2 in other.indices)
        return Index(combined, self.sizes + other.sizes)

    def merge(self, other: "Index") -> "Index":
        if len(self.sizes) != len(other.sizes):
            raise ValueError("Indexes must have same number of dimensions")
        sizes = tuple(max(s1, s2) for s1, s2 in zip(self.sizes, other.sizes))
        return Index(self.indices | other.indices, sizes)

    def crop(self, max_size: int) -> "Index":
        if len(self.indices) <= max_size:
            return self
        # deterministic truncation (the reference's Set.take is
        # implementation-ordered; we sort for reproducibility)
        kept = frozenset(sorted(self.indices)[:max_size])
        return Index(kept, self.sizes)

    def flatten(self) -> set[int]:
        """Radix-combine each vector to a stable signed-63-bit scalar."""
        out = set()
        for idx in self.indices:
            flat = 0
            for v, blocks in zip(idx, self.sizes):
                flat = flat * blocks + v
            out.add(_mix64(flat))
        return out

    def __eq__(self, other) -> bool:
        return isinstance(other, Index) and self.indices == other.indices

    def __hash__(self) -> int:
        return hash(self.indices)

    def __repr__(self) -> str:
        return f"Index({sorted(self.indices)!r}, sizes={self.sizes!r})"
