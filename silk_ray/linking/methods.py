"""Pluggable execution methods — alternate blocking strategies.

Mirrors the reference's ``ExecutionMethod`` hierarchy
(``silk-rules/.../rule/execution/methods/``):

| id | semantics | citation |
|---|---|---|
| ``MultiBlock`` | rule-derived index (the default; handled natively by ``LinkageRule.index``) | MultiBlock.scala:10-12 |
| ``Full`` | cartesian: every entity in one block | Full.scala:10-12 |
| ``Blocking`` | single key path through a transformer chain (default Soundex) | Blocking.scala:19-31 |
| ``MultiPassBlocking`` | union of several key paths | MultiPassBlocking.scala:13-20 |
| ``CompositeBlocking`` | concatenation of two key paths | CompositeBlocking.scala:11-21 |
| ``SortedBlocks`` | sorted prefix mapped to overlapping continuous blocks | SortedBlocks.scala:10-44 |
| ``QGrams`` | q-gram sub-list blocking | QGrams.scala:21-54 |

Each method maps an entity to a set of int64 block keys; plugged into
the linking pipeline via ``generate_links(execution_method=...)``,
replacing the rule-derived MultiBlock index while scoring stays
identical (ExecutionMethod.scala:21-42 separates candidate generation
from rule evaluation the same way).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from silk_ray.kernel.index import Index, stable_str_hash
from silk_ray.kernel.rule import Entity
from silk_ray.kernel.transformers import Transformer, get_transformer


class ExecutionMethod:
    id: str = ""

    def index_keys(self, entity: Entity, source_or_target: bool) -> set[int]:
        raise NotImplementedError


@dataclass
class FullMethod(ExecutionMethod):
    """Cartesian product (Full.scala): Index.default for everyone."""

    id = "Full"

    def index_keys(self, entity, source_or_target):
        return {0}


@dataclass
class BlockingMethod(ExecutionMethod):
    """Key path + transformer chain, default Soundex (Blocking.scala:19-31)."""

    id = "Blocking"
    blocking_path: str = ""
    transformers: list[Transformer] = field(default_factory=lambda: [get_transformer("soundex")])

    def index_keys(self, entity, source_or_target):
        values = entity.get(self.blocking_path, [])
        for t in self.transformers:
            values = t.apply([values])
        return {stable_str_hash(v) for v in values}


@dataclass
class MultiPassBlocking(ExecutionMethod):
    """Union over several blocking key paths (MultiPassBlocking.scala:13-20)."""

    id = "MultiPassBlocking"
    passes: list[BlockingMethod] = field(default_factory=list)

    def index_keys(self, entity, source_or_target):
        out: set[int] = set()
        for i, p in enumerate(self.passes):
            # offset per pass so keys from different passes never collide
            out.update((k * len(self.passes) + i) & 0x7FFFFFFFFFFFFFFF for k in p.index_keys(entity, source_or_target))
        return out


@dataclass
class CompositeBlocking(ExecutionMethod):
    """Concatenated two-key blocks (CompositeBlocking.scala:11-21):
    candidates must share a key in BOTH passes."""

    id = "CompositeBlocking"
    first: BlockingMethod = None
    second: BlockingMethod = None

    def index_keys(self, entity, source_or_target):
        k1 = self.first.index_keys(entity, source_or_target)
        k2 = self.second.index_keys(entity, source_or_target)
        idx = Index.one_dim(k1).conjunction(Index.one_dim(k2))
        return idx.flatten()


@dataclass
class SortedBlocksMethod(ExecutionMethod):
    """Prefix-mapped continuous index with overlap (SortedBlocks.scala:10-44):
    the value's leading characters map to a position in [0,1); positions
    within ``overlap`` of a block boundary join both blocks."""

    id = "SortedBlocks"
    blocking_path: str = ""
    size: int = 100
    overlap: float = 0.5

    def _position(self, value: str) -> float:
        # base-27 fraction of the first characters (a-z + other)
        pos = 0.0
        scale = 1.0
        for ch in value.lower()[:6]:
            c = ord(ch) - ord("a")
            c = min(max(c, -1), 25) + 1  # non-letters → 0
            scale /= 27.0
            pos += c * scale
        return min(pos, 0.9999999)

    def index_keys(self, entity, source_or_target):
        out: set[int] = set()
        for v in entity.get(self.blocking_path, []):
            idx = Index.continuous(
                self._position(v), 0.0, 1.0, block_count=self.size, overlap=self.overlap
            )
            out.update(idx.flatten())
        return out


@dataclass
class QGramsMethod(ExecutionMethod):
    """q-gram sub-list blocking (QGrams.scala:21-54): index a fraction
    ``threshold`` of each value's q-grams."""

    id = "QGrams"
    blocking_path: str = ""
    q: int = 2
    threshold: float = 0.5

    def index_keys(self, entity, source_or_target):
        from silk_ray.kernel.distances import q_grams

        out: set[int] = set()
        for v in entity.get(self.blocking_path, []):
            grams = q_grams(v, self.q)
            take = int(round(len(grams) * self.threshold + 0.5))
            out.update(stable_str_hash(g) for g in grams[:take])
        return out
