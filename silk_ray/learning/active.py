"""Active learning — unlabeled link pool + uncertainty link selectors.

Re-expresses the reference's active-learning loop
(``silk-learning/.../active/ActiveLearning.scala``) around the GenLink
learner: generate a pool of candidate pairs from the *unlabeled* data,
learn a rule population from the labeled reference links, then pick the
candidates whose labels the committee is most uncertain about — those
are the ones worth asking a human to label next.

Semantics mirrored per component:

- pool generation (``poolgenerator/SimpleLinkPoolGenerator.scala:22-70``):
  candidate = pair sharing ≥1 trimmed value on a compatible path pair
  (the reference runs GenerateLinks with a sampling equality operator,
  capped at ``maxLinks = 1000``, then shuffles);
- committee probability (``JensenShannonDivergenceSelector.scala:63-66``):
  ``P(link | rule) = rule(pair, limit=-1) * 0.5 + 0.5``;
- EntropySelector (``EntropySelector.scala:12-28``): pick the candidate
  with maximal binary entropy of the committee vote fraction;
- JensenShannonDivergenceSelector (``:16-85``): rank candidates by the
  minimum over reference links of ``JS(p, q) + 0.5·H(q)``, take top 3;
- KullbackLeiblerDivergenceSelector (same shape with KL divergence);
- UniformSelector / RandomSelector: random picks (baseline).

Scale note: pool generation is the only corpus-sized step —
``pool_from_datasets`` extracts (value, uri) postings with
``map_batches`` and samples pairs per posting bucket; selection itself
runs over ≤ ``max_links`` candidates × a ~20-rule committee, which is
driver-sized by construction (human labeling throughput is the
bottleneck the loop optimizes, not compute).
"""

from __future__ import annotations

import math
import random as _random
from dataclasses import dataclass, field

from silk_ray.kernel.rule import Entity, rule_from_dict
from silk_ray.learning.genlink import (
    LearningConfig,
    ReferenceEntities,
    learn,
)

Pair = tuple[Entity, Entity]


@dataclass
class LinkCandidate:
    """active/LinkCandidate.scala: a scored unlabeled pair."""

    source_uri: str
    target_uri: str
    source: Entity
    target: Entity
    confidence: float | None = None

    @property
    def pair(self) -> Pair:
        return (self.source, self.target)


# ---------------------------------------------------------------------------
# pool generation
# ---------------------------------------------------------------------------


def _trimmed_values(entity: Entity, path: str) -> list[str]:
    """Distinct trimmed values in sorted order — NOT a set: pool
    construction iterates these, and set order varies with the
    interpreter's hash seed, which would make a seeded pool (and the
    whole active-learning trajectory) irreproducible across processes."""
    return sorted({v.strip() for v in entity.get(path, []) if v and v.strip()})


def pool_from_entities(
    source: list[tuple[str, Entity]],
    target: list[tuple[str, Entity]],
    path_pairs: list[tuple[str, str]],
    max_links: int = 1000,
    seed: int = 0,
) -> list[LinkCandidate]:
    """SimpleLinkPoolGenerator semantics over in-memory entities:
    inverted index on trimmed values per target path; a shared value on
    any compatible path pair yields a candidate; capped + shuffled."""
    rng = _random.Random(seed)
    out: list[LinkCandidate] = []
    seen: set[tuple[str, str]] = set()
    for spath, tpath in path_pairs:
        postings: dict[str, list[tuple[str, Entity]]] = {}
        for uri, ent in target:
            for v in _trimmed_values(ent, tpath):
                postings.setdefault(v, []).append((uri, ent))
        for s_uri, s_ent in source:
            for v in _trimmed_values(s_ent, spath):
                for t_uri, t_ent in postings.get(v, ()):
                    key = (s_uri, t_uri)
                    if key in seen or s_uri == t_uri:
                        continue
                    seen.add(key)
                    out.append(LinkCandidate(s_uri, t_uri, s_ent, t_ent))
    rng.shuffle(out)
    return out[:max_links]


def pool_from_datasets(
    source_ds,
    target_ds,
    path_pairs: list[tuple[str, str]],
    uri_col: str = "uri",
    max_links: int = 1000,
    max_bucket: int = 20,
    seed: int = 0,
) -> list[LinkCandidate]:
    """Distributed pool generation: per-side ``map_batches`` extract
    (value, uri, payload) postings, a single groupby(value) co-locates
    both sides, pairs are sampled per bucket (hot values truncated at
    ``max_bucket`` per side — the sampling operator's cap), and only
    the ≤ ``max_links`` sampled candidates reach the driver."""
    import pyarrow as pa

    from silk_ray.kernel.rule import entity_from_row

    spaths = sorted({sp for sp, _ in path_pairs})
    tpaths = sorted({tp for _, tp in path_pairs})

    def extract(side: int, paths: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            vals, uris, sides, payloads = [], [], [], []
            for row in rows:
                ent = entity_from_row({k: v for k, v in row.items() if k != uri_col})
                import json

                payload = json.dumps(ent, sort_keys=True)
                for p in paths:
                    for v in _trimmed_values(ent, p):
                        vals.append(v)
                        uris.append(str(row[uri_col]))
                        sides.append(side)
                        payloads.append(payload)
            return pa.table(
                {
                    "value": pa.array(vals, pa.string()),
                    "uri": pa.array(uris, pa.string()),
                    "side": pa.array(sides, pa.int8()),
                    "payload": pa.array(payloads, pa.string()),
                }
            )

        return fn

    posted = source_ds.map_batches(extract(1, spaths), batch_format="pyarrow").union(
        target_ds.map_batches(extract(0, tpaths), batch_format="pyarrow")
    )

    def sample_bucket(group: pa.Table) -> pa.Table:
        import json

        import zlib

        rows = group.to_pylist()
        # content-derived seed (crc32, not the per-process-salted
        # built-in hash) + sort before sampling: the same (seed, data)
        # always yields the same pool regardless of shuffle delivery
        # order
        rng = _random.Random(zlib.crc32(rows[0]["value"].encode()) ^ seed)
        srcs = sorted((r for r in rows if r["side"] == 1), key=lambda r: r["uri"])
        tgts = sorted((r for r in rows if r["side"] == 0), key=lambda r: r["uri"])
        if len(srcs) > max_bucket:
            srcs = rng.sample(srcs, max_bucket)
        if len(tgts) > max_bucket:
            tgts = rng.sample(tgts, max_bucket)
        s_out, t_out, sp_out, tp_out = [], [], [], []
        for s in srcs:
            for t in tgts:
                if s["uri"] == t["uri"]:
                    continue
                s_out.append(s["uri"])
                t_out.append(t["uri"])
                sp_out.append(s["payload"])
                tp_out.append(t["payload"])
        return pa.table(
            {
                "source": pa.array(s_out, pa.string()),
                "target": pa.array(t_out, pa.string()),
                "source_payload": pa.array(sp_out, pa.string()),
                "target_payload": pa.array(tp_out, pa.string()),
            }
        )

    sampled = posted.groupby("value").map_groups(sample_bucket, batch_format="pyarrow")
    rows = sampled.limit(max_links * 4).take_all()
    import json

    rng = _random.Random(seed)
    rng.shuffle(rows)
    seen: set[tuple[str, str]] = set()
    out: list[LinkCandidate] = []
    for r in rows:
        key = (r["source"], r["target"])
        if key in seen:
            continue
        seen.add(key)
        out.append(
            LinkCandidate(
                r["source"], r["target"],
                json.loads(r["source_payload"]), json.loads(r["target_payload"]),
            )
        )
        if len(out) >= max_links:
            break
    return out


# ---------------------------------------------------------------------------
# committee + selectors
# ---------------------------------------------------------------------------


def _committee(population: list[tuple[dict, float]], size: int = 20):
    rules = []
    for spec, _fitness in population[:size]:
        rules.append(rule_from_dict({"operator": spec["operator"]}))
    return rules


def _apply(rule, pair: Pair) -> float:
    conf = rule.apply(pair[0], pair[1], limit=-1.0)
    return -1.0 if conf is None else conf


def _probability(rule, pair: Pair) -> float:
    """P(link) ∈ [0,1] (JensenShannonDivergenceSelector.scala:63-66)."""
    return _apply(rule, pair) * 0.5 + 0.5


def _binary_entropy(p: float) -> float:
    if p <= 0.0 or p >= 1.0:
        return 0.0
    return (-p * math.log(p) - (1 - p) * math.log(1 - p)) / math.log(2)


def select_uniform(rules, candidates, ref, count: int = 3, seed: int = 0):
    """UniformSelector: random picks."""
    rng = _random.Random(seed)
    return rng.sample(candidates, min(count, len(candidates)))


def select_entropy(rules, candidates, ref, count: int = 1, seed: int = 0):
    """EntropySelector.scala:12-28: maximal committee vote entropy."""

    def entropy(c: LinkCandidate) -> float:
        fulfilled = sum(1 for r in rules if _apply(r, c.pair) > 0.0)
        return _binary_entropy(fulfilled / len(rules))

    return sorted(candidates, key=entropy, reverse=True)[:count]


class _ReferenceLinkDistance:
    """JensenShannonDivergenceSelector.ReferenceLinkDistance (:37-85)."""

    def __init__(self, pair: Pair, rules, is_pos: bool, divergence: str):
        self.divergence = divergence
        fulfilled = [
            r for r in rules if (_apply(r, pair) > 0.0) == is_pos
        ]
        self.rules = fulfilled or rules
        self.p = sum(_probability(r, pair) for r in self.rules) / len(self.rules)

    def __call__(self, pair: Pair) -> float:
        q = sum(_probability(r, pair) for r in self.rules) / len(self.rules)
        if self.divergence == "kl":
            d = self._kl(self.p, q)
        else:
            d = _binary_entropy(0.5 * (self.p + q)) - 0.5 * (
                _binary_entropy(self.p) + _binary_entropy(q)
            )
        return d + 0.5 * _binary_entropy(q)

    @staticmethod
    def _kl(p1: float, p2: float) -> float:
        eps = 1e-9
        p2 = min(max(p2, eps), 1 - eps)
        out = 0.0
        for a, b in ((p1, p2), (1 - p1, 1 - p2)):
            if a > 0.0:
                out += a * math.log(a / b) / math.log(2)
        return out


def _select_divergence(divergence: str):
    def select(rules, candidates, ref: ReferenceEntities, count: int = 3, seed: int = 0):
        dists = [
            _ReferenceLinkDistance(pair, rules, True, divergence) for pair in ref.positive
        ] + [
            _ReferenceLinkDistance(pair, rules, False, divergence) for pair in ref.negative
        ]
        if not dists:
            return select_uniform(rules, candidates, ref, count, seed)

        def rank(c: LinkCandidate) -> float:
            return min(d(c.pair) for d in dists)

        ranked = sorted(candidates, key=rank, reverse=True)
        for c in ranked[:count]:
            c.confidence = rank(c)
        return ranked[:count]

    return select


select_jensen_shannon = _select_divergence("js")
select_kullback_leibler = _select_divergence("kl")

SELECTORS = {
    "uniform": select_uniform,
    "entropy": select_entropy,
    "jensenShannonDivergence": select_jensen_shannon,
    "kullbackLeiblerDivergence": select_kullback_leibler,
}


# ---------------------------------------------------------------------------
# the active-learning loop (ActiveLearning.scala)
# ---------------------------------------------------------------------------


@dataclass
class ActiveLearner:
    """Iterate: learn population from labels → select most-informative
    unlabeled candidates → caller labels them → repeat."""

    reference: ReferenceEntities = field(default_factory=ReferenceEntities)
    config: LearningConfig = field(default_factory=lambda: LearningConfig(population_size=100, max_iterations=10))
    selector: str = "jensenShannonDivergence"
    committee_size: int = 20
    best_rule: dict | None = None
    _population: list = field(default_factory=list)

    def step(self, pool: list[LinkCandidate], count: int = 3) -> list[LinkCandidate]:
        """One loop turn: (re)learn from current labels, return the
        next candidates to label. Needs ≥1 positive label to learn; with
        none, falls back to uniform selection (bootstrap)."""
        unlabeled = [
            c for c in pool
            if not self._is_labeled(c.source_uri, c.target_uri)
        ]
        if not self.reference.positive:
            return select_uniform([], unlabeled, self.reference, count, self.config.seed)
        result = learn(self.reference, self.config, seed_rules=[s for s, _ in self._population[:5]])
        self.best_rule = result.best_rule
        self._population = result.population
        rules = _committee(result.population, self.committee_size)
        return SELECTORS[self.selector](
            rules, unlabeled, self.reference, count, self.config.seed
        )

    def label(self, candidate: LinkCandidate, is_positive: bool) -> None:
        pair = (dict(candidate.source), dict(candidate.target))
        (self.reference.positive if is_positive else self.reference.negative).append(pair)
        self._labeled.add((candidate.source_uri, candidate.target_uri))

    # labeled-pair bookkeeping (uris, not payloads)
    _labeled: set = field(default_factory=set)

    def _is_labeled(self, s: str, t: str) -> bool:
        return (s, t) in self._labeled
