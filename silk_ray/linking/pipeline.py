"""MultiBlock link generation as a Ray Data pipeline.

The RD re-expression of the reference's GenerateLinks/Matcher flow
(silk-rules/.../rule/execution/GenerateLinks.scala:35-196,
Matcher.scala:38-292), per SURVEY.md §2.4/§7:

1. **index stage** (``map_batches`` tasks; per-worker compiled-rule
   cache): per row, evaluate the rule's leaf-comparison inputs once and
   compute the MultiBlock blocking keys (LinkageRule.index →
   Index.flatten); emit exploded rows ``(key, side, uri, keys,
   vals_0..vals_{m-1})``. Transforms run once per row here, never per
   candidate pair.
2. **shuffle**: ``groupby("key")`` co-locates rows sharing a blocking
   key (the RD equivalent of EntityCache blocks + comparisonPairs).
   Optional hot-key **salting**: keys whose row count exceeds a
   threshold are split into ``n_salt`` sub-keys (source rows hashed to
   one salt, target rows replicated to all) so one hot block cannot
   become a straggler task (north_rule skew requirement).
3. **scoring** (``map_groups``): source×target pairs in each block.
   Each exploded row carries its full emitted key set; a pair is scored
   ONLY in its minimum common key's group, so every pair is scored and
   emitted exactly once — Silk's set-dedup of links (Link.scala:59-70)
   without a dedup shuffle, and no duplicate scoring work.
   Pairs kept iff confidence >= limit (Matcher.scala:273-281).
4. **link filter**: per-source top-k = ``groupby(source).map_groups``
   with deterministic (-confidence, target) ordering (Filter.scala:31-57).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa

from silk_ray.kernel.index import _mix64, stable_str_hash
from silk_ray.kernel.rule import LinkageRule, rule_from_dict

_RULE_CACHE: dict[str, LinkageRule] = {}
_STAGE_CACHE: dict[str, Any] = {}


def _compile_rule(rule_spec: dict | LinkageRule) -> LinkageRule:
    if isinstance(rule_spec, LinkageRule):
        return rule_spec
    key = json.dumps(rule_spec, sort_keys=True)
    rule = _RULE_CACHE.get(key)
    if rule is None:
        rule = rule_from_dict(rule_spec)
        _RULE_CACHE[key] = rule
    return rule


def cached_stage(cls, **kwargs):
    """Task-friendly stage factory: returns a plain function whose
    underlying stage object is constructed once per worker process and
    cached (regex compiles / rule compilation amortized) — cheaper than
    an actor pool for lightweight state, since tasks reuse Ray's warm
    worker pool with no per-execution pool spin-up."""
    import cloudpickle

    blob = cloudpickle.dumps((cls, kwargs))
    cache_key = f"{cls.__module__}.{cls.__qualname__}:{hash(blob)}"

    def fn(batch):
        stage = _STAGE_CACHE.get(cache_key)
        if stage is None:
            c, kw = cloudpickle.loads(blob)
            stage = c(**kw)
            _STAGE_CACHE[cache_key] = stage
        return stage(batch)

    return fn


def add_uri_column(ds, cols=("repo", "path"), sep: str = "//", name: str = "uri"):
    """Append a composite natural-key URI column (Entity.uri equivalent;
    uri = repo + '//' + path per BASELINE.json input_hint)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        parts = []
        for i, c in enumerate(cols):
            if i:
                parts.append(sep)
            parts.append(batch[c])
        uri = pc.binary_join_element_wise(
            *[p if isinstance(p, str) else pc.cast(p, pa.string()) for p in parts], ""
        )
        return batch.append_column(name, uri)

    return ds.map_batches(fn, batch_format="pyarrow")


def _batch_to_entities(batch: pa.Table, paths: list[str]) -> list[dict]:
    cols = {}
    for p in paths:
        if p in batch.column_names:
            cols[p] = batch[p].to_pylist()
    n = batch.num_rows
    out = []
    for i in range(n):
        ent = {}
        for p, vals in cols.items():
            v = vals[i]
            if v is None:
                ent[p] = []
            elif isinstance(v, list):
                ent[p] = ["" if x is None else str(x) for x in v]
            else:
                ent[p] = [str(v)]
        out.append(ent)
    return out


def _exploded_schema(n_leaves: int) -> pa.Schema:
    fields = [
        pa.field("key", pa.int64()),
        pa.field("side", pa.int8()),
        pa.field("uri", pa.string()),
        pa.field("keys", pa.list_(pa.int64())),
    ]
    for i in range(n_leaves):
        fields.append(pa.field(f"vals_{i}", pa.list_(pa.string())))
    return pa.schema(fields)


class IndexStage:
    """Index-explosion stage body (state constructed once per worker via
    :func:`cached_stage`)."""

    def __init__(
        self,
        rule_spec: dict,
        side: int,
        limit: float = 0.0,
        hot_keys: dict[int, bool] | None = None,
        n_salt: int = 8,
        both_sides: bool = False,
        keys_only: bool = False,
    ):
        self.rule = _compile_rule(rule_spec)
        self.side = side
        self.limit = limit
        self.hot_keys = hot_keys or {}
        self.n_salt = n_salt
        self.both_sides = both_sides
        self.keys_only = keys_only
        self.n_leaves = len(self.rule.leaf_comparisons())
        self.schema = _exploded_schema(self.n_leaves)

    def _emit(self, ent, uri, side, out):
        rule = self.rule
        source_or_target = side == 1
        keys = rule.index_keys(ent, source_or_target, self.limit)
        if not keys:
            return
        if self.keys_only:
            for key in keys:
                out["key"].append(key)
            return
        vals = rule.leaf_values(ent, source_or_target)
        emitted: list[int] = []
        for key in sorted(keys):
            if key in self.hot_keys:
                if side == 1:
                    salts = [stable_str_hash(uri) % self.n_salt]
                else:
                    salts = range(self.n_salt)
                for s in salts:
                    emitted.append(_mix64(key * 31 + s + 1))
            else:
                emitted.append(key)
        for key in emitted:
            out["key"].append(key)
            out["side"].append(side)
            out["uri"].append(uri)
            out["keys"].append(emitted)
            for i, v in enumerate(vals):
                out[f"vals_{i}"].append(v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = sorted(set(self.rule.source_paths()) | set(self.rule.target_paths()))
        entities = _batch_to_entities(batch, paths)
        uris = batch["uri"].to_pylist()
        if self.keys_only:
            out: dict[str, list] = {"key": []}
            for uri, ent in zip(uris, entities):
                if self.both_sides:
                    self._emit(ent, uri, 1, out)
                    self._emit(ent, uri, 0, out)
                else:
                    self._emit(ent, uri, self.side, out)
            return pa.table({"key": pa.array(out["key"], pa.int64())})
        out = {f.name: [] for f in self.schema}
        for uri, ent in zip(uris, entities):
            if self.both_sides:
                self._emit(ent, uri, 1, out)
                self._emit(ent, uri, 0, out)
            else:
                self._emit(ent, uri, self.side, out)
        arrays = [pa.array(out[f.name], type=f.type) for f in self.schema]
        return pa.Table.from_arrays(arrays, schema=self.schema)


class PairScorer:
    """Post-shuffle scoring over one block group (min-common-key dedup:
    each pair scored exactly once across all its shared blocks)."""

    def __init__(self, rule_spec: dict, limit: float = 0.0, source_equals_target: bool = False):
        self.rule_spec = rule_spec
        self.limit = limit
        self.source_equals_target = source_equals_target

    def __call__(self, group: pa.Table) -> pa.Table:
        rule = _compile_rule(self.rule_spec)
        n_leaves = len(rule.leaf_comparisons())
        group_key = group["key"][0].as_py()
        sides = group["side"].to_numpy(zero_copy_only=False)
        uris = group["uri"].to_pylist()
        key_lists = group["keys"].to_pylist()
        key_sets = [frozenset(k) for k in key_lists]
        vals_cols = [group[f"vals_{i}"].to_pylist() for i in range(n_leaves)]
        src_idx = np.flatnonzero(sides == 1)
        tgt_idx = np.flatnonzero(sides == 0)
        out_s, out_t, out_c = [], [], []
        if len(src_idx) and len(tgt_idx):
            limit = self.limit
            for i in src_idx:
                s_uri = uris[i]
                s_keys = key_sets[i]
                s_vals = [vals_cols[k][i] for k in range(n_leaves)]
                for j in tgt_idx:
                    t_uri = uris[j]
                    if self.source_equals_target and s_uri >= t_uri:
                        continue
                    common = s_keys & key_sets[j]
                    if min(common) != group_key:
                        continue  # scored in a smaller shared block
                    t_vals = [vals_cols[k][j] for k in range(n_leaves)]
                    score = rule.score_from_leaf_values(s_vals, t_vals, limit)
                    if score is not None and score >= limit:
                        out_s.append(s_uri)
                        out_t.append(t_uri)
                        out_c.append(score)
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "target": pa.array(out_t, pa.string()),
                "confidence": pa.array(out_c, pa.float64()),
            }
        )


def _topk_filter(limit_per_source: int):
    import pandas as pd

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic: confidence desc, target asc (sha256-reproducibility,
        # SURVEY.md §7.3) — Filter.scala:40-44
        g = g.sort_values(["confidence", "target"], ascending=[False, True], kind="mergesort")
        return g.head(limit_per_source)

    return fn


def find_hot_keys(ds, rule_spec, limit, threshold, both_sides=False, side=1):
    """Pre-pass: count rows per blocking key, return keys above threshold.

    Cheap rows (one int64 per exploded key); the result is a small
    driver-side dict broadcast into the index tasks."""
    counted = (
        ds.map_batches(
            cached_stage(
                IndexStage,
                rule_spec=rule_spec,
                side=side,
                limit=limit,
                both_sides=both_sides,
                keys_only=True,
            ),
            batch_format="pyarrow",
        )
        .groupby("key")
        .count()
    )
    hot = {}
    for b in counted.iter_batches(batch_format="pyarrow"):
        keys = b["key"].to_pylist()
        counts = b["count()"].to_pylist()
        for k, c in zip(keys, counts):
            if c > threshold:
                hot[k] = True
    return hot


def generate_links(
    source_ds,
    target_ds=None,
    rule_spec: dict | LinkageRule | None = None,
    *,
    limit: float = 0.0,
    link_limit: int | None = 1_000_000,
    source_equals_target: bool = False,
    salt_threshold: int | None = None,
    n_salt: int = 8,
    batch_size: int = 4096,
):
    """Run the blocked linking pipeline; returns a Dataset
    ``(source, target, confidence)`` with each pair exactly once.

    ``link_limit`` mirrors the reference default of 1,000,000 links
    (reference.conf:68-78, LinkSpec.scala:182-204). Inputs must carry a
    ``uri`` column (see :func:`add_uri_column`) plus the rule's paths.
    """
    import ray.data  # noqa: F401  (Dataset ops)

    rule = _compile_rule(rule_spec)
    spec = rule_spec if isinstance(rule_spec, dict) else None
    payload = spec if spec is not None else rule  # prefer JSON for worker cache

    hot_keys = {}
    if salt_threshold:
        hot_keys = find_hot_keys(
            source_ds, payload, limit, salt_threshold, both_sides=source_equals_target, side=1
        )
        if target_ds is not None and not source_equals_target:
            hot_keys.update(find_hot_keys(target_ds, payload, limit, salt_threshold, side=0))

    common = dict(batch_format="pyarrow", batch_size=batch_size)
    if source_equals_target or target_ds is None:
        exploded = source_ds.map_batches(
            cached_stage(
                IndexStage,
                rule_spec=payload,
                side=1,
                limit=limit,
                hot_keys=hot_keys,
                n_salt=n_salt,
                both_sides=True,
            ),
            **common,
        )
        source_equals_target = True
    else:
        src = source_ds.map_batches(
            cached_stage(IndexStage, rule_spec=payload, side=1, limit=limit, hot_keys=hot_keys, n_salt=n_salt),
            **common,
        )
        tgt = target_ds.map_batches(
            cached_stage(IndexStage, rule_spec=payload, side=0, limit=limit, hot_keys=hot_keys, n_salt=n_salt),
            **common,
        )
        exploded = src.union(tgt)

    scorer = PairScorer(payload, limit=limit, source_equals_target=source_equals_target)

    def score_block(group: pa.Table) -> pa.Table:
        return scorer(group)

    links = exploded.groupby("key").map_groups(score_block, batch_format="pyarrow")

    if rule.filter_limit:
        links = links.groupby("source").map_groups(
            _topk_filter(rule.filter_limit), batch_format="pandas"
        )
    if link_limit is not None:
        links = links.limit(link_limit)
    return links
