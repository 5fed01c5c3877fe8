"""MultiBlock link generation as a Ray Data pipeline.

The RD re-expression of the reference's GenerateLinks/Matcher flow
(silk-rules/.../rule/execution/GenerateLinks.scala:35-196,
Matcher.scala:38-292), per SURVEY.md §2.4/§7:

1. **index stage** (``map_batches``, actor pool): per row, evaluate the
   rule's leaf-comparison inputs once and compute the MultiBlock
   blocking keys (LinkageRule.index → Index.flatten); emit exploded
   rows ``(key, side, uri, vals_0..vals_{m-1})``. Transforms run once
   per row here, never per candidate pair.
2. **shuffle**: ``groupby("key")`` co-locates rows sharing a blocking
   key (the RD equivalent of EntityCache blocks + comparisonPairs).
   Optional hot-key **salting**: keys whose row count exceeds a
   threshold are split into ``n_salt`` sub-keys (source rows hashed to
   one salt, target rows replicated to all) so one hot block cannot
   become a straggler task (north_rule skew requirement).
3. **scoring** (``map_groups``): source×target pairs in each block,
   scored via ``LinkageRule.score_from_leaf_values``; pairs kept iff
   confidence >= limit (Matcher.scala:273-281).
4. **dedup**: the same pair found in multiple blocks is deduplicated by
   ``groupby([source,target]).max(confidence)`` — equal to Silk's
   set-dedup since confidence is deterministic per pair (Link.scala:59-70).
5. **link filter**: global distinct is step 4; per-source top-k =
   ``groupby(source).map_groups`` with deterministic (‑confidence,
   target) ordering (Filter.scala:31-57).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa

from silk_ray.kernel.index import _mix64, stable_str_hash
from silk_ray.kernel.rule import LinkageRule, rule_from_dict

_RULE_CACHE: dict[str, LinkageRule] = {}


def _compile_rule(rule_spec: dict | LinkageRule) -> LinkageRule:
    if isinstance(rule_spec, LinkageRule):
        return rule_spec
    key = json.dumps(rule_spec, sort_keys=True)
    rule = _RULE_CACHE.get(key)
    if rule is None:
        rule = rule_from_dict(rule_spec)
        _RULE_CACHE[key] = rule
    return rule


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
        uri = pc.binary_join_element_wise(*[p if isinstance(p, str) else pc.cast(p, pa.string()) for p in parts], "")
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
    ]
    for i in range(n_leaves):
        fields.append(pa.field(f"vals_{i}", pa.list_(pa.string())))
    return pa.schema(fields)


class IndexStage:
    """Actor-pool stage: compile the rule once per actor (§2.3 stateful
    setup in __init__), explode blocking keys per batch in __call__."""

    def __init__(
        self,
        rule_spec: dict,
        side: int,
        limit: float = 0.0,
        hot_keys: dict[int, bool] | None = None,
        n_salt: int = 8,
        both_sides: bool = False,
    ):
        self.rule = _compile_rule(rule_spec)
        self.side = side
        self.limit = limit
        self.hot_keys = hot_keys or {}
        self.n_salt = n_salt
        self.both_sides = both_sides
        self.n_leaves = len(self.rule.leaf_comparisons())
        self.schema = _exploded_schema(self.n_leaves)

    def _emit(self, ent, uri, side, out):
        rule = self.rule
        source_or_target = side == 1
        keys = rule.index_keys(ent, source_or_target, self.limit)
        if not keys:
            return
        vals = rule.leaf_values(ent, source_or_target)
        for key in keys:
            if key in self.hot_keys:
                if side == 1:
                    salts = [stable_str_hash(uri) % self.n_salt]
                else:
                    salts = range(self.n_salt)
                for s in salts:
                    out["key"].append(_mix64(key * 31 + s + 1))
                    out["side"].append(side)
                    out["uri"].append(uri)
                    for i, v in enumerate(vals):
                        out[f"vals_{i}"].append(v)
            else:
                out["key"].append(key)
                out["side"].append(side)
                out["uri"].append(uri)
                for i, v in enumerate(vals):
                    out[f"vals_{i}"].append(v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = sorted(set(self.rule.source_paths()) | set(self.rule.target_paths()))
        entities = _batch_to_entities(batch, paths)
        uris = batch["uri"].to_pylist()
        out: dict[str, list] = {f.name: [] for f in self.schema}
        for uri, ent in zip(uris, entities):
            if self.both_sides:
                self._emit(ent, uri, 1, out)
                self._emit(ent, uri, 0, out)
            else:
                self._emit(ent, uri, self.side, out)
        arrays = [pa.array(out[f.name], type=f.type) for f in self.schema]
        return pa.Table.from_arrays(arrays, schema=self.schema)


class PairScorer:
    """Post-shuffle scoring over one block group."""

    def __init__(self, rule_spec: dict, limit: float = 0.0, source_equals_target: bool = False):
        self.rule_spec = rule_spec
        self.limit = limit
        self.source_equals_target = source_equals_target

    def __call__(self, group: pa.Table) -> pa.Table:
        rule = _compile_rule(self.rule_spec)
        n_leaves = len(rule.leaf_comparisons())
        sides = group["side"].to_numpy(zero_copy_only=False)
        uris = group["uri"].to_pylist()
        vals_cols = [group[f"vals_{i}"].to_pylist() for i in range(n_leaves)]
        src_idx = np.flatnonzero(sides == 1)
        tgt_idx = np.flatnonzero(sides == 0)
        out_s, out_t, out_c = [], [], []
        if len(src_idx) and len(tgt_idx):
            limit = self.limit
            for i in src_idx:
                s_uri = uris[i]
                s_vals = [vals_cols[k][i] for k in range(n_leaves)]
                for j in tgt_idx:
                    t_uri = uris[j]
                    if self.source_equals_target and s_uri >= t_uri:
                        continue
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
    driver-side dict broadcast into the index actors.
    """

    class KeysOnly(IndexStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            full = super().__call__(batch)
            return full.select(["key"])

    counted = (
        ds.map_batches(
            KeysOnly,
            fn_constructor_kwargs=dict(rule_spec=rule_spec, side=side, limit=limit, both_sides=both_sides),
            batch_format="pyarrow",
            concurrency=(1, 8),
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
    concurrency=(1, 8),
    batch_size: int = 4096,
):
    """Run the blocked linking pipeline; returns a Dataset
    ``(source, target, confidence)``.

    ``link_limit`` mirrors the reference default of 1,000,000 links
    (reference.conf:68-78, LinkSpec.scala:182-204). Inputs must carry a
    ``uri`` column (see :func:`add_uri_column`) plus the rule's paths.
    """
    import ray.data  # noqa: F401  (Dataset ops)

    rule = _compile_rule(rule_spec)
    spec = rule_spec if isinstance(rule_spec, dict) else None
    payload = spec if spec is not None else rule  # prefer JSON for actor ctor

    hot_keys = {}
    if salt_threshold:
        hot_keys = find_hot_keys(
            source_ds, payload, limit, salt_threshold, both_sides=source_equals_target, side=1
        )
        if target_ds is not None and not source_equals_target:
            hot_keys.update(
                find_hot_keys(target_ds, payload, limit, salt_threshold, side=0)
            )

    common = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if source_equals_target or target_ds is None:
        exploded = source_ds.map_batches(
            IndexStage,
            fn_constructor_kwargs=dict(
                rule_spec=payload, side=1, limit=limit, hot_keys=hot_keys,
                n_salt=n_salt, both_sides=True,
            ),
            **common,
        )
        source_equals_target = True
    else:
        src = source_ds.map_batches(
            IndexStage,
            fn_constructor_kwargs=dict(rule_spec=payload, side=1, limit=limit, hot_keys=hot_keys, n_salt=n_salt),
            **common,
        )
        tgt = target_ds.map_batches(
            IndexStage,
            fn_constructor_kwargs=dict(rule_spec=payload, side=0, limit=limit, hot_keys=hot_keys, n_salt=n_salt),
            **common,
        )
        exploded = src.union(tgt)

    scorer = PairScorer(payload, limit=limit, source_equals_target=source_equals_target)

    def score_block(group: pa.Table) -> pa.Table:
        return scorer(group)

    scored = exploded.groupby("key").map_groups(score_block, batch_format="pyarrow")

    # dedup pairs found in multiple blocks (deterministic confidence → Max)
    from ray.data.aggregate import Max

    links = scored.groupby(["source", "target"]).aggregate(
        Max("confidence", alias_name="confidence")
    )

    if rule.filter_limit:
        links = links.groupby("source").map_groups(
            _topk_filter(rule.filter_limit), batch_format="pandas"
        )
    if link_limit is not None:
        links = links.limit(link_limit)
    return links
