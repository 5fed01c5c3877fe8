"""Incrementally maintained aggregate views (materialized GROUP BY)
over the CDC lake.

The engine maintains the *row* state per epoch (cdc/merge.py), the
*link* set (cdc/incremental.py) and the *cluster* table
(cdc/clusters.py); this module maintains materialized aggregates —
``GROUP BY g → count(*), SUM(expr)…`` — the standing dashboards /
feature-stat tables every ingest pipeline keeps next to the lake
(the reference emits per-execution transform/link reports,
e.g. silk-rules TransformReport / ExecutionReport; a continuously
tailing engine needs the maintained equivalent).

Delta-native: the merge stage already writes, per epoch and partition,
a *dirty delta* file carrying ``change ∈ {I,U,D}`` plus the full
``old_*``/``new_*`` payload of every changed key (merge.py
``_dirty_table``). That is exactly the Δ a subtractable aggregate
needs:

    I → +new      U → +new −old      D → −old

so per epoch the view update reads ONLY the dirty files (O(delta)),
pre-aggregates contributions inside ``map_batches`` (one partial row
per distinct touched group per batch), and merges the combined group
delta into the stored view. Sum measures are **exact-integer sums**
(``sum`` of an int column, ``sum_strlen`` of a string column) — order-
independent and replay-byte-identical, unlike float accumulation;
count-0 groups must zero out exactly and are dropped (enforced: a
nonzero residue raises).

**min/max** are not subtractable (a delete of a group's extremum
would need a group rescan), so they are maintained through the
classic IVM *support structure*: a co-sharded ``(group, value) →
count`` store, whose per-value count IS subtractable and therefore
updates in O(delta); the group's min/max reduce over its surviving
support rows at read time. Storage is O(groups × distinct values per
group) — declare min/max over bounded-cardinality columns.

Storage is an LSM-ish sharded manifest, the same idiom as the link
store: the view is hash-sharded by group key (crc32, interpreter-
independent) into ``num_shards`` parquet files; an epoch rewrites only
the shards whose groups were touched, the manifest carries every other
shard file forward verbatim — per-epoch I/O is O(delta), not O(view).
Commit is an atomic ``_aggstate.json`` pointer swap with per-epoch
snapshots for as-of-epoch reads and retention-aware GC, exactly like
the lake / links / clusters stores. A catch-up lag beyond the dirty-
file retention window triggers a loud FULL rebuild (one streaming pass
over ``snapshot_dataset``), which is always correct, and the metrics
say it happened.

Multi-node: dirty reads, contribution partials and the full-rebuild
scan are Dataset stages; only the combined per-epoch group delta
(O(touched groups)) and the manifest are driver-held. Shard rewrites
fan out as one Ray task per affected shard.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from silk_ray.cdc import checkpoint as ckpt

# measure fns: name -> (evaluate(column) -> int64 array, nulls already 0)
_NULL_TOKEN = "\x00\x00null"  # group-key serialization marker for shard hashing


@dataclass(frozen=True)
class AggViewSpec:
    """A maintained view: GROUP BY ``group_by`` with exact measures.

    measures: out_column -> (fn, src_column); fn in {"sum",
    "sum_strlen", "min", "max"}. ``sum`` totals an integer column
    (nulls count 0 — pair it with COALESCE(x, 0) in SQL);
    ``sum_strlen`` totals utf8 char lengths; ``min``/``max`` take the
    extremum of the source column in its own type (nulls ignored, SQL
    semantics) via the co-sharded support store — see
    ``minmax_measures``. Key columns (repo/path) may appear in
    group_by; they never change, so both event sides read the bare
    column.
    """

    group_by: tuple[str, ...]
    measures: dict[str, tuple[str, str]] = field(default_factory=dict)
    count_col: str = "n"
    num_shards: int = 32

    def __post_init__(self):
        object.__setattr__(self, "group_by", tuple(self.group_by))
        for out, (fn, _src) in self.measures.items():
            if fn not in ("sum", "sum_strlen", "min", "max"):
                raise ValueError(f"unknown measure fn {fn!r} for {out!r}")
            if out == self.count_col or out in self.group_by:
                raise ValueError(f"measure name {out!r} collides with view columns")

    @property
    def sum_measures(self) -> dict[str, tuple[str, str]]:
        return {o: fs for o, fs in self.measures.items() if fs[0] in ("sum", "sum_strlen")}

    @property
    def minmax_measures(self) -> dict[str, tuple[str, str]]:
        """min/max are NOT subtractable — they are maintained via a
        co-sharded SUPPORT store of (group, value) -> count rows (the
        classic IVM support-structure technique): the per-value count IS
        subtractable, so the support updates in O(delta), and min/max
        per group reduce over the group's surviving support rows at read
        time (``agg_table``). Storage is O(groups x distinct values per
        group); a delete of a group's extremum costs nothing extra —
        its support row just drops to count 0."""
        return {o: fs for o, fs in self.measures.items() if fs[0] in ("min", "max")}

    @property
    def support_srcs(self) -> list[str]:
        return sorted({src for _fn, src in self.minmax_measures.values()})

    def fingerprint(self) -> str:
        return json.dumps(
            {
                "group_by": list(self.group_by),
                "measures": {k: list(v) for k, v in sorted(self.measures.items())},
                "count_col": self.count_col,
                "num_shards": self.num_shards,
            },
            sort_keys=True,
        )


def _state_path(root: str) -> str:
    return os.path.join(root, "_aggstate.json")


def read_aggstate(root: str) -> dict:
    p = _state_path(root)
    if not os.path.exists(p):
        return {"epoch": 0, "shards": {}, "spec": None}
    with open(p) as f:
        return json.load(f)


def read_aggstate_at(root: str, epoch: int) -> dict:
    p = os.path.join(root, "_aggstates", f"state-{epoch:06d}.json")
    if not os.path.exists(p):
        current = read_aggstate(root)["epoch"]
        raise FileNotFoundError(
            f"no agg-view snapshot for epoch {epoch} under {root!r} (current agg "
            f"epoch {current}): the epoch never committed or its snapshot was "
            "GC'd outside the retention window (EngineConfig.retain_epochs)"
        )
    with open(p) as f:
        return json.load(f)


def commit_aggstate(root: str, state: dict) -> None:
    tmp = _state_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _state_path(root))
    snap_dir = os.path.join(root, "_aggstates")
    os.makedirs(snap_dir, exist_ok=True)
    snap = os.path.join(snap_dir, f"state-{int(state.get('epoch', 0)):06d}.json")
    with open(snap + ".tmp", "w") as f:
        json.dump(state, f, sort_keys=True)
    os.replace(snap + ".tmp", snap)


def _epoch_dirty_files(root: str, epoch: int) -> list[str]:
    base = os.path.join(root, "dirty")
    out = []
    if os.path.isdir(base):
        for pdir in sorted(os.listdir(base)):
            f = os.path.join(base, pdir, f"epoch-{epoch:06d}.parquet")
            if os.path.exists(f):
                out.append(f)
    return out


def _measure_values(t: pa.Table, col_name: str | None, fn: str, n: int) -> pa.Array:
    """Evaluate one measure over a payload side; absent column (pre-
    evolution dirty schema) and nulls contribute 0."""
    if col_name is None or col_name not in t.column_names:
        return pa.array(np.zeros(n, dtype=np.int64), pa.int64())
    col = t[col_name]
    if fn == "sum_strlen":
        vals = pc.cast(pc.utf8_length(col), pa.int64())
    else:  # "sum"
        vals = pc.cast(col, pa.int64())
    return pc.fill_null(vals, 0)


def _group_arrays(t: pa.Table, spec: AggViewSpec, prefix: str, n: int) -> dict[str, pa.Array]:
    """Group columns for one event side. Key columns (never renamed by
    the dirty writer) read bare; payload columns read ``{prefix}_{g}``;
    a column missing from this dirty file's schema (schema evolution:
    the group column didn't exist yet) is all-null — the SQL GROUP BY
    NULL group."""
    out = {}
    for g in spec.group_by:
        if g in t.column_names:  # key column (repo/path)
            out[g] = t[g].combine_chunks()
        elif f"{prefix}_{g}" in t.column_names:
            out[g] = t[f"{prefix}_{g}"].combine_chunks()
        else:
            out[g] = pa.nulls(n, pa.string())
    return out


def _partial_agg(t: pa.Table, spec: AggViewSpec) -> pa.Table:
    """Combine contribution rows: one row per distinct group."""
    keys = list(spec.group_by)
    aggs = [(spec.count_col, "sum")] + [(m, "sum") for m in spec.sum_measures]
    g = t.group_by(keys).aggregate(aggs)
    # pyarrow names results "<col>_sum"
    renames = {f"{c}_sum": c for c, _ in aggs}
    return g.rename_columns([renames.get(c, c) for c in g.column_names])


def _contributions(dirty: pa.Table, spec: AggViewSpec) -> pa.Table:
    """±1 contribution rows for one dirty delta table, pre-aggregated."""
    parts = []
    for prefix, changes, w in (("new", ("I", "U"), 1), ("old", ("U", "D"), -1)):
        sub = dirty.filter(pc.is_in(dirty["change"], value_set=pa.array(list(changes))))
        n = sub.num_rows
        if not n:
            continue
        cols = _group_arrays(sub, spec, prefix, n)
        cols[spec.count_col] = pa.array(np.full(n, w, dtype=np.int64), pa.int64())
        for out, (fn, src) in spec.sum_measures.items():
            src_col = src if src in sub.column_names else f"{prefix}_{src}"
            vals = _measure_values(sub, src_col, fn, n)
            cols[out] = vals if w > 0 else pc.multiply(vals, pa.scalar(-1, pa.int64()))
        parts.append(pa.table(cols))
    if not parts:
        return _empty_view(spec)
    return _partial_agg(pa.concat_tables(parts, promote_options="default"), spec)


def _empty_view(spec: AggViewSpec) -> pa.Table:
    cols: dict[str, pa.Array] = {g: pa.array([], pa.string()) for g in spec.group_by}
    cols[spec.count_col] = pa.array([], pa.int64())
    for m in spec.sum_measures:
        cols[m] = pa.array([], pa.int64())
    return pa.table(cols)


def _shard_ids(t: pa.Table, spec: AggViewSpec) -> np.ndarray:
    """crc32 of the serialized group tuple — stable across interpreters
    (PYTHONHASHSEED-independent), the same idiom as the lake's _kh."""
    if t.num_rows == 0:
        return np.zeros(0, dtype=np.int64)
    key_parts = []
    for g in spec.group_by:
        s = pc.cast(t[g], pa.string())
        key_parts.append(pc.fill_null(s, _NULL_TOKEN))
    joined = key_parts[0] if len(key_parts) == 1 else pc.binary_join_element_wise(
        *key_parts, "\x1f"
    )
    keys = joined.to_pylist()
    return np.fromiter(
        (zlib.crc32(k.encode()) for k in keys), dtype=np.int64, count=len(keys)
    ) % spec.num_shards


def _merge_shard(old: pa.Table | None, delta: pa.Table, spec: AggViewSpec) -> pa.Table:
    """old view rows ⊕ delta rows → new shard content (deterministic:
    sorted by group key). Count-0 groups drop; a count-0 group with a
    nonzero measure residue, or any negative count, is a maintenance
    bug and raises."""
    tables = [delta] if old is None or old.num_rows == 0 else [old, delta]
    merged = _partial_agg(
        pa.concat_tables(tables, promote_options="default"), spec
    )
    counts = merged[spec.count_col].to_numpy(zero_copy_only=False)
    if (counts < 0).any():
        raise AssertionError("agg view: negative group count — delta double-applied?")
    zero = counts == 0
    if zero.any():
        for m in spec.sum_measures:
            residue = merged[m].to_numpy(zero_copy_only=False)[zero]
            if (residue != 0).any():
                raise AssertionError(
                    f"agg view: count-0 group with nonzero {m} residue — "
                    "non-subtractable measure or lost delta"
                )
        merged = merged.filter(pa.array(~zero))
    return merged.sort_by([(g, "ascending") for g in spec.group_by])


# --------------------------------------------------------------- support
# (group, value) -> count rows backing min/max measures. Same LSM-shard
# idiom, co-sharded with the view by GROUP hash so a group's support
# always lives in the shard the view update is already touching.

_SUP_V = "_v"  # support value column
_SUP_N = "_sn"  # support count column


def _support_partial(t: pa.Table, spec: AggViewSpec) -> pa.Table:
    keys = list(spec.group_by) + [_SUP_V]
    g = t.group_by(keys).aggregate([(_SUP_N, "sum")])
    return g.rename_columns(
        [_SUP_N if c == f"{_SUP_N}_sum" else c for c in g.column_names]
    )


def _support_contributions(
    dirty: pa.Table, spec: AggViewSpec, src: str
) -> pa.Table | None:
    """±1 support rows for one dirty table and one min/max source
    column; null values contribute nothing (SQL MIN/MAX ignore nulls),
    a pre-evolution dirty file without the column contributes nothing."""
    parts = []
    for prefix, changes, w in (("new", ("I", "U"), 1), ("old", ("U", "D"), -1)):
        sub = dirty.filter(pc.is_in(dirty["change"], value_set=pa.array(list(changes))))
        n = sub.num_rows
        if not n:
            continue
        src_col = src if src in sub.column_names else f"{prefix}_{src}"
        if src_col not in sub.column_names:
            continue
        v = sub[src_col].combine_chunks()
        keep = pc.fill_null(pc.is_valid(v), False)
        if not pc.any(keep).as_py():
            continue
        cols = _group_arrays(sub, spec, prefix, n)
        cols[_SUP_V] = v
        cols[_SUP_N] = pa.array(np.full(n, w, dtype=np.int64), pa.int64())
        parts.append(pa.table(cols).filter(keep))
    if not parts:
        return None
    return _support_partial(pa.concat_tables(parts, promote_options="default"), spec)


def _dirty_support(dirty_files: list[str], spec: AggViewSpec, src: str) -> pa.Table | None:
    """Per-epoch support delta from the dirty files (O(delta); separate
    cheap pass per min/max source — dirty files are delta/P sized)."""
    import ray
    import ray.data as rd

    if not dirty_files:
        return None

    def load(batch: pa.Table) -> pa.Table:
        parts = [
            _support_contributions(pq.read_table(row["file"]), spec, src)
            for row in batch.to_pylist()
        ]
        parts = [p for p in parts if p is not None]
        if not parts:
            return pa.table({})
        return parts[0] if len(parts) == 1 else _support_partial(
            pa.concat_tables(parts, promote_options="default"), spec
        )

    ds = rd.from_items([{"file": f} for f in dirty_files]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
    partials = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not partials:
        return None
    return _support_partial(pa.concat_tables(partials, promote_options="default"), spec)


def _full_scan_support(root: str, spec: AggViewSpec, src: str) -> pa.Table | None:
    """Full-rebuild support: +1 per live row with a non-null value."""
    import ray
    from silk_ray.cdc.merge import snapshot_dataset

    def contrib(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not n or src not in batch.column_names:
            return pa.table({})
        v = batch[src].combine_chunks()
        keep = pc.fill_null(pc.is_valid(v), False)
        if not pc.any(keep).as_py():
            return pa.table({})
        cols = {
            g: (batch[g].combine_chunks() if g in batch.column_names
                else pa.nulls(n, pa.string()))
            for g in spec.group_by
        }
        cols[_SUP_V] = v
        cols[_SUP_N] = pa.array(np.ones(n, dtype=np.int64), pa.int64())
        return _support_partial(pa.table(cols).filter(keep), spec)

    ds = snapshot_dataset(root).map_batches(contrib, batch_format="pyarrow")
    partials = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not partials:
        return None
    ref = next((t for t in partials if not any(
        pa.types.is_null(f.type) for f in t.schema)), partials[0])
    partials = [
        t.cast(ref.schema) if t.schema != ref.schema else t for t in partials
    ]
    return _support_partial(pa.concat_tables(partials, promote_options="default"), spec)


def _merge_support(old: pa.Table | None, delta: pa.Table, spec: AggViewSpec) -> pa.Table:
    """old support ⊕ delta → new shard support; count-0 value rows drop,
    negative counts raise (same invariants as the view merge)."""
    tables = [delta] if old is None or old.num_rows == 0 else [old, delta]
    merged = _support_partial(
        pa.concat_tables(tables, promote_options="default"), spec
    )
    counts = merged[_SUP_N].to_numpy(zero_copy_only=False)
    if (counts < 0).any():
        raise AssertionError("agg support: negative value count — delta double-applied?")
    zero = counts == 0
    if zero.any():
        merged = merged.filter(pa.array(~zero))
    return merged.sort_by(
        [(g, "ascending") for g in spec.group_by] + [(_SUP_V, "ascending")]
    )


def _support_rel(src: str, epoch: int, shard: int) -> str:
    return os.path.join(
        "aggview", f"support-{src}-shard-{shard:05d}-epoch-{epoch:06d}.parquet"
    )


def _shard_rel(epoch: int, shard: int) -> str:
    return os.path.join("aggview", f"shard-{shard:05d}-epoch-{epoch:06d}.parquet")


def update_aggregates(root: str, epoch: int, spec: AggViewSpec) -> dict:
    """Bring the aggregate view up to merge epoch ``epoch``.

    Idempotent (a replayed epoch is a no-op); a catch-up lag beyond the
    one-epoch dirty retention window triggers a loud full rebuild."""
    import ray

    state = read_aggstate(root)
    if state.get("spec") not in (None, spec.fingerprint()):
        raise ValueError(
            "agg view spec changed for an existing view state; use a fresh "
            "root or delete _aggstate.json to rebuild under the new spec"
        )
    if state["epoch"] >= epoch:
        return {"epoch": epoch, "mode": "replay_noop", "groups": _state_rows(root, state)}

    full_rebuild = state["epoch"] < epoch - 1 or (
        state["epoch"] > 0 and not state.get("shards")
    )
    if full_rebuild or state["epoch"] == 0:
        delta = _full_scan_delta(root, spec)
        mode = "full"
        old_shards: dict[str, str] = {}
        old_support: dict[str, dict[str, str]] = {}
        support_deltas = {
            src: _full_scan_support(root, spec, src) for src in spec.support_srcs
        }
    else:
        dirty_files = _epoch_dirty_files(root, epoch)
        delta = _dirty_delta(dirty_files, spec)
        mode = "delta"
        old_shards = dict(state.get("shards") or {})
        old_support = {
            src: dict(m) for src, m in (state.get("support") or {}).items()
        }
        support_deltas = {
            src: _dirty_support(dirty_files, spec, src) for src in spec.support_srcs
        }

    sid = _shard_ids(delta, spec)
    affected = set(int(s) for s in sid)
    support_sharded: dict[str, pa.Table] = {}
    for src, sd in support_deltas.items():
        if sd is None or sd.num_rows == 0:
            continue
        ssid = _shard_ids(sd, spec)
        support_sharded[src] = sd.append_column("_shard", pa.array(ssid, pa.int64()))
        affected.update(int(s) for s in ssid)
    affected = sorted(affected)
    if mode == "delta" and not affected:
        new_state = {
            "epoch": epoch, "shards": old_shards, "support": old_support,
            "spec": spec.fingerprint(),
        }
        commit_aggstate(root, new_state)
        return {
            "epoch": epoch, "mode": "noop", "groups": _state_rows(root, new_state),
            "affected_shards": 0, "delta_groups": 0,
        }

    delta = delta.append_column("_shard", pa.array(sid, pa.int64()))

    @ray.remote
    def _write_shard(old_abs: str | None, shard_delta: pa.Table, out_abs: str) -> int:
        old = pq.read_table(old_abs) if old_abs else None
        merged = _merge_shard(old, shard_delta.drop_columns(["_shard"]), spec)
        ckpt.atomic_write_parquet(merged, out_abs)
        return merged.num_rows

    @ray.remote
    def _write_support_shard(
        old_abs: str | None, shard_delta: pa.Table, out_abs: str
    ) -> int:
        old = pq.read_table(old_abs) if old_abs else None
        merged = _merge_support(old, shard_delta.drop_columns(["_shard"]), spec)
        ckpt.atomic_write_parquet(merged, out_abs)
        return merged.num_rows

    refs = {}
    new_shards = dict(old_shards)
    for s in affected:
        shard_delta = delta.filter(pc.equal(delta["_shard"], s))
        if shard_delta.num_rows == 0 and mode == "delta":
            continue  # shard touched only by a support delta
        old_rel = old_shards.get(str(s))
        rel = _shard_rel(epoch, s)
        refs[s] = _write_shard.remote(
            os.path.join(root, old_rel) if old_rel else None,
            shard_delta,
            os.path.join(root, rel),
        )
        new_shards[str(s)] = rel
    sup_refs: dict[tuple[str, int], object] = {}
    new_support = {src: dict(m) for src, m in old_support.items()}
    for src, sd in support_sharded.items():
        new_support.setdefault(src, {})
        for s in sorted(set(int(x) for x in sd["_shard"].to_pylist())):
            shard_delta = sd.filter(pc.equal(sd["_shard"], s))
            old_rel = (old_support.get(src) or {}).get(str(s))
            rel = _support_rel(src, epoch, s)
            sup_refs[(src, s)] = _write_support_shard.remote(
                os.path.join(root, old_rel) if old_rel else None,
                shard_delta,
                os.path.join(root, rel),
            )
            new_support[src][str(s)] = rel
    rows = ray.get(list(refs.values()))
    # drop shards that emptied out entirely
    for s, n in zip(refs.keys(), rows):
        if n == 0:
            new_shards.pop(str(s), None)
    for (src, s), n in zip(sup_refs.keys(), ray.get(list(sup_refs.values()))):
        if n == 0:
            new_support[src].pop(str(s), None)
    new_state = {
        "epoch": epoch, "shards": new_shards, "support": new_support,
        "spec": spec.fingerprint(),
    }
    commit_aggstate(root, new_state)
    return {
        "epoch": epoch,
        "mode": mode,
        "groups": _state_rows(root, new_state),
        "affected_shards": len(affected),
        "delta_groups": delta.num_rows,
    }


def _dirty_delta(dirty_files: list[str], spec: AggViewSpec) -> pa.Table:
    """Combined per-group contribution delta for one epoch: contribution
    partials computed inside Dataset tasks (one per dirty file — each is
    delta/P sized), only group-level partials reach the driver."""
    import ray
    import ray.data as rd

    if not dirty_files:
        return _empty_view(spec)

    def load(batch: pa.Table) -> pa.Table:
        parts = [
            _contributions(pq.read_table(row["file"]), spec) for row in batch.to_pylist()
        ]
        return parts[0] if len(parts) == 1 else _partial_agg(
            pa.concat_tables(parts, promote_options="default"), spec
        )

    ds = rd.from_items([{"file": f} for f in dirty_files]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
    partials = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not partials:
        return _empty_view(spec)
    return _partial_agg(pa.concat_tables(partials, promote_options="default"), spec)


def _full_scan_delta(root: str, spec: AggViewSpec) -> pa.Table:
    """Full-rebuild path: one streaming pass over the current lake
    state; every row is a +1 contribution."""
    import ray
    from silk_ray.cdc.merge import snapshot_dataset

    def contrib(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not n:
            return _empty_view(spec)
        cols = {}
        for g in spec.group_by:
            cols[g] = (
                batch[g].combine_chunks() if g in batch.column_names else pa.nulls(n, pa.string())
            )
        cols[spec.count_col] = pa.array(np.ones(n, dtype=np.int64), pa.int64())
        for out, (fn, src) in spec.sum_measures.items():
            cols[out] = _measure_values(batch, src, fn, n)
        return _partial_agg(pa.table(cols), spec)

    ds = snapshot_dataset(root).map_batches(contrib, batch_format="pyarrow")
    partials = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not partials:
        return _empty_view(spec)
    # schema drift across partials (all-null group inferred as null type)
    ref = next((t for t in partials if not any(
        pa.types.is_null(f.type) for f in t.schema)), partials[0])
    partials = [
        t.cast(ref.schema) if t.schema != ref.schema else t for t in partials
    ]
    return _partial_agg(pa.concat_tables(partials, promote_options="default"), spec)


def _state_rows(root: str, state: dict) -> int:
    total = 0
    for rel in (state.get("shards") or {}).values():
        p = os.path.join(root, rel)
        if os.path.exists(p):
            total += pq.read_metadata(p).num_rows
    return total


def agg_table(root: str, at_epoch: int | None = None) -> pa.Table:
    """Driver-side snapshot of the maintained view (the view is
    O(groups); for group-key cardinalities where that doesn't hold,
    read the shard files as a Dataset). ``at_epoch`` time-travels to a
    retained earlier commit. min/max measures are reduced here from the
    maintained support store (count>0 rows only, by construction) and
    left-joined onto the view — a group whose values were all null gets
    a null extremum (SQL semantics)."""
    state = read_aggstate(root) if at_epoch is None else read_aggstate_at(root, at_epoch)
    shards = state.get("shards") or {}
    parts = []
    for s in sorted(shards, key=int):
        parts.append(pq.read_table(os.path.join(root, shards[s])))
    if not parts:
        return pa.table({})
    out = pa.concat_tables(parts, promote_options="default")

    # recover the spec shape from the committed fingerprint
    fp = state.get("spec")
    sp = json.loads(fp) if fp else {}
    group_by = [g for g in sp.get("group_by", []) if g in out.column_names] or [
        c for c in out.column_names
    ]
    minmax = {
        o: (fs[0], fs[1])
        for o, fs in (sp.get("measures") or {}).items()
        if fs[0] in ("min", "max")
    }
    if minmax and out.num_rows:
        def _jk(t: pa.Table) -> pa.Array:
            ps = [
                pc.fill_null(pc.cast(t[g].combine_chunks(), pa.string()), _NULL_TOKEN)
                for g in group_by
            ]
            return ps[0] if len(ps) == 1 else pc.binary_join_element_wise(*ps, "\x1f")

        out = out.append_column("_jk", _jk(out))
        sup_state = state.get("support") or {}
        for src in sorted({s for _f, s in minmax.values()}):
            rels = sorted((sup_state.get(src) or {}).values())
            sup_parts = [pq.read_table(os.path.join(root, r)) for r in rels]
            sup_parts = [t for t in sup_parts if t.num_rows]
            cols = {o: fn for o, (fn, s2) in minmax.items() if s2 == src}
            if not sup_parts:
                for o in cols:
                    out = out.append_column(o, pa.nulls(out.num_rows))
                continue
            sup = pa.concat_tables(sup_parts, promote_options="default")
            red = sup.group_by(group_by).aggregate(
                [(_SUP_V, "min"), (_SUP_V, "max")]
            )
            red = red.append_column("_jk", _jk(red))
            sel = {f"{_SUP_V}_min": "min", f"{_SUP_V}_max": "max"}
            right = red.select(["_jk"] + list(sel))
            for o, fn in cols.items():
                right = right.append_column(
                    o, right[f"{_SUP_V}_{fn}"].combine_chunks()
                )
            right = right.drop_columns(list(sel))
            out = out.join(right, keys="_jk", join_type="left outer")
        out = out.drop_columns(["_jk"])

    return out.sort_by([(g, "ascending") for g in group_by])


def gc_aggview(root: str, retain_epochs: int = 1) -> int:
    """Delete shard files not referenced by the live state or any
    retained snapshot; trim snapshots past the window. Carried-forward
    shard files are referenced by many epochs and survive as long as
    any retained manifest points at them."""
    state = read_aggstate(root)
    epoch = int(state.get("epoch", 0))
    floor = epoch - max(1, retain_epochs) - 1

    def _live_rels(st: dict) -> set[str]:
        rels = set((st.get("shards") or {}).values())
        for m in (st.get("support") or {}).values():
            rels.update(m.values())
        return rels

    live: set[str] = _live_rels(state)
    for e in range(max(1, floor + 1), epoch):
        try:
            live.update(_live_rels(read_aggstate_at(root, e)))
        except FileNotFoundError:
            continue
    n = 0
    snap_dir = os.path.join(root, "_aggstates")
    if os.path.isdir(snap_dir):
        for f in os.listdir(snap_dir):
            if f.startswith("state-") and f.endswith(".json"):
                try:
                    e = int(f[len("state-") : -len(".json")])
                except ValueError:
                    continue
                if e <= floor:
                    try:
                        os.remove(os.path.join(snap_dir, f))
                    except OSError:
                        pass
    base = os.path.join(root, "aggview")
    if not os.path.isdir(base):
        return 0
    for f in os.listdir(base):
        rel = os.path.join("aggview", f)
        if f.endswith(".parquet") and rel not in live:
            try:
                os.remove(os.path.join(base, f))
                n += 1
            except OSError:
                pass
        elif f.endswith((".tmp",)) or ".tmp-" in f:
            shutil.rmtree(os.path.join(base, f), ignore_errors=True)
    return n
