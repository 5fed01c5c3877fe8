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
delta into the stored view. Measures are **exact-integer sums**
(``sum`` of an int column, ``sum_strlen`` of a string column) — order-
independent and replay-byte-identical, unlike float accumulation;
count-0 groups must zero out exactly and are dropped (enforced: a
nonzero residue raises). Non-subtractable aggregates (min/max) are
deliberately out: maintaining them exactly requires rescanning a
group's rows on every delete of its extremum, which is O(group) per
event unless the lake is partitioned by the group key — use a batch
query over ``snapshot_dataset`` for those.

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
    """A maintained view: GROUP BY ``group_by`` with exact-int measures.

    measures: out_column -> (fn, src_column); fn in {"sum", "sum_strlen"}.
    ``sum`` totals an integer column (nulls count 0 — pair it with
    COALESCE(x, 0) in SQL); ``sum_strlen`` totals utf8 char lengths.
    Key columns (repo/path) may appear in group_by; they never change,
    so both event sides read the bare column.
    """

    group_by: tuple[str, ...]
    measures: dict[str, tuple[str, str]] = field(default_factory=dict)
    count_col: str = "n"
    num_shards: int = 32

    def __post_init__(self):
        object.__setattr__(self, "group_by", tuple(self.group_by))
        for out, (fn, _src) in self.measures.items():
            if fn not in ("sum", "sum_strlen"):
                raise ValueError(f"unknown measure fn {fn!r} for {out!r}")
            if out == self.count_col or out in self.group_by:
                raise ValueError(f"measure name {out!r} collides with view columns")

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
    aggs = [(spec.count_col, "sum")] + [(m, "sum") for m in spec.measures]
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
        for out, (fn, src) in spec.measures.items():
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
    for m in spec.measures:
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
        for m in spec.measures:
            residue = merged[m].to_numpy(zero_copy_only=False)[zero]
            if (residue != 0).any():
                raise AssertionError(
                    f"agg view: count-0 group with nonzero {m} residue — "
                    "non-subtractable measure or lost delta"
                )
        merged = merged.filter(pa.array(~zero))
    return merged.sort_by([(g, "ascending") for g in spec.group_by])


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
    else:
        dirty_files = _epoch_dirty_files(root, epoch)
        delta = _dirty_delta(dirty_files, spec)
        mode = "delta"
        old_shards = dict(state.get("shards") or {})

    sid = _shard_ids(delta, spec)
    affected = sorted(set(int(s) for s in sid))
    if mode == "delta" and not affected:
        new_state = {
            "epoch": epoch, "shards": old_shards, "spec": spec.fingerprint()
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

    refs = {}
    new_shards = dict(old_shards)
    for s in affected:
        shard_delta = delta.filter(pc.equal(delta["_shard"], s))
        old_rel = old_shards.get(str(s))
        rel = _shard_rel(epoch, s)
        refs[s] = _write_shard.remote(
            os.path.join(root, old_rel) if old_rel else None,
            shard_delta,
            os.path.join(root, rel),
        )
        new_shards[str(s)] = rel
    rows = ray.get(list(refs.values()))
    # drop shards that emptied out entirely
    for s, n in zip(refs.keys(), rows):
        if n == 0:
            new_shards.pop(str(s), None)
    new_state = {"epoch": epoch, "shards": new_shards, "spec": spec.fingerprint()}
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
        for out, (fn, src) in spec.measures.items():
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
    retained earlier commit."""
    state = read_aggstate(root) if at_epoch is None else read_aggstate_at(root, at_epoch)
    shards = state.get("shards") or {}
    parts = []
    group_by: list[str] = []
    for s in sorted(shards, key=int):
        p = os.path.join(root, shards[s])
        t = pq.read_table(p)
        parts.append(t)
        group_by = [c for c in t.column_names]
    if not parts:
        return pa.table({})
    out = pa.concat_tables(parts, promote_options="default")
    keys = [g for g in group_by if g in out.column_names]
    return out.sort_by([(g, "ascending") for g in keys])


def gc_aggview(root: str, retain_epochs: int = 1) -> int:
    """Delete shard files not referenced by the live state or any
    retained snapshot; trim snapshots past the window. Carried-forward
    shard files are referenced by many epochs and survive as long as
    any retained manifest points at them."""
    state = read_aggstate(root)
    epoch = int(state.get("epoch", 0))
    floor = epoch - max(1, retain_epochs) - 1
    live: set[str] = set((state.get("shards") or {}).values())
    for e in range(max(1, floor + 1), epoch):
        try:
            live.update((read_aggstate_at(root, e).get("shards") or {}).values())
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
