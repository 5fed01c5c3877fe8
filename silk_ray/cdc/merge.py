"""Commit-ordered, idempotent merge-apply of changelog epochs into the lake.

The stateful heart of the engine (north_rule; SURVEY.md §7.0/§7.1 step 5):

- events for epoch E = offset window ``[next_offset, next_offset+size)``
  read with Parquet row-group pushdown;
- key partitioning: ``pid = crc32(repo \\x00 path) % P`` added in a
  vectorized ``map_batches`` stage, then ``groupby("pid")`` co-locates
  every key's events (the shuffle key reused by all lake operations);
- per-partition merge task (``map_groups``): read the current partition
  file, skip events at-or-below the partition HWM and duplicate
  offsets, apply in offset order (last-writer-wins; ``D`` deletes),
  sort state by (repo, path) and write the new partition file
  atomically. Deterministic bytes ⇒ task retries and epoch replays
  converge (exactly-once = idempotence + atomic manifest swap);
- schema evolution: new event payload columns are unified into the
  state schema (missing → null); renamed columns are mapped through a
  Silk-style DirectMapping rename (EntitySchema.renameProperty,
  silk-core/.../entity/EntitySchema.scala:147-153);
- each epoch also writes a per-partition *dirty delta* (old + new
  payload per changed key) consumed by incremental re-linking, plus
  lineage metrics (events applied, skew ratio, rows).

State is never authoritative in RAM: everything reconstructs from
(lake snapshot + offset log) — SURVEY.md §7.3 "actor-state restart".
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.parquet as pq

from silk_ray.cdc import checkpoint as ckpt

KEY_COLS = ("repo", "path")
META_COLS = ("offset", "op")
DEFAULT_PARTITIONS = 64


def key_partition(repo: str, path: str, num_partitions: int) -> int:
    return zlib.crc32(f"{repo}\x00{path}".encode()) % num_partitions


def add_pid_column(num_partitions: int):
    def fn(batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        pids = [key_partition(r, p, num_partitions) for r, p in zip(repos, paths)]
        return batch.append_column("pid", pa.array(pids, pa.int32()))

    return fn


def _payload_columns(event_schema: pa.Schema) -> list[str]:
    return [n for n in event_schema.names if n not in META_COLS and n != "pid"]


def _unify_schema(state: pa.Table | None, payload_cols: list[str], event_table: pa.Table) -> pa.Schema:
    """Union of existing state schema and event payload columns."""
    fields: dict[str, pa.Field] = {}
    if state is not None:
        for f in state.schema:
            if f.name != "_offset":
                fields[f.name] = f
    for c in payload_cols:
        if c not in fields:
            fields[c] = pa.field(c, event_table.schema.field(c).type)
    fields["_offset"] = pa.field("_offset", pa.int64())
    return pa.schema(list(fields.values()))


class MergePartition:
    """Per-partition merge task body. Instantiated on the driver with the
    epoch's small control state (HWM map, paths) and shipped to tasks."""

    def __init__(
        self,
        root: str,
        epoch: int,
        hwm: dict[int, int],
        part_files: dict[int, str | None],
        renames: dict[str, str] | None = None,
        link_spec: dict | None = None,
        n_block_partitions: int = 64,
    ):
        self.root = root
        self.epoch = epoch
        self.hwm = hwm
        self.part_files = part_files
        self.renames = renames or {}  # event column -> state column
        # fused incremental-linking delta index: computing blocking-key
        # deltas here (while the dirty payloads are already in memory)
        # saves a whole Ray execution + dirty-file re-read per epoch
        self.link_spec = link_spec
        self.n_block_partitions = n_block_partitions
        self._delta_stage = None

    def _get_delta_stage(self):
        if self._delta_stage is None and self.link_spec is not None:
            from silk_ray.cdc.incremental import DeltaIndexStage

            self._delta_stage = DeltaIndexStage(
                self.link_spec,
                self.n_block_partitions,
                shard_root=self.root,
                epoch=self.epoch,
            )
        return self._delta_stage

    def __call__(self, group: pa.Table) -> pa.Table:
        import os

        pid = int(group["pid"][0].as_py())
        events = group.sort_by("offset")
        if self.renames:
            names = [self.renames.get(n, n) for n in events.column_names]
            events = events.rename_columns(names)
        payload_cols = _payload_columns(events.schema)

        old_file = self.part_files.get(pid)
        state: pa.Table | None = None
        if old_file:
            state = pq.read_table(os.path.join(self.root, old_file))
        schema = _unify_schema(state, payload_cols, events)
        state_cols = [f.name for f in schema if f.name != "_offset"]

        # current state as dict keyed by (repo, path)
        current: dict[tuple, dict] = {}
        if state is not None:
            for row in state.to_pylist():
                current[(row["repo"], row["path"])] = {c: row.get(c) for c in state_cols + ["_offset"]}

        hwm = self.hwm.get(pid, -1)
        seen_offsets: set[int] = set()
        applied = dup_skipped = below_hwm = upserts = deletes = 0
        dirty: dict[tuple, dict] = {}

        ev_rows = events.to_pylist()
        for ev in ev_rows:
            off = ev["offset"]
            if off <= hwm:
                below_hwm += 1
                continue
            if off in seen_offsets:
                dup_skipped += 1
                continue
            seen_offsets.add(off)
            applied += 1
            k = (ev["repo"], ev["path"])
            old_row = current.get(k)
            if k not in dirty:
                dirty[k] = {"old": dict(old_row) if old_row else None}
            if ev["op"] == "D":
                if k in current:
                    del current[k]
                    deletes += 1
            else:
                row = {c: ev.get(c) for c in state_cols}
                row["_offset"] = off
                current[k] = row
                upserts += 1
        new_hwm = max(seen_offsets) if seen_offsets else hwm

        # deterministic state: sort by natural key (SURVEY.md §4 ordering)
        ordered_keys = sorted(current.keys())
        out_cols = {}
        for f in schema:
            out_cols[f.name] = pa.array([current[k].get(f.name) for k in ordered_keys], type=f.type)
        new_state = pa.table(out_cols)
        part_path = ckpt.partition_file(self.root, pid, self.epoch)
        ckpt.atomic_write_parquet(new_state, part_path)

        # dirty delta for incremental re-linking
        dirty_keys = sorted(dirty.keys())
        d_cols: dict[str, list] = {"repo": [], "path": [], "change": []}
        for c in state_cols:
            if c not in KEY_COLS:
                d_cols[f"new_{c}"] = []
                d_cols[f"old_{c}"] = []
        for k in dirty_keys:
            new_row = current.get(k)
            old_row = dirty[k]["old"]
            if new_row is None and old_row is None:
                continue  # inserted then deleted within the epoch, never linked
            d_cols["repo"].append(k[0])
            d_cols["path"].append(k[1])
            d_cols["change"].append("D" if new_row is None else ("I" if old_row is None else "U"))
            for c in state_cols:
                if c in KEY_COLS:
                    continue
                d_cols[f"new_{c}"].append(None if new_row is None else new_row.get(c))
                d_cols[f"old_{c}"].append(None if old_row is None else old_row.get(c))
        dirty_table = pa.table({k: pa.array(v, pa.string() if k != "change" else pa.string()) for k, v in d_cols.items()})
        ckpt.atomic_write_parquet(dirty_table, ckpt.dirty_file(self.root, pid, self.epoch))

        # fused delta index: write blockmap shards + linker summary now
        delta_stage = self._get_delta_stage()
        if delta_stage is not None:
            summary = delta_stage(dirty_table)
            import os as _os2

            summary_path = _os2.path.join(
                self.root, "summaries", f"p={pid:05d}", f"epoch-{self.epoch:06d}.parquet"
            )
            ckpt.atomic_write_parquet(summary, summary_path)

        import os as _os

        rel = _os.path.relpath(part_path, self.root)
        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "events_in": pa.array([len(ev_rows)], pa.int64()),
                "applied": pa.array([applied], pa.int64()),
                "dup_skipped": pa.array([dup_skipped], pa.int64()),
                "below_hwm": pa.array([below_hwm], pa.int64()),
                "upserts": pa.array([upserts], pa.int64()),
                "deletes": pa.array([deletes], pa.int64()),
                "rows": pa.array([new_state.num_rows], pa.int64()),
                "hwm": pa.array([new_hwm], pa.int64()),
                "file": pa.array([rel], pa.string()),
                "dirty": pa.array([dirty_table.num_rows], pa.int64()),
            }
        )


def run_epoch(
    root: str,
    changelog,
    epoch_size: int = 100_000,
    num_partitions: int = DEFAULT_PARTITIONS,
    renames: dict[str, str] | None = None,
    link_spec: dict | None = None,
    n_block_partitions: int = 64,
) -> dict | None:
    """Tail one epoch window off the changelog and merge-apply it.

    ``changelog`` is a parquet path/dir (the binlog segments) or an
    in-memory ``pa.Table`` (tests). Returns the epoch metrics dict, or
    None when no events remain.
    """
    import ray.data as rd

    manifest = ckpt.read_manifest(root)
    lo = manifest.next_offset
    hi = lo + epoch_size

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    flt = (pc.field("offset") >= lo) & (pc.field("offset") < hi)
    if isinstance(changelog, pa.Table):
        table = changelog.filter(
            pc.and_(pc.greater_equal(changelog["offset"], lo), pc.less(changelog["offset"], hi))
        )
        if table.num_rows == 0:
            return None
        events = rd.from_arrow(table)
    else:
        events = rd.read_parquet(changelog, filter=flt)

    events = events.map_batches(add_pid_column(num_partitions), batch_format="pyarrow")

    epoch = manifest.epoch + 1
    hwm = {pid: info["hwm"] for pid, info in manifest.partitions.items()}
    part_files = {pid: info["file"] for pid, info in manifest.partitions.items()}

    merger = MergePartition(
        root, epoch, hwm, part_files, renames,
        link_spec=link_spec, n_block_partitions=n_block_partitions,
    )

    def merge_group(group: pa.Table) -> pa.Table:
        return merger(group)

    metrics_rows = (
        events.groupby("pid").map_groups(merge_group, batch_format="pyarrow").take_all()
    )
    if not metrics_rows:
        return None

    # ---- commit ----
    max_off = max(r["hwm"] for r in metrics_rows)
    new_partitions = dict(manifest.partitions)
    for r in metrics_rows:
        new_partitions[int(r["pid"])] = {
            "file": r["file"],
            "hwm": int(r["hwm"]),
            "rows": int(r["rows"]),
            "epoch": epoch,
        }
    new_manifest = ckpt.Manifest(
        epoch=epoch,
        next_offset=max(int(max_off) + 1, lo),
        partitions=new_partitions,
    )
    ckpt.commit_manifest(root, new_manifest, window=(lo, hi))

    per_part = {int(r["pid"]): {k: int(v) for k, v in r.items() if k not in ("pid", "file")} for r in metrics_rows}
    events_per_part = [r["events_in"] for r in metrics_rows]
    mean_ev = sum(events_per_part) / len(events_per_part)
    metrics = {
        "epoch": epoch,
        "window": [lo, hi],
        "events_applied": int(sum(r["applied"] for r in metrics_rows)),
        "dup_skipped": int(sum(r["dup_skipped"] for r in metrics_rows)),
        "below_hwm": int(sum(r["below_hwm"] for r in metrics_rows)),
        "rows_total": int(sum(r["rows"] for r in metrics_rows)),
        "dirty_total": int(sum(r["dirty"] for r in metrics_rows)),
        "partitions_touched": len(metrics_rows),
        "skew_ratio": (max(events_per_part) / mean_ev) if mean_ev else 0.0,
        "per_partition": per_part,
    }
    ckpt.write_metrics(root, epoch, metrics)
    return metrics


def run_to_completion(root: str, changelog, epoch_size: int = 100_000, **kw) -> list[dict]:
    """Tail the changelog until exhausted; one manifest commit per epoch."""
    out = []
    while True:
        m = run_epoch(root, changelog, epoch_size=epoch_size, **kw)
        if m is None:
            return out
        out.append(m)


# ---------------------------------------------------------------------------
# snapshot access
# ---------------------------------------------------------------------------


def current_files(root: str) -> list[str]:
    import os

    manifest = ckpt.read_manifest(root)
    return [
        os.path.join(root, info["file"])
        for _, info in sorted(manifest.partitions.items())
        if info["file"]
    ]


def snapshot_dataset(root: str):
    """The lake's current state as a Ray Dataset (streaming read)."""
    import ray.data as rd

    files = current_files(root)
    if not files:
        import pandas as pd

        return rd.from_pandas(pd.DataFrame({"repo": [], "path": []}))
    return rd.read_parquet(files)


def state_table(root: str, drop_offset: bool = True) -> pa.Table:
    """Driver-side full state (tests / small lakes only), sorted by key."""
    files = current_files(root)
    if not files:
        return pa.table({"repo": pa.array([], pa.string()), "path": pa.array([], pa.string())})
    tables = [pq.read_table(f) for f in files]
    schema = tables[0].schema
    aligned = []
    for t in tables:
        cols = []
        for f in schema:
            cols.append(t[f.name] if f.name in t.column_names else pa.nulls(t.num_rows, f.type))
        aligned.append(pa.table(dict(zip(schema.names, cols))))
    out = pa.concat_tables(aligned, promote_options="default").sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    if drop_offset and "_offset" in out.column_names:
        out = out.drop_columns(["_offset"])
    return out


def state_sha256(root: str) -> str:
    """Digest over the sorted state's per-row (repo, path, content sha256)
    — the replay-equality invariant (BASELINE.json input_hint)."""
    import hashlib

    t = state_table(root)
    h = hashlib.sha256()
    contents = t["content"].to_pylist() if "content" in t.column_names else [None] * t.num_rows
    for repo, path, content in zip(t["repo"].to_pylist(), t["path"].to_pylist(), contents):
        c = "" if content is None else content
        h.update(repo.encode())
        h.update(b"\x00")
        h.update(path.encode())
        h.update(b"\x00")
        h.update(hashlib.sha256(c.encode()).hexdigest().encode())
        h.update(b"\n")
    return h.hexdigest()
