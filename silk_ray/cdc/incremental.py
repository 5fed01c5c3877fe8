"""Incremental re-linking: maintain the linked table over the changelog.

The RD re-expression of "only entities whose blocking keys changed are
re-compared" (north_star; Silk's MultiBlock semantics from
rule/execution/methods/MultiBlock.scala applied delta-wise):

Persisted link state under ``lake_root/`` (LSM-style)::

    blockmap/bp={B}/delta-{E}-*.parquet    # per-epoch delta shards:
                                           # (action, key, side, uri, keys, vals_0..m)
    blockmap/bp={B}/compact-{E}.parquet    # compacted chain (all 'add')
    links/epoch-{E}/part-*.parquet         # UNFILTERED link set as a file
                                           # MANIFEST: the linkstate lists
                                           # (file, rows, uri-bitset sketch)
                                           # entries across epoch dirs; an
                                           # epoch rewrites only files whose
                                           # sketch hits a dirty uri
    _linkstate.json                        # atomic pointer {epoch, per-bp
                                           # file chains, links manifest}

Per merge epoch E (consuming ``dirty/p=*/epoch-{E}.parquet`` deltas):

1. **delta index + shard write** (``map_batches``, no shuffle): for
   every changed key, compute the OLD payload's blocking keys
   (tombstones) and the NEW payload's keys + leaf-comparison values,
   for both link sides; each task writes its per-bp shard files
   directly (same-epoch shards of one bp touch disjoint uris, so
   reconciliation order among them is irrelevant) and returns only a
   small ``(bp, file, key, uri)`` summary. O(delta) writes; the K-fold
   exploded payload never enters the object store.
2. **compaction**: partitions whose delta chain exceeds ``COMPACT_AT``
   are reconciled and rewritten to one file (amortized O(lake/K)).
3. **delta re-score** (raw-task wave 1): per cost-balanced loader
   bucket, reconcile the chain (newest-file-wins per uri), keep rows
   in affected blocks (vectorized ``is_in``), key-sub-split hot bps,
   score fused with min-common-key dedup; pairs need ≥1 dirty side
   (clean∩clean pairs keep their stored links).
4. **links merge** (wave 1 drop-dirty tasks + wave 2 bundle-write
   tasks over the AFFECTED manifest files only): drop stored links
   touching a dirty uri, add the recomputed ones; each write task
   computes its own manifest entry (rows, uri sketch, n_new);
   unaffected files carry over by reference — O(delta + affected
   files) per epoch, not O(total links). Raw Ray tasks, not a
   Dataset: per-epoch deltas are small and the streaming-executor
   startup (~1.5 s/epoch) dominated the useful work (measured, see
   BASELINE.md); the batch-linking path stays a Dataset pipeline.

The maintained set is UNFILTERED (every pair with confidence ≥ limit);
the per-source top-k LinkFilter (Filter.scala:31-57) is applied as a
view by :func:`filtered_links` — incremental maintenance of a top-k
filtered set would otherwise need non-local re-ranking when a stored
best link disappears.

Bootstrap falls out naturally: after the first merge epoch every key is
dirty (all inserts), so the delta pass builds the full index and link
set.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from silk_ray.cdc import checkpoint as ckpt
from silk_ray.kernel.rule import LinkageRule
from silk_ray.linking.pipeline import _compile_rule, _exploded_schema

DEFAULT_BLOCK_PARTITIONS = 64


# ---------------------------------------------------------------------------
# link state pointer
# ---------------------------------------------------------------------------


def _linkstate_path(root: str) -> str:
    return os.path.join(root, "_linkstate.json")


def read_linkstate(root: str) -> dict:
    p = _linkstate_path(root)
    if not os.path.exists(p):
        return {"epoch": 0, "blockmap": {}, "links_dir": None}
    with open(p) as f:
        return json.load(f)


def commit_linkstate(root: str, state: dict) -> None:
    tmp = _linkstate_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _linkstate_path(root))
    # per-epoch snapshot for as-of-epoch (time-travel) reads — the same
    # idiom as the lake's manifest snapshots (checkpoint.commit_manifest);
    # _gc_links trims snapshots with the files they reference
    snap_dir = os.path.join(root, "_linkstates")
    os.makedirs(snap_dir, exist_ok=True)
    snap = os.path.join(snap_dir, f"state-{int(state.get('epoch', 0)):06d}.json")
    with open(snap + ".tmp", "w") as f:
        json.dump(state, f, sort_keys=True)
    os.replace(snap + ".tmp", snap)


def read_linkstate_at(root: str, epoch: int) -> dict:
    """The link state as committed at ``epoch`` (time-travel read);
    loud error outside the retention window."""
    p = os.path.join(root, "_linkstates", f"state-{epoch:06d}.json")
    if not os.path.exists(p):
        current = read_linkstate(root)["epoch"]
        raise FileNotFoundError(
            f"no linkstate snapshot for epoch {epoch} under {root!r} "
            f"(current link epoch {current}): the epoch never committed or "
            "its snapshot was GC'd outside the retention window "
            "(EngineConfig.retain_epochs)"
        )
    with open(p) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# stage 1: delta index
# ---------------------------------------------------------------------------


class DeltaIndexStage:
    """Turn dirty rows into blockmap add/del delta rows (both link sides).

    With ``shard_root`` set, each task writes its per-bp delta shard
    files DIRECTLY (no shuffle: every (uri, bp) pair is produced by
    exactly one task because the merge stage emits one dirty row per
    key per epoch, so same-epoch shards of one bp touch disjoint uris
    and their reconciliation order is irrelevant) and returns only a
    small summary ``(bp, file, key, uri)`` — the driver registers the
    shards and collects affected keys / dirty uris from it. This keeps
    the ~K-fold exploded payload out of the object-store shuffle."""

    def __init__(self, rule_spec, n_block_partitions: int, shard_root: str | None = None, epoch: int = 0):
        from silk_ray.linking.pipeline import _spec_symmetric

        self.rule = _compile_rule(rule_spec)
        self.nbp = n_block_partitions
        self.shard_root = shard_root
        self.epoch = epoch
        self.n_leaves = len(self.rule.leaf_comparisons())
        base = _exploded_schema(self.n_leaves)
        fields = [pa.field("bp", pa.int32()), pa.field("action", pa.string())] + list(base)
        self.schema = pa.schema(fields)
        # symmetric rules (every leaf's source == target spec): side-1
        # and side-0 evaluations coincide, so transforms/index hashing
        # run once per entity instead of per side
        self.symmetric = isinstance(rule_spec, dict) and _spec_symmetric(rule_spec)

    def _payload_entity(self, row: dict, prefix: str) -> dict | None:
        ent = {"repo": [row["repo"]], "path": [row["path"]]}
        any_val = False
        for k, v in row.items():
            if k.startswith(prefix):
                name = k[len(prefix):]
                ent[name] = [] if v is None else [str(v)]
                if v is not None:
                    any_val = True
        return ent if any_val else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from silk_ray.cdc.generator import make_uri

        out: dict[str, list] = {f.name: [] for f in self.schema}
        rule = self.rule
        for row in batch.to_pylist():
            uri = make_uri(row["repo"], row["path"])
            old_ent = self._payload_entity(row, "old_")
            new_ent = self._payload_entity(row, "new_")
            old_keys = new_keys = new_vals = None
            for side in (1, 0):
                sot = side == 1
                if old_ent is not None:
                    if old_keys is None or not self.symmetric:
                        old_keys = sorted(rule.index_keys(old_ent, sot))
                    for key in old_keys:
                        out["bp"].append(key % self.nbp)
                        out["action"].append("del")
                        out["key"].append(key)
                        out["side"].append(side)
                        out["uri"].append(uri)
                        out["keys"].append(None)
                        for i in range(self.n_leaves):
                            out[f"vals_{i}"].append(None)
                if new_ent is not None:
                    if new_keys is None or not self.symmetric:
                        new_vals = rule.leaf_values(new_ent, sot)
                        new_keys = sorted(rule.index_keys(new_ent, sot))
                    for key in new_keys:
                        out["bp"].append(key % self.nbp)
                        out["action"].append("add")
                        out["key"].append(key)
                        out["side"].append(side)
                        out["uri"].append(uri)
                        out["keys"].append(new_keys)
                        for i, v in enumerate(new_vals):
                            out[f"vals_{i}"].append(v)
        arrays = [pa.array(out[f.name], type=f.type) for f in self.schema]
        table = pa.Table.from_arrays(arrays, schema=self.schema)
        if self.shard_root is None:
            return table
        return self._write_shards(table)

    def _write_shards(self, table: pa.Table) -> pa.Table:
        """Write per-bp shard files locally; return the summary rows."""
        import uuid

        import pyarrow.compute as pc

        delta_schema = _delta_schema(self.n_leaves)
        sum_bp, sum_file, sum_key, sum_uri = [], [], [], []
        if table.num_rows:
            for bp in pc.unique(table["bp"]).to_pylist():
                sub = table.filter(pc.equal(table["bp"], bp))
                shard = sub.select(delta_schema.names).cast(delta_schema).sort_by(
                    [("key", "ascending"), ("side", "ascending"), ("uri", "ascending"), ("action", "ascending")]
                )
                rel = os.path.join(
                    "blockmap", f"bp={bp:05d}",
                    f"delta-{self.epoch:06d}-{uuid.uuid4().hex[:8]}.parquet",
                )
                ckpt.atomic_write_parquet(shard, os.path.join(self.shard_root, rel))
                keys = sub["key"].to_pylist()
                uris = sub["uri"].to_pylist()
                sum_bp.extend([bp] * len(keys))
                sum_file.extend([rel] * len(keys))
                sum_key.extend(keys)
                sum_uri.extend(uris)
        return pa.table(
            {
                "bp": pa.array(sum_bp, pa.int32()),
                "file": pa.array(sum_file, pa.string()),
                "key": pa.array(sum_key, pa.int64()),
                "uri": pa.array(sum_uri, pa.string()),
            }
        )


# ---------------------------------------------------------------------------
# stage 2: blockmap partition rewrite
# ---------------------------------------------------------------------------


COMPACT_AT = 8  # delta files per blockmap partition before compaction


def _delta_schema(n_leaves: int) -> pa.Schema:
    return pa.schema([pa.field("action", pa.string())] + list(_exploded_schema(n_leaves)))


def read_bp_reconciled(root: str, files: list[str], n_leaves: int) -> pa.Table:
    """Reconcile a blockmap partition from its ordered delta files
    (LSM-style): for every uri, only the NEWEST file mentioning it is
    authoritative (it contains the uri's full current 'add' rows for
    this partition; 'del' rows are pure tombstone markers — a uri whose
    newest mention is del-only has left this partition)."""
    import pyarrow.compute as pc

    import numpy as np

    schema = _exploded_schema(n_leaves)
    if not files:
        return schema.empty_table()
    tables = [pq.read_table(os.path.join(root, f)) for f in files]
    if len(tables) == 1:
        t = tables[0]
        keep = pc.equal(t["action"], "add")
        return t.filter(keep).select(schema.names).cast(schema)
    # vectorized newest-file-wins (the reconcile_tables shape,
    # merge.py): dictionary-encode uris across the chain, take the max
    # file index per code, keep each file's 'add' rows only where that
    # file is the uri's newest mention — no Python loop over uri lists
    allt = pa.concat_tables(
        [
            t.append_column("_fidx", pa.array(np.full(t.num_rows, i, np.int32)))
            for i, t in enumerate(tables)
        ]
    )
    codes_arr = pc.dictionary_encode(allt["uri"].combine_chunks()).indices
    codes = codes_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    fidx = allt["_fidx"].to_numpy(zero_copy_only=False)
    newest = np.full(int(codes.max()) + 1 if codes.size else 0, -1, np.int32)
    np.maximum.at(newest, codes, fidx)
    mask = (fidx == newest[codes]) & pc.equal(allt["action"], "add").to_numpy(
        zero_copy_only=False
    )
    return allt.filter(pa.array(mask)).select(schema.names).cast(schema)


def _consolidate_bundle(root: str, bps: list[int], shard_lists: list[list[str]], epoch: int):
    """Merge each bp's SAME-EPOCH shard files (one per merge task that
    touched the bp; disjoint uris, so concat order is irrelevant) into
    one delta file. O(this epoch's delta). Deterministic content
    (sorted input file list, sorted rows) → idempotent on replay."""
    out = []
    for bp, files in zip(bps, shard_lists):
        rel = os.path.join("blockmap", f"bp={bp:05d}", f"delta-{epoch:06d}-merged.parquet")
        # replay fast-path: the merged file's content is uniquely
        # determined by (bp, epoch) — the shard set is fixed by the
        # epoch's committed summaries — so an existing file IS the
        # result (and after a post-commit rollback the original shards
        # may already be GC'd)
        if not os.path.exists(os.path.join(root, rel)):
            tables = [pq.read_table(os.path.join(root, f)) for f in sorted(files)]
            merged = pa.concat_tables(tables).sort_by(
                [("key", "ascending"), ("side", "ascending"), ("uri", "ascending"), ("action", "ascending")]
            )
            ckpt.atomic_write_parquet(merged, os.path.join(root, rel))
        out.append((bp, rel))
    return out


def _compact_bundle(root: str, bps: list[int], chains: list[list[str]], n_leaves: int, epoch: int):
    out = []
    for bp, files in zip(bps, chains):
        merged = read_bp_reconciled(root, files, n_leaves).sort_by(
            [("key", "ascending"), ("side", "ascending"), ("uri", "ascending")]
        )
        merged = merged.add_column(0, "action", pa.array(["add"] * merged.num_rows, pa.string()))
        rel = os.path.join("blockmap", f"bp={bp:05d}", f"compact-{epoch:06d}.parquet")
        ckpt.atomic_write_parquet(merged, os.path.join(root, rel))
        out.append((bp, rel))
    return out


_compact_bps_task = None  # ray.remote wrapper, created lazily (no ray at import)
_consolidate_bps_task = None


def _ensure_compact_task():
    global _compact_bps_task
    if _compact_bps_task is None:
        import ray

        _compact_bps_task = ray.remote(num_cpus=1)(_compact_bundle)
    return _compact_bps_task


def _ensure_consolidate_task():
    global _consolidate_bps_task
    if _consolidate_bps_task is None:
        import ray

        _consolidate_bps_task = ray.remote(num_cpus=1)(_consolidate_bundle)
    return _consolidate_bps_task


def _links_empty_table() -> pa.Table:
    return pa.table(
        {
            "source": pa.array([], pa.string()),
            "target": pa.array([], pa.string()),
            "confidence": pa.array([], pa.float64()),
            "epoch_added": pa.array([], pa.int32()),
        }
    )


def _lrs_bundle(
    root: str,
    bucket: dict,
    key_arr: pa.Array,
    uri_arr: pa.Array,
    payload,
    limit: float,
    n_leaves: int,
    n_block_partitions: int,
    epoch: int,
) -> pa.Table:
    """One cost-balanced loader bucket: reconcile delta chains, keep
    rows in affected blocks, key-sub-split hot bps, score fused (no
    shuffle — bp co-locates every row of a key; see update_links)."""
    import pyarrow.compute as pc

    from silk_ray.linking.pipeline import PairScorer

    t_start = time.perf_counter()
    parts = []
    chain_memo: dict[tuple, pa.Table] = {}
    for files, msplit, rsplit in zip(bucket["files"], bucket["msplits"], bucket["rsplits"]):
        memo_key = tuple(files)
        t = chain_memo.get(memo_key)
        if t is None:
            t = read_bp_reconciled(root, files, n_leaves)
            t = t.filter(pc.is_in(t["key"], value_set=key_arr))
            if len(chain_memo) >= 4:
                chain_memo.clear()
            chain_memo[memo_key] = t
        if msplit > 1 and t.num_rows:
            keys_np = t["key"].to_numpy(zero_copy_only=False)
            mask = (keys_np // n_block_partitions) % msplit == rsplit
            t = t.filter(pa.array(mask))
        parts.append(t)
    loaded = pa.concat_tables(parts) if parts else _exploded_schema(n_leaves).empty_table()
    loaded = loaded.append_column("dirty", pc.is_in(loaded["uri"], value_set=uri_arr))
    t_mid = time.perf_counter()
    scorer = PairScorer(payload, limit=limit, source_equals_target=True, dirty_col="dirty")
    out = scorer(loaded)
    out = out.append_column("epoch_added", pa.array([epoch] * out.num_rows, pa.int32()))
    if os.environ.get("SILKRAY_LINK_PROFILE"):
        print(
            f"[lrs] load={t_mid - t_start:.2f} score={time.perf_counter() - t_mid:.2f} "
            f"rows={loaded.num_rows}",
            flush=True,
        )
    return out


def _drop_dirty_files(root: str, files: list[str], uri_arr: pa.Array) -> pa.Table:
    """Stored link files minus links touching a dirty uri."""
    import pyarrow.compute as pc

    parts = []
    for f in files:
        t = pq.read_table(os.path.join(root, f))
        if "epoch_added" not in t.column_names:  # pre-tagging layout
            t = t.append_column("epoch_added", pa.array([0] * t.num_rows, pa.int32()))
        keep = pc.and_(
            pc.invert(pc.is_in(t["source"], value_set=uri_arr)),
            pc.invert(pc.is_in(t["target"], value_set=uri_arr)),
        )
        parts.append(t.filter(keep))
    return pa.concat_tables(parts) if parts else _links_empty_table()


LINK_FILE_ROWS = 500_000  # target rows per manifest file


def _write_links_bundle(root: str, dir_new: str, name: str, epoch: int, *bundle) -> list[dict]:
    """Concat a bundle of link tables and write size-bounded manifest
    files (≤ ``LINK_FILE_ROWS`` rows each — an oversized input file
    re-splits here, keeping per-epoch rewrite cost bounded per file),
    returning their entries + this epoch's recomputed counts (sketch
    computed here, not re-read driver-side). An empty bundle writes
    nothing. The wave-1 outputs arrive as DIRECT ObjectRef args so
    Ray's locality-aware scheduler runs each write task where most of
    its bundle's bytes already live (multi-node: mostly node-local
    reads, remainder via plasma transfer)."""
    import pyarrow.compute as pc

    tables = [t for t in bundle if t.num_rows]
    if not tables:
        return []
    merged = pa.concat_tables(tables)
    out = []
    n_chunks = -(-merged.num_rows // LINK_FILE_ROWS)
    per = -(-merged.num_rows // n_chunks)
    for j in range(n_chunks):
        chunk = merged.slice(j * per, per)
        if not chunk.num_rows:
            continue
        p = os.path.join(dir_new, f"{name}-{j:03d}.parquet")
        ckpt.atomic_write_parquet(chunk, p)
        n_new = int(
            pc.sum(pc.cast(pc.equal(chunk["epoch_added"], epoch), pa.int64())).as_py() or 0
        )
        out.append(
            {
                "file": os.path.relpath(p, root),
                "rows": chunk.num_rows,
                "sketch": _sketch_of_links(chunk),
                "n_new": n_new,
            }
        )
    return out


_LINK_TASKS: dict[str, object] = {}


def _link_task(name: str):
    """Lazily-created ray.remote wrappers (no ray needed at import)."""
    task = _LINK_TASKS.get(name)
    if task is None:
        import ray

        fn = {"lrs": _lrs_bundle, "drop": _drop_dirty_files, "write": _write_links_bundle}[name]
        task = ray.remote(num_cpus=1)(fn)
        _LINK_TASKS[name] = task
    return task


# ---------------------------------------------------------------------------
# stage 3+4: delta re-score and links merge
# ---------------------------------------------------------------------------


def update_links(
    root: str,
    rule_spec: dict | LinkageRule,
    epoch: int,
    *,
    limit: float = 0.0,
    n_block_partitions: int = DEFAULT_BLOCK_PARTITIONS,
    retain_epochs: int = 1,
) -> dict:
    """Process merge epoch ``epoch``'s dirty deltas into the link state.

    Returns link metrics (links_recomputed, links_removed, ...).
    ``retain_epochs`` = as-of-epoch read depth for the link store
    (``links_table(at_epoch=)``); the replaced-file GC keeps that many
    past manifests' files.
    """
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    _phases: list[tuple[str, float]] = []
    _t_prev = [time.perf_counter()]

    def _mark(name: str) -> None:
        # per-phase wall clock, printed when SILKRAY_LINK_PHASES is set
        now = time.perf_counter()
        _phases.append((name, now - _t_prev[0]))
        _t_prev[0] = now

    state = read_linkstate(root)
    assert state["epoch"] == epoch - 1, (
        f"link state at epoch {state['epoch']}, cannot apply epoch {epoch}"
    )
    rule = _compile_rule(rule_spec)
    n_leaves = len(rule.leaf_comparisons())
    payload = rule_spec if isinstance(rule_spec, dict) else rule

    dirty_dir = os.path.join(root, "dirty")
    dirty_files = []
    if os.path.isdir(dirty_dir):
        for pdir in sorted(os.listdir(dirty_dir)):
            f = os.path.join(dirty_dir, pdir, f"epoch-{epoch:06d}.parquet")
            if os.path.exists(f):
                dirty_files.append(f)
    if not dirty_files:
        state["epoch"] = epoch
        commit_linkstate(root, state)
        return {"epoch": epoch, "links_recomputed": 0, "links_removed": 0, "links_total": _count_links(root, state)}

    # -- stage 1+2: delta index + per-bp shard writes --------------------
    # Preferred path: the merge stage already ran the delta index fused
    # into its tasks (MergePartition.link_spec) and left per-partition
    # summary files — read them driver-side, zero extra Ray executions.
    summary_dir = os.path.join(root, "summaries")
    summary_files = []
    if os.path.isdir(summary_dir):
        for pdir in sorted(os.listdir(summary_dir)):
            f = os.path.join(summary_dir, pdir, f"epoch-{epoch:06d}.parquet")
            if os.path.exists(f):
                summary_files.append(f)

    if summary_files:
        summary_batches = [pq.read_table(f) for f in summary_files]
        _mark("read_summaries")
    else:
        # fallback (e.g. merge ran without link_spec): run the delta
        # index over the dirty files as its own execution
        from silk_ray.linking.pipeline import cached_stage

        summary_ds = rd.read_parquet(dirty_files).map_batches(
            cached_stage(
                DeltaIndexStage,
                rule_spec=payload,
                n_block_partitions=n_block_partitions,
                shard_root=root,
                epoch=epoch,
            ),
            batch_format="pyarrow",
        )
        summary_batches = list(summary_ds.iter_batches(batch_format="pyarrow"))

    import pyarrow.compute as pc

    bm_files: dict[int, list[str]] = {
        int(k): (list(v) if isinstance(v, list) else [v]) for k, v in state["blockmap"].items()
    }
    # vectorized driver-side collection (these summaries are delta-sized
    # but still ~K× the dirty count; python set loops here were a
    # measurable serial chunk per epoch)
    summary_all = pa.concat_tables(summary_batches) if summary_batches else None
    affected_keys: set[int] = set()
    dirty_uris: set[str] = set()
    new_shards: dict[int, list[str]] = {}
    if summary_all is not None and summary_all.num_rows:
        affected_keys = set(pc.unique(summary_all["key"]).to_pylist())
        dirty_uris = set(pc.unique(summary_all["uri"]).to_pylist())
        files_tbl = pa.table(
            {"bp": summary_all["bp"], "file": summary_all["file"]}
        ).group_by(["bp", "file"]).aggregate([])
        for bp, f in zip(files_tbl["bp"].to_pylist(), files_tbl["file"].to_pylist()):
            new_shards.setdefault(bp, []).append(f)
    # consolidate same-epoch shards (one per merge task that touched the
    # bp) into ONE delta file per bp: chains then grow O(1) per epoch,
    # so the full COMPACT_AT reconcile fires every ~COMPACT_AT epochs
    # per bp (amortized O(state/COMPACT_AT)) instead of every epoch —
    # without this, ~P shards/bp/epoch tripped compaction into an
    # O(total blockmap) rewrite per epoch (measured 0.6-0.9 s/epoch at
    # sf0.1, growing with state)
    multi = {bp: sorted(set(s)) for bp, s in new_shards.items() if len(set(s)) > 1}
    if multi:
        task = _ensure_consolidate_task()
        items = sorted(multi.items())
        # one wave across the cluster: the cost is per-small-file IO
        # (~P shards per bp), so spread bps over ~2 tasks per CPU
        ncpu_c = int(ray.cluster_resources().get("CPU", 8))
        per = max(1, -(-len(items) // (2 * ncpu_c)))
        merged = ray.get(
            [
                task.remote(root, [bp for bp, _ in items[i : i + per]],
                            [fs for _, fs in items[i : i + per]], epoch)
                for i in range(0, len(items), per)
            ]
        )
        for bundle in merged:
            for bp, rel in bundle:
                new_shards[int(bp)] = [rel]
        _mark("consolidate")
    for bp, shards in new_shards.items():
        bm_files.setdefault(bp, []).extend(sorted(set(shards)))
    affected_bps = sorted({k % n_block_partitions for k in affected_keys})

    # -- compaction: bound each partition's delta chain ------------------
    # raw Ray tasks, not a Dataset: this is a driver-coordinated chain
    # maintenance op over a known small bp list; the streaming-executor
    # fixed cost (~0.5-1 s) was a measurable slice of every epoch
    to_compact = [bp for bp in bm_files if len(bm_files[bp]) > COMPACT_AT]
    if to_compact:
        task = _ensure_compact_task()
        compacted = ray.get(
            [
                task.remote(root, to_compact[i : i + 4],
                            [bm_files[bp] for bp in to_compact[i : i + 4]],
                            n_leaves, epoch)
                for i in range(0, len(to_compact), 4)
            ]
        )
        for bundle in compacted:
            for bp, rel in bundle:
                bm_files[int(bp)] = [rel]
        _mark("compaction")

    # -- stage 3: re-score affected blocks ------------------------------
    keys_ref = ray.put(pa.array(sorted(affected_keys), pa.int64()))
    uris_ref = ray.put(pa.array(sorted(dirty_uris), pa.string()))

    # per-bp delta row counts (driver-side, from the summary): large
    # bps are SUB-SPLIT by key so no single scoring task becomes the
    # serial tail — pair scoring is O(block²)-ish and task-level skew
    # was the measured scaling blocker (straggler tasks of 5-6 s)
    rows_per_bp: dict[int, int] = {}
    if summary_all is not None and summary_all.num_rows:
        bp_counts = pa.table({"bp": summary_all["bp"]}).group_by("bp").aggregate([("bp", "count")])
        rows_per_bp = dict(
            zip(bp_counts["bp"].to_pylist(), bp_counts["bp_count"].to_pylist())
        )
    SPLIT_ROWS = int(os.environ.get("SILKRAY_SPLIT_ROWS", "1000"))
    loader_items = []
    for bp in affected_bps:
        if not bm_files.get(bp):
            continue
        msplit = max(1, -(-rows_per_bp.get(bp, 0) // SPLIT_ROWS))
        for r in range(msplit):
            loader_items.append(
                {"bp": bp, "files": bm_files[bp], "msplit": msplit, "rsplit": r}
            )

    # adaptive parallelism: size loader tasks by the work actually
    # present — affected-chain bytes (driver-side getsize) AND the
    # delta-summary row count (pair scoring is CPU-bound per exploded
    # row, so compressed bytes alone undercount it). Fixed counts
    # (64/64) cost ~10s of pure task/shuffle overhead per epoch on
    # small deltas while the useful compute is milliseconds; both terms
    # grow the counts back to the cap at scale.
    n_summary = int(summary_all.num_rows) if summary_all is not None else 0
    total_bm_bytes = 0
    for bp in affected_bps:
        for f in bm_files.get(bp) or ():
            try:
                total_bm_bytes += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    # cap at 4 waves of cluster CPUs: past that, extra tasks only add
    # scheduling overhead + redundant chain reads (each task rebuilds
    # the affected-key hash set and re-reads any chain split across
    # task boundaries)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_loader_tasks = int(
        max(
            1,
            min(
                len(loader_items),
                max(total_bm_bytes // (8 << 20), n_summary // 1_500) + 1,
                4 * ncpu,
            ),
        )
    )
    # explicit greedy bin-packing into n_loader_tasks buckets: pair
    # scoring is ~quadratic in a split's block sizes, so hot splits
    # must SPREAD across tasks (contiguous bp-major batching clumps a
    # hot bp's splits into one task — measured 2.7x-mean stragglers),
    # while same-chain items stay adjacent inside a bucket so the
    # loader memo still dedups chain reads
    est = {
        id(it): (rows_per_bp.get(it["bp"], 0) / it["msplit"]) ** 2 / 1_000
        + rows_per_bp.get(it["bp"], 0) / it["msplit"]
        for it in loader_items
    }
    buckets: list[list] = [[] for _ in range(n_loader_tasks)]
    loads = [0.0] * n_loader_tasks
    for it in sorted(loader_items, key=lambda x: -est[id(x)]):
        i = loads.index(min(loads))
        buckets[i].append(it)
        loads[i] += est[id(it)]
    # one dict per bucket (parallel lists); each wave-1 task takes
    # exactly one cost-balanced bucket
    loader_buckets = [
        {
            "bps": [it["bp"] for it in b],
            "files": [it["files"] for it in b],
            "msplits": [it["msplit"] for it in b],
            "rsplits": [it["rsplit"] for it in b],
        }
        for b in (sorted(b, key=lambda x: (x["bp"], x["rsplit"])) for b in buckets)
        if b
    ]

    # -- stage 3 (score) + stage 4 (links merge) as TWO RAW-TASK WAVES --
    # The stored link set is a MANIFEST of size-bounded parquet files,
    # each carrying a small uri-bitset sketch. Per epoch only files
    # whose sketch intersects the dirty-uri bits are rewritten
    # (drop-dirty + union with the recomputed links); every other file
    # is carried over BY REFERENCE. Per-epoch link-merge cost is
    # O(delta + affected files), not O(total links) — the same
    # delta-not-state principle as the blockmap LSM and the lake
    # merge-apply.
    #
    # Raw Ray tasks instead of a Dataset plan: wave 1 scores each
    # loader bucket / drop-dirties each affected-file group and returns
    # table refs; wave 2 concats refs per output file, writes it, and
    # computes its manifest entry (rows, sketch, n_new) IN the task —
    # no per-epoch streaming-executor startup and no driver-side
    # re-read of written files. Same shape as the merge stage's direct
    # exchange (merge.py), which replaced a sort-groupby for the same
    # reason.
    manifest = _links_manifest(state, root)
    dirty_bits = _uri_bits(sorted(dirty_uris))
    affected, carried = [], []
    for entry in manifest:
        if len(manifest) > MAX_LINK_FILES or _sketch_hits(entry.get("sketch"), dirty_bits):
            affected.append(entry)
        else:
            carried.append(entry)
    # above MAX_LINK_FILES every file became "affected" → this epoch's
    # write doubles as full compaction

    links_dir_new = os.path.join(root, "links", f"epoch-{epoch:06d}")
    affected_rows = sum(e["rows"] for e in affected)
    n_link_blocks = max(1, min(64, affected_rows // 500_000 + 1))

    lrs = _link_task("lrs")
    refs = [
        lrs.remote(root, bucket, keys_ref, uris_ref, payload, limit,
                   n_leaves, n_block_partitions, epoch)
        for bucket in loader_buckets
    ]
    if affected:
        drop = _link_task("drop")
        files = [e["file"] for e in affected]
        per = max(1, len(files) // n_link_blocks)
        refs += [
            drop.remote(root, files[i : i + per], uris_ref)
            for i in range(0, len(files), per)
        ]

    # Idempotent replay: a crash between this write and commit_linkstate
    # would otherwise leave a partial epoch dir that a replay doubles.
    # Clearing any previous attempt first keeps the linkstate pointer
    # swap the sole commit point.
    import shutil

    shutil.rmtree(links_dir_new, ignore_errors=True)
    os.makedirs(links_dir_new, exist_ok=True)
    _mark("plan_build")
    written: list[dict] = []
    if refs:
        write = _link_task("write")
        n_out = min(n_link_blocks, len(refs))
        bundles = [refs[i::n_out] for i in range(n_out)]
        write_refs = [
            write.remote(root, links_dir_new, f"part-{i:05d}", epoch, *b)
            for i, b in enumerate(bundles)
        ]
        # release the driver's pins on wave-1 outputs: each write task
        # holds its own bundle's refs, so blocks free as writes finish
        # instead of all living until update_links returns
        del refs, bundles
        for entry_list in ray.get(write_refs):
            written.extend(entry_list)
    # no refs at all (no loader buckets, no affected files) → nothing
    # written this epoch; the manifest simply carries existing entries
    _mark("score_and_write")
    n_new = sum(e.pop("n_new") for e in written)

    prev_files = [
        {"file": e["file"]} for e in _links_manifest(
            {k: v for k, v in state.items() if k in ("links_files", "links_dir")}, root
        )
    ]
    prev_blockmap = [
        f
        for v in state.get("blockmap", {}).values()
        for f in (v if isinstance(v, list) else [v])
    ]
    state = {
        "epoch": epoch,
        "blockmap": {str(k): v for k, v in bm_files.items()},
        "links_files": carried + written,
        # previous manifest's file list: GC keeps these too, so a crash
        # between a future epoch's links write and its linkstate commit
        # can still replay against this epoch's intact file set
        "links_files_prev": prev_files,
        # previous blockmap chains: same one-epoch GC retention, so a
        # rolled-back linkstate can still reconcile its chains
        "blockmap_prev": prev_blockmap,
    }
    _mark("manifest_post")
    commit_linkstate(root, state)
    _gc_links(root, state, retain_epochs=retain_epochs)
    _mark("commit_gc")

    metrics = {
        "epoch": epoch,
        "links_recomputed": int(n_new),
        # rows in rewritten files minus what survived = stored links
        # dropped this epoch (dirty-uri links; recomputed ones that
        # still hold come back via n_new)
        "links_removed": int(affected_rows - (sum(e["rows"] for e in written) - n_new)),
        "dirty_uris": len(dirty_uris),
        "affected_keys": len(affected_keys),
        "affected_block_partitions": len(affected_bps),
        "links_total": _count_links(root, state),
    }
    _append_link_metrics(root, epoch, metrics)
    if os.environ.get("SILKRAY_LINK_PHASES"):
        print(f"[link-phases] epoch={epoch} " + " ".join(f"{n}={d:.2f}" for n, d in _phases), flush=True)
    return metrics


# links-manifest machinery: per-file 8192-bit uri sketches gate which
# stored files an epoch must rewrite (false positive → harmless extra
# rewrite; false negatives impossible)
LINK_SKETCH_BITS = 8192
MAX_LINK_FILES = 64


def _uri_bits(uris) -> set[int]:
    import zlib

    return {zlib.crc32(u.encode()) % LINK_SKETCH_BITS for u in uris}


def _sketch_of_links(t: pa.Table) -> str:
    import base64

    import numpy as np

    bits = np.zeros(LINK_SKETCH_BITS // 8, dtype=np.uint8)
    for col in ("source", "target"):
        for b in _uri_bits(t[col].to_pylist()):
            bits[b >> 3] |= 1 << (b & 7)
    return base64.b64encode(bits.tobytes()).decode()


def _sketch_hits(sketch_b64: str | None, dirty_bits: set[int]) -> bool:
    import base64

    if sketch_b64 is None:  # legacy entry without a sketch
        return True
    raw = base64.b64decode(sketch_b64)
    return any(raw[b >> 3] & (1 << (b & 7)) for b in dirty_bits)


def _links_manifest(state: dict, root: str | None = None) -> list[dict]:
    """Manifest entries from the state. Legacy ``links_dir`` states
    expand to one sketch-less entry PER FILE with real row counts
    (``sketch: None`` → always treated as affected), so GC retention
    and block sizing behave identically for upgraded lakes."""
    if state.get("links_files") is not None:
        return state["links_files"]
    if not state.get("links_dir"):
        return []
    d = os.path.join(root, state["links_dir"]) if root else state["links_dir"]
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            p = os.path.join(d, f)
            rel = os.path.relpath(p, root) if root else p
            out.append(
                {"file": rel, "rows": pq.read_metadata(p).num_rows, "sketch": None}
            )
    return out


def _gc_links(root: str, state: dict, retain_epochs: int = 1) -> None:
    """Delete link files no retained manifest references (files replaced
    by a rewrite). Runs after the commit point, so a crash mid-GC leaves
    only unreferenced garbage. ``retain_epochs`` = as-of-epoch read
    depth (``links_table(at_epoch=)``); the default keeps exactly the
    crash-replay window (``links_files_prev``), identical to the
    pre-time-travel behavior."""
    live = {
        os.path.normpath(e["file"])
        for e in state.get("links_files", []) + state.get("links_files_prev", [])
    }
    epoch = int(state.get("epoch", 0))
    floor = epoch - max(1, retain_epochs) - 1
    for e in range(max(1, floor + 1), epoch):
        try:
            snap = read_linkstate_at(root, e)
        except FileNotFoundError:  # pre-snapshot state or already trimmed
            continue
        live.update(
            os.path.normpath(entry["file"]) for entry in _links_manifest(snap, root)
        )
    snap_dir = os.path.join(root, "_linkstates")
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
    base = os.path.join(root, "links")
    if not os.path.isdir(base):
        return
    for d in os.listdir(base):
        full = os.path.join(base, d)
        if not os.path.isdir(full):
            continue
        for f in os.listdir(full):
            rel = os.path.normpath(os.path.join("links", d, f))
            if f.endswith(".parquet") and rel not in live:
                try:
                    os.remove(rel if os.path.isabs(rel) else os.path.join(root, rel))
                except OSError:
                    pass
        if not os.listdir(full):
            try:
                os.rmdir(full)
            except OSError:
                pass


def gc_blockmap(root: str, state: dict | None = None) -> int:
    """Delete blockmap files neither the committed linkstate nor its
    one-epoch rollback window (``blockmap_prev``) references:
    pre-compaction chain members two commits back and orphaned shards
    from crashed/retried delta-index attempts (shard names carry a
    random suffix, so a retry never overwrites its predecessor — the
    summary file registers exactly one attempt's shards and the rest
    are garbage). Files whose embedded epoch is NEWER than the
    linkstate epoch are kept: a pending catch-up ``update_links`` will
    register them from the summaries. Run only after
    ``commit_linkstate``. Returns files removed."""
    from silk_ray.cdc.merge import _file_epoch

    if state is None:
        state = read_linkstate(root)
    link_epoch = int(state.get("epoch", 0))
    live = {
        os.path.normpath(f)
        for files in state.get("blockmap", {}).values()
        for f in (files if isinstance(files, list) else [files])
    }
    live |= {os.path.normpath(f) for f in state.get("blockmap_prev", [])}
    base = os.path.join(root, "blockmap")
    if not os.path.isdir(base):
        return 0
    removed = 0
    for d in os.listdir(base):
        full = os.path.join(base, d)
        if not os.path.isdir(full):
            continue
        for f in os.listdir(full):
            if not f.endswith(".parquet"):
                continue
            e = _file_epoch(f)
            rel = os.path.normpath(os.path.join("blockmap", d, f))
            if rel not in live and e is not None and e <= link_epoch:
                try:
                    os.remove(os.path.join(root, rel))
                    removed += 1
                except OSError:
                    pass
    return removed


def _count_links(root: str, state: dict) -> int:
    files = state.get("links_files")
    if files is not None:
        return sum(e["rows"] for e in files)
    if not state.get("links_dir"):
        return 0
    d = os.path.join(root, state["links_dir"])
    total = 0
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(d, f)).num_rows
    return total


def _append_link_metrics(root: str, epoch: int, metrics: dict) -> None:
    d = os.path.join(root, "_metrics")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"links-{epoch:06d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, sort_keys=True)
    os.replace(tmp, os.path.join(d, f"links-{epoch:06d}.json"))


# ---------------------------------------------------------------------------
# link views
# ---------------------------------------------------------------------------


def links_table(root: str, at_epoch: int | None = None) -> pa.Table:
    """The maintained unfiltered link set, sorted (driver-side;
    test/small-lake helper — distributed consumers read the manifest
    files as a Dataset). ``at_epoch`` time-travels to a retained
    earlier link commit."""
    empty = pa.table({"source": pa.array([], pa.string()), "target": pa.array([], pa.string()),
                      "confidence": pa.array([], pa.float64())})
    state = read_linkstate(root) if at_epoch is None else read_linkstate_at(root, at_epoch)
    entries = _links_manifest(state, root)
    tables = []
    for e in entries:
        p = os.path.join(root, e["file"])
        if os.path.isdir(p):  # legacy dir entry
            tables += [pq.read_table(os.path.join(p, f)) for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
        elif os.path.exists(p):
            tables.append(pq.read_table(p))
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables, promote_options="default").sort_by(
        [("source", "ascending"), ("target", "ascending")]
    )


def filtered_links(root: str, filter_limit: int | None, unambiguous: bool = False) -> pa.Table:
    """Per-source top-k view (LinkFilter, Filter.scala:40-44); with
    ``unambiguous`` keep only single-link sources (Filter.scala:46-57)."""
    t = links_table(root)
    if not filter_limit or t.num_rows == 0:
        return t
    import pandas as pd

    df = t.to_pandas()
    if unambiguous:
        n = df.groupby("source", sort=False)["target"].transform("size")
        return pa.Table.from_pandas(df[n == 1].reset_index(drop=True), preserve_index=False)
    df = df.sort_values(["source", "confidence", "target"], ascending=[True, False, True], kind="mergesort")
    df = df.groupby("source", sort=True).head(filter_limit).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
