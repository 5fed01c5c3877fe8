"""Snapshot bootstrap: initialize the lake from an existing table, then
tail the changelog from the snapshot's offset.

The canonical CDC startup story (Debezium's initial snapshot, a
warehouse backfill, a migrated lake): you hold a consistent snapshot of
the source *as of* binlog offset S, and the live changelog. Bootstrap
loads the snapshot as lake epoch 1 and positions the consumer at S+1,
so the subsequent :func:`silk_ray.cdc.engine.run` applies exactly the
events the snapshot hasn't seen — the end state is byte-identical to
having tailed the whole stream from offset 0 (tests/test_bootstrap.py
proves sha256 equality for the lake, the link store and the aggregate
view).

Mechanism: the snapshot is expressed as a synthetic insert-only
changelog window occupying offsets ``S-n+1 .. S`` (one distinct offset
per row — the merge stage's duplicate-offset filter must not collapse
snapshot rows) and pushed through the ordinary :func:`merge.run_epoch`.
That reuses every tested path unchanged — key partitioning, dirty
deltas, fused link-index summaries, dead-letter quarantine for
malformed snapshot rows, manifest commit — and leaves
``next_offset = S+1``, which is the consumer position (window anchoring
makes per-partition HWMs < S harmless: offsets ≤ S are never read
again). Incremental linking / cluster / aggregate maintenance then
initialize from epoch 1's dirty files via the engine's normal catch-up.

Scale shape: an in-memory snapshot (tests, small lakes) goes through
run_epoch as one table; a parquet snapshot (file or directory) is
converted file-by-file into synthetic changelog segments by Ray tasks —
offset ranges are assigned from parquet-footer row counts (a
metadata-only driver probe), so no snapshot payload ever concentrates
driver-side.

Ordering semantics: if the snapshot contains duplicate (repo, path)
keys, the LAST row in snapshot order wins (rows get ascending offsets;
the merge keeps the newest per key) — same rule as the stream itself.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from silk_ray.cdc import checkpoint as ckpt
from silk_ray.cdc.merge import DEFAULT_PARTITIONS, run_epoch

KEY_COLS = ("repo", "path")


def _synth_table(t: pa.Table, start: int) -> pa.Table:
    """Snapshot rows → insert events at offsets start..start+n-1."""
    import numpy as np

    n = t.num_rows
    cols: dict = {
        "offset": pa.array(np.arange(start, start + n, dtype=np.int64), pa.int64()),
        "op": pa.array(["I"] * n, pa.string()),
    }
    for name in t.column_names:
        if name in ("offset", "op"):
            raise ValueError(
                f"snapshot carries a reserved changelog column {name!r}; "
                "rename it before bootstrapping"
            )
        cols[name] = t[name]
    return pa.table(cols)


def bootstrap_lake(
    root: str,
    snapshot,
    *,
    as_of_offset: int,
    num_partitions: int = DEFAULT_PARTITIONS,
    link_spec: dict | None = None,
    n_block_partitions: int = 64,
    renames: dict[str, str] | None = None,
) -> dict:
    """Load ``snapshot`` (pa.Table, or a parquet file/dir path) into a
    FRESH lake root as epoch 1, positioned so tailing resumes at
    ``as_of_offset + 1``. Returns the bootstrap epoch's merge metrics.

    Raises if the root already has committed epochs (bootstrap is a
    one-time initialization; a crashed bootstrap attempt — no manifest
    commit — replays deterministically), or if ``as_of_offset < n-1``
    (n snapshot rows need n distinct non-negative synthetic offsets
    ≤ S; a snapshot taken at offset S of a stream that created n keys
    always satisfies this).
    """
    manifest = ckpt.read_manifest(root)
    if manifest.epoch > 0:
        raise ValueError(
            f"lake at {root!r} already has committed epoch {manifest.epoch}; "
            "bootstrap initializes a fresh root only"
        )
    # single-writer lease: an engine started concurrently on the same
    # fresh root would tail from offset 0 while we write epoch 1
    ckpt.acquire_writer(root, "bootstrap")
    try:
        return _bootstrap_locked(
            root, snapshot, as_of_offset, num_partitions,
            link_spec, n_block_partitions, renames,
        )
    finally:
        ckpt.release_writer(root)


def _bootstrap_locked(
    root, snapshot, as_of_offset, num_partitions,
    link_spec, n_block_partitions, renames,
) -> dict:
    if isinstance(snapshot, pa.Table):
        n = snapshot.num_rows
        if as_of_offset < n - 1:
            raise ValueError(
                f"as_of_offset={as_of_offset} < n-1={n - 1}: {n} snapshot rows "
                "need distinct non-negative offsets ending at the snapshot offset"
            )
        changelog = _synth_table(snapshot, as_of_offset - n + 1)
    else:
        changelog = _synth_parquet(root, snapshot, as_of_offset)

    metrics = run_epoch(
        root,
        changelog,
        epoch_size=2**62,  # the whole snapshot is one epoch window
        num_partitions=num_partitions,
        renames=renames,
        link_spec=link_spec,
        n_block_partitions=n_block_partitions,
    )
    if metrics is None:
        raise ValueError("empty snapshot: nothing to bootstrap")
    if isinstance(changelog, str) and changelog.startswith(root):
        # the synthetic segments are consumed the moment the manifest
        # commits (crash-before-commit replays regenerate them)
        import shutil

        shutil.rmtree(changelog, ignore_errors=True)
    metrics["bootstrap"] = True
    metrics["as_of_offset"] = as_of_offset
    return metrics


def _synth_parquet(root: str, snapshot_path: str, as_of_offset: int) -> str:
    """Convert a parquet snapshot (file or dir) into synthetic changelog
    segments under ``root/_bootstrap_changelog/``. Offset ranges come
    from footer row counts (metadata-only, driver-side); the payload
    conversion fans out one Ray task per file."""
    import ray

    if os.path.isdir(snapshot_path):
        files = sorted(
            os.path.join(snapshot_path, f)
            for f in os.listdir(snapshot_path)
            if f.endswith(".parquet")
        )
    else:
        files = [snapshot_path]
    if not files:
        raise ValueError(f"no parquet files under {snapshot_path!r}")
    counts = [pq.read_metadata(f).num_rows for f in files]
    n = sum(counts)
    if as_of_offset < n - 1:
        raise ValueError(
            f"as_of_offset={as_of_offset} < n-1={n - 1}: {n} snapshot rows "
            "need distinct non-negative offsets ending at the snapshot offset"
        )
    out_dir = os.path.join(root, "_bootstrap_changelog")
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def convert(src: str, start: int, out: str) -> int:
        t = _synth_table(pq.read_table(src), start)
        ckpt.atomic_write_parquet(t, out)
        return t.num_rows

    start = as_of_offset - n + 1
    refs = []
    for i, (f, c) in enumerate(zip(files, counts)):
        refs.append(convert.remote(f, start, os.path.join(out_dir, f"seg-{i:05d}.parquet")))
        start += c
    ray.get(refs)
    return out_dir


def _export_task(root: str, files: list[str], out_path: str) -> int:
    """Reconcile one partition chain and write it as a clean snapshot
    part (internal columns dropped; key-sorted for determinism)."""
    from silk_ray.cdc.merge import _read_chain, reconcile_tables

    t = reconcile_tables(_read_chain(root, files))
    t = t.drop_columns([c for c in ("_offset", "_kh") if c in t.column_names])
    if not t.num_rows:
        return 0
    t = t.sort_by([("repo", "ascending"), ("path", "ascending")])
    ckpt.atomic_write_parquet(t, out_path)
    return t.num_rows


def export_snapshot(root: str, out_dir: str, at_epoch: int | None = None) -> dict:
    """The inverse of bootstrap: write the lake's (or an as-of-epoch)
    state as a clean partitioned parquet snapshot plus a consistency
    marker, suitable for ``bootstrap_lake`` on another root.

    One Ray task per partition chain writes ``part-{pid}.parquet``
    (reconciled, internals dropped, key-sorted); the ``_SNAPSHOT.json``
    marker — epoch, the binlog offset the state is consistent as of,
    row/file counts — is written atomically LAST, so a crashed export
    leaves no marker and a rerun converges. The DR/migration runbook is
    export → bootstrap(as_of_offset = marker) → tail: byte-identical to
    a full tail (tests/test_bootstrap.py round trip)."""
    import ray

    from silk_ray.cdc.merge import partition_chains

    marker_path = os.path.join(out_dir, "_SNAPSHOT.json")
    if os.path.exists(marker_path):
        raise FileExistsError(
            f"{marker_path} already exists — refusing to overwrite a committed "
            "snapshot; export to a fresh directory"
        )
    manifest = (
        ckpt.read_manifest_at(root, at_epoch) if at_epoch is not None
        else ckpt.read_manifest(root)
    )
    if manifest.epoch == 0:
        raise ValueError(f"lake at {root!r} has no committed epochs to export")
    os.makedirs(out_dir, exist_ok=True)
    chains = partition_chains(root, at_epoch=at_epoch)
    task = ray.remote(_export_task)
    jobs, parts = [], []
    for pid, files in sorted(chains.items()):
        p = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        jobs.append(task.remote(root, files, p))
        parts.append(p)
    rows = ray.get(jobs)
    files = [os.path.basename(p) for p, n in zip(parts, rows) if n]
    marker = {
        "epoch": manifest.epoch,
        "as_of_offset": manifest.next_offset - 1,
        "rows": int(sum(rows)),
        "files": files,
        "num_partitions": manifest.num_partitions,
    }
    import json

    tmp = f"{marker_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(marker, f, sort_keys=True)
    os.replace(tmp, marker_path)
    return marker


def read_snapshot_marker(path: str) -> dict | None:
    """The _SNAPSHOT.json of an exported snapshot directory, if any."""
    import json

    p = os.path.join(path, "_SNAPSHOT.json") if os.path.isdir(path) else None
    if p is None or not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
