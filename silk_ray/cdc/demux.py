"""Multi-table binlog demux: one shared changelog carrying events for
many tables (a ``tbl`` column — the Debezium / MySQL-binlog shape, one
stream per database, not per table) is routed into per-table changelog
directories with offsets preserved, and each table then runs the
ordinary single-table engine on its own stream.

Routing-then-ingesting (instead of teaching the merge about tables) is
the deliberate design: the demux is a resumable, embarrassingly
parallel map over changelog fragments — no shuffle, no state beyond a
cursor — and every single-table property (exactly-once replay, schema
evolution, DLQ, txn atomicity, incremental linking, views, egress)
composes per table with zero changes, because each table's lake
consumes a complete, gap-tolerant offset stream (the engine's window
anchoring skips foreign-table offsets). This mirrors the production
shape of per-table topics fed from one binlog.

Exactly-once: a demux window's output files are a deterministic
function of the window's input (fragments processed in sorted-path
order, rows offset-sorted, fixed parquet options), written
tmp→rename and committed by writing ``_demux.json`` LAST — a crash
mid-window reruns the window and rewrites byte-identical segments.

Transaction atomicity composes per table ONLY when the demux cut
itself is transaction-aligned: ``run_multi`` forces ``txn_snap`` on
the demux window whenever any consuming table runs ``txn_atomic``, so
a transaction straddling a plain size-based cut can never strand part
of itself beyond a table's demuxed horizon (where the table's own
boundary snap could not see the continuation and would durably commit
a torn state). Cross-table atomicity of the COMMIT POINT remains out
of scope: a transaction touching two tables is atomic within each
lake but the two lakes can commit it in different epochs. A
coordinated multi-lake commit point would be needed for more.

Rows with a null/empty/path-unsafe ``tbl`` quarantine to
``out_dir/deadletter/`` (reason ``missing_tbl``/``invalid_tbl``) —
they cannot be routed, and dropping them silently would violate the
"every offset is accounted for" rule the engine lives by.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from silk_ray.cdc.merge import (
    _next_existing_offset,
    _window_fragments,
)

_SAFE_TBL = re.compile(r"^[A-Za-z0-9_.-]{1,128}$")


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_demux.json")


def read_demux_state(out_dir: str) -> dict:
    p = _state_path(out_dir)
    if not os.path.exists(p):
        return {"window": 0, "next_offset": 0}
    with open(p) as f:
        return json.load(f)


def _commit_demux_state(out_dir: str, window: int, next_offset: int) -> None:
    tmp = f"{_state_path(out_dir)}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"window": int(window), "next_offset": int(next_offset)}, f, sort_keys=True)
    os.replace(tmp, _state_path(out_dir))


def table_dir(out_dir: str, tbl: str) -> str:
    if not _SAFE_TBL.match(tbl or ""):
        raise ValueError(f"unroutable table name {tbl!r}")
    return os.path.join(out_dir, "tables", tbl)


def demuxed_tables(out_dir: str) -> list[str]:
    d = os.path.join(out_dir, "tables")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def _route_fragment(src, lo: int, hi: int) -> tuple[dict, "object"]:
    """Map task: read one fragment's window rows, split by tbl.
    Returns ({tbl: object-store ref of that table's rows, tbl column
    dropped}, dead-rows table or None)."""
    import ray

    if isinstance(src, pa.Table):
        t = src
    else:
        t = pq.read_table(src, filters=[("offset", ">=", lo), ("offset", "<", hi)])
    if t.num_rows == 0:
        return {}, None
    if "tbl" not in t.column_names:
        raise ValueError("multi-table demux requires a `tbl` changelog column")
    tbl_arr = t["tbl"]
    valid_name = pc.fill_null(
        pc.match_substring_regex(pc.cast(tbl_arr, pa.string()), _SAFE_TBL.pattern), False
    )
    dead = t.filter(pc.invert(valid_name))
    if dead.num_rows:
        reasons = pa.array(
            [
                "missing_tbl" if v is None or v == "" else "invalid_tbl"
                for v in dead["tbl"].to_pylist()
            ],
            pa.string(),
        )
        dead = dead.append_column("reason", reasons)
        t = t.filter(valid_name)
    else:
        dead = None
    out: dict[str, object] = {}
    if t.num_rows:
        # dictionary-encode + per-code masks: one pass, no Python rows
        enc = pc.dictionary_encode(pc.cast(t["tbl"], pa.string())).combine_chunks()
        codes, names = enc.indices, enc.dictionary.to_pylist()
        body = t.drop_columns(["tbl"])
        for code, name in enumerate(names):
            part = body.filter(pc.equal(codes, code))
            out[name] = ray.put(part.sort_by([("offset", "ascending")]))
    return out, dead


def _clean_stale_tmp(d: str) -> None:
    """Remove tmp leftovers from crashed writers. New tmp names are
    dot-prefixed (discovery-safe); legacy ``*.tmp-<pid>`` suffix names
    from older versions are also swept so a stale torn file can never
    be picked up as a fragment or crash ``gc_demux``'s footer read."""
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return
    for f in names:
        if f.startswith(".tmp-") or ".tmp-" in f:
            try:
                os.remove(os.path.join(d, f))
            except OSError:
                pass


def _write_seg(out_dir: str, tbl: str, window: int, *shards) -> int:
    """Writer task: concat this table's window shards (fragment order),
    offset-sort, write one segment atomically. Deterministic bytes —
    a crashed window's rerun rewrites the identical file."""
    parts = [s for s in shards if s is not None and s.num_rows]
    if not parts:
        return 0
    t = parts[0] if len(parts) == 1 else pa.concat_tables(parts, promote_options="default")
    t = t.sort_by([("offset", "ascending")])
    d = table_dir(out_dir, tbl)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"seg-{window:06d}.parquet")
    # tmp basename MUST be dot-prefixed: pyarrow dataset discovery (the
    # engine's _window_fragments / _next_existing_offset scan this dir)
    # only skips '.'/'_' prefixes, so a torn suffix-style tmp left by a
    # writer crash would be discovered as a fragment and hard-fail every
    # subsequent epoch (pq.read_table on a truncated file).
    tmp = os.path.join(d, f".tmp-{os.getpid()}-seg-{window:06d}")
    _clean_stale_tmp(d)
    pq.write_table(t, tmp, row_group_size=64 * 1024)
    os.replace(tmp, path)
    return t.num_rows


def demux_window(
    out_dir: str, changelog, epoch_size: int = 500_000, txn_snap: bool = False
) -> dict | None:
    """Route one offset window. Returns {window, next_offset, rows
    {tbl: n}, dead_lettered} or None when the stream is exhausted.

    ``txn_snap`` snaps the window cut to GLOBAL transaction boundaries
    on the shared changelog (merge.snap_txn_boundary). Required when
    any consuming table runs with ``txn_atomic``: a plain ``lo +
    epoch_size`` cut can land mid-transaction, and a table whose
    demuxed substream ends inside that transaction sees no
    continuation (the remainder is not demuxed yet), so its engine's
    own boundary snap finds nothing to defer and durably commits a
    torn transaction. Transactions are contiguous on the SHARED
    changelog (the binlog shape), so a globally txn-aligned cut
    guarantees every per-table substream ends on a complete
    transaction — per-table atomicity then composes with zero
    engine-side changes."""
    import ray

    state = read_demux_state(out_dir)
    lo = state["next_offset"]
    nxt = _next_existing_offset(changelog, lo)
    if nxt is None:
        return None
    lo = max(lo, nxt)
    hi = lo + epoch_size
    if txn_snap:
        from silk_ray.cdc.merge import snap_txn_boundary

        hi = snap_txn_boundary(changelog, lo, hi)
    fragments = _window_fragments(changelog, lo, hi)
    if not fragments:
        return None
    window = state["window"] + 1
    route = ray.remote(_route_fragment)
    routed = ray.get([route.remote(f, lo, hi) for f in fragments])
    by_tbl: dict[str, list] = {}
    dead_parts = []
    for m, dead in routed:
        for tbl, ref in m.items():
            by_tbl.setdefault(tbl, []).append(ref)
        if dead is not None:
            dead_parts.append(dead)
    dead_lettered = 0
    if dead_parts:
        dead = pa.concat_tables(dead_parts, promote_options="default").sort_by(
            [("offset", "ascending")]
        )
        dd = os.path.join(out_dir, "deadletter")
        os.makedirs(dd, exist_ok=True)
        p = os.path.join(dd, f"window-{window:06d}.parquet")
        tmp = os.path.join(dd, f".tmp-{os.getpid()}-window-{window:06d}")
        _clean_stale_tmp(dd)
        pq.write_table(dead, tmp)
        os.replace(tmp, p)
        dead_lettered = dead.num_rows
    if not by_tbl and not dead_lettered:
        return None
    write = ray.remote(_write_seg)
    os.makedirs(out_dir, exist_ok=True)
    # Writer tasks run in bounded WAVES, and each table's shard refs are
    # RELEASED as its wave completes: a 10^3-live-table deployment would
    # otherwise submit 10^3 concurrent writers and keep every routed
    # shard pinned in the object store until the slowest write finished
    # — driver-side in-flight state is now O(wave), not O(tables), and
    # object-store pinning drains progressively. (The {tbl: ref} maps
    # themselves are ~100 bytes/entry — the F×T dict is MBs at 10^3
    # tables and is the exchange's inherent driver footprint.)
    wave_size = max(1, int(os.environ.get("SILKRAY_DEMUX_WRITE_WAVE", "64")))
    tables = sorted(by_tbl)
    counts: dict[str, int] = {}
    waves = 0
    for i in range(0, len(tables), wave_size):
        wave = tables[i : i + wave_size]
        got = ray.get([write.remote(out_dir, t, window, *by_tbl[t]) for t in wave])
        counts.update(zip(wave, got))
        for t in wave:
            del by_tbl[t]  # unpin this table's routed shards now
        waves += 1
    _commit_demux_state(out_dir, window, hi)  # the sole commit point
    return {
        "window": window,
        "next_offset": hi,
        "rows": counts,
        "dead_lettered": dead_lettered,
        "write_waves": waves,
    }


def demux_to_completion(
    out_dir: str, changelog, epoch_size: int = 500_000, txn_snap: bool = False
) -> list[dict]:
    out = []
    while True:
        m = demux_window(out_dir, changelog, epoch_size, txn_snap=txn_snap)
        if m is None:
            return out
        out.append(m)


def gc_demux(root: str, tables: list[str] | None = None, force: bool = False) -> int:
    """Reclaim demuxed segments every consuming lake has fully applied.

    Without GC a continuously-tailing multi-table root accumulates one
    segment per (table, window) forever. A segment is reclaimable when
    its footer max offset is below ITS table's lake cursor
    (``lakes/<tbl>`` manifest ``next_offset``) — below-HWM redelivery
    is a no-op, so nothing that matters can ever need it again. A
    table with NO lake under the root is protected: its whole stream
    is retained for a future consumer unless ``force`` drops it.
    Returns the number of files removed. Footer-statistics only."""
    from silk_ray.cdc import checkpoint as ckpt
    from silk_ray.cdc.merge import _MAX_OFF_CACHE

    demux_dir = os.path.join(root, "demux")
    removed = 0
    for tbl in tables if tables is not None else demuxed_tables(demux_dir):
        lake = os.path.join(root, "lakes", tbl)
        manifest = ckpt.read_manifest(lake)
        if manifest.epoch == 0 and not force:
            continue  # no consumer yet — retain the stream
        floor = manifest.next_offset if manifest.epoch else None
        d = table_dir(demux_dir, tbl)
        for f in sorted(os.listdir(d)):
            if f.startswith((".", "_")) or ".tmp-" in f:
                continue  # crashed-writer leftovers: footer read would
                # fail on a torn file; _clean_stale_tmp sweeps them at
                # the table's next segment write (never here — GC may
                # run beside a live writer whose tmp is mid-rename)
            p = os.path.join(d, f)
            if floor is not None:
                md = pq.read_metadata(p)
                mx = None
                try:
                    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
                        "offset"
                    ]
                    stats = [md.row_group(r).column(idx).statistics for r in range(md.num_row_groups)]
                    if stats and all(s is not None and s.has_min_max for s in stats):
                        mx = max(s.max for s in stats)
                except KeyError:
                    pass
                if mx is None:
                    mx = int(pc.max(pq.read_table(p, columns=["offset"])["offset"]).as_py())
                if mx >= floor:
                    continue
            os.remove(p)
            _MAX_OFF_CACHE.pop(p, None)
            removed += 1
    return removed


def run_multi(
    root: str,
    changelog,
    configs: dict[str, "object"],
    demux_epoch: int = 500_000,
    parallel_tables: bool = True,
) -> dict[str, list[dict]]:
    """Demux + per-table engines under one root: tables land in
    ``root/demux/tables/<tbl>`` and each declared table's lake lives at
    ``root/lakes/<tbl>``. ``configs`` maps table name → EngineConfig.
    Per demux window, every declared table's engine catches up on its
    stream — so all lakes tail the shared binlog together, each with
    its own exactly-once cursor. Undeclared tables still demux (their
    segments wait for a future consumer); declared tables missing from
    the stream simply stay empty.

    ``parallel_tables`` runs the per-window catch-ups in one thread per
    table: each engine spends its time in ``ray.get`` (GIL released),
    the lakes are disjoint roots with their own writer leases, and Ray
    supports task submission from multiple driver threads — so T
    tables' epochs pipeline through the cluster instead of leaving it
    idle between serial catch-ups. Set False to debug one table at a
    time."""
    from silk_ray.cdc.engine import run

    demux_dir = os.path.join(root, "demux")
    metrics: dict[str, list[dict]] = {tbl: [] for tbl in configs}
    # Any txn_atomic consumer forces globally txn-aligned demux cuts —
    # see demux_window: without this, a transaction straddling the cut
    # leaves a table's demuxed stream ending mid-transaction and that
    # table durably commits a torn state.
    txn_snap = any(getattr(cfg, "txn_atomic", False) for cfg in configs.values())

    def catch_up(tbl, cfg):
        td = table_dir(demux_dir, tbl)
        if not os.path.isdir(td):
            return
        metrics[tbl].extend(run(os.path.join(root, "lakes", tbl), td, cfg))

    while True:
        w = demux_window(demux_dir, changelog, demux_epoch, txn_snap=txn_snap)
        if w is None:
            break
        if parallel_tables and len(configs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(configs))) as ex:
                futures = [ex.submit(catch_up, t, c) for t, c in configs.items()]
                for f in futures:
                    f.result()  # surface the first failure loudly
        else:
            for tbl, cfg in configs.items():
                catch_up(tbl, cfg)
    return metrics
