"""Incrementally maintained duplicate-cluster state over the CDC link
store.

The engine maintains a materialized *link* set per epoch
(cdc/incremental.py); this module maintains the materialized *cluster*
table over it — connected components of the link graph, the entity-
resolution grouping the reference stops short of (Silk emits links;
grouping them is the canonical downstream step). Per epoch, only the
components actually touched by the delta are rebuilt:

- every link REMOVED this epoch had a dirty endpoint (incremental.py
  drops exactly the stored links touching a dirty uri), so any
  component that can split contains a dirty uri;
- every link ADDED this epoch also has a dirty endpoint (`dirty_col`
  scoring), so any pair of components that can merge both contain a
  seed endpoint.

Hence the affected set A = old clusters of (dirty uris ∪ endpoints of
this epoch's new links) is exact: components outside A are bitwise
unchanged. The rebuild re-runs connected components only on links with
an endpoint in an A-component (or brand-new uris), then splices:
``new = old[cluster ∉ A] ∪ CC(subgraph)``. Members of A-components
whose links all vanished drop out (singletons are implicit, as in
:func:`silk_ray.functions.graph.connected_components`).

Scale shape: seeds and A are delta-sized (driver-held, like
``update_links``'s own dirty set); the affected-member table and the
link scan stay distributed — membership filtering broadcasts below the
standard gate and falls back to disjoint hash-shuffle semi-joins above
it; the component rebuild itself self-gates between driver union-find
and the pointer-jumped distributed rounds. Cluster state is written as
a per-epoch parquet directory with an atomic STATE.json pointer swap
(same commit idiom as the linkstate), replay-idempotent, with a
one-epoch rollback window like every other store in the engine.

Catch-up window: rebuilding epoch N needs N's summary files (the dirty
uris), which storage GC retains only for the newest epoch — the same
one-epoch window as the rest of the engine. A lag beyond it triggers a
loud FULL rebuild (batch CC over the whole current link set), which is
always correct, and the metrics say it happened.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from silk_ray.cdc import checkpoint as ckpt
from silk_ray.cdc.incremental import _links_manifest, read_linkstate

BROADCAST_MAX = 4_000_000


def _state_path(root: str) -> str:
    return os.path.join(root, "_clusterstate.json")


def read_clusterstate(root: str) -> dict:
    p = _state_path(root)
    if not os.path.exists(p):
        return {"epoch": 0, "dir": None, "dir_prev": None}
    with open(p) as f:
        return json.load(f)


def commit_clusterstate(root: str, state: dict) -> None:
    tmp = _state_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _state_path(root))
    # per-epoch snapshot for as-of-epoch reads (same idiom as the lake
    # manifests and linkstates); gc_clusters trims with the dirs
    snap_dir = os.path.join(root, "_clusterstates")
    os.makedirs(snap_dir, exist_ok=True)
    snap = os.path.join(snap_dir, f"state-{int(state.get('epoch', 0)):06d}.json")
    with open(snap + ".tmp", "w") as f:
        json.dump(state, f, sort_keys=True)
    os.replace(snap + ".tmp", snap)


def read_clusterstate_at(root: str, epoch: int) -> dict:
    """The cluster state as committed at ``epoch`` (time-travel read);
    loud error outside the retention window."""
    p = os.path.join(root, "_clusterstates", f"state-{epoch:06d}.json")
    if not os.path.exists(p):
        current = read_clusterstate(root)["epoch"]
        raise FileNotFoundError(
            f"no cluster-state snapshot for epoch {epoch} under {root!r} "
            f"(current cluster epoch {current}): the epoch never committed "
            "or its snapshot was GC'd outside the retention window "
            "(EngineConfig.retain_epochs)"
        )
    with open(p) as f:
        return json.load(f)


def _epoch_summary_files(root: str, epoch: int) -> list[str]:
    base = os.path.join(root, "summaries")
    out = []
    if os.path.isdir(base):
        for pdir in sorted(os.listdir(base)):
            f = os.path.join(base, pdir, f"epoch-{epoch:06d}.parquet")
            if os.path.exists(f):
                out.append(f)
    return out


def _empty_clusters() -> pa.Table:
    return pa.table(
        {"uri": pa.array([], pa.string()), "cluster_id": pa.array([], pa.string())}
    )


def clusters_table(root: str, at_epoch: int | None = None) -> pa.Table:
    """Driver-side snapshot of the cluster state (test/small-lake
    helper, like ``links_table``; the streaming path is
    ``read_parquet`` over the state dir). ``at_epoch`` time-travels to
    a retained earlier commit."""
    state = (
        read_clusterstate(root) if at_epoch is None else read_clusterstate_at(root, at_epoch)
    )
    if not state.get("dir"):
        return _empty_clusters()
    d = os.path.join(root, state["dir"])
    parts = [
        pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    return pa.concat_tables(parts) if parts else _empty_clusters()


def _subgraph(links, member_uris, n_members: int):
    """Links with either endpoint in the membership set — broadcast
    filter below the gate, disjoint shuffle semi-joins above (the two
    passes partition the output: source-hits, then target-hits among
    source-misses — no dedup needed)."""
    import numpy as np
    import pyarrow.compute as pc

    from silk_ray.pipelines.relational import (
        lookup_sorted,
        shuffle_anti_filter,
        shuffle_semi_filter,
    )

    if n_members <= BROADCAST_MAX:
        import ray

        ref = ray.put(np.asarray(sorted(member_uris.to_pandas()["uri"])))

        def either(b: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            if len(keys) == 0:
                return b.slice(0, 0)
            s_hit, _ = lookup_sorted(keys, keys, b["source"].to_numpy(zero_copy_only=False))
            t_hit, _ = lookup_sorted(keys, keys, b["target"].to_numpy(zero_copy_only=False))
            return b.filter(pa.array(s_hit | t_hit))

        return links.map_batches(either, batch_format="pyarrow")
    src_hit = shuffle_semi_filter(links, "source", member_uris, "uri")
    src_miss = shuffle_anti_filter(links, "source", member_uris, "uri")
    tgt_hit = shuffle_semi_filter(src_miss, "target", member_uris, "uri")
    return src_hit.union(tgt_hit)


def update_clusters(
    root: str,
    epoch: int,
    *,
    num_partitions: int = 64,
    local_max_edges: int = 1_000_000,
) -> dict:
    """Bring the cluster state up to merge/link epoch ``epoch``.

    Idempotent: a replayed epoch returns without touching state. A lag
    beyond the one-epoch summary-retention window triggers a full
    rebuild (see module docstring)."""
    import ray.data as rd

    from silk_ray.functions.graph import connected_components
    from silk_ray.pipelines.relational import broadcast_anti_filter, broadcast_semi_filter

    state = read_clusterstate(root)
    if state["epoch"] >= epoch:
        return {"epoch": epoch, "mode": "replay_noop", "rows": _state_rows(root, state)}
    linkstate = read_linkstate(root)
    manifest = _links_manifest(linkstate, root)
    link_files = [os.path.join(root, e["file"]) for e in manifest]
    links = (
        rd.read_parquet(link_files, columns=["source", "target", "epoch_added"])
        if link_files
        else None
    )

    full_rebuild = state["epoch"] < epoch - 1  # summaries for the gap are GC'd
    seeds: set = set()
    affected: set = set()
    if not full_rebuild:
        for f in _epoch_summary_files(root, epoch):
            t = pq.read_table(f, columns=["uri"])
            seeds.update(t["uri"].to_pylist())
        if links is not None:
            new_entries = [e for e in manifest if e.get("n_new") is None or e.get("n_new")]
            for e in new_entries:
                t = pq.read_table(
                    os.path.join(root, e["file"]),
                    columns=["source", "target"],
                    filters=[("epoch_added", "==", epoch)],
                )
                seeds.update(t["source"].to_pylist())
                seeds.update(t["target"].to_pylist())

    old_dir = state.get("dir")
    mode = "full" if full_rebuild else "delta"
    if full_rebuild or old_dir is None:
        mode = "full"
        if links is None:
            return _commit(root, state, epoch, None, mode, 0, 0)
        cc = connected_components(
            links, "source", "target", node_col="uri", label_col="cluster_id",
            num_partitions=num_partitions, local_max_edges=local_max_edges,
        )
        return _write_and_commit(root, state, epoch, cc, mode, affected=-1, seeds=-1)

    if not seeds:
        # clean epoch: nothing linked or unlinked — pointer moves, data
        # doesn't (the state dir is carried forward verbatim)
        return _commit(root, state, epoch, old_dir, "noop", 0, 0)

    old_ds = rd.read_parquet(os.path.join(root, old_dir))
    seed_list = sorted(seeds)
    matched = broadcast_semi_filter(old_ds, "uri", seed_list).to_pandas()
    # an all-miss filter comes back as a column-less empty frame
    affected = set(matched["cluster_id"]) if len(matched) else set()

    # membership set for the link scan = affected-component members ∪
    # seeds (covers brand-new uris with no old cluster); kept as a
    # Dataset — a single affected component can be corpus-sized
    seeds_ds = rd.from_arrow(
        pa.table(
            {
                "uri": pa.array(seed_list, pa.string()),
                "cluster_id": pa.array(seed_list, pa.string()),
            }
        )
    )
    member_uris = seeds_ds
    if affected:
        member_uris = member_uris.union(
            broadcast_semi_filter(old_ds, "cluster_id", sorted(affected))
        )
    member_uris = member_uris.materialize()
    n_members = member_uris.count()

    sub = _subgraph(links, member_uris, n_members) if links is not None else None
    cc = (
        connected_components(
            sub, "source", "target", node_col="uri", label_col="cluster_id",
            num_partitions=num_partitions, local_max_edges=local_max_edges,
        )
        if sub is not None
        else None
    )
    kept = broadcast_anti_filter(old_ds, "cluster_id", sorted(affected)) if affected else old_ds
    new_ds = kept.union(cc) if cc is not None else kept
    return _write_and_commit(
        root, state, epoch, new_ds, mode, affected=len(affected), seeds=len(seeds)
    )


def _state_rows(root: str, state: dict) -> int:
    if not state.get("dir"):
        return 0
    d = os.path.join(root, state["dir"])
    return sum(
        pq.read_metadata(os.path.join(d, f)).num_rows
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def _write_and_commit(root, state, epoch, ds, mode, affected, seeds) -> dict:
    rel = os.path.join("clusters", f"epoch-{epoch:06d}")
    out_dir = os.path.join(root, rel)
    if os.path.isdir(out_dir):  # crashed attempt: the pointer is the commit
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # distributed write — the cluster table is O(linked corpus); only the
    # pointer swap below is driver-side
    ds = ds.map_batches(
        lambda b: pa.table({"uri": b["uri"], "cluster_id": b["cluster_id"]}),
        batch_format="pyarrow",
    )
    ds.write_parquet(out_dir)
    if not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        ckpt.atomic_write_parquet(_empty_clusters(), os.path.join(out_dir, "part-000.parquet"))
    rows = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    return _commit(root, state, epoch, rel, mode, affected, seeds, rows=rows)


def _commit(root, state, epoch, rel_dir, mode, affected, seeds, rows=None) -> dict:
    prev = state.get("dir")
    new_state = {
        "epoch": epoch,
        "dir": rel_dir,
        "dir_prev": prev if prev != rel_dir else state.get("dir_prev"),
    }
    commit_clusterstate(root, new_state)
    if rows is None:
        rows = _state_rows(root, new_state)
    return {
        "epoch": epoch,
        "mode": mode,
        "rows": rows,
        "affected_clusters": affected,
        "seed_uris": seeds,
    }


def gc_clusters(root: str, retain_epochs: int = 1) -> int:
    """Delete cluster epoch dirs outside the pointer + retention window
    (``dir`` / ``dir_prev`` always survive; ``retain_epochs`` past
    snapshots stay readable via ``clusters_table(at_epoch=)``)."""
    state = read_clusterstate(root)
    live = {state.get("dir"), state.get("dir_prev")} - {None}
    epoch = int(state.get("epoch", 0))
    floor = epoch - max(1, retain_epochs) - 1
    for e in range(max(1, floor + 1), epoch):
        try:
            live.add(read_clusterstate_at(root, e).get("dir"))
        except FileNotFoundError:
            continue
    live -= {None}
    n = 0
    snap_dir = os.path.join(root, "_clusterstates")
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
    base = os.path.join(root, "clusters")
    if not os.path.isdir(base):
        return 0
    for d in os.listdir(base):
        rel = os.path.join("clusters", d)
        if rel not in live:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            n += 1
    return n
