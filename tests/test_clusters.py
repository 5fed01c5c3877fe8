"""Incrementally maintained cluster state (cdc/clusters.py): after every
epoch the maintained table must equal a from-scratch connected-components
pass over the current link store — through link additions AND removals
(component merges and splits)."""

import copy

import pytest

from silk_ray.cdc.clusters import (
    clusters_table,
    commit_clusterstate,
    gc_clusters,
    read_clusterstate,
    update_clusters,
)
from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog
from silk_ray.cdc.incremental import links_table
from silk_ray.pipelines.rules import BENCH_RULE

UNFILTERED_RULE = copy.deepcopy(BENCH_RULE)
UNFILTERED_RULE.pop("filter_limit", None)


def _batch_cc(links) -> dict:
    """Union-find oracle over the link table: uri -> min uri of its
    component."""
    parent = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, t in zip(links["source"].to_pylist(), links["target"].to_pylist()):
        for n in (s, t):
            parent.setdefault(n, n)
        rs, rt = find(s), find(t)
        if rs != rt:
            if rt < rs:
                rs, rt = rt, rs
            parent[rt] = rs
    return {n: find(n) for n in parent}


def _maintained(root) -> dict:
    t = clusters_table(root)
    return dict(zip(t["uri"].to_pylist(), t["cluster_id"].to_pylist()))


@pytest.fixture(scope="module")
def cluster_run(tmp_path_factory, ray_session):
    """Engine driven ONE epoch at a time so the invariant is checked at
    every commit point, not just the end state."""
    base = make_base_table(120, seed=61, near_dup_frac=0.25)
    log = make_changelog(base, 750, seed=62, dup_frac=0.05)
    root = str(tmp_path_factory.mktemp("lake"))
    cfg = EngineConfig(
        epoch_size=250,
        num_partitions=4,
        n_block_partitions=16,
        rule_spec=UNFILTERED_RULE,
        maintain_clusters=True,
        max_epochs=1,
    )
    snapshots = []
    while True:
        ms = run(root, log, cfg)
        if not ms:
            break
        m = ms[0]
        snapshots.append(
            {
                "metrics": m,
                "maintained": _maintained(root),
                "batch": _batch_cc(links_table(root)),
            }
        )
    return root, snapshots


def test_maintained_equals_batch_every_epoch(cluster_run):
    _root, snapshots = cluster_run
    assert len(snapshots) == 3
    for s in snapshots:
        assert s["maintained"] == s["batch"], s["metrics"]["clusters"]


def test_delta_mode_after_first_epoch(cluster_run):
    _root, snapshots = cluster_run
    modes = [s["metrics"]["clusters"]["mode"] for s in snapshots]
    assert modes[0] == "full"
    assert all(m in ("delta", "noop") for m in modes[1:])


def test_links_actually_churned(cluster_run):
    """The scenario must exercise removals (splits/merges), not just
    first-epoch growth — otherwise the invariant is vacuous."""
    _root, snapshots = cluster_run
    assert any(s["metrics"]["links"]["links_removed"] > 0 for s in snapshots[1:])
    assert any(s["metrics"]["clusters"]["affected_clusters"] > 0 for s in snapshots[1:])


def test_replay_is_noop(cluster_run):
    root, snapshots = cluster_run
    last = snapshots[-1]["metrics"]["clusters"]["epoch"]
    before = _maintained(root)
    out = update_clusters(root, last)
    assert out["mode"] == "replay_noop"
    assert _maintained(root) == before


def test_crash_window_recovery_delta(cluster_run):
    """Crash between link commit and cluster commit: rewind the cluster
    pointer one epoch (the retained rollback window) and re-apply — the
    delta path must reconverge to the batch answer."""
    root, snapshots = cluster_run
    state = read_clusterstate(root)
    last = state["epoch"]
    assert state["dir_prev"]
    commit_clusterstate(
        root, {"epoch": last - 1, "dir": state["dir_prev"], "dir_prev": None}
    )
    out = update_clusters(root, last)
    assert out["mode"] in ("delta", "noop")
    assert _maintained(root) == snapshots[-1]["batch"]
    commit_clusterstate(root, state)  # restore for later tests


def test_lag_beyond_window_full_rebuild(cluster_run):
    root, snapshots = cluster_run
    state = read_clusterstate(root)
    last = state["epoch"]
    commit_clusterstate(root, {"epoch": last - 2, "dir": None, "dir_prev": None})
    out = update_clusters(root, last)
    assert out["mode"] == "full"
    assert _maintained(root) == snapshots[-1]["batch"]
    commit_clusterstate(root, state)


def test_gc_keeps_rollback_window(cluster_run):
    import os

    root, _snapshots = cluster_run
    gc_clusters(root)
    state = read_clusterstate(root)
    live = {state.get("dir"), state.get("dir_prev")} - {None}
    on_disk = {
        os.path.join("clusters", d) for d in os.listdir(os.path.join(root, "clusters"))
    }
    assert on_disk == live
