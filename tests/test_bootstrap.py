"""Snapshot bootstrap (cdc/bootstrap.py).

Core invariant: bootstrap(snapshot as of S) + tail(events > S) ends in
the SAME engine state — lake sha256, link store, maintained aggregate
view — as tailing the whole stream from offset 0.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from silk_ray.cdc.bootstrap import bootstrap_lake
from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog, sequential_apply
from silk_ray.cdc.matview import AggViewSpec, agg_table
from silk_ray.cdc.merge import state_sha256, state_table
from silk_ray.pipelines.rules import CDC_CLUSTER_RULE

SPEC = AggViewSpec(
    group_by=("lang",),
    measures={"sum_chars": ("sum_strlen", "content")},
    count_col="n_docs",
    num_shards=8,
)


def _stream(n_rows=80, n_events=700, seed=23):
    base = make_base_table(n_rows, seed=seed)
    return make_changelog(base, n_events, seed=seed + 1, dup_frac=0.04)


def _snapshot_at(log: pa.Table, s: int) -> pa.Table:
    """Consistent snapshot of the stream as of offset ``s`` (inclusive),
    via the sequential oracle."""
    prefix = log.filter(pc.less_equal(log["offset"], s))
    state = sequential_apply(prefix)
    rows = [state[k] for k in sorted(state)]
    return pa.table(
        {
            c: pa.array([r[c] for r in rows], pa.string())
            for c in ("repo", "path", "commit", "lang", "content", "branch")
        }
    )


def _cfg(**kw):
    return EngineConfig(
        epoch_size=150,
        num_partitions=4,
        n_block_partitions=8,
        rule_spec=CDC_CLUSTER_RULE,
        maintain_clusters=True,
        agg_spec=SPEC,
        **kw,
    )


def _links_fingerprint(root):
    from silk_ray.cdc.incremental import links_table

    t = links_table(root)
    return sorted(zip(t["source"].to_pylist(), t["target"].to_pylist()))


def _clusters_fingerprint(root):
    from silk_ray.cdc.clusters import clusters_table

    t = clusters_table(root)
    return sorted(zip(t["uri"].to_pylist(), t["cluster_id"].to_pylist()))


def test_bootstrap_plus_tail_equals_full_tail(tmp_path, ray_session):
    log = _stream()
    s = 399  # mid-stream snapshot point

    full = str(tmp_path / "full")
    run(full, log, _cfg())

    boot = str(tmp_path / "boot")
    snap = _snapshot_at(log, s)
    m = bootstrap_lake(
        boot, snap, as_of_offset=s,
        num_partitions=4, link_spec=CDC_CLUSTER_RULE, n_block_partitions=8,
    )
    assert m["bootstrap"] and m["epoch"] == 1
    assert m["events_applied"] == snap.num_rows
    # tail the SAME full changelog: offsets ≤ s must never be re-read
    run(boot, log, _cfg())

    assert state_sha256(boot) == state_sha256(full)
    assert _links_fingerprint(boot) == _links_fingerprint(full)
    assert _clusters_fingerprint(boot) == _clusters_fingerprint(full)
    a, b = agg_table(boot), agg_table(full)
    assert a.select(sorted(a.column_names)).equals(b.select(sorted(b.column_names)))


def test_bootstrap_from_parquet_dir(tmp_path, ray_session):
    """Directory snapshots stream file-by-file through Ray tasks; the
    synthetic segments are cleaned up after the manifest commit."""
    import pyarrow.parquet as pq

    log = _stream(n_events=500)
    s = 299
    snap = _snapshot_at(log, s)
    snap_dir = str(tmp_path / "snap")
    os.makedirs(snap_dir)
    third = max(1, snap.num_rows // 3)
    for i in range(3):
        part = snap.slice(i * third, third if i < 2 else snap.num_rows - 2 * third)
        pq.write_table(part, os.path.join(snap_dir, f"part-{i:03d}.parquet"))

    boot = str(tmp_path / "boot")
    m = bootstrap_lake(boot, snap_dir, as_of_offset=s, num_partitions=4)
    assert m["events_applied"] == snap.num_rows
    assert not os.path.exists(os.path.join(boot, "_bootstrap_changelog"))
    run(boot, log, EngineConfig(epoch_size=150, num_partitions=4))

    full = str(tmp_path / "full")
    run(full, log, EngineConfig(epoch_size=150, num_partitions=4))
    assert state_sha256(boot) == state_sha256(full)


def test_bootstrap_guards(tmp_path, ray_session):
    log = _stream(n_events=300)
    snap = _snapshot_at(log, 199)
    boot = str(tmp_path / "boot")
    # offsets must fit below the snapshot offset
    with pytest.raises(ValueError, match="as_of_offset"):
        bootstrap_lake(boot, snap, as_of_offset=snap.num_rows - 2, num_partitions=4)
    bootstrap_lake(boot, snap, as_of_offset=199, num_partitions=4)
    # one-time initialization only
    with pytest.raises(ValueError, match="already has committed epoch"):
        bootstrap_lake(boot, snap, as_of_offset=199, num_partitions=4)
    # reserved column names rejected
    bad = snap.append_column("op", pa.array(["x"] * snap.num_rows))
    with pytest.raises(ValueError, match="reserved changelog column"):
        bootstrap_lake(str(tmp_path / "b2"), bad, as_of_offset=10**6, num_partitions=4)


def test_duplicate_keys_last_wins_and_dlq(tmp_path, ray_session):
    """Duplicate snapshot keys: last row in snapshot order wins (stream
    semantics). Structurally-invalid snapshot rows (null key) land in
    the dead-letter queue, the rest apply."""
    snap = pa.table(
        {
            "repo": pa.array(["r", "r", "r", None]),
            "path": pa.array(["a", "a", "b", "c"]),
            "commit": pa.array(["c1", "c2", "c3", "c4"]),
            "lang": pa.array(["py"] * 4),
            "content": pa.array(["one", "two", "three", "four"]),
        }
    )
    boot = str(tmp_path / "boot")
    m = bootstrap_lake(boot, snap, as_of_offset=100, num_partitions=2)
    assert m["dead_lettered"] == 1
    t = state_table(boot)
    assert t.num_rows == 2
    row_a = t.filter(pc.equal(t["path"], "a"))
    assert row_a["commit"].to_pylist() == ["c2"]  # last duplicate wins
    from silk_ray.cdc.merge import dead_letters_table

    dl = dead_letters_table(boot)
    assert dl.num_rows == 1
