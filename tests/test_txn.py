"""Binlog transaction atomicity (EngineConfig.txn_atomic): epoch
windows snap to ``txn``-column boundaries (merge.snap_txn_boundary) so
no committed state ever exposes half a transaction; a transaction
larger than the window applies atomically in one grown epoch."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from silk_ray.cdc import checkpoint as ckpt
from silk_ray.cdc.generator import (
    assign_txns,
    make_base_table,
    make_changelog,
    sequential_apply,
)
from silk_ray.cdc.merge import (
    run_epoch,
    run_to_completion,
    snap_txn_boundary,
    state_sha256,
    state_table,
)

EPOCH = 120
BIG = (300, 3 * EPOCH // 2)  # one txn 1.5x the window: the grow path


@pytest.fixture(scope="module")
def tagged():
    base = make_base_table(60, seed=31)
    log = make_changelog(base, 900, seed=32, dup_frac=0.03)
    return assign_txns(log, seed=33, mean_size=5, untagged_frac=0.15, big_txn=BIG)


def _txn_spans(tagged: pa.Table) -> dict[int, tuple[int, int]]:
    t = tagged.filter(pc.is_valid(tagged["txn"]))
    spans: dict[int, tuple[int, int]] = {}
    for tx, off in zip(t["txn"].to_pylist(), t["offset"].to_pylist()):
        lo, hi = spans.get(tx, (off, off))
        spans[tx] = (min(lo, off), max(hi, off))
    return spans


def _strip(rows, keys=("repo", "path", "commit", "lang", "content", "branch")):
    return [{k: r.get(k) for k in keys} for r in rows]


def test_no_commit_splits_a_transaction(ray_session, tagged, tmp_path):
    root = str(tmp_path / "lake")
    spans = _txn_spans(tagged)
    windows = []
    while True:
        m = run_epoch(root, tagged, epoch_size=EPOCH, num_partitions=6, txn_atomic=True)
        if m is None:
            break
        windows.append(tuple(m["window"]))
        boundary = ckpt.read_manifest(root).next_offset
        for tx, (lo, hi) in spans.items():
            assert not (lo < boundary <= hi), (
                f"commit at {boundary} splits txn {tx} spanning [{lo},{hi}]"
            )
    # the grow path actually ran: some window is wider than EPOCH
    assert any(hi - lo > EPOCH for lo, hi in windows)
    # and some window was snapped shorter (a txn deferred to the next epoch)
    assert any(hi - lo < EPOCH for lo, hi in windows)
    # the stream was fully consumed and the final state is still the oracle's
    state = sequential_apply(tagged)
    expected = [state[k] for k in sorted(state)]
    got = state_table(root).to_pylist()
    assert _strip(got) == _strip(expected)


def test_txn_never_becomes_a_payload_column(ray_session, tagged, tmp_path):
    root = str(tmp_path / "lake")
    run_to_completion(root, tagged, epoch_size=EPOCH, num_partitions=6, txn_atomic=True)
    assert "txn" not in state_table(root).column_names


def test_final_state_matches_non_atomic_and_cross_shape_replay(
    ray_session, tagged, tmp_path
):
    r1, r2, r3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    run_to_completion(r1, tagged, epoch_size=EPOCH, num_partitions=6, txn_atomic=True)
    run_to_completion(r2, tagged, epoch_size=77, num_partitions=6, txn_atomic=True)
    run_to_completion(r3, tagged, epoch_size=200, num_partitions=6)  # plain
    assert state_sha256(r1) == state_sha256(r2) == state_sha256(r3)


def test_parquet_changelog_and_resume(ray_session, tagged, tmp_path):
    """snap works on on-disk multi-file changelogs, and a crash-resume
    mid-stream lands on the same state as the table-backed run."""
    d = tmp_path / "binlog"
    os.makedirs(d)
    srt = tagged.sort_by([("offset", "ascending")])
    third = srt.num_rows // 3
    pq.write_table(srt.slice(0, third), str(d / "seg-0.parquet"))
    pq.write_table(srt.slice(third, third), str(d / "seg-1.parquet"))
    pq.write_table(srt.slice(2 * third), str(d / "seg-2.parquet"))

    r_tab, r_pq = str(tmp_path / "tab"), str(tmp_path / "pq")
    run_to_completion(r_tab, tagged, epoch_size=EPOCH, num_partitions=6, txn_atomic=True)
    run_epoch(r_pq, str(d), epoch_size=EPOCH, num_partitions=6, txn_atomic=True)
    run_epoch(r_pq, str(d), epoch_size=EPOCH, num_partitions=6, txn_atomic=True)
    # crash here; resume
    run_to_completion(r_pq, str(d), epoch_size=EPOCH, num_partitions=6, txn_atomic=True)
    assert state_sha256(r_pq) == state_sha256(r_tab)


def test_multi_key_transaction_is_all_or_nothing(ray_session, tmp_path):
    """The semantic heart: a 2-key transaction straddling the window
    boundary is visible either fully or not at all at every commit."""
    def ev(off, op, repo, path, content, txn):
        return (off, op, repo, path, f"c{off}", "py", content, txn)

    rows = [
        ev(0, "I", "r1", "a.py", "one", None),
        ev(1, "I", "r1", "b.py", "two", None),
        ev(2, "U", "r1", "a.py", "moved-out", 9),   # txn 9: A -> B transfer
        ev(3, "U", "r1", "b.py", "moved-in", 9),
        ev(4, "U", "r1", "a.py", "final", None),
    ]
    cols = list(zip(*rows))
    log = pa.table(
        {
            "offset": pa.array(cols[0], pa.int64()),
            "op": pa.array(cols[1], pa.string()),
            "repo": pa.array(cols[2], pa.string()),
            "path": pa.array(cols[3], pa.string()),
            "commit": pa.array(cols[4], pa.string()),
            "lang": pa.array(cols[5], pa.string()),
            "content": pa.array(cols[6], pa.string()),
            "txn": pa.array(cols[7], pa.int64()),
        }
    )
    root = str(tmp_path / "lake")
    # window of 3 would end at offset 3, splitting txn 9 -> must snap to 2
    m1 = run_epoch(root, log, epoch_size=3, num_partitions=2, txn_atomic=True)
    assert m1["window"][1] == 2
    s1 = {r["path"]: r["content"] for r in state_table(root).to_pylist()}
    assert s1 == {"a.py": "one", "b.py": "two"}  # txn 9 invisible
    m2 = run_epoch(root, log, epoch_size=3, num_partitions=2, txn_atomic=True)
    s2 = {r["path"]: r["content"] for r in state_table(root).to_pylist()}
    assert s2["b.py"] == "moved-in"  # txn 9 fully applied


def test_snap_is_noop_without_txn_column_or_on_singletons(ray_session):
    base = make_base_table(20, seed=5)
    log = make_changelog(base, 100, seed=6, dup_frac=0.0)
    assert snap_txn_boundary(log, 0, 40) == 40
    nulls = log.append_column("txn", pa.nulls(log.num_rows, pa.int64()))
    assert snap_txn_boundary(nulls, 0, 40) == 40
    # boundary exactly between two transactions stands
    two = log.append_column(
        "txn", pa.array([1] * 40 + [2] * 60, pa.int64())
    )
    assert snap_txn_boundary(two, 0, 40) == 40
    # boundary one inside txn 2 snaps back to its first offset
    assert snap_txn_boundary(two, 0, 41) == 40
    # txn 1 swallows a window starting at 0: grow to its end
    assert snap_txn_boundary(two, 0, 10) == 40


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(1, 9), min_size=1, max_size=30),
        nulls=st.lists(st.booleans(), min_size=30, max_size=30),
        lo_rank=st.integers(0, 28),
        win=st.integers(1, 40),
    )
    def test_snap_property(sizes, nulls, lo_rank, win):
        """For any contiguous txn layout and any window: the snapped end
        never splits a transaction, is > lo, and equals hi whenever hi
        already sits on a boundary (no gratuitous movement)."""
        import pyarrow as pa

        from silk_ray.cdc.merge import snap_txn_boundary

        txn, boundaries = [], {0}
        for g, s in enumerate(sizes):
            txn.extend([None if nulls[g % len(nulls)] else g] * s)
            boundaries.add(len(txn))
        n = len(txn)
        # null txns are singletons: every position around them is a boundary
        for i, t in enumerate(txn):
            if t is None:
                boundaries.add(i)
                boundaries.add(i + 1)
        log = pa.table(
            {
                "offset": pa.array(range(n), pa.int64()),
                "op": pa.array(["I"] * n),
                "repo": pa.array(["r"] * n),
                "path": pa.array([f"p{i}" for i in range(n)]),
                "txn": pa.array(txn, pa.int64()),
            }
        )
        # lo must itself be a boundary (the engine guarantees this
        # inductively); pick the nearest boundary <= lo_rank
        lo = max(b for b in boundaries if b <= min(lo_rank, n - 1))
        hi = lo + win
        end = snap_txn_boundary(log, lo, hi)
        assert end > lo
        assert end in boundaries or end >= n
        if min(hi, n) in boundaries or hi >= n:
            assert end == hi
except ImportError:  # pragma: no cover
    pass


def test_engine_config_plumbs_txn_atomic(ray_session, tagged, tmp_path):
    from silk_ray.cdc.engine import EngineConfig, run

    root = str(tmp_path / "lake")
    run(root, tagged, EngineConfig(epoch_size=EPOCH, num_partitions=6, txn_atomic=True))
    spans = _txn_spans(tagged)
    boundary = ckpt.read_manifest(root).next_offset
    for tx, (lo, hi) in spans.items():
        assert not (lo < boundary <= hi)
    ref = str(tmp_path / "ref")
    run_to_completion(ref, tagged, epoch_size=EPOCH, num_partitions=6)
    assert state_sha256(root) == state_sha256(ref)
