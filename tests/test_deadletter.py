"""Dead-letter quarantine for malformed changelog events.

A 10^10-event binlog WILL carry garbage (producer bugs, unknown op
codes, null keys). Pre-DLQ the engine either crashed the epoch (null
key -> undefined partition hash) or silently upserted an unknown op.
Now structurally-invalid events are diverted to
``deadletter/epoch-NNNNNN.parquet`` with a ``reason``, the lake applies
exactly the valid subset, window offsets still advance past trailing
garbage (no re-read loop), and replay rewrites identical quarantine
files (exactly-once still holds).
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog, sequential_apply
from silk_ray.cdc.merge import (
    dead_letters_table,
    run_to_completion,
    state_sha256,
    state_table,
)

KEYS = ("repo", "path", "commit", "lang", "content", "branch")


def _corrupt(log: pa.Table, every: int = 17) -> tuple[pa.Table, dict[int, str]]:
    """Inject one of four malformations at every ``every``-th row.
    Returns (corrupted log, offset -> expected reason)."""
    rows = log.to_pylist()
    expected: dict[int, str] = {}
    for i in range(0, len(rows), every):
        r = rows[i]
        kind = (i // every) % 4
        if kind == 0:
            r["op"] = "X"
            expected[r["offset"]] = "unknown_op"
        elif kind == 1:
            r["op"] = None
            expected[r["offset"]] = "unknown_op"
        elif kind == 2:
            r["repo"] = ""
            expected[r["offset"]] = "null_key"
        else:
            r["path"] = None
            expected[r["offset"]] = "null_key"
    return pa.Table.from_pylist(rows, schema=log.schema), expected


def _valid_subset(log: pa.Table, bad_offsets) -> pa.Table:
    mask = pc.invert(pc.is_in(log["offset"], value_set=pa.array(sorted(bad_offsets))))
    return log.filter(mask)


def _oracle_rows(changelog):
    state = sequential_apply(changelog)
    return [{k: state[key].get(k) for k in KEYS} for key in sorted(state.keys())]


def _engine_rows(root):
    return [{k: r.get(k) for k in KEYS} for r in state_table(root).to_pylist()]


def test_dead_letters_quarantined_valid_subset_applied(ray_session, tmp_path):
    base = make_base_table(60, seed=71)
    log, expected = _corrupt(make_changelog(base, 400, seed=72, dup_frac=0.05))
    root = str(tmp_path / "lake")
    metrics = run_to_completion(root, log, epoch_size=150, num_partitions=4)

    dlq = dead_letters_table(root)
    got = {r["offset"]: r["reason"] for r in dlq.to_pylist()}
    assert got == expected
    assert sum(m["dead_lettered"] for m in metrics) == len(expected)
    reason_totals: dict[str, int] = {}
    for m in metrics:
        for k, v in m["dead_reasons"].items():
            reason_totals[k] = reason_totals.get(k, 0) + v
    assert reason_totals == {
        "unknown_op": sum(1 for v in expected.values() if v == "unknown_op"),
        "null_key": sum(1 for v in expected.values() if v == "null_key"),
    }
    # the lake state is exactly the sequential oracle over the valid subset
    assert _engine_rows(root) == _oracle_rows(_valid_subset(log, expected))


def test_trailing_garbage_does_not_pin_the_window(ray_session, tmp_path):
    base = make_base_table(30, seed=73)
    log = make_changelog(base, 120, seed=74, dup_frac=0.0)
    rows = log.to_pylist()
    rows[-1]["op"] = "Z"  # highest offset in the stream is malformed
    log = pa.Table.from_pylist(rows, schema=log.schema)
    root = str(tmp_path / "lake")
    metrics = run_to_completion(root, log, epoch_size=50, num_partitions=2)
    assert metrics[-1]["dead_lettered"] == 1
    # the offset advanced past the garbage: a re-tail finds nothing new
    assert run_to_completion(root, log, epoch_size=50, num_partitions=2) == []


def test_all_malformed_window_advances_with_empty_state(ray_session, tmp_path):
    base = make_base_table(20, seed=75)
    log = make_changelog(base, 60, seed=76, dup_frac=0.0)
    rows = log.to_pylist()
    for r in rows:
        r["op"] = "?"
    log = pa.Table.from_pylist(rows, schema=log.schema)
    root = str(tmp_path / "lake")
    metrics = run_to_completion(root, log, epoch_size=25, num_partitions=2)
    # every received row is quarantined (a redelivered duplicate would
    # be quarantined twice — the DLQ audits what arrived, not a dedup)
    assert sum(m["dead_lettered"] for m in metrics) == log.num_rows
    assert all(m["events_applied"] == 0 for m in metrics)
    assert state_table(root).num_rows == 0
    assert run_to_completion(root, log, epoch_size=25, num_partitions=2) == []


def test_replay_rewrites_identical_quarantine_and_state(ray_session, tmp_path):
    base = make_base_table(40, seed=77)
    log, expected = _corrupt(make_changelog(base, 300, seed=78, dup_frac=0.08), every=23)

    shas, dlqs = [], []
    for run_dir, epoch_size in (("a", 120), ("b", 80)):  # different epoching
        root = str(tmp_path / run_dir)
        run(root, log, EngineConfig(epoch_size=epoch_size, num_partitions=3))
        shas.append(state_sha256(root))
        dlqs.append(
            sorted(
                (r["offset"], r["reason"], r.get("repo"), r.get("path"))
                for r in dead_letters_table(root).to_pylist()
            )
        )
    assert shas[0] == shas[1]
    assert dlqs[0] == dlqs[1]
    assert {o: r for o, r, _, _ in dlqs[0]} == expected


def test_engine_with_linking_survives_garbage(ray_session, tmp_path):
    """Malformed events must not disturb downstream link maintenance."""
    import copy

    from silk_ray.pipelines.rules import BENCH_RULE

    rule = copy.deepcopy(BENCH_RULE)
    rule.pop("filter_limit", None)
    base = make_base_table(50, seed=79, near_dup_frac=0.3)
    log, expected = _corrupt(make_changelog(base, 200, seed=80), every=19)
    root = str(tmp_path / "lake")
    metrics = run(
        root,
        log,
        EngineConfig(epoch_size=100, num_partitions=3, n_block_partitions=8, rule_spec=rule),
    )
    assert sum(m["dead_lettered"] for m in metrics) == len(expected)
    assert {r["offset"] for r in dead_letters_table(root).to_pylist()} == set(expected)
    # state equals the valid-subset oracle even with linking enabled
    assert _engine_rows(root) == _oracle_rows(_valid_subset(log, expected))


# ---------------------------------------------------------------------------
# typed ingest enforcement (payload_schema -> ValueType validation)
# ---------------------------------------------------------------------------


def _with_size_column(log: pa.Table, every: int = 13) -> tuple[pa.Table, dict[int, str]]:
    """Append a lexically-integer ``size`` payload column; every
    ``every``-th row gets a non-integer value (producer bug), every
    ``every*2``-th of those a null (which must PASS — absent values are
    never validated)."""
    rows = log.to_pylist()
    expected: dict[int, str] = {}
    for i, r in enumerate(rows):
        r["size"] = str(100 + i)
        if i % every == 0:
            if (i // every) % 2 == 0:
                r["size"] = f"{i}.5px"
                expected[r["offset"]] = "invalid_type:size"
            else:
                r["size"] = None  # null passes
    schema = log.schema.append(pa.field("size", pa.string()))
    return pa.Table.from_pylist(rows, schema=schema), expected


SIZE_SCHEMA = {"size": "IntegerValueType"}


def test_payload_schema_quarantines_invalid_typed_rows(ray_session, tmp_path):
    base = make_base_table(50, seed=91)
    log, expected = _with_size_column(make_changelog(base, 300, seed=92, dup_frac=0.05))
    root = str(tmp_path / "lake")
    metrics = run_to_completion(
        root, log, epoch_size=120, num_partitions=4, payload_schema=SIZE_SCHEMA
    )
    dlq = dead_letters_table(root)
    assert {r["offset"]: r["reason"] for r in dlq.to_pylist()} == expected
    assert sum(m["dead_lettered"] for m in metrics) == len(expected)
    # lake state == sequential oracle over the valid subset (incl. size
    # col; sequential_apply hardcodes base columns, so track full rows)
    keys = KEYS + ("size",)
    state: dict = {}
    seen: set = set()
    for r in _valid_subset(log, expected).sort_by("offset").to_pylist():
        if r["offset"] in seen:
            continue
        seen.add(r["offset"])
        k = (r["repo"], r["path"])
        if r["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = r
    oracle = [{k: state[key].get(k) for k in keys} for key in sorted(state.keys())]
    got = [{k: r.get(k) for k in keys} for r in state_table(root).to_pylist()]
    assert got == oracle


def test_structural_reasons_take_precedence_over_type(ray_session, tmp_path):
    base = make_base_table(20, seed=93)
    log, _ = _with_size_column(make_changelog(base, 60, seed=94), every=7)
    rows = log.to_pylist()
    # one row is BOTH structurally broken and type-invalid
    rows[0]["op"] = "Z"
    rows[0]["size"] = "oops"
    rows[1]["repo"] = ""
    rows[1]["size"] = "bad too"
    log = pa.Table.from_pylist(rows, schema=log.schema)
    root = str(tmp_path / "lake")
    run_to_completion(root, log, epoch_size=100, num_partitions=2, payload_schema=SIZE_SCHEMA)
    got = {r["offset"]: r["reason"] for r in dead_letters_table(root).to_pylist()}
    assert got[rows[0]["offset"]] == "unknown_op"
    assert got[rows[1]["offset"]] == "null_key"


def test_payload_schema_missing_column_is_skipped(ray_session, tmp_path):
    """Schema evolution: a declared column the stream doesn't carry yet
    must not quarantine anything."""
    base = make_base_table(20, seed=95)
    log = make_changelog(base, 80, seed=96)
    root = str(tmp_path / "lake")
    metrics = run_to_completion(
        root, log, epoch_size=50, num_partitions=2,
        payload_schema={"not_yet_a_column": "IntegerValueType", "lang": "StringValueType"},
    )
    assert sum(m.get("dead_lettered", 0) for m in metrics) == 0
    assert dead_letters_table(root).num_rows == 0


def test_typed_quarantine_replay_identity(ray_session, tmp_path):
    """Different epoching -> byte-identical state and identical DLQ."""
    base = make_base_table(30, seed=97)
    log, expected = _with_size_column(make_changelog(base, 200, seed=98), every=11)
    shas, dlqs = [], []
    for run_dir, epoch_size in (("a", 90), ("b", 60)):
        root = str(tmp_path / run_dir)
        run(root, log, EngineConfig(epoch_size=epoch_size, num_partitions=3,
                                    payload_schema=SIZE_SCHEMA))
        shas.append(state_sha256(root))
        dlqs.append(sorted(
            (r["offset"], r["reason"]) for r in dead_letters_table(root).to_pylist()
        ))
    assert shas[0] == shas[1]
    assert dlqs[0] == dlqs[1]
    assert dict(dlqs[0]) == expected


def test_strict_columns_quarantines_undeclared(ray_session, tmp_path):
    """Closed-world ingest: rows carrying non-null values in undeclared
    columns quarantine with unknown_column:<col>; null values in such
    columns pass (the generator's pre-evolution rows carry a null
    branch); open-world default is unchanged."""
    base = make_base_table(40, seed=93)
    # evolve_at makes `branch` non-null from that row on — undeclared
    log = make_changelog(base, 300, seed=94, evolve_at=150)
    schema = {
        "commit": "StringValueType",
        "lang": "StringValueType",
        "content": "StringValueType",
    }
    strict = str(tmp_path / "strict")
    run_to_completion(strict, log, epoch_size=100, num_partitions=3,
                      payload_schema=schema, strict_columns=True)
    dlq = dead_letters_table(strict)
    reasons = set(dlq["reason"].to_pylist())
    assert reasons == {"unknown_column:branch"}
    n_branch = sum(1 for v in log["branch"].to_pylist() if v is not None)
    assert dlq.num_rows == n_branch
    # no branch value ever reached the lake; pre-evolution rows did
    st = state_table(strict)
    assert "branch" not in st.column_names or all(
        v is None for v in st["branch"].to_pylist()
    )

    # open world (default): the same stream evolves the schema
    open_ = str(tmp_path / "open")
    run_to_completion(open_, log, epoch_size=100, num_partitions=3,
                      payload_schema=schema)
    st2 = state_table(open_)
    assert any(v is not None for v in st2["branch"].to_pylist())

    # strict without a declared schema is a config error
    import pytest as _pytest

    from silk_ray.cdc.merge import _validate_events

    with _pytest.raises(ValueError, match="requires payload_schema"):
        _validate_events(log.slice(0, 5), None, strict_columns=True)


def test_strict_columns_replay_identity(ray_session, tmp_path):
    base = make_base_table(30, seed=95)
    log = make_changelog(base, 240, seed=96, evolve_at=100)
    schema = {"commit": "StringValueType", "lang": "StringValueType",
              "content": "StringValueType"}
    roots = []
    for i, (ep, parts) in enumerate([(80, 2), (120, 5)]):
        r = str(tmp_path / f"l{i}")
        run_to_completion(r, log, epoch_size=ep, num_partitions=parts,
                          payload_schema=schema, strict_columns=True)
        roots.append(r)
    assert state_sha256(roots[0]) == state_sha256(roots[1])
    a = sorted((r["offset"], r["reason"]) for r in dead_letters_table(roots[0]).to_pylist())
    b = sorted((r["offset"], r["reason"]) for r in dead_letters_table(roots[1]).to_pylist())
    assert a == b and a


def test_strict_columns_accepts_txn_metadata(ray_session, tmp_path):
    """Closed-world validation must treat ALL engine metadata columns
    (META_COLS — including ``txn``) as known: running --strict-columns
    on a txn-tagged changelog previously quarantined every row carrying
    a non-null txn as unknown_column:txn, dead-lettering most of the
    stream and producing a silently wrong lake."""
    from silk_ray.cdc.generator import assign_txns

    base = make_base_table(30, seed=97)
    log = assign_txns(make_changelog(base, 240, seed=98), seed=99, mean_size=5)
    assert sum(v is not None for v in log["txn"].to_pylist()) > log.num_rows // 2
    schema = {"commit": "StringValueType", "lang": "StringValueType",
              "content": "StringValueType"}
    root = str(tmp_path / "lake")
    run_to_completion(root, log, epoch_size=80, num_partitions=3,
                      payload_schema=schema, strict_columns=True, txn_atomic=True)
    dlq = dead_letters_table(root)
    reasons = dlq["reason"].to_pylist() if dlq.num_rows else []
    assert not any(r == "unknown_column:txn" for r in reasons), reasons
    # every event applied: the lake matches the sequential oracle
    st = sequential_apply(log)
    want = [{k: r.get(k) for k in KEYS} for r in (st[k] for k in sorted(st))]
    got = [{k: r.get(k) for k in KEYS} for r in state_table(root).to_pylist()]
    assert got == want
    # and `txn` never leaks into the lake as a payload column
    assert "txn" not in state_table(root).column_names
