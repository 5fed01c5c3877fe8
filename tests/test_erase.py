"""Predicate erasure as CDC events (cdc/erase.py).

Invariants:
- erase_where appends D events to the binlog; applying them through the
  normal engine equals the sequential oracle over the combined stream
  (erasure is indistinguishable from organic deletes);
- downstream stores (links, aggregate view, egress) process the erasure
  exactly like any delete — the view equals a batch GROUP BY and the
  egress carries before-images for the erased keys;
- replay across epoch shapes stays byte-identical with erasure events
  in the stream; redelivery of the erasure window is a no-op;
- predicate compilation: AND of conditions, evolution-missing columns
  never match, bad specs and same-offset re-emits are refused.
"""

import json
import os

import pyarrow.compute as pc
import pytest

from silk_ray.cdc.erase import compile_predicate, erase_where
from silk_ray.cdc.generator import (
    make_base_table,
    make_changelog,
    sequential_apply,
    write_changelog_segments,
)
from silk_ray.cdc.merge import run_to_completion, state_sha256, state_table


@pytest.fixture()
def binlog(tmp_path):
    base = make_base_table(80, seed=81)
    log = make_changelog(base, 700, seed=82, dup_frac=0.04)
    d = str(tmp_path / "cl")
    write_changelog_segments(log, d, segment_size=250)
    return d, log


def _live_keys(changelog_dir):
    # read per file and unify: the erasure segment carries only
    # (offset, op, repo, path) — a naive pads.dataset() would infer the
    # 4-column schema from it (lexically first) and drop the payload
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    parts = [
        pq.read_table(p)
        for p in sorted(glob.glob(os.path.join(changelog_dir, "*.parquet")))
    ]
    log = pa.concat_tables(parts, promote_options="default")
    return sequential_apply(log)


def test_erase_where_equals_oracle_and_downstream(ray_session, tmp_path, binlog):
    from silk_ray.cdc.engine import EngineConfig, run
    from silk_ray.cdc.matview import AggViewSpec, agg_table
    from silk_ray.cdc.egress import egress_table
    from tests.test_matview import batch_view

    d, log = binlog
    agg = AggViewSpec(group_by=("lang",), measures={"chars": ("sum_strlen", "content")})
    cfg = EngineConfig(epoch_size=200, num_partitions=4, agg_spec=agg, egress=True)
    root = str(tmp_path / "lake")
    run(root, d, cfg)
    langs = set(state_table(root)["lang"].to_pylist())
    victim = sorted(langs)[0]
    n_victim = sum(
        1 for v in state_table(root)["lang"].to_pylist() if v == victim
    )
    assert n_victim > 0

    out = erase_where(root, d, {"column": "lang", "op": "==", "value": victim})
    assert out["events"] == n_victim
    assert os.path.exists(out["segment"])

    pre_seq = egress_table(root).num_rows
    run(root, d, cfg)  # tail the erasure events

    final = state_table(root)
    assert victim not in set(final["lang"].to_pylist())
    # exact oracle: sequential apply over the combined stream
    oracle = _live_keys(d)
    assert sorted((r["repo"], r["path"]) for r in final.to_pylist()) == sorted(oracle)
    # the maintained view re-aggregated exactly (victim group gone)
    got = agg_table(root)
    want = batch_view(root, agg)
    assert got.sort_by("lang").equals(want.sort_by("lang"))
    assert victim not in set(got["lang"].to_pylist())
    # egress emitted one D with a before-image per erased key
    eg = egress_table(root).slice(pre_seq)
    dels = eg.filter(pc.equal(eg["op"], "D"))
    assert dels.num_rows == n_victim
    assert set(dels["old_lang"].to_pylist()) == {victim}
    assert all(v is None for v in dels["new_content"].to_pylist())


def test_erase_replay_identical_across_epoch_shapes(ray_session, tmp_path, binlog):
    d, _ = binlog
    root_a = str(tmp_path / "a")
    run_to_completion(root_a, d, epoch_size=200, num_partitions=4)
    erase_where(root_a, d, {"column": "path", "op": "contains", "value": "module_0"})
    run_to_completion(root_a, d, epoch_size=200, num_partitions=4)

    # a second lake consumes the SAME binlog (now containing the erasure
    # segment) under different epoching/partitioning
    root_b = str(tmp_path / "b")
    run_to_completion(root_b, d, epoch_size=130, num_partitions=7)
    assert state_sha256(root_a) == state_sha256(root_b)
    assert all(
        "module_0" not in p for p in state_table(root_a)["path"].to_pylist()
    )

    # redelivery of the whole stream is a no-op
    sha = state_sha256(root_a)
    run_to_completion(root_a, d, epoch_size=90, num_partitions=4)
    assert state_sha256(root_a) == sha


def test_erase_no_matches_and_collision_refused(ray_session, tmp_path, binlog):
    d, _ = binlog
    root = str(tmp_path / "lake")
    run_to_completion(root, d, epoch_size=300, num_partitions=3)
    out = erase_where(root, d, {"column": "lang", "op": "==", "value": "cobol"})
    assert out == {"events": 0, "segment": None}
    out1 = erase_where(root, d, {"column": "path", "op": "prefix", "value": "src/module_01"})
    assert out1["events"] > 0
    # a second un-consumed erasure stacks at FRESH offsets (the first
    # segment advanced the binlog head) — erasure is monotone-append
    out2 = erase_where(root, d, {"column": "lang", "op": "!=", "value": "nothing"})
    assert out2["offset_lo"] > out1["offset_hi"]
    # a same-offset re-emit (a lost-result retry of an already-written
    # segment) is refused instead of silently overwritten
    from silk_ray.cdc import checkpoint as ckpt
    from silk_ray.cdc.merge import _changelog_max_offset

    start = max(
        _changelog_max_offset(d) or -1, ckpt.read_manifest(root).next_offset - 1
    ) + 1
    stale = os.path.join(d, f"erasure-{start:012d}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    empty = pa.table({"offset": pa.array([], pa.int64()),
                      "op": pa.array([], pa.string()),
                      "repo": pa.array([], pa.string()),
                      "path": pa.array([], pa.string())})
    pq.write_table(empty, stale)  # 0 rows: does not advance the binlog head
    try:
        with pytest.raises(FileExistsError, match="already exists"):
            erase_where(root, d, {"column": "lang", "op": "!=", "value": "nothing"})
    finally:
        os.remove(stale)


def test_compile_predicate_semantics(ray_session):
    import pyarrow as pa

    t = pa.table({
        "lang": ["py", "js", "py", None],
        "size": [1, 5, 9, 3],
        "path": ["src/a.py", "lib/b.js", "src/c.py", "x"],
    })
    m = compile_predicate([
        {"column": "lang", "op": "==", "value": "py"},
        {"column": "size", "op": ">=", "value": 5},
    ])(t)
    assert m.to_pylist() == [False, False, True, False]  # AND; null never matches
    m = compile_predicate({"column": "path", "op": "prefix", "value": "src/"})(t)
    assert m.to_pylist() == [True, False, True, False]
    m = compile_predicate({"column": "lang", "op": "in", "value": ["js", "go"]})(t)
    assert m.to_pylist() == [False, True, False, False]
    # evolution: a column absent from this batch matches nothing
    m = compile_predicate({"column": "branch", "op": "==", "value": "b"})(t)
    assert m.to_pylist() == [False] * 4
    with pytest.raises(ValueError, match="empty predicate"):
        compile_predicate([])
    with pytest.raises(ValueError, match="unknown predicate op"):
        compile_predicate({"column": "lang", "op": "~", "value": "x"})
    with pytest.raises(ValueError, match="missing"):
        compile_predicate({"column": "lang"})


def test_erase_cli(ray_session, tmp_path, binlog, capsys):
    from silk_ray.__main__ import main

    d, _ = binlog
    root = str(tmp_path / "lake")
    assert main(["cdc", "--root", root, "--changelog", d,
                 "--epoch-size", "300", "--num-partitions", "3"]) == 0
    capsys.readouterr()
    assert main(["erase", "--root", root, "--changelog", d,
                 "--where", '{"column": "lang", "op": "==", "value": "go"}']) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_go = sum(1 for v in state_table(root)["lang"].to_pylist() if v == "go")
    assert out["events"] == n_go
    assert main(["cdc", "--root", root, "--changelog", d,
                 "--epoch-size", "300", "--num-partitions", "3"]) == 0
    assert "go" not in set(state_table(root)["lang"].to_pylist())


def test_rewrite_where_equals_oracle(ray_session, tmp_path, binlog):
    """U events through the binlog: matched rows keep their full payload
    with the SET targets overwritten; unmatched rows untouched; replay
    across epoch shapes identical."""
    d, _ = binlog
    from silk_ray.cdc.erase import rewrite_where

    root = str(tmp_path / "lake")
    run_to_completion(root, d, epoch_size=200, num_partitions=4)
    before = {(r["repo"], r["path"]): r for r in state_table(root).to_pylist()}

    out = rewrite_where(
        root, d,
        {"column": "path", "op": "prefix", "value": "src/module_01"},
        [{"target": "lang",
          "input": {"transform": "upperCase", "inputs": [{"path": "lang"}]}},
         {"target": "reviewed",
          "input": {"transform": "constant", "params": {"value": "yes"},
                    "inputs": []}}],
    )
    assert out["events"] > 0
    run_to_completion(root, d, epoch_size=200, num_partitions=4)

    after = {(r["repo"], r["path"]): r for r in state_table(root).to_pylist()}
    assert set(after) == set(before)  # a rewrite never adds/removes keys
    changed = 0
    for k, row in after.items():
        if k[1].startswith("src/module_01"):
            changed += 1
            assert row["lang"] == before[k]["lang"].upper()
            assert row["reviewed"] == "yes"  # evolution-added column
            assert row["content"] == before[k]["content"]  # payload preserved
            assert row["commit"] == before[k]["commit"]
        else:
            assert row["lang"] == before[k]["lang"]
            assert row.get("reviewed") is None
    assert changed == out["events"]

    # different epoch shape consumes the same binlog identically
    root_b = str(tmp_path / "b")
    run_to_completion(root_b, d, epoch_size=130, num_partitions=7)
    assert state_sha256(root_b) == state_sha256(root)


def test_rewrite_bad_rule_aborts_without_emitting(ray_session, tmp_path, binlog):
    d, _ = binlog
    import glob

    from silk_ray.cdc.erase import rewrite_where

    root = str(tmp_path / "lake")
    run_to_completion(root, d, epoch_size=300, num_partitions=3)
    segs = set(glob.glob(os.path.join(d, "*.parquet")))
    with pytest.raises(ValueError, match="aborting the emit"):
        rewrite_where(
            root, d,
            {"column": "lang", "op": "==", "value": "py"},
            # Integer-typed target fed non-numeric content must error
            [{"target": "n", "value_type": "IntegerValueType",
              "input": {"path": "content"}}],
        )
    assert set(glob.glob(os.path.join(d, "*.parquet"))) == segs  # nothing appended


def test_rewrite_cli(ray_session, tmp_path, binlog, capsys):
    from silk_ray.__main__ import main

    d, _ = binlog
    root = str(tmp_path / "lake")
    assert main(["cdc", "--root", root, "--changelog", d,
                 "--epoch-size", "300", "--num-partitions", "3"]) == 0
    capsys.readouterr()
    assert main(["rewrite", "--root", root, "--changelog", d,
                 "--where", '{"column": "lang", "op": "==", "value": "go"}',
                 "--set", '[{"target": "lang", "input": {"transform": "constant", '
                          '"params": {"value": "golang"}, "inputs": []}}]']) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events"] > 0
    assert main(["cdc", "--root", root, "--changelog", d,
                 "--epoch-size", "300", "--num-partitions", "3"]) == 0
    langs = set(state_table(root)["lang"].to_pylist())
    assert "go" not in langs and "golang" in langs


def test_erase_flows_through_incremental_linking(ray_session, tmp_path):
    """An erased document's links vanish via the normal incremental
    path; a rewrite that changes content re-scores affected pairs. The
    maintained link store must equal a from-scratch batch run at every
    step (erasure/rewrite are organic D/U events to the linker)."""
    import copy

    from silk_ray.cdc.engine import EngineConfig, run
    from silk_ray.cdc.erase import erase_where, rewrite_where
    from silk_ray.cdc.generator import write_changelog_segments
    from silk_ray.cdc.incremental import links_table
    from silk_ray.pipelines.rules import BENCH_RULE
    from tests.test_soak_linked import _batch_links

    rule = copy.deepcopy(BENCH_RULE)
    rule.pop("filter_limit", None)

    base = make_base_table(70, seed=85, near_dup_frac=0.3)
    log = make_changelog(base, 500, seed=86, dup_frac=0.03)
    d = str(tmp_path / "cl")
    write_changelog_segments(log, d, segment_size=250)

    cfg = EngineConfig(epoch_size=250, num_partitions=4, n_block_partitions=8,
                       rule_spec=rule)
    root = str(tmp_path / "lake")
    run(root, d, cfg)

    def sorted_links():
        lt = links_table(root)
        return sorted(zip(lt["source"].to_pylist(), lt["target"].to_pylist()))

    assert sorted_links() == _batch_links(root, rule)
    pre = sorted_links()
    assert pre, "corpus with near-dups must produce links"

    # erase one linked document: its pairs must leave the store
    victim = pre[0][0]
    repo, path = victim.split("//", 1)
    erase_where(root, d, [{"column": "repo", "op": "==", "value": repo},
                          {"column": "path", "op": "==", "value": path}])
    run(root, d, cfg)
    post = sorted_links()
    assert post == _batch_links(root, rule)
    assert all(victim not in pair for pair in post)

    # rewrite another linked doc's content: incremental == batch again
    other = post[0][0] if post else None
    if other is not None:
        repo2, path2 = other.split("//", 1)
        rewrite_where(
            root, d,
            [{"column": "repo", "op": "==", "value": repo2},
             {"column": "path", "op": "==", "value": path2}],
            [{"target": "content",
              "input": {"transform": "constant",
                        "params": {"value": "entirely different body now"},
                        "inputs": []}}],
        )
        run(root, d, cfg)
        assert sorted_links() == _batch_links(root, rule)
