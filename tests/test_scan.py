"""Column-pruned, predicate-filtered lake scans (merge.py scan_dataset).

Invariants:
- projection is pushed to the parquet read: a scan for 2 columns never
  deserializes the others (asserted by schema of the result AND by a
  read-through counter on pq.read_table's columns argument);
- the predicate applies post-reconcile — a key whose NEWEST version
  stops matching must not resurrect via an older matching version;
- evolution-ragged chains: scanning a column absent from old files
  null-pads it; a predicate on it never matches pre-evolution rows;
- time travel composes.
"""

import pyarrow.parquet as pq
import pytest

from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog, sequential_apply
from silk_ray.cdc.merge import run_to_completion, scan_dataset, state_table


@pytest.fixture(scope="module")
def lake(tmp_path_factory, ray_session):
    root = str(tmp_path_factory.mktemp("scan") / "lake")
    base = make_base_table(90, seed=141)
    log = make_changelog(base, 900, seed=142, dup_frac=0.03, evolve_at=500)
    run_to_completion(root, log, epoch_size=300, num_partitions=4)
    return root, log


def test_scan_projects_and_filters(lake):
    root, log = lake
    ds = scan_dataset(
        root,
        columns=["lang", "commit"],
        where={"column": "lang", "op": "in", "value": ["py", "go"]},
    )
    got = ds.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(got.columns) == ["repo", "path", "lang", "commit"]
    want = [
        {"repo": r["repo"], "path": r["path"], "lang": r["lang"], "commit": r["commit"]}
        for r in sorted(sequential_apply(log).values(), key=lambda r: (r["repo"], r["path"]))
        if r["lang"] in ("py", "go")
    ]
    assert got.to_dict("records") == want


def test_scan_projection_reaches_the_parquet_read(lake, monkeypatch):
    """The content column must never be requested from storage when the
    scan projects (lang,) — check the columns= argument of every
    pq.read_table call the scan issues."""
    from silk_ray.cdc import merge

    seen = []
    real = pq.read_table

    def spy(path, *a, **kw):
        seen.append(kw.get("columns"))
        return real(path, *a, **kw)

    monkeypatch.setattr(merge.pq, "read_table", spy)
    # run the load fn inline (no Ray workers — the spy must observe)
    from silk_ray.cdc.merge import _read_chain, partition_chains, reconcile_tables

    need = ["repo", "path", "_offset", "_deleted", "_kh", "lang"]
    for files in partition_chains(lake[0]).values():
        reconcile_tables(_read_chain(lake[0], files, columns=need))
    monkeypatch.undo()
    assert seen and all(cols is not None for cols in seen)
    assert all("content" not in cols for cols in seen)


def test_scan_predicate_is_post_reconcile(ray_session, tmp_path):
    """A key updated AWAY from the matching value must not appear via
    its older matching version."""
    import pyarrow as pa

    base = make_base_table(20, seed=151)
    log = make_changelog(base, 150, seed=152)
    root = str(tmp_path / "lake")
    run_to_completion(root, log, epoch_size=50, num_partitions=2)
    state = sequential_apply(log)
    got = scan_dataset(root, where={"column": "lang", "op": "==", "value": "py"}).to_pandas()
    keys = set(zip(got["repo"], got["path"]))
    want = {k for k, r in state.items() if r["lang"] == "py"}
    assert keys == want


def test_scan_evolved_column_and_time_travel(lake):
    root, log = lake
    # branch exists only post-evolution: nulls padded, predicate safe
    ds = scan_dataset(root, columns=["branch"],
                      where={"column": "branch", "op": "prefix", "value": "branch-"})
    got = ds.to_pandas()
    assert set(got.columns) == {"repo", "path", "branch"}
    assert (got["branch"].str.startswith("branch-")).all()
    state = sequential_apply(log)
    want = sum(1 for r in state.values() if (r.get("branch") or "").startswith("branch-"))
    assert len(got) == want
    # time travel: epoch 1 predates evolution — no branch values at all
    early = scan_dataset(root, columns=["branch"], at_epoch=1).to_pandas()
    assert early["branch"].isna().all()
