"""``python -m silk_ray`` CLI (the reference's Silk.main single-machine
entry, Silk.scala:221-233): config-driven link / transform / cdc."""

import json

import pyarrow.parquet as pq


def test_cli_link_transform_cdc(ray_session, tmp_path, capsys):
    from silk_ray.__main__ import main
    from silk_ray.cdc.generator import make_base_table, make_changelog, write_changelog_segments

    linkspec = {
        "source": {"path": "/root/testdata/sf0.001/documents.parquet",
                   "columns": ["doc_id", "text", "lang"], "uri_cols": ["doc_id"]},
        "rule": {"operator": {"metric": "equality", "threshold": 0.0,
                              "source": {"path": "lang"}, "target": {"path": "lang"}}},
        "link_limit": 50,
        "output": {"path": str(tmp_path / "links"), "format": "parquet"},
    }
    (tmp_path / "link.json").write_text(json.dumps(linkspec))
    assert main(["link", "--config", str(tmp_path / "link.json")]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["command"] == "link"
    n = sum(pq.read_table(str(f)).num_rows for f in (tmp_path / "links").glob("*.parquet"))
    assert n == 50  # link_limit applied

    tspec = {
        "input": {"path": "/root/testdata/sf0.001/documents.parquet",
                  "columns": ["doc_id", "lang"]},
        "rules": [{"target": "lang_norm",
                   "input": {"transform": "lowerCase", "inputs": [{"path": "lang"}]}}],
        "output": {"path": str(tmp_path / "tout")},
    }
    (tmp_path / "t.json").write_text(json.dumps(tspec))
    assert main(["transform", "--config", str(tmp_path / "t.json")]) == 0
    n = sum(pq.read_table(str(f)).num_rows for f in (tmp_path / "tout").glob("*.parquet"))
    assert n == 500

    base = make_base_table(50, seed=5)
    log = make_changelog(base, 200, seed=6)
    write_changelog_segments(log, str(tmp_path / "cl"), segment_size=100)
    assert main(["cdc", "--root", str(tmp_path / "lake"), "--changelog", str(tmp_path / "cl"),
                 "--epoch-size", "100", "--num-partitions", "2", "--block-partitions", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events_applied"] == 200
    assert out["dead_lettered"] == 0
    assert out["lag_offsets"] == 0


def test_cli_cdc_maintain_clusters(ray_session, tmp_path, capsys):
    """--maintain-clusters drives cdc/clusters.py through the CLI; the
    final maintained table equals batch CC over the final link store."""
    import json

    from silk_ray.__main__ import main
    from silk_ray.cdc.clusters import clusters_table, read_clusterstate
    from silk_ray.cdc.generator import (
        make_base_table,
        make_changelog,
        write_changelog_segments,
    )
    from silk_ray.cdc.incremental import links_table
    from silk_ray.pipelines.rules import BENCH_RULE
    from tests.test_clusters import _batch_cc

    rule = {k: v for k, v in BENCH_RULE.items() if k != "filter_limit"}
    (tmp_path / "rule.json").write_text(json.dumps(rule))
    base = make_base_table(50, seed=5, near_dup_frac=0.3)
    log = make_changelog(base, 200, seed=6)
    write_changelog_segments(log, str(tmp_path / "cl"), segment_size=100)
    root = str(tmp_path / "lake")
    assert main(["cdc", "--root", root, "--changelog", str(tmp_path / "cl"),
                 "--epoch-size", "100", "--num-partitions", "2", "--block-partitions", "4",
                 "--rule", str(tmp_path / "rule.json"), "--maintain-clusters"]) == 0
    capsys.readouterr()
    assert read_clusterstate(root)["epoch"] == 2
    t = clusters_table(root)
    maintained = dict(zip(t["uri"].to_pylist(), t["cluster_id"].to_pylist()))
    assert maintained == _batch_cc(links_table(root))
