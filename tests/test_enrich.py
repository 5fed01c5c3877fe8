"""Ingest-time enrichment: transform rules evaluated inside the CDC
read tasks (EngineConfig.enrich_rules / run_epoch(enrich_specs=)).

Each rule's target becomes a lake payload column (typed via ValueType
targets); rows whose enrichment errors quarantine to the DLQ with
reason ``enrich_error:<target>`` — the engine's equivalent of the
reference's transform error sink (ExecuteTransform.scala:76-79).
Deterministic rules ⇒ replay identity holds.
"""

import pyarrow as pa
import pytest

from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog
from silk_ray.cdc.merge import (
    dead_letters_table,
    run_to_completion,
    state_sha256,
    state_table,
)

ENRICH = [
    {"target": "lang_upper",
     "input": {"transform": "upperCase", "inputs": [{"path": "lang"}]}},
    {"target": "path_num",
     "input": {"transform": "regexExtract", "params": {"regex": "[0-9]+"},
               "inputs": [{"path": "path"}]},
     "value_type": "IntValueType"},
]


def _first_num(path):
    import re

    m = re.search(r"[0-9]+", path or "")
    return int(m.group(0)) if m else None


def test_enrichment_columns_in_lake_state(ray_session, tmp_path):
    base = make_base_table(40, seed=61)
    log = make_changelog(base, 250, seed=62, dup_frac=0.05)
    root = str(tmp_path / "lake")
    run_to_completion(root, log, epoch_size=100, num_partitions=4, enrich_specs=ENRICH)
    state = state_table(root).to_pylist()
    assert state, "lake empty"
    for r in state:
        assert r["lang_upper"] == r["lang"].upper()
        assert r["path_num"] == _first_num(r["path"])
    # typed target -> typed lake column
    assert state_table(root).schema.field("path_num").type == pa.int32()


def test_enrich_error_rows_quarantined(ray_session, tmp_path):
    """A rule whose output fails its ValueType on SOME rows: those rows
    quarantine with enrich_error:<target>, the rest apply normally."""
    rules = [
        {"target": "lang_num",
         "input": {"transform": "map",
                   "params": {"mapping": "py:1,js:2", "default": "unmapped"},
                   "inputs": [{"path": "lang"}]},
         "value_type": "IntegerValueType"},
    ]
    base = make_base_table(40, seed=63)
    log = make_changelog(base, 200, seed=64)
    root = str(tmp_path / "lake")
    run_to_completion(root, log, epoch_size=80, num_partitions=3, enrich_specs=rules)

    dlq = dead_letters_table(root)
    state = state_table(root).to_pylist()
    langs_dead = {r["lang"] for r in dlq.to_pylist()}
    langs_live = {r["lang"] for r in state}
    assert dlq.num_rows > 0, "expected some unmapped langs in the stream"
    assert langs_dead and langs_dead.isdisjoint({"py", "js"})
    assert langs_live <= {"py", "js"}
    assert set(dlq["reason"].to_pylist()) == {"enrich_error:lang_num"}
    for r in state:
        assert r["lang_num"] == {"py": 1, "js": 2}[r["lang"]]


def test_enrichment_replay_identity(ray_session, tmp_path):
    base = make_base_table(30, seed=65)
    log = make_changelog(base, 180, seed=66, dup_frac=0.08)
    shas = []
    for d, epoch_size in (("a", 70), ("b", 40)):
        root = str(tmp_path / d)
        run(root, log, EngineConfig(epoch_size=epoch_size, num_partitions=3,
                                    enrich_rules=ENRICH))
        shas.append(state_sha256(root))
    assert shas[0] == shas[1]


def test_enrichment_overwrites_existing_column(ray_session, tmp_path):
    """A rule targeting an existing payload column replaces it (same
    type — lake schema stays consistent across chain files)."""
    rules = [{"target": "lang",
              "input": {"transform": "upperCase", "inputs": [{"path": "lang"}]}}]
    base = make_base_table(20, seed=67)
    log = make_changelog(base, 100, seed=68)
    root = str(tmp_path / "lake")
    run_to_completion(root, log, epoch_size=60, num_partitions=2, enrich_specs=rules)
    langs = set(state_table(root)["lang"].to_pylist())
    assert langs and all(v == v.upper() for v in langs)
