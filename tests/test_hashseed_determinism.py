"""Cross-process determinism under interpreter hash randomization.

The north rule's replay guarantee — "full replay from any checkpoint
converges to byte-identical table state" — must hold across *processes*,
not just within one: a resume after a crash, or a re-run on another
node, starts a fresh interpreter whose str-hash seed (PYTHONHASHSEED)
differs, so any set/dict string-iteration order leaking into an output
silently breaks replay identity while every single-process test stays
green. (Found in the wild: the active-learning pool iterated a set of
trimmed values, making the seeded labeling trajectory irreproducible —
silk_ray/learning/active.py `_trimmed_values`.)

This test runs the full engine (lake merge-apply + incremental linking
+ maintained clusters) AND the seeded learning stack (pool + GA) in two
child interpreters with adversarially different PYTHONHASHSEED values
and requires identical fingerprints for every surface.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, json, hashlib, copy
sys.path.insert(0, sys.argv[2])
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, log_to_driver=False)

from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog
from silk_ray.cdc.merge import state_sha256
from silk_ray.cdc.incremental import links_table
from silk_ray.cdc.clusters import clusters_table
from silk_ray.pipelines.rules import BENCH_RULE

def sha_rows(table, cols):
    rows = sorted(tuple(r[c] for c in cols) for r in table.to_pylist())
    return hashlib.sha256(json.dumps(rows, default=str).encode()).hexdigest()

rule = copy.deepcopy(BENCH_RULE)
rule.pop("filter_limit", None)
base = make_base_table(100, seed=91, near_dup_frac=0.25)
log = make_changelog(base, 400, seed=92, dup_frac=0.05)
root = sys.argv[1]
cfg = EngineConfig(
    epoch_size=200, num_partitions=4, n_block_partitions=16,
    rule_spec=rule, maintain_clusters=True,
)
run(root, log, cfg)

links = links_table(root)
clusters = clusters_table(root)

# seeded learning stack: pool order feeds selection, so it is part of
# the reproducibility contract (not just the final rule)
from silk_ray.learning.active import ActiveLearner, pool_from_entities
from silk_ray.learning.genlink import LearningConfig

names = [f"Item {chr(65 + i)} number {i * 13}" for i in range(12)]
source = [(f"s{i}", {"label": [n], "sku": [f"sku-{i}", f"grp-{i % 4}"]}) for i, n in enumerate(names)]
target = [(f"t{i}", {"name": [n.lower()], "sku": [f"sku-{i}", f"grp-{(i + 1) % 4}"]}) for i, n in enumerate(names)]
truth = {(f"s{i}", f"t{i}") for i in range(12)}
pool = pool_from_entities(source, target, [("label", "name"), ("sku", "sku")], max_links=200, seed=0)
pool_sig = hashlib.sha256(json.dumps([(c.source_uri, c.target_uri) for c in pool]).encode()).hexdigest()
learner = ActiveLearner(config=LearningConfig(population_size=40, max_iterations=4, seed=3))
for _ in range(4):
    picks = learner.step(pool, count=3)
    if not picks:
        break
    for c in picks:
        learner.label(c, (c.source_uri, c.target_uri) in truth)
rule_sig = hashlib.sha256(
    json.dumps(learner.best_rule, sort_keys=True).encode()
).hexdigest()

print(json.dumps({
    "state_sha256": state_sha256(root),
    "links_sha": sha_rows(links, ["source", "target", "confidence"]),
    "clusters_sha": sha_rows(clusters, ["uri", "cluster_id"]),
    "pool_sig": pool_sig,
    "rule_sig": rule_sig,
}))
ray.shutdown()
"""


@pytest.mark.slow
def test_engine_and_learning_identical_across_hash_seeds(tmp_path):
    results = []
    for seed in ("1", "16"):
        env = dict(os.environ, PYTHONHASHSEED=seed, RAY_ADDRESS="")
        root = str(tmp_path / f"lake_{seed}")
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, root, _REPO],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        results.append(json.loads(proc.stdout.strip().splitlines()[-1]))
    a, b = results
    for key in a:
        assert a[key] == b[key], f"{key} differs across PYTHONHASHSEED: {a[key]} vs {b[key]}"
