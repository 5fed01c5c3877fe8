"""Randomized soak of the FULL linked engine (lake + link store +
cluster table): seeded random streams driven epoch-by-epoch through
`engine.run` with linking and cluster maintenance on, checking at EVERY
commit point that

- the maintained link set equals a from-scratch `generate_links` pass
  over the current lake state (incremental == batch, the core
  north_rule invariant),
- the maintained cluster table equals batch connected components over
  the current link store, and
- the maintained aggregate view equals a batch GROUP BY over the
  current lake state,

then replaying the whole stream into a fresh root with different
epoching and asserting byte-identical lake sha256 plus identical final
link, cluster and view tables, and finally bootstrapping a THIRD root
from a mid-stream snapshot (cdc/bootstrap.py) and tailing the rest —
all three engines must converge to the same state.

Complements test_clusters.py (one fixed scenario) and test_soak.py
(merge-apply only): here the stream shape, epoch size, partition
counts and near-dup density are all drawn from a seeded RNG.
"""

import copy

import pytest

from silk_ray.cdc.clusters import clusters_table
from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog
from silk_ray.cdc.incremental import links_table
from silk_ray.cdc.matview import AggViewSpec, agg_table
from silk_ray.cdc.merge import state_sha256
from silk_ray.pipelines.rules import BENCH_RULE

AGG = AggViewSpec(
    group_by=("lang",),
    measures={"sum_chars": ("sum_strlen", "content")},
    count_col="n_docs",
    num_shards=8,
)


def _view_fingerprint(t):
    cols = sorted(t.column_names)
    return sorted(zip(*(t[c].to_pylist() for c in cols))) if t.num_rows else []


def _batch_links(root, rule_spec):
    """From-scratch linkage over the current lake snapshot."""
    from silk_ray.cdc.merge import snapshot_dataset
    from silk_ray.linking.pipeline import add_uri_column, generate_links

    ds = add_uri_column(snapshot_dataset(root))
    lt = generate_links(
        ds, None, rule_spec, source_equals_target=True, link_limit=None
    ).to_pandas()
    return sorted(zip(lt["source"], lt["target"]))


def _batch_cc(links):
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, t in zip(links["source"].to_pylist(), links["target"].to_pylist()):
        for n in (s, t):
            parent.setdefault(n, n)
        rs, rt = find(s), find(t)
        if rs != rt:
            if rt < rs:
                rs, rt = rt, rs
            parent[rt] = rs
    return sorted((n, find(n)) for n in parent)


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_linked_engine_randomized_soak(ray_session, tmp_path, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    rule = copy.deepcopy(BENCH_RULE)
    rule.pop("filter_limit", None)

    n_base = int(rng.integers(60, 140))
    n_events = int(rng.integers(500, 900))
    near_dup = float(rng.uniform(0.15, 0.35))
    base = make_base_table(n_base, seed=seed + 1, near_dup_frac=near_dup)
    log = make_changelog(base, n_events, seed=seed + 2, dup_frac=0.05)

    epoch_a = int(rng.integers(150, 350))
    cfg = EngineConfig(
        epoch_size=epoch_a,
        num_partitions=int(rng.integers(2, 7)),
        n_block_partitions=int(rng.integers(8, 24)),
        rule_spec=rule,
        maintain_clusters=True,
        agg_spec=AGG,
        max_epochs=1,
    )
    root_a = str(tmp_path / "a")
    epochs = 0
    while True:
        ms = run(root_a, log, cfg)
        if not ms:
            break
        epochs += 1
        lt = links_table(root_a)
        # incremental link set == from-scratch batch over the lake state
        got = sorted(zip(lt["source"].to_pylist(), lt["target"].to_pylist()))
        assert got == _batch_links(root_a, rule), f"seed {seed} epoch {epochs}"
        # maintained clusters == batch CC over the link store
        ct = clusters_table(root_a)
        assert sorted(zip(ct["uri"].to_pylist(), ct["cluster_id"].to_pylist())) == _batch_cc(lt)
        # maintained aggregate view == batch GROUP BY over the lake state
        from tests.test_matview import batch_view

        assert _view_fingerprint(agg_table(root_a)) == _view_fingerprint(
            batch_view(root_a, AGG)
        ), f"seed {seed} epoch {epochs}"
    assert epochs >= 2

    # full replay, different epoching, with an online repartition after
    # the first committed epoch: byte-identical lake, identical stores
    # (links/clusters/agg must ride through the eventless epoch)
    from silk_ray.cdc.repartition import repartition_lake

    cfg_b = copy.deepcopy(cfg)
    cfg_b.epoch_size = int(rng.integers(150, 350))
    cfg_b.max_epochs = 1
    root_b = str(tmp_path / "b")
    run(root_b, log, cfg_b)
    cfg_b.num_partitions = int(rng.integers(2, 11))
    repartition_lake(root_b, cfg_b.num_partitions)
    cfg_b.max_epochs = None
    run(root_b, log, cfg_b)
    assert state_sha256(root_b) == state_sha256(root_a)
    la, lb = links_table(root_a), links_table(root_b)
    assert sorted(zip(la["source"].to_pylist(), la["target"].to_pylist())) == sorted(
        zip(lb["source"].to_pylist(), lb["target"].to_pylist())
    )
    ca, cb = clusters_table(root_a), clusters_table(root_b)
    assert sorted(zip(ca["uri"].to_pylist(), ca["cluster_id"].to_pylist())) == sorted(
        zip(cb["uri"].to_pylist(), cb["cluster_id"].to_pylist())
    )
    assert _view_fingerprint(agg_table(root_b)) == _view_fingerprint(agg_table(root_a))

    # bootstrap leg: snapshot mid-stream, tail the rest — converges to
    # the same lake/links/clusters/view as the full tails
    from silk_ray.cdc.bootstrap import bootstrap_lake
    from tests.test_bootstrap import _snapshot_at

    import pyarrow.compute as pc

    s = int(pc.max(log["offset"]).as_py() * rng.uniform(0.35, 0.7))
    snap = _snapshot_at(log, s)
    cfg_c = copy.deepcopy(cfg)
    cfg_c.epoch_size = int(rng.integers(150, 350))
    cfg_c.max_epochs = None
    root_c = str(tmp_path / "c")
    bootstrap_lake(
        root_c, snap, as_of_offset=s,
        num_partitions=cfg.num_partitions, link_spec=rule,
        n_block_partitions=cfg.n_block_partitions,
    )
    run(root_c, log, cfg_c)
    assert state_sha256(root_c) == state_sha256(root_a)
    lc = links_table(root_c)
    assert sorted(zip(lc["source"].to_pylist(), lc["target"].to_pylist())) == sorted(
        zip(la["source"].to_pylist(), la["target"].to_pylist())
    )
    cc = clusters_table(root_c)
    assert sorted(zip(cc["uri"].to_pylist(), cc["cluster_id"].to_pylist())) == sorted(
        zip(ca["uri"].to_pylist(), ca["cluster_id"].to_pylist())
    )
    assert _view_fingerprint(agg_table(root_c)) == _view_fingerprint(agg_table(root_a))
