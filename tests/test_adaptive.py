"""Adaptive epoch sizing (EngineConfig.target_epoch_seconds).

Invariants:
- the final state is identical to a fixed-size run (epoch shape never
  changes WHAT the lake holds — the standing replay invariant — only
  when commits land);
- sizes respect [min_epoch_size, max_epoch_size] and the 4x/step
  growth damping at every epoch;
- a tiny target drives the window down to min_epoch_size; a huge
  target grows it (damped) toward max_epoch_size;
- the whole stream still drains (lag 0) and metrics record the size
  used and the size chosen next.
"""

import pytest

from silk_ray.cdc.engine import EngineConfig, run
from silk_ray.cdc.generator import make_base_table, make_changelog
from silk_ray.cdc.merge import state_sha256


@pytest.fixture(scope="module")
def log():
    base = make_base_table(100, seed=97)
    return make_changelog(base, 3000, seed=98, dup_frac=0.02)


def test_adaptive_equals_fixed_and_respects_bounds(ray_session, log, tmp_path):
    root = str(tmp_path / "adaptive")
    ms = run(
        root, log,
        EngineConfig(
            epoch_size=200, num_partitions=4,
            # unreachably large target: the window must GROW, damped
            target_epoch_seconds=3600.0,
            min_epoch_size=50, max_epoch_size=1600,
        ),
    )
    assert ms and ms[-1]["lag_offsets"] == 0
    sizes = [m["epoch_size"] for m in ms]
    assert sizes[0] == 200
    assert sorted(sizes) == sizes, f"sizes must grow monotonically here: {sizes}"
    for prev, cur in zip(sizes, sizes[1:]):
        assert cur <= prev * 4, "growth damping violated"
        assert 50 <= cur <= 1600
    assert max(sizes) > 200  # it actually adapted

    fixed = str(tmp_path / "fixed")
    run(fixed, log, EngineConfig(epoch_size=200, num_partitions=4))
    assert state_sha256(root) == state_sha256(fixed)


def test_adaptive_shrinks_to_min(ray_session, log, tmp_path):
    root = str(tmp_path / "shrink")
    ms = run(
        root, log,
        EngineConfig(
            epoch_size=1000, num_partitions=4,
            target_epoch_seconds=1e-9,  # impossible target: shrink hard
            min_epoch_size=100,
        ),
    )
    assert ms[-1]["lag_offsets"] == 0
    assert ms[0]["epoch_size"] == 1000
    assert ms[-1]["epoch_size"] == 100  # pinned at the floor
    assert all(m["next_epoch_size"] >= 100 for m in ms)

    fixed = str(tmp_path / "fixed")
    run(fixed, log, EngineConfig(epoch_size=1000, num_partitions=4))
    assert state_sha256(root) == state_sha256(fixed)


def test_adaptive_off_by_default(ray_session, log, tmp_path):
    root = str(tmp_path / "plain")
    ms = run(root, log, EngineConfig(epoch_size=700, num_partitions=4))
    assert all(m["epoch_size"] == 700 for m in ms)
    assert all("next_epoch_size" not in m for m in ms)
