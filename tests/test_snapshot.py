"""As-of-epoch (time-travel) reads over the lake: per-epoch manifest
snapshots + retention-aware GC (merge.py `gc_lake(retain_epochs=)`,
checkpoint.py `read_manifest_at`).

Invariants:
- `state_table(root, at_epoch=e)` equals the sequential oracle over the
  changelog prefix consumed through epoch e (exact historical state,
  not an approximation);
- the default retention (1) keeps exactly the rollback window readable
  and is byte-identical in storage behavior to the pre-feature GC;
- deeper retention keeps deeper history; reads past the window fail
  loudly, never silently return wrong data.
"""

import pyarrow.compute as pc
import pytest

from silk_ray.cdc import checkpoint as ckpt
from silk_ray.cdc.generator import make_base_table, make_changelog, sequential_apply
from silk_ray.cdc.merge import (
    gc_lake,
    run_epoch,
    run_to_completion,
    state_sha256,
    state_table,
)

KEYS = ("repo", "path", "commit", "lang", "content")


def _strip(rows):
    return [{k: r.get(k) for k in KEYS} for r in rows]


def _oracle_prefix(changelog, next_offset):
    prefix = changelog.filter(pc.less(changelog["offset"], next_offset))
    state = sequential_apply(prefix)
    return _strip([state[k] for k in sorted(state.keys())])


@pytest.fixture(scope="module")
def log():
    base = make_base_table(120, seed=61)
    return make_changelog(base, 1500, seed=62, dup_frac=0.03)


def test_time_travel_matches_prefix_oracle(ray_session, log, tmp_path):
    """Without GC, every committed epoch is readable and equals the
    oracle over exactly the offsets consumed through that epoch."""
    root = str(tmp_path / "lake")
    run_to_completion(root, log, epoch_size=300, num_partitions=4, compact_at=3)
    current = ckpt.read_manifest(root).epoch
    assert current == 5
    for e in range(1, current + 1):
        next_offset = ckpt.read_manifest_at(root, e).next_offset
        got = _strip(state_table(root, at_epoch=e).to_pylist())
        assert got == _oracle_prefix(log, next_offset), f"epoch {e}"
    # at_epoch=current is the current state
    assert state_sha256(root, at_epoch=current) == state_sha256(root)


def test_default_retention_keeps_rollback_window_only(ray_session, log, tmp_path):
    root = str(tmp_path / "lake")
    shas = {}
    while True:
        m = run_epoch(root, log, epoch_size=300, num_partitions=4, compact_at=3)
        if m is None:
            break
        shas[m["epoch"]] = state_sha256(root)
        gc_lake(root)  # default retain_epochs=1, as the engine runs it
    current = ckpt.read_manifest(root).epoch
    # previous epoch: readable, exact
    assert state_sha256(root, at_epoch=current - 1) == shas[current - 1]
    # two back: loudly gone
    with pytest.raises(FileNotFoundError, match="retention window"):
        state_table(root, at_epoch=current - 2)


def test_deep_retention_time_travel(ray_session, log, tmp_path):
    root = str(tmp_path / "lake")
    shas = {}
    while True:
        m = run_epoch(root, log, epoch_size=250, num_partitions=4, compact_at=2)
        if m is None:
            break
        shas[m["epoch"]] = state_sha256(root)
        gc_lake(root, retain_epochs=3)
    current = ckpt.read_manifest(root).epoch
    assert current == 6
    for e in range(current - 3, current + 1):
        assert state_sha256(root, at_epoch=e) == shas[e], f"epoch {e}"
    with pytest.raises(FileNotFoundError, match="retention window"):
        state_table(root, at_epoch=current - 4)


def test_unknown_epoch_fails_loudly(ray_session, log, tmp_path):
    root = str(tmp_path / "lake")
    run_epoch(root, log, epoch_size=300, num_partitions=2)
    with pytest.raises(FileNotFoundError, match="never committed"):
        state_table(root, at_epoch=99)
