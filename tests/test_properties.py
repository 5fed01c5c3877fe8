"""Property-based invariants (hypothesis) for the engine's load-bearing
contracts:

- MultiBlock completeness: values within the distance threshold MUST
  share at least one block key (``Index.matches``) — this is THE
  guarantee candidate generation rests on (MultiBlock / Silk indexing,
  ``kernel/index.py``); a violation is a silently dropped link.
- LSM reconcile: ``reconcile_tables`` (newest-wins + tombstones over
  delta chains) must equal a sequential one-event-at-a-time dict apply
  regardless of how events are split into chain tables.
- Sketch Jaccard: the crc32-sketch Jaccard used by the dedup verifiers
  equals exact shingle-set Jaccard.

No Ray needed — these are pure-kernel properties (no ray_session
fixture, runs fast under hypothesis's default profile).
"""

from __future__ import annotations

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import assume, given, settings

# ---------------------------------------------------------------------------
# blocking completeness
# ---------------------------------------------------------------------------

words = st.text(alphabet="abcdef", min_size=1, max_size=8)


def _within(measure, a: str, b: str, theta: float) -> bool:
    d = measure.evaluate(a, b, theta)
    return d <= theta


def _ref_lev_blocks(s: str, limit: float, min_char: str = "0", max_char: str = "z") -> set[int]:
    """The reference's LevenshteinDistance.indexValue, transcribed
    directly (LevenshteinDistance.scala:50-70 + StringUtils.qGrams:
    '#'-boundary sliding q-grams, drop-first-(q-1) reorder, take
    limit·q+1, radix-combine into [minChar..maxChar]^q)."""
    q = 2
    lo, hi = ord(min_char), ord(max_char)
    padded = "#" * (q - 1) + s + "#" * (q - 1)
    grams = [padded[i : i + q] for i in range(len(padded) - q + 1)]
    reordered = grams[q - 1 :] + grams[: q - 1]
    out = set()
    for g in reordered[: int(limit) * q + 1]:
        idx = 0
        for ch in g:
            c = min(max(ord(ch), lo), hi)
            idx = idx * (hi - lo + 1) + c - lo
        out.add(idx)
    return out


@settings(max_examples=300, deadline=None)
@given(words, st.sampled_from([0.0, 1.0, 2.0]))
def test_levenshtein_index_matches_reference(s, theta):
    """Our q-gram blocking index is gram-for-gram the reference's.
    (Absolute completeness is NOT the contract: the reference itself
    fails to co-block e.g. 'a'/'z' at θ=1 — the q-gram lemma breaks on
    strings shorter than the q-gram window, and we match that behavior
    exactly rather than 'fixing' it into a different blocking scheme.)"""
    from silk_ray.kernel.distances import DISTANCE_MEASURES

    m = DISTANCE_MEASURES["levenshteinDistance"]()
    # raw one-dim block codes (flatten() additionally bit-mixes for
    # partition spreading, which is orthogonal to gram identity)
    got = {t[0] for t in m.index_value(s, theta, True).indices}
    assert got == _ref_lev_blocks(s, theta), (s, theta)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(words, min_size=1, max_size=8),
    st.lists(words, min_size=1, max_size=8),
    st.sampled_from([0.2, 0.5, 0.8]),
)
def test_jaccard_blocking_complete(t1, t2, theta):
    """Token sets within the jaccard distance threshold must co-block:
    sorted take-order + the exact prefix-filter length make the index a
    TRUE prefix filter (the reference's Set.take order is arbitrary and
    its (n·θ+0.5).toInt length is up to one element short at the
    boundary — hypothesis found d == θ counterexamples against that
    formula)."""
    from silk_ray.kernel.distances import DISTANCE_MEASURES

    m = DISTANCE_MEASURES["jaccard"]()
    if m.apply(t1, t2, theta) > theta:
        return
    i1 = m.index(t1, theta, True)
    i2 = m.index(t2, theta, False)
    assert i1.matches(i2), (t1, t2, theta)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(words, min_size=1, max_size=8),
    st.lists(words, min_size=1, max_size=8),
    st.sampled_from([0.2, 0.5, 0.8]),
)
def test_dice_blocking_complete(t1, t2, theta):
    """Same completeness contract for the dice prefix index
    (overlap >= n(1-θ)/(1+θ) within the threshold)."""
    from silk_ray.kernel.distances import DISTANCE_MEASURES

    m = DISTANCE_MEASURES["dice"]()
    if m.apply(t1, t2, theta) > theta:
        return
    i1 = m.index(t1, theta, True)
    i2 = m.index(t2, theta, False)
    assert i1.matches(i2), (t1, t2, theta)


# ---------------------------------------------------------------------------
# LSM reconcile vs sequential model
# ---------------------------------------------------------------------------

event_lists = st.lists(
    st.tuples(
        st.integers(0, 5),  # key id
        st.sampled_from(["U", "U", "U", "D"]),  # op (upserts dominate)
        st.integers(0, 99),  # payload
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(event_lists, st.integers(1, 5))
def test_lsm_reconcile_equals_sequential(events, n_chunks):
    """Any chunking of the ordered event stream into chain tables
    reconciles to the sequential newest-wins dict state."""
    from silk_ray.cdc.merge import reconcile_tables

    # sequential model
    state: dict[tuple[str, str], int] = {}
    for k, op, payload in events:
        key = ("r", f"k{k}")
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = payload

    # chain tables (oldest→newest): each chunk is itself a reconciled
    # per-key delta (last event in the chunk wins, deletes as
    # ``_deleted`` tombstones) — exactly the shape the engine's
    # per-epoch delta files have
    bounds = np.linspace(0, len(events), n_chunks + 1).astype(int)
    tables = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        chunk = events[lo:hi]
        if not chunk:
            continue
        delta: dict[int, tuple[str, int]] = {}
        for k, op, p in chunk:
            delta[k] = (op, p)
        tables.append(
            pa.table(
                {
                    "repo": pa.array(["r"] * len(delta)),
                    "path": pa.array([f"k{k}" for k in delta]),
                    "payload": pa.array([p for _, p in delta.values()], pa.int64()),
                    "_deleted": pa.array([op == "D" for op, _ in delta.values()]),
                }
            )
        )
    got = reconcile_tables(tables)
    got_state = {(r["repo"], r["path"]): r["payload"] for r in got.to_pylist()}
    assert got_state == dict(state), (events, n_chunks)


# ---------------------------------------------------------------------------
# sketch jaccard == exact jaccard
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(words, min_size=0, max_size=15),
    st.lists(words, min_size=0, max_size=15),
)
def test_sketch_jaccard_equals_exact(w1, w2):
    from silk_ray.functions.dedup import _sketch_of

    t1, t2 = " ".join(w1), " ".join(w2)
    a = _sketch_of(t1, 3)
    b = _sketch_of(t2, 3)
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    got = inter / union if union else 0.0

    from silk_ray.functions.dedup import shingles

    s1, s2 = shingles(t1, 3), shingles(t2, 3)
    want = len(s1 & s2) / len(s1 | s2) if (s1 | s2) else 0.0
    assert got == want


# ---------------------------------------------------------------------------
# keyed merge-join kernels (asof / range) vs brute force
# ---------------------------------------------------------------------------

on_values = st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=30)


@given(on_values, on_values, st.booleans())
@settings(max_examples=200, deadline=None)
def test_asof_emit_matches_bruteforce(l_vals, r_vals, strict):
    from silk_ray.pipelines.relational import _asof_emit

    l_on = np.array(sorted(l_vals), dtype=np.int64)
    r_on = np.array(sorted(r_vals), dtype=np.int64)
    li, ri = _asof_emit(strict)(l_on, r_on)
    got = {(int(a), int(b)) for a, b in zip(li, ri)}
    want = set()
    for i, lv in enumerate(l_on):
        cand = [j for j, rv in enumerate(r_on) if (rv < lv if strict else rv <= lv)]
        if cand:
            want.add((i, cand[-1]))  # last index = greatest value (sorted, dup-stable)
    assert got == want


@given(on_values, on_values, st.integers(-20, 20), st.integers(0, 25))
@settings(max_examples=200, deadline=None)
def test_range_emit_matches_bruteforce(l_vals, r_vals, lo, width):
    from silk_ray.pipelines.relational import _range_emit

    hi = lo + width
    l_on = np.array(sorted(l_vals), dtype=np.int64)
    r_on = np.array(sorted(r_vals), dtype=np.int64)
    li, ri = _range_emit(lo, hi)(l_on, r_on)
    got = sorted(zip(li.tolist(), ri.tolist()))
    want = sorted(
        (i, j)
        for i, lv in enumerate(l_on)
        for j, rv in enumerate(r_on)
        if lv + lo <= rv < lv + hi
    )
    assert got == want


@given(
    st.lists(
        st.recursive(
            st.one_of(
                st.none(),
                st.booleans(),
                st.integers(min_value=-(10**12), max_value=10**12),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                st.text(max_size=40),
            ),
            lambda inner: st.one_of(
                st.lists(inner, max_size=4),
                st.dictionaries(st.text(max_size=8), inner, max_size=4),
            ),
            max_leaves=8,
        ),
        max_size=12,
    ),
    st.sampled_from(["array", "ndjson", "concat"]),
    st.integers(min_value=4, max_value=64),
)
@settings(max_examples=60, deadline=None)
def test_json_stream_round_trips_arbitrary_values(tmp_path_factory, values, shape, chunk):
    """Property: iter_json_records over any of the three producer
    shapes yields exactly json.loads' values, for ANY top-level value
    list and ANY chunk size (the resume/refill seams can't drop,
    duplicate or reorder a record)."""
    import json as _json
    import os

    from silk_ray.sources.streaming import iter_json_records

    # the uniform top-level-array rule (ADVICE r4): EVERY top-level
    # '[' opens a wrapper whose elements are the records, so a list
    # value at top level of an NDJSON/concat file is genuinely
    # ambiguous input (it flattens) — excluded from the property
    assume(shape == "array" or not any(isinstance(v, list) for v in values))
    d = tmp_path_factory.mktemp("jsprop")
    p = os.path.join(str(d), "f.json")
    if shape == "array":
        body = _json.dumps(values)
    elif shape == "ndjson":
        body = "\n".join(_json.dumps(v) for v in values)
    else:
        body = " ".join(_json.dumps(v) for v in values)
    with open(p, "w", encoding="utf-8") as f:
        f.write(body)
    got = list(iter_json_records(p, chunk_size=chunk))
    # NDJSON/concat of a top-level list value is indistinguishable from
    # an array element stream only in the array shape; keep shapes with
    # non-dict/list top-level values honest too
    assert got == values
