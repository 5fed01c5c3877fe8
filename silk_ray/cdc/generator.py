"""Deterministic synthetic data: source-code base table + binlog changelog.

Shapes follow FIXTURES.md (F1/F2/F3) and BASELINE.json's ``input_hint``:

- base table ``(repo, path, commit, lang, content)``: Zipf-hot repos
  (drives skew handling), POSIX-ish paths, 40-hex pseudo-sha commits,
  token-soup content from a seeded vocabulary with planted near-
  duplicate pairs across repos (for linkage tests);
- changelog ``(offset, op, repo, path, commit, lang, content)``:
  globally monotone offsets, per-key commit-ordered subsequences
  (I → U* → optional D → optional re-I), ~60/30/10 U/I/D mix,
  duplicate events injected on purpose (same offset replayed) to test
  idempotence; optional schema-evolution switch at a configured offset
  (added ``branch`` column, ``lang`` renamed to ``language``).

Everything is seeded — no wall clock, no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["py", "scala", "js", "java", "go", "md"]
_EXT = {"py": "py", "scala": "scala", "js": "js", "java": "java", "go": "go", "md": "md"}

# large vocabulary so unrelated documents share few tokens (mirrors a
# real code corpus; keeps token blocking selective)
_VOCAB_SIZE = 20_000


def _vocab(rng: np.random.Generator) -> list[str]:
    roots = [
        "load", "parse", "merge", "index", "block", "link", "score", "apply",
        "commit", "offset", "batch", "table", "schema", "stream", "shard",
        "hash", "token", "value", "entity", "rule", "filter", "write", "read",
        "cache", "state", "epoch", "event", "key", "part", "data", "config",
    ]
    suffixes = ["", "er", "ing", "ed", "_fn", "_impl", "_v2", "_util", "s", "_id"]
    words = []
    for r in roots:
        for s in suffixes:
            words.append(r + s)
    # fill with random identifier-like words (diverse prefixes, so q-gram
    # blocking on filenames stays selective like a real code corpus)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    seen = set(words)
    while len(words) < _VOCAB_SIZE:
        w = "".join(rng.choice(letters, size=int(rng.integers(4, 11))))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words[:_VOCAB_SIZE]


def pseudo_sha(repo: str, path: str, seq: int) -> str:
    """40-hex deterministic pseudo-sha (FIXTURES.md F1)."""
    return hashlib.sha1(f"{repo}\x00{path}\x00{seq}".encode()).hexdigest()


def _zipf_repo_ids(rng: np.random.Generator, n: int, n_repos: int, a: float = 1.3) -> np.ndarray:
    """Zipf-distributed repo picks so some repos are hot."""
    raw = rng.zipf(a, size=n)
    return (raw - 1) % n_repos


def make_base_table(
    n_rows: int,
    seed: int = 42,
    n_repos: int | None = None,
    near_dup_frac: float = 0.05,
) -> pa.Table:
    """F1 base table with planted near-duplicate pairs.

    Near-dups: a fraction of rows in repos ``repo-00xx`` get a twin in
    ``repo-01xx`` with the same path tail (≤2 char edits) and content
    with a few token edits. The twin relationship is recoverable via
    :func:`golden_links`.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    n_repos = n_repos or max(8, n_rows // 50)

    repo_ids = _zipf_repo_ids(rng, n_rows, n_repos)
    lang_ids = rng.integers(0, len(LANGS), size=n_rows)

    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_rows):
        repo = f"repo-{repo_ids[i]:04d}"
        lang = LANGS[lang_ids[i]]
        module = f"module_{rng.integers(0, 20):02d}"
        fname = f"{vocab[rng.integers(0, _VOCAB_SIZE)]}_{i % 1000:03d}.{_EXT[lang]}"
        path = f"src/{module}/{fname}"
        n_tok = int(rng.integers(20, 400))
        toks = rng.integers(0, _VOCAB_SIZE, size=n_tok)
        content = " ".join(vocab[t] for t in toks)
        repos.append(repo)
        paths.append(path)
        commits.append(pseudo_sha(repo, path, 0))
        langs.append(lang)
        contents.append(content)

    # plant near-duplicates: source rows in repo-00xx → twins in repo-01xx
    n_dups = int(n_rows * near_dup_frac)
    dup_src = rng.choice(n_rows, size=min(n_dups, n_rows), replace=False)
    for i in dup_src:
        src_repo_num = int(repos[i].split("-")[1])
        twin_repo = f"repo-{src_repo_num + 100:04d}"
        # path: ≤2 char edits on the filename stem
        p = list(paths[i])
        pos = int(rng.integers(4, max(5, len(p) - 4)))
        p[pos] = chr(ord("a") + int(rng.integers(0, 26)))
        twin_path = "".join(p)
        # content: ≤3 token replacements
        toks = contents[i].split(" ")
        for _ in range(int(rng.integers(1, 4))):
            toks[int(rng.integers(0, len(toks)))] = vocab[int(rng.integers(0, _VOCAB_SIZE))]
        repos.append(twin_repo)
        paths.append(twin_path)
        commits.append(pseudo_sha(twin_repo, twin_path, 0))
        langs.append(langs[i])
        contents.append(" ".join(toks))

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def golden_links(base: pa.Table) -> set[tuple[str, str]]:
    """The planted near-dup pairs as (source_uri, target_uri), where
    uri = repo + '//' + path and twins live in repo-(n+100)."""
    rows = base.to_pylist()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["repo"], []).append(r)
    links = set()
    index = {(r["repo"], r["path"]): r for r in rows}
    for r in rows:
        num = int(r["repo"].split("-")[1])
        if num < 100:
            continue
        src_repo = f"repo-{num - 100:04d}"
        # twin has same path length and ≥ path minus 2 edits; match on
        # (lang, near path) among source repo rows
        for cand in by_key.get(src_repo, []):
            if cand["lang"] != r["lang"]:
                continue
            if len(cand["path"]) == len(r["path"]):
                diff = sum(1 for a, b in zip(cand["path"], r["path"]) if a != b)
                if diff <= 2:
                    links.add((make_uri(cand["repo"], cand["path"]), make_uri(r["repo"], r["path"])))
    del index
    return links


def make_uri(repo: str, path: str) -> str:
    return f"{repo}//{path}"


# ---------------------------------------------------------------------------
# changelog (F2)
# ---------------------------------------------------------------------------

CHANGELOG_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("branch", pa.string()),  # schema-evolution column (null before the switch)
    ]
)


def make_changelog(
    base: pa.Table,
    n_events: int,
    seed: int = 43,
    dup_frac: float = 0.02,
    evolve_at: int | None = None,
    new_key_frac: float = 0.3,
) -> pa.Table:
    """Commit-ordered per-key event stream over (and beyond) the base table.

    Event mix ≈ 60% U / 30% I / 10% D (FIXTURES.md F2). Keys are drawn
    Zipf-hot. ``dup_frac`` of events are re-appended verbatim (same
    offset) to exercise idempotent apply. From ``evolve_at`` onwards,
    events carry a non-null ``branch`` column (schema evolution).
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    base_keys = list(zip(base["repo"].to_pylist(), base["path"].to_pylist()))
    base_lang = dict(zip(base_keys, base["lang"].to_pylist()))

    n_new = int(len(base_keys) * new_key_frac)
    new_keys = []
    for i in range(n_new):
        repo = f"repo-{int(rng.integers(0, 300)):04d}"
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        path = f"src/new_{i:05d}/{vocab[int(rng.integers(0, _VOCAB_SIZE))]}.{_EXT[lang]}"
        new_keys.append((repo, path))

    # key state machine: not-exists → I; exists → U (60) / D (10)
    all_keys = base_keys + new_keys
    exists = {k: True for k in base_keys}
    exists.update({k: False for k in new_keys})
    version = {k: 0 for k in all_keys}
    # current content per key so updates EDIT rather than regenerate —
    # preserves planted near-dup structure across U events
    cur_content: dict[tuple, str] = dict(zip(base_keys, base["content"].to_pylist()))

    # rank-zipfian key popularity (mild exponent; hot keys exist without
    # one key absorbing the whole stream)
    ranks = np.arange(1, len(all_keys) + 1, dtype=np.float64)
    key_weights = 1.0 / ranks**0.8
    rng.shuffle(key_weights)
    key_weights /= key_weights.sum()

    cols: dict[str, list] = {c: [] for c in ("offset", "op", "repo", "path", "commit", "lang", "content", "branch")}

    offset = 0
    picks = rng.choice(len(all_keys), size=n_events, p=key_weights)
    ops_roll = rng.random(n_events)
    for ev in range(n_events):
        k = all_keys[picks[ev]]
        repo, path = k
        if not exists[k]:
            op = "I"
        elif ops_roll[ev] < 0.85:
            op = "U"
        else:
            op = "D"
        evolved = evolve_at is not None and offset >= evolve_at
        if op == "D":
            exists[k] = False
            cur_content.pop(k, None)
            row = (offset, "D", repo, path, None, None, None, None)
        else:
            was_update = op == "U" and k in cur_content
            exists[k] = True
            version[k] += 1
            lang = base_lang.get(k) or LANGS[int(rng.integers(0, len(LANGS)))]
            if was_update:
                # edit: replace up to 3 tokens of the current content
                toks = cur_content[k].split(" ")
                for _ in range(int(rng.integers(1, 4))):
                    toks[int(rng.integers(0, len(toks)))] = vocab[int(rng.integers(0, _VOCAB_SIZE))]
                content = " ".join(toks)
            else:
                n_tok = int(rng.integers(20, 200))
                toks = rng.integers(0, _VOCAB_SIZE, size=n_tok)
                content = " ".join(vocab[t] for t in toks)
            cur_content[k] = content
            branch = f"branch-{int(rng.integers(0, 4))}" if evolved else None
            row = (offset, op, repo, path, pseudo_sha(repo, path, version[k]), lang, content, branch)
        for c, v in zip(cols, row):
            cols[c].append(v)
        offset += 1

    # inject duplicated events: re-append a sample verbatim (same offset)
    n_dup = int(n_events * dup_frac)
    if n_dup:
        dup_idx = rng.choice(n_events, size=n_dup, replace=False)
        for i in sorted(dup_idx):
            for c in cols:
                cols[c].append(cols[c][i])

    return pa.table(
        {
            "offset": pa.array(cols["offset"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "repo": pa.array(cols["repo"], pa.string()),
            "path": pa.array(cols["path"], pa.string()),
            "commit": pa.array(cols["commit"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "content": pa.array(cols["content"], pa.string()),
            "branch": pa.array(cols["branch"], pa.string()),
        }
    )


def assign_txns(
    changelog: pa.Table,
    seed: int = 7,
    mean_size: int = 4,
    untagged_frac: float = 0.1,
    big_txn: tuple[int, int] | None = None,
) -> pa.Table:
    """Add a binlog-shaped int64 ``txn`` column for the transaction-
    atomicity tests: unique offsets group into contiguous runs of
    ~geometric(1/mean_size) length, ``untagged_frac`` of groups carry
    null txn (singleton semantics), and ``big_txn=(start_rank, size)``
    overwrites that contiguous offset-rank range with one fresh id (a
    transaction larger than an epoch window — the grow path).
    Duplicate offsets (redelivered events) inherit their offset's id,
    as a real binlog redelivery would."""
    rng = np.random.default_rng(seed)
    offs = np.array(sorted(set(changelog["offset"].to_pylist())), dtype=np.int64)
    n = len(offs)
    sizes: list[int] = []
    total = 0
    while total < n:
        s = max(1, min(int(rng.geometric(1.0 / mean_size)), n - total))
        sizes.append(s)
        total += s
    ids = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    null_mask = np.repeat(rng.random(len(sizes)) < untagged_frac, sizes)
    if big_txn is not None:
        start, size = big_txn
        ids[start : start + size] = len(sizes) + 1
        null_mask[start : start + size] = False
    txn_of = dict(zip(offs.tolist(), ids.tolist()))
    null_of = dict(zip(offs.tolist(), null_mask.tolist()))
    vals = [
        None if null_of[o] else txn_of[o] for o in changelog["offset"].to_pylist()
    ]
    return changelog.append_column("txn", pa.array(vals, pa.int64()))


def interleave_changelogs(tables: dict[str, pa.Table], seed: int = 9) -> pa.Table:
    """Multiplex per-table changelogs into one global stream (the
    multi-table binlog shape cdc/demux.py consumes): each table's
    unique offsets map order-preservingly onto a seeded random
    interleaving of global slots — per-table LWW semantics unchanged —
    duplicate offsets follow their offset's slot, and a ``tbl`` column
    marks the route."""
    rng = np.random.default_rng(seed)
    names = sorted(tables)
    uniq = {n: sorted(set(tables[n]["offset"].to_pylist())) for n in names}
    labels = np.repeat(np.arange(len(names)), [len(uniq[n]) for n in names])
    rng.shuffle(labels)
    slot_of: dict[str, dict[int, int]] = {n: {} for n in names}
    counters = dict.fromkeys(names, 0)
    for slot, lab in enumerate(labels):
        n = names[lab]
        slot_of[n][uniq[n][counters[n]]] = slot
        counters[n] += 1
    parts = []
    for n in names:
        t = tables[n]
        new_off = pa.array([slot_of[n][o] for o in t["offset"].to_pylist()], pa.int64())
        t = t.set_column(t.schema.get_field_index("offset"), "offset", new_off)
        parts.append(t.append_column("tbl", pa.array([n] * t.num_rows, pa.string())))
    return pa.concat_tables(parts, promote_options="default")


def sequential_apply(changelog: pa.Table) -> dict[tuple[str, str], dict]:
    """Trivial single-threaded oracle for merge-apply (FIXTURES.md F5):
    dict of key → latest event, last-writer-wins by offset, D deletes;
    duplicate offsets (same offset seen again) are ignored."""
    state: dict[tuple[str, str], dict] = {}
    applied_offsets: set[int] = set()
    rows = changelog.sort_by("offset").to_pylist()
    for r in rows:
        if r["offset"] in applied_offsets:
            continue
        applied_offsets.add(r["offset"])
        k = (r["repo"], r["path"])
        if r["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = {
                "repo": r["repo"],
                "path": r["path"],
                "commit": r["commit"],
                "lang": r["lang"],
                "content": r["content"],
                "branch": r.get("branch"),
            }
    return state


def write_changelog_segments(changelog: pa.Table, out_dir: str, segment_size: int = 10_000) -> list[str]:
    """Write the changelog as offset-ordered Parquet segments (the
    'binlog' the engine tails). Returns segment paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    # sort_by's take concatenates chunks; >2 GiB of string content in a
    # column overflows int32 offsets — widen strings for the sort
    # (parquet round-trips large_string as plain BYTE_ARRAY)
    widened = pa.schema(
        [
            pa.field(f.name, pa.large_string()) if pa.types.is_string(f.type) else f
            for f in changelog.schema
        ]
    )
    ordered = changelog.cast(widened).sort_by("offset")
    paths = []
    for seg_no, start in enumerate(range(0, ordered.num_rows, segment_size)):
        seg = ordered.slice(start, segment_size)
        p = os.path.join(out_dir, f"segment-{seg_no:06d}.parquet")
        # store_schema=False drops the ARROW:schema metadata, so the
        # widened large_string columns round-trip as plain BYTE_ARRAY →
        # string on read (a cast-back of a slice trips Arrow's
        # whole-buffer size check instead of the slice's)
        pq.write_table(seg, p, store_schema=False)
        paths.append(p)
    return paths
