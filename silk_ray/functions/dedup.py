"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

All expressed Ray-Data-first (ray_guide patterns): vectorized hash
computation in ``map_batches``, candidate generation via
``groupby(bucket)`` shuffles, pairwise verification only inside small
buckets — no driver-side O(n²).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text or "") if t]


def shingles(text: str, k: int = 3) -> set[str]:
    """Word k-shingles."""
    toks = _tokens(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    hashes = [
        hashlib.sha256((t or "").encode()).hexdigest() for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the smallest-id row per exact content hash:
    hash in map_batches → groupby(hash) → min-id row per group."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
    )

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return hashed.groupby("content_hash").map_groups(first_per_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """n_perm universal-hash MinHash signatures over word shingles;
    permutation parameters generated once per actor from a fixed seed."""

    def __init__(self, n_perm: int = 64, k_shingle: int = 3, seed: int = 1234, text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        # a, x < 2^32 so a*x + b < 2^64: exact in uint64, then mod p
        self.a = rng.integers(1, 1 << 32, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 32, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = k_shingle
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k)
        if not sh:
            return np.zeros(self.n_perm, dtype=np.uint64)
        base = np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64)
        # (n_perm, |sh|) fully vectorized universal hash, min per row
        hashed = (self.a[:, None] * base[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return hashed.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "minhash": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    bands: int = 16,
    k_shingle: int = 3,
    jaccard_threshold: float = 0.7,
    concurrency=(1, 8),
):
    """MinHash → band buckets → candidate pairs → shingle-Jaccard verify.

    Returns a Dataset ``(left_id, right_id, jaccard)`` with left < right.
    Classic shingle→minhash→band→bucket-groupby plan; verification
    re-reads only candidate docs' shingle sets (carried through the
    bucket shuffle as the signature + text hash, then verified with the
    true Jaccard over re-tokenized shingles carried per row).
    """
    rows_per_band = n_perm // bands

    class BandStage(MinHasher):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            texts = batch[text_col].to_pylist()
            out_band, out_bucket, out_id, out_text = [], [], [], []
            for i, t in zip(ids, texts):
                sig = self.signature(t)
                for band in range(bands):
                    chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                    bucket = zlib.crc32(chunk.tobytes())
                    out_band.append(band)
                    out_bucket.append((band << 32) | bucket)
                    out_id.append(i)
                    out_text.append(t)
            return pa.table(
                {
                    "bucket": pa.array(out_bucket, pa.int64()),
                    id_col: pa.array(out_id),
                    text_col: pa.array(out_text, pa.string()),
                }
            )

    banded = ds.map_batches(
        BandStage,
        fn_constructor_kwargs=dict(n_perm=n_perm, k_shingle=k_shingle, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        texts = group[text_col].to_pylist()
        seen = dict(zip(ids, texts))
        uniq = sorted(seen)
        # shingle sets computed once per doc, not once per pair
        sets = {i: shingles(seen[i], k_shingle) for i in uniq}
        ls, rs, js = [], [], []
        for x in range(len(uniq)):
            sx = sets[uniq[x]]
            for y in range(x + 1, len(uniq)):
                sy = sets[uniq[y]]
                inter = len(sx & sy)
                union = len(sx) + len(sy) - inter
                j = inter / union if union else 0.0
                if j >= jaccard_threshold:
                    ls.append(uniq[x])
                    rs.append(uniq[y])
                    js.append(j)
        return pa.table(
            {
                "left_id": pa.array(ls),
                "right_id": pa.array(rs),
                "jaccard": pa.array(js, pa.float64()),
            }
        )

    pairs = banded.groupby("bucket").map_groups(verify_bucket, batch_format="pyarrow")
    # same pair can match in several bands → dedup
    from ray.data.aggregate import Max

    return pairs.groupby(["left_id", "right_id"]).aggregate(Max("jaccard", alias_name="jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (weighted by term frequency)."""
    from collections import Counter

    counts = Counter(_tokens(text))
    if not counts:
        return 0
    hashes = np.array(
        [
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            for tok in counts
        ],
        dtype=np.uint64,
    )
    weights = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # (T, 64) bit matrix via unpackbits on the big-endian byte view
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1, bitorder="little")
    acc = ((2 * bits.astype(np.int64) - 1) * weights[:, None]).sum(axis=0)
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


class SimHashStage:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array([h - (1 << 63) for h in hashes], pa.int64()),
            }
        )


def simhash_near_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3, n_tables: int = 4):
    """Near-dup candidates by SimHash: split the 64-bit hash into
    ``n_tables`` 16-bit bands (pigeonhole: hamming ≤ 3 ⇒ one band equal),
    bucket-groupby per band, verify hamming distance in-bucket."""
    band_bits = 64 // n_tables

    class Bander(SimHashStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            base = super().__call__(batch)
            ids = base[id_col].to_pylist()
            hashes = [h + (1 << 63) for h in base["simhash"].to_pylist()]
            ob, oi, oh = [], [], []
            for i, h in zip(ids, hashes):
                for band in range(n_tables):
                    chunk = (h >> (band * band_bits)) & ((1 << band_bits) - 1)
                    ob.append((band << band_bits) | chunk)
                    oi.append(i)
                    oh.append(h - (1 << 63))
            return pa.table(
                {"bucket": pa.array(ob, pa.int64()), id_col: pa.array(oi), "simhash": pa.array(oh, pa.int64())}
            )

    banded = ds.map_batches(
        Bander,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def verify(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        hs = group["simhash"].to_pylist()
        uniq = sorted(set(zip(ids, hs)))
        ls, rs, ds_ = [], [], []
        for x in range(len(uniq)):
            for y in range(x + 1, len(uniq)):
                d = bin((uniq[x][1] ^ uniq[y][1]) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming and uniq[x][0] != uniq[y][0]:
                    ls.append(uniq[x][0])
                    rs.append(uniq[y][0])
                    ds_.append(d)
        return pa.table(
            {"left_id": pa.array(ls), "right_id": pa.array(rs), "hamming": pa.array(ds_, pa.int64())}
        )

    from ray.data.aggregate import Min

    pairs = banded.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["left_id", "right_id"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (exact, via prefix-filter blocking)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    threshold: float = 0.8,
):
    """Exact all-pairs n-gram Jaccard ≥ threshold via prefix filtering:
    each doc emits its ⌊n(1-t)⌋+1 smallest-hashed shingles as block keys
    (same guarantee as JaccardDistance.index, JaccardDistance.scala:41-47),
    pairs verified with true Jaccard in-bucket."""

    def emit_prefix(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        ob, oi, ot = [], [], []
        for i, t in zip(ids, texts):
            sh = sorted(shingles(t, k_shingle), key=lambda s: zlib.crc32(s.encode()))
            prefix_len = int(len(sh) * (1 - threshold)) + 1
            for s in sh[:prefix_len]:
                ob.append(zlib.crc32(s.encode()))
                oi.append(i)
                ot.append(t)
        return pa.table(
            {"bucket": pa.array(ob, pa.int64()), id_col: pa.array(oi), text_col: pa.array(ot, pa.string())}
        )

    blocked = ds.map_batches(emit_prefix, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        texts = group[text_col].to_pylist()
        seen = dict(zip(ids, texts))
        uniq = sorted(seen)
        sets = {i: shingles(seen[i], k_shingle) for i in uniq}
        ls, rs, js = [], [], []
        for x in range(len(uniq)):
            sx = sets[uniq[x]]
            for y in range(x + 1, len(uniq)):
                sy = sets[uniq[y]]
                inter = len(sx & sy)
                union = len(sx) + len(sy) - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    ls.append(uniq[x])
                    rs.append(uniq[y])
                    js.append(j)
        return pa.table(
            {"left_id": pa.array(ls), "right_id": pa.array(rs), "jaccard": pa.array(js, pa.float64())}
        )

    from ray.data.aggregate import Max

    pairs = blocked.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["left_id", "right_id"]).aggregate(Max("jaccard", alias_name="jaccard"))
