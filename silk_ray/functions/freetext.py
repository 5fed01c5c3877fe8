"""Free-text preprocessing extractors — the Ray Data re-expression of
the reference's standalone freetext tool
(``silk-tools/silk-freetext-preprocessing/.../extractor/*.scala``,
``transformer/*.scala``).

The reference tool streams entities from a SPARQL endpoint, trains
small in-memory models, and emits one extracted property per entity.
Here each extractor is a ``map_batches`` stage over a Dataset column;
trained vocabularies are collected once from the (small) training
column, shipped via ``ray.put`` and read per task — no shuffle.

| reference | here |
|---|---|
| BagOfWords (extractor/BagOfWords.scala:train/apply) | :func:`bag_of_words_extractor` — vocab = lowercase whitespace tokens of the training column; output = first token of the value found in the vocab |
| FeatureValuePairs (extractor/FeatureValuePairs.scala) | :func:`feature_value_pairs_extractor` — vocab = whole lowercase training values; output = the value when it is in the vocab |
| Regex (extractor/Regex.scala) | :func:`regex_extractor` — first regex match ("" when none) |
| Dictionary (extractor/Dictionary.scala) | :func:`dictionary_extractor` — attaches a resource file's content as a constant column |
| Tokenizer / Ngrams transformers | kernel ``tokenize`` / ``shingle`` transformers |
| Rounder (transformer/Rounder.scala) | :func:`round_numeric_strings` |
| Abbreviator | empty class in the reference (Abbreviator.scala) — nothing to port |
"""

from __future__ import annotations

import re

import pyarrow as pa

from silk_ray.kernel.distances import DistanceMeasure  # noqa: F401 (doc cross-ref)


def _collect_vocab(train_ds, train_col: str, tokenized: bool) -> set[str]:
    """Distinct lowercase training vocabulary (tokens or whole values).
    The training side is a dimension-sized column; the partial-distinct
    pass runs distributed, only the per-batch distinct sets reach the
    driver."""

    def distinct_batch(batch: pa.Table) -> pa.Table:
        vocab: set[str] = set()
        for v in batch[train_col].to_pylist():
            if v is None:
                continue
            if tokenized:
                vocab.update(str(v).lower().split())
            else:
                vocab.add(str(v).lower())
        return pa.table({"token": pa.array(sorted(vocab), pa.string())})

    out: set[str] = set()
    for b in train_ds.map_batches(distinct_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.update(b["token"].to_pylist())
    return out


def _vocab_extract(ds, col: str, out_col: str, vocab: set[str], tokenized: bool):
    import ray

    ref = ray.put(vocab)

    def fn(batch: pa.Table) -> pa.Table:
        v = ray.get(ref)
        out = []
        for val in batch[col].to_pylist():
            if val is None:
                out.append("")
                continue
            if tokenized:
                hit = next((t for t in str(val).split() if t.lower() in v), "")
            else:
                hit = str(val) if str(val).lower() in v else ""
            out.append(hit)
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def bag_of_words_extractor(ds, col: str, train_ds, train_col: str, out_col: str = "extracted"):
    """Train a token vocabulary on ``train_ds[train_col]``, then emit
    the first token of ``ds[col]`` present in the vocabulary
    (BagOfWords.scala:23-60)."""
    vocab = _collect_vocab(train_ds, train_col, tokenized=True)
    return _vocab_extract(ds, col, out_col, vocab, tokenized=True)


def feature_value_pairs_extractor(ds, col: str, train_ds, train_col: str, out_col: str = "extracted"):
    """Whole-value vocabulary membership (FeatureValuePairs.scala:16-63)."""
    vocab = _collect_vocab(train_ds, train_col, tokenized=False)
    return _vocab_extract(ds, col, out_col, vocab, tokenized=False)


def regex_extractor(ds, col: str, regex: str, out_col: str = "extracted"):
    """First regex match per value, "" when none (Regex.scala:14-40)."""
    pattern = re.compile(regex)

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for val in batch[col].to_pylist():
            m = pattern.search(val or "")
            out.append(m.group(0) if m else "")
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def dictionary_extractor(ds, path: str, out_col: str = "extracted"):
    """Attach a resource file's content as a constant column
    (Dictionary.scala:12-34 reads the whole dictionary file as the
    extracted value)."""
    with open(path, encoding="utf-8") as f:
        content = f.read()

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, pa.array([content] * batch.num_rows, pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def round_numeric_strings(ds, col: str, out_col: str | None = None):
    """Round numeric strings to ints (Rounder.scala:6-17); non-numeric
    values pass through unchanged."""
    num_re = re.compile(r"^[+-]?\d+(\.\d+)?$")
    target = out_col or col

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for val in batch[col].to_pylist():
            s = "" if val is None else str(val)
            out.append(str(round(float(s))) if num_re.match(s) else s)
        arr = pa.array(out, pa.string())
        if target in batch.column_names:
            return batch.set_column(batch.column_names.index(target), target, arr)
        return batch.append_column(target, arr)

    return ds.map_batches(fn, batch_format="pyarrow")
