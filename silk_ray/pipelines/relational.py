"""Relational building blocks over Ray Datasets: broadcast joins,
pre-aggregation, deterministic top-k.

Join strategy per ray_guide: the small side is materialized once,
shipped via ``ray.put`` and read in each task/actor — no shuffle. Both
stages pre-aggregate inside ``map_batches`` where possible so the
``groupby`` shuffle moves partial rows, not raw rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_semi_filter(ds, key_col: str, keys):
    """Semi-join: keep rows whose key is in the broadcast key set."""
    import ray

    ref = ray.put(np.asarray(sorted(keys)))

    def fn(batch: pa.Table) -> pa.Table:
        sorted_keys = ray.get(ref)
        vals = batch[key_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(sorted_keys, vals)
        idx[idx >= len(sorted_keys)] = len(sorted_keys) - 1 if len(sorted_keys) else 0
        mask = len(sorted_keys) > 0 and sorted_keys[idx] == vals
        return batch.filter(pa.array(mask if isinstance(mask, np.ndarray) else [False] * batch.num_rows))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_anti_filter(ds, key_col: str, keys):
    """Anti-join: drop rows whose key is in the broadcast key set (the
    complement of :func:`broadcast_semi_filter`, same sorted-array
    membership kernel)."""
    import ray

    ref = ray.put(np.asarray(sorted(keys)))

    def fn(batch: pa.Table) -> pa.Table:
        sorted_keys = ray.get(ref)
        if len(sorted_keys) == 0:
            return batch
        vals = batch[key_col].to_numpy(zero_copy_only=False)
        hit, _ = lookup_sorted(sorted_keys, sorted_keys, vals)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_lookup(ds, key_col: str, mapping: dict, out_col: str, drop_missing: bool = True):
    """Dimension join: map key → value via a broadcast dict (pandas map)."""
    import ray

    ref = ray.put(mapping)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        df[out_col] = df[key_col].map(m)
        if drop_missing:
            df = df[df[out_col].notna()]
        return df

    return ds.map_batches(fn, batch_format="pandas")


def lookup_sorted(sorted_keys, sorted_vals, vals):
    """Vectorized membership + value lookup of ``vals`` against aligned
    ``(sorted_keys, sorted_vals)`` arrays. Returns ``(hit mask, values
    at the matched positions)`` — positions for misses are arbitrary, so
    gate every use on the mask."""
    if len(sorted_keys) == 0:
        return np.zeros(len(vals), dtype=bool), np.empty(len(vals), dtype=object)
    idx = np.clip(np.searchsorted(sorted_keys, vals), 0, len(sorted_keys) - 1)
    return sorted_keys[idx] == vals, sorted_vals[idx]


def broadcast_lookup_sorted(ds, key_col: str, keys, values, out_col: str, drop_missing: bool = True):
    """Dimension join via broadcast sorted arrays + vectorized
    ``np.searchsorted`` — same shape as :func:`broadcast_lookup` but
    ships two numpy arrays instead of a Python dict (hash-free lookup,
    ~10x smaller serialized payload for large dimensions)."""
    import ray

    keys = np.asarray(keys)
    order = np.argsort(keys)
    ref = ray.put((keys[order], np.asarray(values, dtype=object)[order]))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        sorted_keys, sorted_vals = ray.get(ref)
        hit, looked = lookup_sorted(sorted_keys, sorted_vals, df[key_col].to_numpy())
        out = np.full(len(df), None, dtype=object)
        out[hit] = looked[hit]
        df[out_col] = out
        if drop_missing:
            df = df[hit]
        return df

    return ds.map_batches(fn, batch_format="pandas")


def _key_hash(arr) -> np.ndarray:
    """FULL-RANGE int64 key hash for an Arrow array — the exchange key
    every keyed machinery here sorts on. Full-range (not ``hash % P``)
    keeps the range-sort boundaries high-cardinality: duplicate
    boundaries are what create EMPTY range partitions, which Ray's
    sort builds schema-less and which degrade the stream schema
    ("RefBundle with a different schema" warnings). Integers get a
    splitmix-style uint64 mix; strings hash once per DISTINCT value
    (dictionary-encode, crc32 per unique, numpy take — the
    cdc/merge._crc_keys idiom)."""
    import zlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        enc = arr.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        if not uniq:
            return np.empty(0, np.int64)
        crc_u = np.fromiter(
            (zlib.crc32(str(v).encode()) for v in uniq), np.int64, len(uniq)
        )
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return crc_u[idx]
    a = arr.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    h = a * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(31)
    return h.view(np.int64)


def shuffle_lookup(ds, key_col: str, dim, dim_key: str, dim_val: str, out_col: str, num_partitions: int = 64):
    """Hash-shuffle dimension join (inner): attach ``dim_val`` as
    ``out_col`` to every ``ds`` row whose key matches a ``dim`` row;
    unmatched rows drop. The scale path when the dimension exceeds the
    broadcast gate — both sides shuffle only their needed columns, and
    each partition joins with a vectorized sorted lookup. Dimension keys
    are assumed unique (a duplicate keeps one arbitrary value — fine for
    key-unique dimensions and for semi-join use)."""
    import pyarrow.compute as pc  # noqa: F401

    base = ds.schema().base_schema
    if out_col in base.names:
        raise ValueError(f"out_col {out_col!r} already exists")
    val_type = dim.schema().base_schema.field(dim_val).type
    key_type = base.field(key_col).type
    fact_names = list(base.names)

    def tag_fact(b: pa.Table) -> pa.Table:
        cols = {f.name: b[f.name] for f in base}
        cols[out_col] = pa.nulls(b.num_rows, val_type)
        cols["_dside"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["_dpart"] = pa.array(_key_hash(b[key_col]), pa.int64())
        return pa.table(cols)

    def tag_dim(b: pa.Table) -> pa.Table:
        keys = b[dim_key].cast(key_type)
        cols = {}
        for f in base:
            cols[f.name] = keys if f.name == key_col else pa.nulls(b.num_rows, f.type)
        cols[out_col] = b[dim_val]
        cols["_dside"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["_dpart"] = pa.array(_key_hash(keys), pa.int64())
        return pa.table(cols)

    tagged = ds.map_batches(tag_fact, batch_format="pyarrow").union(
        dim.map_batches(tag_dim, batch_format="pyarrow")
    )

    out_schema = pa.schema(list(base) + [pa.field(out_col, val_type)])

    def join_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g["_dside"].to_numpy(zero_copy_only=False)
        dim_rows = np.flatnonzero(side == 0)
        fact_rows = np.flatnonzero(side == 1)
        if dim_rows.size == 0 or fact_rows.size == 0:
            return out_schema.empty_table()
        dsub = g.take(pa.array(dim_rows))
        keys = dsub[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        svals = dsub[out_col].to_numpy(zero_copy_only=False)[order]
        fsub = g.take(pa.array(fact_rows))
        hit, vals = lookup_sorted(skeys, svals, fsub[key_col].to_numpy(zero_copy_only=False))
        fsub = fsub.filter(pa.array(hit))
        cols = {c: fsub[c] for c in fact_names}
        cols[out_col] = pa.array(list(vals[hit]), val_type)
        return pa.table(cols)

    return tagged.sort("_dpart").map_batches(
        join_group, batch_format="pyarrow", batch_size=None
    )


def shuffle_semi_filter(ds, key_col: str, keys_ds, keys_col: str, num_partitions: int = 64):
    """Hash-shuffle semi-join: keep ``ds`` rows whose key appears in
    ``keys_ds`` — the fallback when the key side is too big for
    :func:`broadcast_semi_filter`'s driver-side set."""

    def keys_only(b: pa.Table) -> pa.Table:
        return pa.table({keys_col: b[keys_col], "_one": pa.array(np.ones(b.num_rows, np.int8))})

    out = shuffle_lookup(
        ds,
        key_col,
        keys_ds.map_batches(keys_only, batch_format="pyarrow"),
        keys_col,
        "_one",
        "__semi_hit",
        num_partitions=num_partitions,
    )
    return out.drop_columns(["__semi_hit"])


def shuffle_anti_filter(ds, key_col: str, keys_ds, keys_col: str, num_partitions: int = 64):
    """Hash-shuffle anti-join: drop ``ds`` rows whose key appears in
    ``keys_ds`` — the scale fallback when the drop set exceeds
    :func:`broadcast_anti_filter`'s driver-side array (e.g. the
    non-representative members of duplicate clusters at corpus scale).
    Same tagged-union plan as :func:`shuffle_lookup`, but the partition
    join KEEPS the misses and drops the hits (an inner join cannot
    express this, hence the dedicated group kernel)."""
    base = ds.schema().base_schema
    key_type = base.field(key_col).type
    fact_names = list(base.names)

    def tag_fact(b: pa.Table) -> pa.Table:
        cols = {f.name: b[f.name] for f in base}
        cols["_dside"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["_dpart"] = pa.array(_key_hash(b[key_col]), pa.int64())
        return pa.table(cols)

    def tag_dim(b: pa.Table) -> pa.Table:
        keys = b[keys_col].cast(key_type)
        cols = {}
        for f in base:
            cols[f.name] = keys if f.name == key_col else pa.nulls(b.num_rows, f.type)
        cols["_dside"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["_dpart"] = pa.array(_key_hash(keys), pa.int64())
        return pa.table(cols)

    tagged = ds.map_batches(tag_fact, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_dim, batch_format="pyarrow")
    )

    def join_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return base.empty_table()
        side = g["_dside"].to_numpy(zero_copy_only=False)
        fact_rows = np.flatnonzero(side == 1)
        fsub = g.take(pa.array(fact_rows)).select(fact_names)
        dim_rows = np.flatnonzero(side == 0)
        if dim_rows.size == 0 or fact_rows.size == 0:
            return fsub
        skeys = np.sort(g.take(pa.array(dim_rows))[key_col].to_numpy(zero_copy_only=False))
        hit, _ = lookup_sorted(skeys, skeys, fsub[key_col].to_numpy(zero_copy_only=False))
        return fsub.filter(pa.array(~hit))

    return tagged.sort("_dpart").map_batches(
        join_group, batch_format="pyarrow", batch_size=None
    )


def grouped_apply(ds, key_col: str, fn, num_partitions: int = 64, coalesce: int | None = None):
    """Hash-partitioned grouped apply: range-sort on the full-range key
    hash, then a vectorized pandas ``groupby`` inside each sorted block
    — avoids Ray's per-group map_groups overhead when there are many
    small groups (same trick as the linking scorer).

    ``fn`` receives a pandas DataFrame of ONE key group and returns a
    DataFrame (the classic map_groups contract).

    The exchange: tag each row with a FULL-RANGE int64 key hash, range
    ``sort`` on it, then one ``map_batches(batch_size=None)`` call per
    sorted block running a pandas groupby over the real key. Equal
    hashes land in one block (Ray's sort keeps equal keys together —
    the same guarantee map_groups relies on), so every key group
    arrives whole. Full-range (not ``hash % P``) keeps the sort
    boundaries high-cardinality: duplicate boundaries are what create
    EMPTY range partitions, which Ray's sort builds schema-less and
    which degrade the stream schema ("RefBundle with a different
    schema" warnings). ``num_partitions`` is kept for signature
    stability; the sort's own block count drives parallelism.

    ``coalesce``: pre-exchange repartition to this many blocks. Pass it
    (usually 1) when the tagged stream is provably SMALL and the key is
    LOW-cardinality (a local pre-aggregation already pruned it, e.g.
    top-k per language): with fewer distinct keys than blocks the sort
    would still sample duplicate boundaries; a single pre-coalesced
    block sidesteps the range split entirely."""
    import zlib

    # typed empty OUTPUT frame, computed once driver-side by running fn
    # on a correctly-typed empty input: an empty block must emit this
    # (not a column-less frame, which loses dtypes through the pandas
    # concat path and degrades the stream schema)
    empty_in = ds.schema().base_schema.empty_table().to_pandas()
    try:
        empty_out = fn(empty_in)
    except Exception:
        # fn not empty-safe: empty partitions re-raise at runtime (the
        # legacy contract; such callers evidently never hit them)
        empty_out = None

    def _on_empty() -> pd.DataFrame:
        return empty_out.copy() if empty_out is not None else fn(empty_in.copy())

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        col = df[key_col]
        if col.dtype == object:
            # hash once per DISTINCT key, broadcast via take (the
            # _crc_keys dictionary-encode idiom — grouped keys repeat
            # within every batch, so uniques << rows)
            codes, uniques = pd.factorize(col, use_na_sentinel=False)
            crc_u = np.fromiter(
                (zlib.crc32(str(v).encode()) for v in uniques),
                dtype=np.int64,
                count=len(uniques),
            )
            df["__part"] = crc_u[codes]
        else:
            # splitmix-style int mix in uint64, viewed back as int64
            h = col.to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
            df["__part"] = h.view(np.int64)
        return df

    def apply_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.shape[1] == 0 or part.empty:
            return _on_empty()
        part = part.drop(columns="__part")
        outs = [fn(g) for _, g in part.groupby(key_col, sort=True)]
        return pd.concat(outs, ignore_index=True) if outs else _on_empty()

    tagged = ds.map_batches(add_part, batch_format="pandas")
    if coalesce:
        tagged = tagged.repartition(coalesce)
    return tagged.sort("__part").map_batches(
        apply_part, batch_format="pandas", batch_size=None
    )


def _union_sides(left, right, by: str, on: str, value_cols: dict[str, str]):
    """Tag and union both join sides under one explicit unified Arrow
    schema (left types win for shared names; right-only value columns
    keep their own type; padding is typed nulls, so the union never
    sees null-type vs typed-column conflicts). A self-join (``right is
    left``) tags both sides from ONE scan instead of re-running the
    shared lineage twice. Returns ``(unioned, left_cols, unified)``."""
    left_schema = left.schema().base_schema
    right_schema = right.schema().base_schema if right is not left else left_schema
    left_cols = list(left_schema.names)
    right_keep = [by, on] + sorted(set(value_cols) - {by, on})
    fields = list(left_schema)
    for c in right_keep:
        if c not in left_cols:
            fields.append(right_schema.field(c))
    unified = pa.schema(fields + [pa.field("_side", pa.int8())])

    def retype(batch: pa.Table, side: int) -> pa.Table:
        keep = set(left_cols) if side == 0 else set(right_keep)
        cols = {}
        for f in unified:
            if f.name == "_side":
                cols[f.name] = pa.nulls(batch.num_rows, pa.int8()).fill_null(side)
            elif f.name in keep and f.name in batch.column_names:
                col = batch[f.name]
                cols[f.name] = col if col.type == f.type else col.cast(f.type)
            else:
                cols[f.name] = pa.nulls(batch.num_rows, f.type)
        return pa.table(cols)

    if right is left:
        unioned = left.map_batches(
            lambda b: pa.concat_tables([retype(b, 0), retype(b, 1)]),
            batch_format="pyarrow",
        )
    else:
        unioned = left.map_batches(
            lambda b: retype(b, 0), batch_format="pyarrow"
        ).union(right.map_batches(lambda b: retype(b, 1), batch_format="pyarrow"))
    return unioned, left_cols, unified


def _keyed_merge_join(left, right, by, on, value_cols, num_partitions, emit):
    """Shared machinery of :func:`asof_join` / :func:`range_join` —
    Arrow-native throughout (typed-null padding never passes through a
    pandas conversion, so integer value columns stay exact int64):

    1. tag + union both sides under one unified schema;
    2. hash-co-partition on ``by`` (one coarse ``groupby("__part")``
       shuffle, many keys per partition — same shape as
       :func:`grouped_apply`);
    3. per partition: ONE sort by ``(by, _side, on, value srcs)`` (the
       trailing value columns make tie-breaking among equal ``on``
       rows deterministic regardless of shuffle arrival order), then a
       per-key vectorized merge: ``emit(l_on, r_on)`` returns the
       matched (left, right) local index arrays from two binary
       searches, and the output is built by two ``take`` calls."""
    import pyarrow.compute as pc

    unioned, left_cols, unified = _union_sides(left, right, by, on, value_cols)
    out_schema = pa.schema(
        [unified.field(c) for c in left_cols]
        + [pa.field(dst, unified.field(src).type) for src, dst in value_cols.items()]
    )
    tie_cols = [c for c in sorted(set(value_cols)) if c not in (by, on)]

    def add_part(batch: pa.Table) -> pa.Table:
        # SQL join semantics: a null key or null ordering value never
        # matches anything — drop those rows instead of letting the
        # segment scan group null-keyed rows together
        mask = pc.and_(pc.is_valid(batch[by]), pc.is_valid(batch[on]))
        if not pc.min(mask).as_py():
            batch = batch.filter(mask)
        return batch.append_column(
            "__part", pa.array(_key_hash(batch[by]), pa.int64())
        )

    def apply_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        part = part.drop_columns(["__part"])
        order = pc.sort_indices(
            part,
            sort_keys=[(by, "ascending"), ("_side", "ascending"), (on, "ascending")]
            + [(c, "ascending") for c in tie_cols],
        )
        part = part.take(order).combine_chunks()
        by_np = part[by].to_numpy(zero_copy_only=False)
        side_np = part["_side"].to_numpy()
        on_np = part[on].to_numpy(zero_copy_only=False)
        changes = np.nonzero(by_np[1:] != by_np[:-1])[0] + 1
        starts = np.concatenate(([0], changes, [len(by_np)]))
        l_takes, r_takes = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            mid = s + int(np.searchsorted(side_np[s:e], 1, side="left"))
            if mid == s or mid == e:  # one side empty for this key
                continue
            li, ri = emit(on_np[s:mid], on_np[mid:e])
            if len(li):
                l_takes.append(li + s)
                r_takes.append(ri + mid)
        if not l_takes:
            return out_schema.empty_table()
        lt = part.take(pa.array(np.concatenate(l_takes)))
        rt = part.take(pa.array(np.concatenate(r_takes)))
        cols = {c: lt[c] for c in left_cols}
        for src, dst in value_cols.items():
            cols[dst] = rt[src]
        return pa.table(cols)

    return (
        unioned.map_batches(add_part, batch_format="pyarrow")
        .sort("__part")
        .map_batches(apply_part, batch_format="pyarrow", batch_size=None)
    )


def asof_join(
    left,
    right,
    by: str,
    on: str,
    value_cols: dict[str, str],
    strict: bool = True,
    num_partitions: int = 64,
):
    """Backward as-of join (inner): each left row is matched to the
    single right row with the greatest ``on`` value at-or-before
    (``strict``: strictly before) the left row's ``on``, within the
    same ``by`` key. ``value_cols`` maps right column → output name.
    Left rows with no predecessor are dropped (inner semantics, so
    output types stay non-null). Ties among right rows with equal
    ``on`` are broken deterministically by the value columns' sort
    order.

    Partitioning: both sides are hash-co-partitioned on ``by`` (the
    same coarse shuffle key every other keyed op uses); the per-key
    merge is sort + ``np.searchsorted`` — O((n+m) log (n+m)) per key,
    no per-pair work. Assumption: one ``by``-key group fits a single
    task (same as grouped_apply); salt hot keys upstream if a single
    key's rows exceed a task's memory."""
    return _keyed_merge_join(
        left, right, by, on, value_cols, num_partitions, _asof_emit(strict)
    )


def _asof_emit(strict: bool):
    """Per-key as-of match kernel on sorted ``on`` arrays: local (left,
    right) index pairs of each left row's latest predecessor."""
    side = "left" if strict else "right"

    def emit(l_on: np.ndarray, r_on: np.ndarray):
        idx = np.searchsorted(r_on, l_on, side=side) - 1
        hit = np.nonzero(idx >= 0)[0]
        return hit, idx[hit]

    return emit


def range_join(
    left,
    right,
    by: str,
    on: str,
    lo,
    hi,
    value_cols: dict[str, str],
    num_partitions: int = 64,
):
    """Banded non-equi join (inner): each left row matched to EVERY
    right row of the same ``by`` key whose ``on`` lies in
    ``[left.on + lo, left.on + hi)`` (half-open; ``lo``/``hi`` may be
    negative, e.g. ``lo=-Timedelta('30m'), hi=Timedelta(0)`` = the
    preceding 30-minute window). Emits one row per matched pair:
    left columns + ``value_cols`` (right column → output name).

    Partitioning: both sides hash-co-partitioned on ``by``; per key
    the right side is sorted once and each left row's band is found
    with two binary searches, pairs materialized by vectorized repeat
    — O((n+m) log (n+m) + pairs) per key, never O(n·m) probing.
    Assumptions: one ``by``-key group fits a task, and the band is
    selective enough that ``pairs`` per key fits a task's memory (cap
    the band upstream for hot keys)."""
    if not (lo <= hi):
        raise ValueError(f"range_join requires lo <= hi, got lo={lo!r} hi={hi!r}")
    return _keyed_merge_join(
        left, right, by, on, value_cols, num_partitions, _range_emit(lo, hi)
    )


def _range_emit(lo, hi):
    """Per-key band-match kernel on sorted ``on`` arrays: local (left,
    right) index pairs for every right row in ``[l+lo, l+hi)``."""

    def emit(l_on: np.ndarray, r_on: np.ndarray):
        lo_idx = np.searchsorted(r_on, l_on + lo, side="left")
        hi_idx = np.searchsorted(r_on, l_on + hi, side="left")
        counts = np.maximum(hi_idx - lo_idx, 0)
        total = int(counts.sum())
        left_take = np.repeat(np.arange(len(l_on)), counts)
        offsets = np.repeat(np.cumsum(counts) - counts, counts)
        right_take = np.repeat(lo_idx, counts) + (np.arange(total) - offsets)
        return left_take, right_take

    return emit


def round_columns(ds, cols: dict[str, int]):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        for c, nd in cols.items():
            df[c] = df[c].round(nd)
        return df

    return ds.map_batches(fn, batch_format="pandas")
