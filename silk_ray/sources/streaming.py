"""Streaming XML / JSON sources for files larger than worker memory.

Re-expression of the reference's pull-parser sources
(``silk-plugins/silk-plugins-xml/.../XmlSourceStreaming.scala:24-130``
StAX reader positioned on the entity path, one entity subtree
materialized at a time;
``silk-plugins/silk-plugins-json/.../JsonSourceStreaming.scala``
Jackson streaming parser with ``goToFirstEntity``/``goToNextEntity``
cursor walk): memory is bounded by ONE record (plus a fixed read
buffer), never the document.

Ray-Data shape: the unit of parallelism is the FILE (a dataset of
paths fanned out one read task per file via ``flat_map``-style
``map_batches``); WITHIN a file the parser is a generator that yields
Arrow batches of ``batch_size`` rows as it walks the stream, so the
streaming executor applies backpressure per batch — a 100 GB single
XML document flows through as a sequence of bounded tables instead of
one task holding a DOM. Row semantics are IDENTICAL to the in-memory
``xml`` / ``json`` readers on the same input (pinned by equivalence
tests), so pipelines can switch formats freely when a producer starts
emitting giant documents.

XML memory bound: ``ElementTree.iterparse`` with an element stack —
every completed entity row is ``clear()``-ed immediately and every
completed non-entity child is detached from its parent, so the live
tree is one root chain + the current record.

JSON memory bound: an incremental ``JSONDecoder.raw_decode`` loop
over a sliding text buffer. Accepts the three shapes real producers
emit: a top-level array of objects, newline-delimited objects
(NDJSON), and bare concatenated objects. The buffer holds one record
plus at most one read chunk.
"""

from __future__ import annotations

import json

import pyarrow as pa

_CHUNK = 1 << 20  # 1 MiB read granularity (both parsers)


# ---------------------------------------------------------------------------
# XML
# ---------------------------------------------------------------------------


def _xml_row(node, file_path: str, multi_valued: bool) -> dict:
    """One entity element -> one row; EXACTLY the in-memory _read_xml
    extraction (attributes as @name, child tags as text, #text
    fallback for leaf entities)."""
    row: dict = {"_file": file_path}
    for k, v in node.attrib.items():
        row[f"@{k}"] = v
    for child in node:
        text = (child.text or "").strip()
        if multi_valued:
            row.setdefault(child.tag, []).append(text)
        elif child.tag not in row:
            row[child.tag] = text
    if not list(node) and (node.text or "").strip():
        row["#text"] = node.text.strip()
    return row


def _rows_to_table(rows: list[dict], multi_valued: bool) -> pa.Table:
    names = sorted({k for r in rows for k in r}) or ["_file"]
    cols = {}
    for name in names:
        vals = [r.get(name) for r in rows]
        typ = (
            pa.list_(pa.string())
            if multi_valued and name not in ("_file", "#text") and not name.startswith("@")
            else pa.string()
        )
        cols[name] = pa.array(vals, typ)
    return pa.table(cols)


def iter_xml_records(path: str, base_path: str = "", multi_valued: bool = False):
    """Yield one row dict per entity element, holding at most one
    record subtree in memory (iterparse + aggressive detach)."""
    import xml.etree.ElementTree as ET

    parts = [p for p in base_path.strip("/").split("/") if p]
    tag_stack: list[str] = []
    elem_stack: list = []
    target: list[str] | None = None
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            if target is None:
                # resolve the absolute entity path at the root, exactly
                # like the DOM reader: a base_path starting with the
                # root tag is absolute, otherwise it is root-relative
                target = (
                    parts
                    if parts and elem.tag == parts[0]
                    else [elem.tag, *parts]
                    if parts
                    else [elem.tag]
                )
            tag_stack.append(elem.tag)
            elem_stack.append(elem)
            continue
        depth = len(tag_stack)
        if tag_stack == target:
            yield _xml_row(elem, path, multi_valued)
            elem.clear()
        tag_stack.pop()
        elem_stack.pop()
        if elem_stack and depth <= len(target):
            # detach completed subtrees at record depth or shallower —
            # the live tree stays one ancestor chain + the current
            # record. Deeper elements are left alone: they are INSIDE
            # a record (or a bounded non-target branch) still being
            # built, and detaching them would strip the record's
            # children before its end event fires.
            parent = elem_stack[-1]
            try:
                parent.remove(elem)
            except ValueError:
                pass


def read_xml_streaming(
    paths,
    columns=None,
    base_path: str = "",
    multi_valued: bool = False,
    batch_size: int = 4096,
    **kw,
):
    """Streaming XmlSource: dataset of file paths -> one read task per
    file -> generator of ``batch_size``-row Arrow tables."""
    import ray.data as rd

    files = _expand(paths)

    def parse(batch: pa.Table):
        for p in batch["path"].to_pylist():
            yield from iter_xml_batches(p, base_path, multi_valued, batch_size)

    ds = rd.from_items([{"path": p} for p in files]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )
    return ds.select_columns(columns) if columns else ds


def iter_xml_batches(
    path: str, base_path: str = "", multi_valued: bool = False, batch_size: int = 4096
):
    """The per-file generator behind read_xml_streaming: Arrow tables
    of at most ``batch_size`` rows, built incrementally — the parser's
    working set never exceeds one record + one pending batch. (Ray's
    block builder may coalesce these small tables into larger blocks
    up to the DataContext target block size; that is block SIZING, the
    parse-side memory bound lives here.)"""
    rows: list[dict] = []
    for row in iter_xml_records(path, base_path, multi_valued):
        rows.append(row)
        if len(rows) >= batch_size:
            yield _rows_to_table(rows, multi_valued)
            rows = []
    if rows:
        yield _rows_to_table(rows, multi_valued)


# ---------------------------------------------------------------------------
# JSON
# ---------------------------------------------------------------------------


def iter_json_records(path: str, chunk_size: int = _CHUNK):
    """Yield top-level JSON values one at a time from an array /
    NDJSON / concatenated-objects file, holding one value + one read
    chunk in memory."""
    dec = json.JSONDecoder()
    with open(path, encoding="utf-8") as f:
        buf, pos, eof = "", 0, False
        # EVERY top-level '[' opens a wrapper array whose elements are
        # the records (uniform rule: '[1,2]\n[3,4]' yields 1,2,3,4 —
        # concatenated / NDJSON top-level arrays are all flattened, not
        # just the first one)
        in_array = False
        grow = 1  # exponential refill factor while one value stays incomplete

        def refill() -> bool:
            # `grow` doubles on each consecutive incomplete decode of
            # the SAME value: every retry re-scans the value from its
            # start, so linear refills would make a record of R bytes
            # cost O(R²/chunk) — exponential growth bounds the retries
            # at O(log(R/chunk)) and the total scan at O(R)
            nonlocal buf, pos, eof
            more = f.read(chunk_size * grow)
            if not more:
                eof = True
                return False
            buf, pos = buf[pos:] + more, 0
            return True

        while True:
            if pos >= len(buf):
                if not refill():
                    return
            # skip inter-value syntax
            c = buf[pos]
            if c.isspace() or c == ",":
                pos += 1
                continue
            if c == "[" and not in_array:
                in_array = True
                pos += 1
                continue
            if c == "]" and in_array:
                pos += 1
                in_array = False  # a following '[' re-opens array mode
                continue
            try:
                val, end = dec.raw_decode(buf, pos)
            except ValueError:
                if not eof and refill():
                    grow = min(grow * 2, 4096)
                    continue
                if buf[pos:].strip():
                    raise ValueError(
                        f"truncated JSON value at end of {path!r}"
                    ) from None
                return
            if (
                not eof
                and isinstance(val, (bool, int, float))
                and all(ch in "0123456789.eE+-" for ch in buf[end:])
            ):
                # JSON numbers are not self-delimiting: a number whose
                # remaining buffer tail could still EXTEND it may be cut
                # by the chunk edge — "-100" split "-10|0" would decode
                # as TWO records (-10, 0), and "0.0" split "0.|0" stops
                # at "0" leaving ".". Whenever everything between the
                # value's end and the buffer edge is number-alphabet,
                # extend the buffer and re-decode before accepting.
                # (bools ride along via isinstance(True, int) — the
                # re-decode is merely a no-op refill for them.)
                refill()
                continue
            grow = 1
            yield val
            pos = end


def read_json_streaming(paths, columns=None, batch_size: int = 4096, **kw):
    """Streaming JsonSource: one read task per file, yielding
    ``batch_size``-row Arrow tables from an incremental parse."""
    import ray.data as rd

    files = _expand(paths)

    def parse(batch: pa.Table):
        for p in batch["path"].to_pylist():
            rows: list = []
            for val in iter_json_records(p):
                rows.append(val if isinstance(val, dict) else {"value": val})
                if len(rows) >= batch_size:
                    yield pa.Table.from_pylist(rows)
                    rows = []
            if rows:
                yield pa.Table.from_pylist(rows)

    ds = rd.from_items([{"path": p} for p in files]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )
    return ds.select_columns(columns) if columns else ds


def _expand(paths) -> list[str]:
    import os

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if not f.startswith((".", "_"))
            )
        else:
            out.append(p)
    return out
