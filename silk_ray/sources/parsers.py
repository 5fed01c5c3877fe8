"""Parse-column workflow operators: a column holding a JSON/XML document
per row is parsed and exploded into child entities.

Reference: ``JsonParserOperator`` (JsonParserTask.scala:9-26 +
LocalJsonParserTaskExecutor.scala — read the document from ``inputPath``
or the first value, then behave like a JSON dataset over ``basePath``)
and ``XmlParserOperator`` (XmlParserTask.scala). The XSLT operator
(XSLTOperator.scala) is NOT ported — it needs a real XSLT processor,
which this environment does not ship.

Ray Data shape: plain ``map_batches`` stages — parsing is stateless and
per-row, entities explode 1→N rows. Scalar leaf fields become string
columns (the reference's entities are string-valued too); nested
objects/arrays are re-serialized as JSON strings so downstream
transforms can parse further levels with another pass.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _navigate(doc, parts: list[str]):
    """Walk ``basePath`` segments; lists fan out. Returns the selected
    node list (each a dict/scalar)."""
    nodes = [doc]
    for seg in parts:
        nxt = []
        for n in nodes:
            if isinstance(n, list):
                n = [c for c in n]
                for c in n:
                    if isinstance(c, dict) and seg in c:
                        nxt.append(c[seg])
            elif isinstance(n, dict) and seg in n:
                nxt.append(n[seg])
        nodes = nxt
    out = []
    for n in nodes:
        if isinstance(n, list):
            out.extend(n)
        else:
            out.append(n)
    return out


def _rows_from_nodes(nodes, parent) -> list[dict]:
    rows = []
    for node in nodes:
        if isinstance(node, dict):
            row = {}
            for k, v in node.items():
                if isinstance(v, (dict, list)):
                    row[k] = json.dumps(v, sort_keys=True)
                elif v is None:
                    row[k] = None
                elif isinstance(v, bool):
                    row[k] = "true" if v else "false"
                else:
                    row[k] = str(v)
        else:
            row = {"#text": None if node is None else str(node)}
        if parent is not None:
            row["_parent"] = parent
        rows.append(row)
    return rows


def _table_from_rows(rows: list[dict], with_parent: bool = True) -> pa.Table:
    names = sorted({k for r in rows for k in r})
    if not names:
        names = ["_parent"] if with_parent else ["#text"]
    return pa.table(
        {n: pa.array([r.get(n) for r in rows], pa.string()) for n in names}
    )


def parse_json_column(ds, input_col: str, base_path: str = "", parent_col: str | None = None):
    """JsonParserOperator: ``input_col`` holds one JSON document per row;
    ``base_path`` ('/Persons/Person') selects the entity nodes; one
    output row per node. With ``parent_col`` set, ``_parent`` carries
    that column for URI suffixing; without it the column is omitted —
    batch-local ordinals would collide across blocks and be
    block-size-dependent."""
    parts = [p for p in base_path.strip("/").split("/") if p]

    def parse(batch: pa.Table) -> pa.Table:
        docs = batch[input_col].to_pylist()
        parents = (
            [str(v) for v in batch[parent_col].to_pylist()] if parent_col else [None] * len(docs)
        )
        rows: list[dict] = []
        for doc_str, parent in zip(docs, parents):
            if not doc_str:
                continue
            try:
                doc = json.loads(doc_str)
            except json.JSONDecodeError:
                continue
            rows.extend(_rows_from_nodes(_navigate(doc, parts), parent))
        return _table_from_rows(rows, with_parent=parent_col is not None)

    return ds.map_batches(parse, batch_format="pyarrow")


def parse_xml_column(ds, input_col: str, base_path: str = "", parent_col: str | None = None):
    """XmlParserOperator: like :func:`parse_json_column` for XML —
    attributes become ``@``-prefixed columns, child-element text becomes
    columns, leaf text ``#text`` (same row shape as the XML source)."""
    parts = [p for p in base_path.strip("/").split("/") if p]

    def parse(batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        docs = batch[input_col].to_pylist()
        parents = (
            [str(v) for v in batch[parent_col].to_pylist()] if parent_col else [None] * len(docs)
        )
        rows: list[dict] = []
        for doc_str, parent in zip(docs, parents):
            if not doc_str:
                continue
            try:
                root = ET.fromstring(doc_str)
            except ET.ParseError:
                continue
            nodes = [root]
            for tag in parts[1:] if parts and root.tag == parts[0] else parts:
                nodes = [c for n in nodes for c in n if c.tag == tag]
            for node in nodes:
                row: dict = {} if parent is None else {"_parent": parent}
                for k, v in node.attrib.items():
                    row[f"@{k}"] = v
                for child in node:
                    if child.tag not in row:
                        row[child.tag] = (child.text or "").strip()
                if not list(node) and (node.text or "").strip():
                    row["#text"] = node.text.strip()
                rows.append(row)
        return _table_from_rows(rows, with_parent=parent_col is not None)

    return ds.map_batches(parse, batch_format="pyarrow")
