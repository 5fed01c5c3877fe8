"""RDF file dataset — N-Triples / N-Quads source, N-Triples sinks.

Re-expresses the reference's ``RdfFileDataset``
(``silk-plugins/silk-plugins-rdf/.../datasets/RdfFileDataset.scala:24-121``)
Ray-Data-first. The reference loads the file into an in-memory Jena
model and retrieves entities via SPARQL per property path; here the
triples themselves are a streaming Dataset (the ``TripleEntityTable``
analogue, ``silk-core/.../execution/local/TripleEntityTable.scala``)
and entity retrieval is a ``groupby(subject)`` pivot — distributed,
never driver-side.

Like the reference, N-Triples is the only *written* format
(``RdfFileDataset.scala:64-71``); reads accept N-Triples and N-Quads.
Turtle/RDF-XML need a real RDF parser stack (Jena in the reference) —
not available in this container, rejected loudly.

Triple schema: ``subject, predicate, object, kind('uri'|'literal'|
'blank'), lang, datatype[, graph]`` — lexical forms unescaped, the
``RdfNode`` sum type (``RdfFormatUtil.scala:47-66``) flattened to a
kind column.
"""

from __future__ import annotations

import os
import re
import uuid

import pyarrow as pa
import pyarrow.compute as pc

# one RE2-compatible pattern for a whole statement: subject, predicate,
# object (uri / blank / literal with optional lang or datatype tag),
# optional graph term (N-Quads)
_STATEMENT_RE = (
    r'^\s*(?P<subject><[^>]*>|_:\S+)'
    r'\s+<(?P<predicate>[^>]*)>'
    r'\s+(?P<object><[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)'
    r'(?:\s+(?P<graph><[^>]*>))?'
    r'\s*\.\s*$'
)
_LITERAL_RE = (
    r'^"(?P<lex>(?:[^"\\]|\\.)*)"'
    r'(?:@(?P<lang>[A-Za-z][A-Za-z0-9-]*))?'
    r'(?:\^\^<(?P<datatype>[^>]*)>)?$'
)

_UNESCAPE = {
    "\\t": "\t", "\\b": "\b", "\\n": "\n", "\\r": "\r", "\\f": "\f",
    "\\\"": '"', "\\'": "'", "\\\\": "\\",
}
_UNESCAPE_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})|\\[tbnrf\"'\\]")


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        g = m.group(0)
        if g in _UNESCAPE:
            return _UNESCAPE[g]
        return chr(int(m.group(1) or m.group(2), 16))

    return _UNESCAPE_RE.sub(sub, s)


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )


def _strip_angle(arr: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(arr, r"^<|>$", "")


def _empty_to_null(arr: pa.Array) -> pa.Array:
    """extract_regex yields '' for non-participating optional groups —
    normalize to null."""
    return pc.if_else(
        pc.equal(pc.fill_null(arr, ""), ""), pa.scalar(None, pa.string()), arr
    )


def parse_ntriples_batch(batch: pa.Table) -> pa.Table:
    """Vectorized N-Triples/N-Quads line parse: one ``extract_regex``
    for the statement, one for literal decomposition; Python unescape
    only on the (rare) literal rows containing a backslash."""
    lines = batch["text"].combine_chunks() if "text" in batch.column_names else batch[0]
    st = pc.extract_regex(lines, _STATEMENT_RE)
    # comments / blank lines / malformed fall out as nulls
    valid = pc.is_valid(st)
    st = pc.drop_null(st)
    bad = pc.filter(lines, pc.and_(pc.invert(valid), pc.invert(
        pc.match_substring_regex(lines, r"^\s*(#|$)"))))
    if len(bad):
        raise ValueError(f"unparseable N-Triples line: {bad[0].as_py()!r}")

    subj_raw = pc.struct_field(st, "subject")
    subj_is_uri = pc.starts_with(subj_raw, "<")
    subject = pc.if_else(subj_is_uri, _strip_angle(subj_raw), subj_raw)

    obj_raw = pc.struct_field(st, "object")
    obj_is_uri = pc.starts_with(obj_raw, "<")
    obj_is_blank = pc.starts_with(obj_raw, "_:")
    kind = pc.if_else(
        obj_is_uri, pa.scalar("uri"),
        pc.if_else(obj_is_blank, pa.scalar("blank"), pa.scalar("literal")),
    )
    lit = pc.extract_regex(obj_raw, _LITERAL_RE)  # null for uri/blank rows
    lex = pc.struct_field(lit, "lex")
    has_esc = pc.fill_null(pc.match_substring(lex, "\\"), False)
    if pc.any(has_esc).as_py():
        py = lex.to_pylist()
        lex = pa.array(
            [(_unescape(v) if (v is not None and e) else v) for v, e in zip(py, has_esc.to_pylist())],
            pa.string(),
        )
    obj = pc.if_else(obj_is_uri, _strip_angle(obj_raw), pc.if_else(obj_is_blank, obj_raw, lex))

    cols = {
        "subject": subject,
        "predicate": pc.struct_field(st, "predicate"),
        "object": obj,
        "kind": kind,
        "lang": _empty_to_null(pc.struct_field(lit, "lang")),
        "datatype": _empty_to_null(pc.struct_field(lit, "datatype")),
    }
    # always present (null for triples / default-graph quads) so block
    # schemas agree across mixed .nt/.nq inputs
    cols["graph"] = _empty_to_null(_strip_angle(pc.struct_field(st, "graph")))
    return pa.table(cols)


def read_ntriples(paths, columns=None, graph: str | None = None, format: str = "", **kw):
    """Triple-table read (TripleEntityTable analogue). ``graph``
    restricts an N-Quads file to one named graph
    (``RdfFileDataset.scala:40,95-101``)."""
    import ray.data as rd

    if format and format.lower() not in ("n-triples", "ntriples", "nt", "n-quads", "nquads", "nq"):
        raise ValueError(
            f"unsupported RDF format {format!r}: only N-Triples/N-Quads "
            "can be parsed without an RDF parser stack (reference uses Jena)"
        )
    ds = rd.read_text(paths, **kw).map_batches(parse_ntriples_batch, batch_format="pyarrow")
    if graph:
        ds = ds.filter(expr=f'graph == "{graph}"')
    return ds.select_columns(columns) if columns else ds


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def entities_from_triples(triples, paths=None, type_uri: str | None = None):
    """EntityRetriever analogue: pivot the triple stream into the
    entity table (``uri`` + one ``list<string>`` column per property
    path, the Entity multi-value model, ``Entity.scala:36-41``).

    ``paths=None`` discovers the predicate set first (predicates are a
    tiny vocabulary — a driver-side distinct is safe at any corpus
    size). ``type_uri`` keeps only subjects with a matching ``rdf:type``
    triple (SparqlRestriction's common case). One groupby(subject)
    shuffle — values co-locate by entity, nothing else moves."""
    if paths is None:
        pred_ds = triples.select_columns(["predicate"]).unique("predicate")
        paths = sorted(p for p in pred_ds if p != RDF_TYPE)

    path_list = list(paths)
    schema = pa.schema(
        [pa.field("uri", pa.string())]
        + [pa.field(p, pa.list_(pa.string())) for p in path_list]
    )

    def pivot(group: pa.Table) -> pa.Table:
        preds = group["predicate"].to_pylist()
        objs = group["object"].to_pylist()
        if type_uri is not None and not any(
            p == RDF_TYPE and o == type_uri for p, o in zip(preds, objs)
        ):
            return schema.empty_table()
        row: dict[str, list[str]] = {p: [] for p in path_list}
        for p, o in zip(preds, objs):
            if p in row:
                row[p].append(o)
        arrays = [pa.array([group["subject"][0].as_py()], pa.string())] + [
            pa.array([row[p]], pa.list_(pa.string())) for p in path_list
        ]
        return pa.Table.from_arrays(arrays, schema=schema)

    return triples.groupby("subject").map_groups(pivot, batch_format="pyarrow")


def format_literal_statement(subject: str, predicate: str, value: str) -> str:
    """``NTriplesLinkFormatter.formatLiteralStatement``
    (``formatters/NTriplesLinkFormatter.scala:27-29``)."""
    return f'<{subject}> <{predicate}> "{_escape(value)}" .\n'


def format_link(source: str, target: str, predicate: str) -> str:
    """``NTriplesLinkFormatter.formatLink``
    (``formatters/NTriplesLinkFormatter.scala:23-25``)."""
    return f"<{source}> <{predicate}> <{target}> .\n"


def write_ntriples(
    ds,
    path: str,
    subject_col: str = "uri",
    uri_cols: set[str] | None = None,
    predicates: dict[str, str] | None = None,
):
    """FormattedEntitySink analogue (``FormattedEntitySink.scala``):
    every non-subject column becomes triples (multi-valued lists fan
    out). ``uri_cols`` are written as resources, everything else as
    escaped plain literals (the reference decides by ValueType; the
    flat-table analogue is per-column). Directory-of-parts layout —
    resumable, never one giant file."""
    uri_set = uri_cols or set()
    pred_map = predicates or {}
    os.makedirs(path, exist_ok=True)

    def write_part(batch: pa.Table) -> pa.Table:
        out: list[str] = []
        value_cols = [c for c in batch.column_names if c != subject_col]
        subs = batch[subject_col].to_pylist()
        cols = {c: batch[c].to_pylist() for c in value_cols}
        for i, s in enumerate(subs):
            for c in value_cols:
                v = cols[c][i]
                if v is None:
                    continue
                pred = pred_map.get(c, c)
                for item in v if isinstance(v, list) else [v]:
                    if item is None:
                        continue
                    if c in uri_set:
                        out.append(format_link(s, str(item), pred))
                    else:
                        out.append(format_literal_statement(s, pred, str(item)))
        fname = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.nt")
        tmp = fname + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.writelines(out)
        os.replace(tmp, fname)
        return pa.table({"file": pa.array([fname]), "rows": pa.array([len(out)], pa.int64())})

    return ds.map_batches(write_part, batch_format="pyarrow", batch_size=None).take_all()


def write_links_ntriples(
    links,
    path: str,
    predicate: str = "http://www.w3.org/2002/07/owl#sameAs",
    source_col: str = "source",
    target_col: str = "target",
):
    """FormattedLinkSink analogue: ``<source> <predicate> <target> .``
    per link (``FormattedLinkSink.scala``; owl:sameAs default as in
    ``LinkSpec.scala``)."""
    os.makedirs(path, exist_ok=True)

    def write_part(batch: pa.Table) -> pa.Table:
        lines = [
            format_link(s, t, predicate)
            for s, t in zip(batch[source_col].to_pylist(), batch[target_col].to_pylist())
        ]
        fname = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.nt")
        tmp = fname + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.writelines(lines)
        os.replace(tmp, fname)
        return pa.table({"file": pa.array([fname]), "rows": pa.array([len(lines)], pa.int64())})

    return links.map_batches(write_part, batch_format="pyarrow", batch_size=None).take_all()


def write_links_alignment(
    links,
    path: str,
    predicate: str = "http://www.w3.org/2002/07/owl#sameAs",
    source_col: str = "source",
    target_col: str = "target",
    confidence_col: str = "confidence",
):
    """AlignmentDataset sink: Alignment-API XML, one ``<map><Cell>`` per
    link with entity1/entity2/relation/measure
    (``formatters/AlignmentLinkFormatter.scala:5-33``); owl:sameAs
    prints as relation ``=``. One XML part per block (header+footer per
    part file, like the reference's per-resource formatter)."""
    import xml.sax.saxutils as sx

    os.makedirs(path, exist_ok=True)
    relation = "=" if predicate == "http://www.w3.org/2002/07/owl#sameAs" else predicate
    header = (
        "<?xml version='1.0' encoding='utf-8' standalone='no'?>\n"
        "<rdf:RDF xmlns='http://knowledgeweb.semanticweb.org/heterogeneity/alignment#'\n"
        "    xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'\n"
        "    xmlns:xsd='http://www.w3.org/2001/XMLSchema#'\n"
        "    xmlns:align='http://knowledgeweb.semanticweb.org/heterogeneity/alignment#'>\n"
        "<Alignment>\n"
    )
    footer = "</Alignment>\n</rdf:RDF>\n"

    def write_part(batch: pa.Table) -> pa.Table:
        cells = []
        confs = (
            batch[confidence_col].to_pylist()
            if confidence_col in batch.column_names
            else [0.0] * batch.num_rows
        )
        for s, t, c in zip(
            batch[source_col].to_pylist(), batch[target_col].to_pylist(), confs
        ):
            cells.append(
                "<map>\n  <Cell>\n"
                f"    <entity1 rdf:resource={sx.quoteattr(s)}/>\n"
                f"    <entity2 rdf:resource={sx.quoteattr(t)}/>\n"
                f"    <relation>{sx.escape(relation)}</relation>\n"
                "    <measure rdf:datatype=\"http://www.w3.org/2001/XMLSchema#float\">"
                f"{0.0 if c is None else c}</measure>\n"
                "  </Cell>\n</map>\n"
            )
        fname = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.xml")
        tmp = fname + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(header)
            f.writelines(cells)
            f.write(footer)
        os.replace(tmp, fname)
        return pa.table({"file": pa.array([fname]), "rows": pa.array([len(cells)], pa.int64())})

    return links.map_batches(write_part, batch_format="pyarrow", batch_size=None).take_all()
