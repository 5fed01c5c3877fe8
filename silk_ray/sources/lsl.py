"""Silk-LSL XML config support: run the reference's own config files.

Parses the Link Specification Language (doc/LinkSpecificationLanguage.md;
XSD at silk-core/src/main/resources/org/silkframework/
LinkSpecificationLanguage.xsd) subset that maps onto this engine:

- ``<Prefixes>``          → prefix table for path resolution
- ``<DataSources>``       → csv / file sources (``sparqlEndpoint`` etc.
  are network datasets → rejected with a clear error)
- ``<Interlinks>``        → one linkage task each: source/target
  datasets, ``<LinkageRule>`` tree, ``<Filter>``, ``<Outputs>``
- rule tree: ``<Aggregate type>`` → aggregator node, ``<Compare metric
  threshold weight>`` → comparison, ``<TransformInput function>`` →
  transformer node, ``<Input path>`` → path leaf, ``<Param>`` → params

Path mapping: this engine's entities are tabular, so an RDF-ish LSL
path ``?a/rdfs:label[@lang='en']`` resolves to the bare column name
(``label``): the variable prefix, namespace prefix and property filters
are stripped (filters select among multi-valued RDF properties, which a
column source does not have). The legacy ``required``/``optional``
attributes are ignored — the current reference model dropped them too
(rule/similarity/SimilarityOperator.scala has no such field).

URIs for row-oriented csv sources are 1-based row numbers, matching
the reference's names-corpus link files (``<2000>``-style URIs).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Any


def _local_path(path: str) -> str:
    """``?a/rdfs:label[@lang='en']`` or ``?a/<http://…#label>`` →
    ``label`` (full-URI paths resolve to the local name; the ':' strip
    must not fire on a URI's scheme colon)."""
    p = path.strip()
    if p.startswith("?"):
        slash = p.find("/")
        p = p[slash + 1 :] if slash >= 0 else ""
    if "[" in p:
        p = p[: p.index("[")]
    if p.startswith("<") and p.endswith(">"):
        inner = p[1:-1]
        return inner.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    if ":" in p:
        p = p.rsplit(":", 1)[1]
    return p


def _params(elem: ET.Element) -> dict[str, str]:
    return {p.get("name"): p.get("value") for p in elem.findall("Param")}


def _input_from_xml(elem: ET.Element) -> dict[str, Any]:
    if elem.tag == "Input":
        return {"path": _local_path(elem.get("path", ""))}
    if elem.tag == "TransformInput":
        return {
            "transform": elem.get("function"),
            "params": _params(elem),
            "inputs": [
                _input_from_xml(c) for c in elem if c.tag in ("Input", "TransformInput")
            ],
        }
    raise ValueError(f"unexpected input element <{elem.tag}>")


def rule_operator_from_xml(elem: ET.Element) -> dict[str, Any]:
    """``<Aggregate>``/``<Compare>`` element → this engine's rule dict."""
    if elem.tag == "Aggregate":
        return {
            "aggregator": elem.get("type"),
            "weight": int(elem.get("weight", "1")),
            "operators": [
                rule_operator_from_xml(c) for c in elem if c.tag in ("Aggregate", "Compare")
            ],
        }
    if elem.tag == "Compare":
        inputs = [c for c in elem if c.tag in ("Input", "TransformInput")]
        if len(inputs) != 2:
            raise ValueError(f"<Compare> needs exactly 2 inputs, found {len(inputs)}")
        return {
            "metric": elem.get("metric"),
            "threshold": float(elem.get("threshold", "0")),
            "weight": int(elem.get("weight", "1")),
            "params": _params(elem),
            "source": _input_from_xml(inputs[0]),
            "target": _input_from_xml(inputs[1]),
        }
    raise ValueError(f"unexpected rule element <{elem.tag}>")


def _resolve_url(url: str, config_dir: str) -> str:
    if url.startswith("classpath:"):
        # classpath:names/source1.txt → sibling of the config file
        rel = url[len("classpath:") :]
        cand = os.path.join(config_dir, os.path.basename(rel))
        return cand if os.path.exists(cand) else os.path.join(config_dir, rel)
    if url.startswith("file:"):
        return url[len("file:") :]
    if os.path.isabs(url):
        return url
    return os.path.join(config_dir, url)


def load_lsl_source(ds_spec: dict[str, Any], config_dir: str):
    """DataSource spec → Ray Dataset with a 1-based row-number ``uri``."""
    import pyarrow as pa
    import ray.data as rd

    typ = ds_spec["type"]
    params = ds_spec["params"]
    if typ != "csv":
        raise ValueError(
            f"LSL DataSource type {typ!r} is not supported in this engine "
            "(network/SPARQL datasets are out of scope); use type=csv"
        )
    path = _resolve_url(params["url"], config_dir)
    columns = [c.strip() for c in params.get("properties", "").split(",") if c.strip()]
    sep = params.get("separator", ",")
    lines = open(path, encoding=params.get("charset", "utf-8")).read().splitlines()
    rows = {c: [] for c in columns}
    uris = []
    for i, line in enumerate(lines):
        parts = line.split(sep) if len(columns) > 1 else [line]
        for c, v in zip(columns, parts + [""] * (len(columns) - len(parts))):
            rows[c].append(v)
        uris.append(str(i + 1))
    table = pa.table({"uri": pa.array(uris, pa.string()), **{c: pa.array(v, pa.string()) for c, v in rows.items()}})
    return rd.from_arrow(table)


def parse_lsl_config(path: str) -> dict[str, Any]:
    """Parse a Silk-LSL file into {datasources, interlinks}."""
    root = ET.parse(path).getroot()
    datasources = {}
    for ds in root.findall("./DataSources/DataSource"):
        datasources[ds.get("id")] = {"type": ds.get("type"), "params": _params(ds)}
    interlinks = []
    for il in root.findall("./Interlinks/Interlink"):
        rule_elems = [c for c in il.find("LinkageRule") if c.tag in ("Aggregate", "Compare")]
        if len(rule_elems) != 1:
            raise ValueError("LinkageRule must have exactly one root operator")
        rule: dict[str, Any] = {"operator": rule_operator_from_xml(rule_elems[0])}
        # <Filter limit=... unambiguous=...> (LinkFilter.scala:26)
        filt = il.find("Filter")
        if filt is not None:
            if filt.get("limit"):
                rule["filter_limit"] = int(filt.get("limit"))
            if filt.get("unambiguous"):
                rule["filter_unambiguous"] = filt.get("unambiguous").lower() == "true"
        outputs = []
        outs = il.find("Outputs")
        if outs is not None:
            for o in outs.findall("Output"):
                outputs.append({"type": o.get("type"), "params": _params(o)})
        for side in ("SourceDataset", "TargetDataset"):
            node = il.find(side)
            restrict = node.findtext("RestrictTo") if node is not None else None
            if restrict and restrict.strip():
                # a SPARQL graph-pattern restriction; silently dropping it
                # would change the link set — reject loudly (equality
                # restrictions are available via the JSON rule DSL +
                # linking/pushdown.py instead)
                raise ValueError(
                    f"interlink {il.get('id')!r}: non-empty <RestrictTo> on {side} "
                    "is a SPARQL restriction this engine does not evaluate"
                )
        interlinks.append(
            {
                "id": il.get("id"),
                "source": il.find("SourceDataset").get("dataSource"),
                "target": il.find("TargetDataset").get("dataSource"),
                "rule": rule,
                "outputs": outputs,
            }
        )
    return {"datasources": datasources, "interlinks": interlinks}


def run_lsl_config(path: str, interlink: str | None = None, output_path: str | None = None,
                   link_limit: int | None = 1_000_000) -> dict[str, dict]:
    """Execute every interlink of an LSL config (or just ``interlink``
    when named — ``Silk.main`` runs all when none is given). Returns
    ``{interlink id: {"links": Dataset, "rows": int | None, "output":
    path | None}}``; ``rows`` is taken from the sink's part summaries
    when an output was written (no second execution of the plan)."""
    from silk_ray.linking.pipeline import generate_links
    from silk_ray.sources.registry import write_links

    cfg = parse_lsl_config(path)
    config_dir = os.path.dirname(os.path.abspath(path))
    links_specs = cfg["interlinks"]
    if interlink:
        links_specs = [i for i in links_specs if i["id"] == interlink]
        if not links_specs:
            raise ValueError(f"no interlink {interlink!r} in {path}")
    results: dict[str, dict] = {}
    for spec in links_specs:
        src = load_lsl_source(cfg["datasources"][spec["source"]], config_dir)
        tgt = load_lsl_source(cfg["datasources"][spec["target"]], config_dir)
        links = generate_links(src, tgt, spec["rule"], link_limit=link_limit)
        out = output_path if len(links_specs) == 1 else None
        fmt = None
        if spec["outputs"]:
            o = spec["outputs"][0]
            fmt = o["params"].get("format")
            if out is None:
                out = _resolve_url(o["params"].get("file", "links.nt"), config_dir)
                fmt = fmt or "ntriples"
        if out is not None and fmt is None:
            fmt = "ntriples" if out.endswith((".nt", ".ntriples")) else "parquet"
        rows = None
        if out is not None:
            parts = write_links(links, out, fmt)
            if isinstance(parts, list) and parts and isinstance(parts[0], dict):
                rows = int(sum(p.get("rows", 0) for p in parts))
        results[spec["id"]] = {"links": links, "rows": rows, "output": out}
    return results
