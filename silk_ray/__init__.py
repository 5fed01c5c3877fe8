"""silk_ray — a Ray-Data-native CDC / incremental linkage engine.

A brand-new engine (NOT a port) with the query & data-processing
capabilities of the Silk link-discovery framework (reference:
/root/reference), re-expressed Ray-Data-first:

- ``silk_ray.kernel``    — pure-Python/pyarrow rule kernel (transformers,
  distance measures, aggregators, blocking Index, linkage rules) with
  semantics matching the reference (citations in docstrings).
- ``silk_ray.linking``   — batch MultiBlock linking as a Ray Data
  pipeline (index flat_map → salted groupby(block) → pair scoring →
  link filter).
- ``silk_ray.cdc``       — changelog tail → key-partitioned, commit-
  ordered, idempotent merge-apply into Parquet lake tables with
  per-partition high-water marks, checkpointed offset log, atomic
  manifest commits, and incremental re-linking of dirty blocks.
- ``silk_ray.functions`` — training-data-pipeline operators: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
  text analysis (lang-id, quality, token counts, fingerprints).
- ``silk_ray.pipelines`` — queries over the driver's testdata tables.

No module in this package calls ``ray.init`` / ``ray.shutdown``; the
caller owns the Ray session.
"""

__version__ = "0.1.0"
