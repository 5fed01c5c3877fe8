"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in silk_ray) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``    — flagship CDC pipeline seeded from sf0.001 documents:
  binlog changelog → merge-apply lake → incremental linkage; returns the
  final lake state (stable schema: repo, path, commit, lang, content,
  branch).
- ``queries()``  — operator inventory over the testdata tables
  (SURVEY.md §2 coverage + training-data ops).
- ``oracle_sql()`` — DuckDB equivalents (same column names/rounding).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from silk_ray.pipelines.queries import cdc_flagship

    return cdc_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from silk_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from silk_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
