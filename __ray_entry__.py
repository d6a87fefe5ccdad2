"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; none
of these functions (nor the library code they call) touches
``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize the
    crawl table from events × documents, extract metrics, assemble
    deduped per-url series, and produce the daily rollup tier through
    the hourly→daily re-aggregation chain."""
    from sits_classification_ray.pipelines.queries import build_queries

    return build_queries()["rollup_daily"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2,
    ordered so the driver's first-50 correctness window spans one
    representative per operator family (DRIVER_WINDOW)."""
    from sits_classification_ray.pipelines.queries import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from sits_classification_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
