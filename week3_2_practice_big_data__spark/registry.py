"""Query registry — the implementation contract of SURVEY.md §2.

Every operator key registers a builder `(spark, sf_dir) -> DataFrame` and,
where SQL-expressible, a DuckDB oracle SQL string. `__spark_entry__.py`
exposes the registry to the correctness driver; tests/oracle.py replays the
same comparison locally.

Cross-engine float discipline (see SURVEY.md §7.4): every float column in a
checked output is rounded (typically 6 dp; 2 dp for large money sums) on BOTH
sides, because Spark and DuckDB may disagree in the last ulp (different
summation orders, different libm). Integer/string/date columns are exact.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    key: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    key: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: register a query builder under a SURVEY §2 key."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = Query(key, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco
