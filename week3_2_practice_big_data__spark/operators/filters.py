"""Filter / predicate operators (SURVEY.md §2.1-C).

`filt_range_pred` generalizes the reference's numeric threshold guards
(`sigma <= 0`, app.py:23,32) to pushdown-friendly range predicates on the
star schema. `filt_dict_dispatch` is the theme-dict dispatch
(`bg_colors[theme]`, app.py:126-133) as a CASE/lookup. The geometry
predicates (`filt_point_in_polygon`, `filt_mask_apply`) live with the
generative pipeline in plans/generative.py.

Scale notes: these predicates are all Catalyst-pushable (shown as
PushedFilters in the parquet scan), so at 100 TB they skip row groups via
min/max stats before any CPU is spent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register
from ..common import dec as _dec

_RANGE_ORACLE = """
SELECT l_returnflag,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 24
  AND l_discount > 0.02
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "filt_range_pred",
    oracle=_RANGE_ORACLE,
    doc="Conjunctive range predicates (quantity/discount/date) — pushdown-"
    "friendly generalization of the sigma<=0 guards (app.py:23,32).",
    tags=("filter",),
)
def filt_range_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 24)
            & (F.col("l_discount") > 0.02)
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_extendedprice"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


_DISPATCH_ORACLE = """
SELECT event_type,
  CASE event_type
    WHEN 'error' THEN 'alert'
    WHEN 'purchase' THEN 'money'
    WHEN 'signup' THEN 'growth'
    ELSE 'engagement'
  END AS category,
  COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "filt_dict_dispatch",
    oracle=_DISPATCH_ORACLE,
    doc="Enum/dict dispatch (bg_colors[theme] + theme ternary, "
    "app.py:126-133) as a CASE mapping.",
    tags=("filter",),
)
def filt_dict_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    category = (
        F.when(F.col("event_type") == "error", "alert")
        .when(F.col("event_type") == "purchase", "money")
        .when(F.col("event_type") == "signup", "growth")
        .otherwise("engagement")
    )
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", category.alias("category"), "n")
        .orderBy("event_type")
    )
