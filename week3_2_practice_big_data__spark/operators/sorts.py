"""Sort / limit / top-k operators (SURVEY.md §2.1-G).

The reference's only ordering requirement is the painter's-algorithm
composite (app.py:137-150) — implemented with the generative pipeline in
plans/generative.py (`sort_composite_order`). Here: the REF-ANALOG global
sort and top-k patterns.

Scale notes (100 TB): a global ORDER BY is a range-partitioned shuffle —
fine for small outputs, deadly as a full-table materialization; `limit_topk`
instead relies on Spark's TakeOrderedAndProject (per-partition top-k then
k-way merge on the driver — no global sort), and per-group top-k uses a
window row_number filter which prunes during the sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..io import load_table
from ..registry import register
from ..common import dec as _dec


_ORDERBY_ORACLE = """
SELECT n_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register(
    "sort_orderby",
    oracle=_ORDERBY_ORACLE,
    doc="Global ORDER BY on grouped revenue per nation (REF-ANALOG).",
    tags=("sort", "bench"),
)
def sort_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register(
    "limit_topk",
    oracle=_TOPK_ORACLE,
    doc="Global top-k (ORDER BY + LIMIT → TakeOrderedAndProject: "
    "per-partition heads, no global sort). Deterministic tie-break on key.",
    tags=("sort",),
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


_TOPK_GROUP_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rn
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rn <= 3
ORDER BY c_mktsegment, rn
"""


@register(
    "limit_topk_per_group",
    oracle=_TOPK_GROUP_ORACLE,
    doc="Per-group top-k via row_number() <= k (REF-ANALOG).",
    tags=("sort", "window"),
)
def limit_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


# ---------------------------------------------------------------------------
# limit_offset_page — DataFrame pagination: df.offset(k).limit(n) after a
# deterministic total order (totalprice DESC, orderkey ASC tiebreak) —
# page 3 of the order book, rows 41–60. Exercises the df.offset() API
# (Spark 3.4+) and the SQL LIMIT/OFFSET contract. Scale note: OFFSET is
# the CORRECT tool only at shallow depth — Spark plans it as
# TakeOrderedAndProject(limit = offset + n) (top-60 here, partial per
# partition, no global sort), but the cost grows with depth; deep
# pagination should switch to keyset predicates (WHERE (price, key) <
# last_seen ORDER BY … LIMIT n), which pytest pins as row-identical to
# this page.
# ---------------------------------------------------------------------------

_PAGE_N = 20
_PAGE_OFFSET = 40

_PAGE_ORACLE = f"""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT {_PAGE_N} OFFSET {_PAGE_OFFSET}
"""


@register(
    "limit_offset_page",
    oracle=_PAGE_ORACLE,
    doc="df.offset(40).limit(20) after a deterministic total order — "
    "page 3 of the order book. Planned as TakeOrderedAndProject"
    "(limit=60): per-partition top-60 + single merge, no global sort. "
    "The keyset-pagination equivalence (the deep-page scale path) is "
    "pytest-pinned.",
    tags=("sort", "limit"),
)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderpriority",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(_PAGE_OFFSET)
        .limit(_PAGE_N)
    )
