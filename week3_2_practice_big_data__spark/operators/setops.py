"""Set operators (SURVEY.md §2.1-H) — REF-ANALOG (absent from the reference).

union/unionByName, intersect, exceptAll over customer-key predicates.

Scale notes (100 TB): UNION ALL is shuffle-free (concatenate partitions);
DISTINCT/INTERSECT/EXCEPT shuffle on the full row — at scale, prefer
key-only projections (as here) before distinct-style set ops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

_UNION_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
ORDER BY c_custkey
"""


@register(
    "set_union",
    oracle=_UNION_ORACLE,
    doc="UNION (distinct) of two customer-key selections.",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.filter(F.col("c_acctbal") > 8000).select("c_custkey")
    return a.unionByName(b).distinct().orderBy("c_custkey")


_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT DISTINCT o_custkey AS c_custkey FROM orders
ORDER BY c_custkey
"""


@register(
    "set_intersect",
    oracle=_INTERSECT_ORACLE,
    doc="INTERSECT: BUILDING-segment customers who have placed orders.",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b).orderBy("c_custkey")


_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer
EXCEPT
SELECT DISTINCT o_custkey AS c_custkey FROM orders
ORDER BY c_custkey
"""


@register(
    "set_except",
    oracle=_EXCEPT_ORACLE,
    doc="EXCEPT: customers minus buyers (set-op form of the anti join).",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.select("c_custkey")
        .exceptAll(orders.select(F.col("o_custkey").alias("c_custkey")).distinct())
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep duplicate
# multiplicity (min / difference of per-row counts), a distinct relational
# surface from the distinct-set forms above. Both engines support the ALL
# variants natively.
# ---------------------------------------------------------------------------

_INTERSECT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
"""


@register(
    "set_intersect_all",
    oracle=_INTERSECT_ALL_ORACLE,
    doc="INTERSECT ALL (bag semantics — min multiplicity per key): "
    "customers' completed-order keys ∩ open-order keys with counts "
    "preserved (REF-ANALOG).",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersectAll(b).orderBy("o_custkey")


_EXCEPT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
"""


@register(
    "set_except_all",
    oracle=_EXCEPT_ALL_ORACLE,
    doc="EXCEPT ALL (bag semantics — count difference per key) on order "
    "keys by status (REF-ANALOG).",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# set_union_byname_missing — unionByName(allowMissingColumns=True): the
# schema-evolution union (each side contributes NULL for columns it
# lacks) — the in-memory twin of src_schema_evolution's mergeSchema
# read. Aggregate output so the NULL-fill semantics, not row order, are
# what the hash pins.
# ---------------------------------------------------------------------------

_UBN_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(p) AS BIGINT) AS n_priced,
  CAST(count(pr) AS BIGINT) AS n_prioritized,
  CAST(coalesce(sum(CAST(coalesce(p, 0) AS DECIMAL(18,2))), 0) AS DOUBLE)
    AS sum_priced
FROM (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS p,
    CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS pr
  FROM orders
) t
"""


@register(
    "set_union_byname_missing",
    oracle=_UBN_ORACLE,
    doc="unionByName(allowMissingColumns=True): two projections with "
    "disjoint extra columns unioned by NAME — each side surfaces NULL "
    "for the column it lacks; counts + decimal-exact sum pin the "
    "NULL-fill semantics against a CASE-reconstructed oracle "
    "(REF-ANALOG: the in-memory twin of src_schema_evolution). "
    "Zero-shuffle narrow union feeding one partial agg.",
    tags=("setop",),
)
def set_union_byname_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority"
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_priced"),
        F.count("o_orderpriority").alias("n_prioritized"),
        F.coalesce(
            F.sum(
                F.coalesce(F.col("o_totalprice"), F.lit(0)).cast(
                    "decimal(18,2)"
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("sum_priced"),
    )
