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
