"""Partition-pruning join demonstration (REF-ANALOG, scale-critical).

`join_dpp_partitioned` — the one scan optimization SURVEY §4.1 couldn't
show on flat test files: the fact table is written PARTITIONED by ship
year into the repo scratch warehouse (once per sf, marker-guarded), then
joined to a filtered year dimension. Catalyst's dynamic partition pruning
turns the dimension filter into a runtime partition filter on the fact
scan — at 100 TB this is the difference between scanning two year
partitions and scanning the table. The executed plan carries a
`dynamicpruning` expression in the fact scan's PartitionFilters (pinned
by a plan test); the DuckDB oracle computes the same aggregate from the
raw table, proving partitioning changed the plan, not the answer.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..common import build_once
from ..io import load_table
from ..registry import register

_TARGET_YEARS = (1996, 1997)


def _warehouse(sf_dir: str) -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp",
        f"dpp_orders_{os.path.basename(sf_dir.rstrip('/'))}",
    )


def _partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    def build(tmp: str) -> None:
        (
            load_table(spark, sf_dir, "orders")
            .withColumn("o_year", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(tmp)
        )

    return build_once(_warehouse(sf_dir), build)


def _read_orders_part(spark: SparkSession, sf_dir: str, path: str):
    """Explicit read schema: an EMPTY partitioned write leaves no data
    files, and a schemaless parquet read would fail inference — the empty
    source must flow through as an empty relation, not an error."""
    sch = (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .schema
    )
    return spark.read.schema(sch).parquet(path)


_DPP_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE CAST(year(o_orderdate) AS INT) IN {_TARGET_YEARS}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "join_dpp_partitioned",
    oracle=_DPP_ORACLE,
    doc="Dynamic partition pruning: orders written partitioned by year, "
    "joined to a filtered year dimension — the dim filter becomes a "
    "runtime PartitionFilter on the fact scan (dynamicpruning expression, "
    "pinned by plan test), so only the two target-year partitions are "
    "read. Oracle recomputes from the raw table: partitioning changes the "
    "plan, never the answer (REF-ANALOG; the 100 TB scan-elision "
    "pattern).",
    tags=("join", "source", "scale"),
)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _partitioned_orders(spark, sf_dir)
    _read_orders_part(spark, sf_dir, path).createOrReplaceTempView("orders_part")
    years = spark.range(1995, 2002).select(
        F.col("id").cast("int").alias("y")
    )
    years.createOrReplaceTempView("years_dim")
    return spark.sql(f"""
SELECT o_orderpriority, count(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders_part JOIN years_dim ON o_year = y
WHERE y IN {_TARGET_YEARS}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")


_STATIC_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE CAST(year(o_orderdate) AS INT) = 1996
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "src_partition_prune_static",
    oracle=_STATIC_ORACLE,
    doc="Static partition pruning: a literal predicate on the partition "
    "column of the partitioned orders dataset prunes at PLANNING time — "
    "the scan lists only the one matching partition directory (plan test: "
    "PartitionFilters carries the literal, zero data filters needed). The "
    "planning-time sibling of join_dpp_partitioned's runtime pruning "
    "(REF-ANALOG).",
    tags=("source", "scale"),
)
def src_partition_prune_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _partitioned_orders(spark, sf_dir)
    _read_orders_part(spark, sf_dir, path).createOrReplaceTempView("orders_part")
    return spark.sql("""
SELECT o_orderpriority, count(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders_part
WHERE o_year = 1996
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
