"""TPC-H-shaped analytical query skeletons beyond Q1/Q3/Q5 (REF-ANALOG).

Q1's shape is `agg_groupby_multi`, Q3/Q5 live in operators/joins.py; this
module adds the remaining classic plan shapes the driver tables can express
(the tables are TPC-H-ish but not column-complete, so each query is the
standard skeleton adapted to the available columns — adaptations noted per
key). Money sums follow the repo-wide decimal discipline: DECIMAL(18,2)
inputs so grouped sums are exact and cross-engine bit-identical, CAST to
DOUBLE only on output.

Scale notes (100 TB): every query touches lineitem/orders exactly once;
dimension sides (nation, supplier, part sub-selects) broadcast; the only
big-table shuffles are the grouped aggregates on bounded keys. Semi/anti
forms (Q4's EXISTS, Q16's NOT IN) carry only the join key through the
shuffle, never the payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register


def _views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...]) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Q4 — order priority checking: orders in a quarter with at least one line
# shipped after the order date (adaptation: the tables lack commit/receipt
# dates, so "late line" = l_shipdate > o_orderdate). EXISTS plans as a
# left-semi join on o_orderkey.
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "join_q4_order_priority",
    oracle=_Q4_SQL,
    doc="TPC-H Q4 skeleton: quarter filter + correlated EXISTS (line "
    "shipped after order date) -> left-semi join on o_orderkey -> priority "
    "counts. Semi join ships only the orderkey column of lineitem "
    "(REF-ANALOG).",
    tags=("join", "agg", "tpch"),
)
def join_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q4_SQL)


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year. nation joins twice
# (supplier side, customer side) — both broadcast; year() returns INT in
# Spark and BIGINT in DuckDB, so both sides cast to INT.
# ---------------------------------------------------------------------------

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
  CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS INT) AS l_year,
    CAST(l_extendedprice AS DECIMAL(18,2))
      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "join_q7_volume_shipping",
    oracle=_Q7_SQL,
    doc="TPC-H Q7 skeleton: directed trade volume between two nations (a pair "
    "with flows at every test scale, so the parity check is never "
    "vacuously empty-vs-empty) per "
    "ship year — nation broadcast-joined twice under an OR of direction "
    "pairs, exact decimal volume sums (REF-ANALOG).",
    tags=("join", "agg", "tpch"),
)
def join_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    return spark.sql(_Q7_SQL)


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by revenue lost to
# returns in a quarter. revenue is an exact decimal sum cast to double, so
# the DESC sort boundary is bit-identical across engines; c_custkey breaks
# ties deterministically.
# ---------------------------------------------------------------------------

_Q10_SQL = """
SELECT c_custkey, c_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "join_q10_returned_item",
    oracle=_Q10_SQL,
    doc="TPC-H Q10 skeleton: returned-line revenue per customer in a "
    "quarter, nation broadcast, top-20 by exact decimal revenue "
    "(REF-ANALOG).",
    tags=("join", "agg", "tpch"),
)
def join_q10_returned_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_Q10_SQL)


# ---------------------------------------------------------------------------
# Q14 — promotion effect: share of revenue from PROMO-type parts in a
# month. Both operands of the final division are exact decimal sums cast to
# DOUBLE; one IEEE division of identical doubles is itself identical, so no
# rounding is needed on the ratio.
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT
  CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
  CAST(sum(volume) AS DOUBLE) AS total_revenue,
  CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(sum(volume) AS DOUBLE) AS promo_share
FROM (
  SELECT p_type,
    CAST(l_extendedprice AS DECIMAL(18,2))
      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
) priced
"""


@register(
    "agg_q14_promo_share",
    oracle=_Q14_SQL,
    doc="TPC-H Q14 skeleton: PROMO revenue share in one month — "
    "conditional decimal aggregate over a part broadcast join; the ratio "
    "is a single IEEE division of two exact sums (REF-ANALOG).",
    tags=("agg", "tpch"),
)
def agg_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q14_SQL)


# ---------------------------------------------------------------------------
# Q16 — supplier-part relationship counting (adaptation: the tables have no
# partsupp, so supplier×part pairs come from lineitem; the excluded
# "complaint" suppliers are the low-balance ones). NOT IN list is non-null
# by construction (s_suppkey is a key), so the anti join is plain.
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 2, 3, 4, 5)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


@register(
    "agg_q16_supplier_cnt",
    oracle=_Q16_SQL,
    doc="TPC-H Q16 skeleton: distinct suppliers per (brand, size) slice "
    "with a NOT IN exclusion list — anti join against a tiny broadcast "
    "list, distinct count keyed on the grouped columns (REF-ANALOG; "
    "supplier×part pairs via lineitem, low-balance suppliers excluded).",
    tags=("agg", "join", "tpch"),
)
def agg_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem", "part", "supplier"))
    return spark.sql(_Q16_SQL)


# ---------------------------------------------------------------------------
# Q18 — large-volume orders: customers whose single order exceeds 250 units
# (~top 1% of orders). l_quantity is integer-valued, so double sums stay
# exact far below 2^53 and the HAVING boundary is crisp.
# ---------------------------------------------------------------------------

_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(sum(l_quantity) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register(
    "agg_q18_large_orders",
    oracle=_Q18_SQL,
    doc="TPC-H Q18 skeleton: orders with >250 total units (IN over a "
    "grouped HAVING subquery -> semi join on orderkey), top-20 by order "
    "price. The qualifying-order list is aggregated once and semi-joined, "
    "not recomputed per row (REF-ANALOG).",
    tags=("agg", "join", "tpch"),
)
def agg_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q18_SQL)
