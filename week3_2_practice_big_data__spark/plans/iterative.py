"""Iterative DataFrame algorithms (NS; 'iterative algorithms' category the
driver contract exempts from SQL oracles — but fixed-iteration PageRank IS
SQL-expressible as an unrolled CTE chain, so it gets the full oracle check).

`iter_pagerank_tokens`: PageRank over the token co-occurrence digraph of
`documents` (edge a→b for consecutive tokens). 8 unrolled iterations:
PR₀ = 1/N; PRₖ₊₁(v) = 0.15/N + 0.85·Σ_{u→v} PRₖ(u)/outdeg(u).

Scale notes (100 TB): at real scale the per-iteration join (ranks ⋈ edges →
group by dst) runs with BOTH sides hash-partitioned by node id, ranks cached
and checkpointed every few iterations to cut lineage — the loop itself stays
driver-side Python over lazy plans (no collect inside the loop). Here the
vocabulary is tiny so the 8 iterations compose into one lazy plan which
Catalyst pipelines; dangling-node mass is intentionally not redistributed
(deterministic, documented simplification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register
from ..functions.text import tokens_sql
from .. import synth

_ITER = 8
_DAMP = "0.85e0"
_JUMP = "0.15e0"


def _pagerank_sql(dialect: str) -> str:
    parts = [
        f"WITH tok AS ({tokens_sql(dialect)}),",
        """
pairs AS (
  SELECT token AS src, lead(token, 1) OVER w AS dst
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
edges AS (
  SELECT src, dst, count(*) AS w FROM pairs WHERE dst IS NOT NULL
  GROUP BY src, dst
),
nodes AS (
  SELECT src AS token FROM edges
  UNION
  SELECT dst AS token FROM edges
),
nn AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT src, sum(w) AS deg FROM edges GROUP BY src),
pr0 AS (
  SELECT token, 1e0 / nn.n AS pr FROM nodes CROSS JOIN nn
)""",
    ]
    for k in range(_ITER):
        parts.append(
            f""",
pr{k + 1} AS (
  SELECT nodes.token,
    {_JUMP} / nn.n + {_DAMP} * coalesce(mass.m, 0e0) AS pr
  FROM nodes
  CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS token, sum(p.pr * e.w / d.deg) AS m
    FROM pr{k} p
    JOIN edges e ON p.token = e.src
    JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst
  ) mass ON nodes.token = mass.token
)"""
        )
    parts.append(
        # 7 dp, not 9: each iteration's group-sum order is engine-dependent
        # (~1e-15 drift after 8 iterations); 7 dp leaves a ~5e-8 guard band
        # while still discriminating ranks (values are ~1e-2).
        f"""
SELECT token, {synth.q6('pr', 7)} AS pagerank
FROM pr{_ITER}
ORDER BY pagerank DESC, token
LIMIT 20
"""
    )
    return "".join(parts)


@register(
    "iter_pagerank_tokens",
    oracle=_pagerank_sql("duckdb"),
    doc="Iterative algorithm surface: 8 unrolled PageRank iterations over "
    "the token co-occurrence digraph; fully oracle-checked (NS).",
    tags=("iterative", "ns", "bench"),
)
def iter_pagerank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_pagerank_sql("spark"))
