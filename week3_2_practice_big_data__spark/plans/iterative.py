"""Iterative DataFrame algorithms (NS; 'iterative algorithms' category the
driver contract exempts from SQL oracles — but fixed-iteration PageRank IS
SQL-expressible as an unrolled CTE chain, so it gets the full oracle check).

`iter_pagerank_tokens`: PageRank over the token co-occurrence digraph of
`documents` (edge a→b for consecutive tokens). 8 unrolled iterations:
PR₀ = 1/N; PRₖ₊₁(v) = 0.15/N + 0.85·Σ_{u→v} PRₖ(u)/outdeg(u).

Spark-side the edge list is MATERIALIZED AND CACHED before the iteration
chain: Catalyst inlines multiply-referenced CTEs, so the naive one-SQL form
re-tokenizes the corpus once per edge reference (~52 scans of `documents`
in the executed plan). Caching `edges` turns every reference into an
InMemoryTableScan — the iterate-over-cached-edges discipline every
distributed graph engine uses. The DuckDB oracle keeps the single-text CTE
form (DuckDB materializes multiply-referenced CTEs itself).

Scale notes (100 TB): the one corpus-sized pass is the cached edge build
(tokenize → bigram window → count); everything after runs on VOCAB-bounded
relations, so the per-iteration joins broadcast — correct at any corpus
size. Only if the node set itself were huge (web-graph PageRank, not token
vocab) would the iteration switch to both sides hash-partitioned by node
id with periodic checkpoints to cut lineage; the loop itself stays
driver-side Python over lazy plans (no collect inside the loop) either
way. Dangling-node mass is intentionally not redistributed (deterministic,
documented simplification).
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


def _edges_sql(dialect: str) -> str:
    """Standalone SELECT producing the weighted token-bigram edge list."""
    return f"""
WITH tok AS ({tokens_sql(dialect)}),
pairs AS (
  SELECT token AS src, lead(token, 1) OVER w AS dst
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT src, dst, count(*) AS w FROM pairs WHERE dst IS NOT NULL
GROUP BY src, dst
"""


def _iterate_sql(edges_ref: str) -> str:
    """Iteration chain over an `edges` relation given by `edges_ref` —
    shared text for both engines; only the edges binding differs."""
    parts = [
        f"""WITH edges AS ({edges_ref}),
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


def _pagerank_oracle() -> str:
    return _iterate_sql(_edges_sql("duckdb"))


_CACHED: dict[tuple, tuple] = {}


def _cached_graph(spark: SparkSession, sf_dir: str):
    """edges / nodes / outdeg as persisted DataFrames + node count.

    Cache substitution only applies to direct DataFrame references (a SQL
    WITH-CTE def is not matched by the cache manager), so the iteration is
    driven through the DataFrame API over these handles.
    """
    import pyspark.sql.functions as F

    # keyed by session too: a cached DataFrame is dead once its session stops
    key = (id(spark), sf_dir.rstrip("/"))
    if key not in _CACHED:
        load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
        # The graph is VOCAB-sized (distinct tokens / bigrams), bounded by
        # vocabulary — not corpus-sized. One heavy pass builds it; compact
        # partitioning keeps the per-iteration stages from fragmenting.
        edges = spark.sql(_edges_sql("spark")).coalesce(2).persist()
        nodes = (
            edges.select(F.col("src").alias("token"))
            .union(edges.select(F.col("dst").alias("token")))
            .distinct()
            .coalesce(1)
            .persist()
        )
        outdeg = (
            edges.groupBy("src").agg(F.sum("w").alias("deg")).coalesce(1).persist()
        )
        n = nodes.count()  # materializes the caches; n is an exact BIGINT
        _CACHED[key] = (edges, nodes, outdeg, n)
    return _CACHED[key]


@register(
    "iter_pagerank_tokens",
    oracle=_pagerank_oracle(),
    doc="Iterative algorithm surface: 8 PageRank iterations as a driver-side "
    "loop over the cached token co-occurrence digraph; expression text "
    "mirrors the oracle CTE chain exactly, so it stays fully oracle-checked "
    "(NS).",
    tags=("iterative", "ns", "bench"),
)
def iter_pagerank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    edges, nodes, outdeg, n = _cached_graph(spark, sf_dir)
    # Same float text as the oracle: nn.n is BIGINT there, `n` is int here —
    # both divisions are double / exact-integer → identical IEEE results.
    pr = nodes.select("token", F.expr(f"1e0 / {n}").alias("pr"))
    for _ in range(_ITER):
        # string-qualified aliases: edges/outdeg re-enter pr's own lineage
        # each iteration, so unqualified Column refs would be ambiguous
        # broadcast: every relation here is vocab-bounded, so broadcast
        # joins are the correct strategy at ANY corpus scale — the corpus
        # was reduced to this graph in the one cached aggregation pass
        mass = (
            pr.alias("p")
            .join(F.broadcast(edges.alias("e")), F.expr("p.token = e.src"))
            .join(F.broadcast(outdeg.alias("d")), F.expr("e.src = d.src"))
            .groupBy(F.expr("e.dst").alias("dst"))
            .agg(F.expr("sum(p.pr * e.w / d.deg)").alias("m"))
        )
        pr = (
            nodes.alias("nz")
            .join(F.broadcast(mass.alias("ms")), F.expr("nz.token = ms.dst"), "left")
            .select(
                F.expr("nz.token").alias("token"),
                F.expr(f"{_JUMP} / {n} + {_DAMP} * coalesce(ms.m, 0e0)").alias("pr"),
            )
        )
    return (
        pr.select("token", F.expr(synth.q6("pr", 7)).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "token")
        .limit(20)
    )
