"""NORTH-STAR embedding similarity operators (SURVEY.md §2.1-K).

Over `embeddings` (vec_id, embedding ARRAY<FLOAT> dim=64, label):

- `ns_sim_topk` — brute-force cosine top-k against a query vector, computed
  with a FIXED-ORDER array fold (zip_with + aggregate / list_reduce) so both
  engines add products in the same sequence → bit-identical scores.
- `ns_dedup_embed_cosine` — all pairs with cosine ≥ τ, computed RELATIONALLY
  (posexplode to (vec_id, dim, val) long format, join on dim, group-sum):
  this is the representation that scales — at 100 TB you partition the
  long-format table by dim-block and the pair-join by candidate bucket.
- `ns_sim_ann_lsh` — the scale path: random-hyperplane LSH buckets
  (deterministic LCG plane components), bucket histogram + within-bucket
  candidate counts. Brute force is O(n²·d); LSH makes candidate generation
  O(n·planes) + within-bucket joins.

Float discipline: products/sums of doubles from identical inputs; the only
order-nondeterministic sums (relational group-sums over 64 dims) carry
~1e-15 error against the oracle and every emitted score is q6-quantized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register
from .. import synth

_DIM = 64


def _view(spark: SparkSession, sf_dir: str) -> None:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")


def _long_sql(dialect: str) -> str:
    """(vec_id, dim, val DOUBLE) long format — explode-dialect seam."""
    if dialect == "spark":
        return """
SELECT vec_id, posexplode(embedding) AS (dim, fval)
FROM embeddings
"""
    return f"""
SELECT vec_id, d - 1 AS dim, embedding[d] AS fval
FROM embeddings, (SELECT CAST(range AS INT) + 1 AS d FROM range({_DIM})) ds
"""


def _long_cast(dialect: str) -> str:
    return (
        f"SELECT vec_id, dim, CAST(fval AS DOUBLE) AS val FROM ({_long_sql(dialect)}) e0"
    )


def _dot_fold(dialect: str, a: str, b: str) -> str:
    """Fixed-order dot product of two float arrays as DOUBLE."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0e0, (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_prepend(0e0, list_transform(generate_series(1, {_DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, v) -> acc + v)"
    )


# ---------------------------------------------------------------------------
# ns_sim_topk — brute-force cosine top-k (the correctness baseline).
# ---------------------------------------------------------------------------

_QUERY_ID = 0
_TOPK = 10


def _topk_sql(dialect: str) -> str:
    dot = _dot_fold(dialect, "c.embedding", "q.embedding")
    na = _dot_fold(dialect, "c.embedding", "c.embedding")
    nb = _dot_fold(dialect, "q.embedding", "q.embedding")
    return f"""
SELECT c.vec_id, c.label,
  {synth.q6(f"{dot} / (sqrt({na}) * sqrt({nb}))")} AS cosine
FROM embeddings c
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID}) q
WHERE c.vec_id != {_QUERY_ID}
ORDER BY cosine DESC, c.vec_id
LIMIT {_TOPK}
"""


@register(
    "ns_sim_topk",
    oracle=_topk_sql("duckdb"),
    doc="Brute-force cosine top-k against a query embedding; fixed-order "
    "array fold for bit-identical scores (NS).",
    tags=("ns", "similarity", "bench"),
)
def ns_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_topk_sql("spark"))


# ---------------------------------------------------------------------------
# ns_dedup_embed_cosine — embedding near-dup pairs, relational long format.
# ---------------------------------------------------------------------------

_COS_T = "0.4e0"


def _embed_pairs_sql(dialect: str) -> str:
    return f"""
WITH long AS ({_long_cast(dialect)}),
norms AS (
  SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM long GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi, sum(a.val * b.val) AS dot
  FROM long a JOIN long b ON a.dim = b.dim AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT d.ai, d.bi, {synth.q6("d.dot / (na.nrm * nb.nrm)")} AS cosine
FROM dots d
JOIN norms na ON d.ai = na.vec_id
JOIN norms nb ON d.bi = nb.vec_id
WHERE d.dot / (na.nrm * nb.nrm) >= {_COS_T}
ORDER BY cosine DESC, ai, bi
"""


@register(
    "ns_dedup_embed_cosine",
    oracle=_embed_pairs_sql("duckdb"),
    doc="Embedding-cosine near-dup pairs (τ=0.4) over long-format vectors — "
    "dim-join + group-sum, the partitionable 100 TB shape (NS).",
    tags=("ns", "dedup", "similarity"),
)
def ns_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_embed_pairs_sql("spark"))


# ---------------------------------------------------------------------------
# ns_sim_ann_lsh — random-hyperplane LSH bucketing (the ANN scale path).
# Plane components are LCG uniforms centered at 0, identical both engines.
# ---------------------------------------------------------------------------

_PLANES = 8


def _lsh_sql(dialect: str) -> str:
    pval = f"({synth.lcg_u('p.plane * 64 + l.dim', 1234, 0)} - 0.5e0)"
    pow2 = "CAST(floor(pow(2e0, CAST(plane AS DOUBLE)) + 0.5e0) AS BIGINT)"
    return f"""
WITH long AS ({_long_cast(dialect)}),
proj AS (
  SELECT l.vec_id, p.plane, sum(l.val * {pval}) AS dot
  FROM long l CROSS JOIN {synth.series_sql(_PLANES, "plane", dialect)} p
  GROUP BY l.vec_id, p.plane
),
buckets AS (
  SELECT vec_id,
    sum(CASE WHEN dot > 0e0 THEN {pow2} ELSE 0 END) AS bucket
  FROM proj GROUP BY vec_id
)
SELECT bucket, count(*) AS n_vecs,
  CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_candidate_pairs
FROM buckets GROUP BY bucket ORDER BY bucket
"""


@register(
    "ns_sim_ann_lsh",
    oracle=_lsh_sql("duckdb"),
    doc="ANN scale path: random-hyperplane LSH bucket assignment + candidate "
    "pair counts (replaces O(n²) with within-bucket joins) (NS).",
    tags=("ns", "similarity", "scale"),
)
def ns_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_lsh_sql("spark"))


# ---------------------------------------------------------------------------
# ns_sim_ann_ivf — IVF-style ANN: a seeded coarse quantizer (8 centroids,
# LCG components) assigns every vector to its nearest cell; the query probes
# only its nprobe=2 nearest cells and ranks those candidates by exact
# cosine. Complements ns_sim_ann_lsh: LSH prunes by hash bucket, IVF prunes
# by quantizer cell — together they cover the two standard ANN scale paths.
# Cell assignment distances are q6-quantized BEFORE the argmin row_number
# (group-sum order across 64 dims is engine-dependent at ~1e-15; quantized
# assignment + (dq, c) tie-break makes the partition the deterministic
# contract). Candidate cosines reuse the fixed-order fold → bit-identical.
# Scale notes (100 TB): the assignment pass is one dim-join + group-sum over
# the long format (partitionable by dim-block); the probe search touches
# nprobe/cells of the data — the candidate join keys on cell, so it
# shuffles only the probed cells, and real IVF swaps the seeded centroids
# for trained ones without changing the plan shape.
# ---------------------------------------------------------------------------

_IVF_CELLS = 8
_IVF_PROBE = 2
_IVF_SEED = 4242


def _ivf_sql(dialect: str) -> str:
    cval = f"({synth.uniform('cs.c * 64 + ds.dim', _IVF_SEED, 0, -1.0, 1.0)})"
    dot = _dot_fold(dialect, "cv.embedding", "qv.embedding")
    na = _dot_fold(dialect, "cv.embedding", "cv.embedding")
    nb = _dot_fold(dialect, "qv.embedding", "qv.embedding")
    return f"""
WITH long AS ({_long_cast(dialect)}),
cent AS (
  SELECT cs.c, ds.dim, {cval} AS cval
  FROM {synth.series_sql(_IVF_CELLS, "c", dialect)} cs
  CROSS JOIN {synth.series_sql(_DIM, "dim", dialect)} ds
),
dist AS (
  SELECT l.vec_id, ct.c,
    {synth.q6("sum((l.val - ct.cval) * (l.val - ct.cval))")} AS dq
  FROM long l JOIN cent ct ON l.dim = ct.dim
  GROUP BY l.vec_id, ct.c
),
assign AS (
  SELECT vec_id, c AS cell,
    row_number() OVER (PARTITION BY vec_id ORDER BY dq, c) AS rn
  FROM dist
),
cells AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
probe AS (
  SELECT cell FROM assign WHERE vec_id = {_QUERY_ID} AND rn <= {_IVF_PROBE}
)
SELECT cl.vec_id, cl.cell,
  {synth.q6(f"{dot} / (sqrt({na}) * sqrt({nb}))")} AS cosine
FROM cells cl
JOIN probe p ON cl.cell = p.cell
JOIN embeddings cv ON cl.vec_id = cv.vec_id
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID}) qv
WHERE cl.vec_id != {_QUERY_ID}
ORDER BY cosine DESC, cl.vec_id
LIMIT {_TOPK}
"""


@register(
    "ns_sim_ann_ivf",
    oracle=_ivf_sql("duckdb"),
    doc="ANN scale path #2: IVF-style coarse-quantizer cell pruning "
    "(nprobe=2 of 8 seeded centroids) + exact cosine rerank of the probed "
    "candidates (NS).",
    tags=("ns", "similarity", "scale"),
)
def ns_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_ivf_sql("spark"))
