"""NORTH-STAR embedding similarity operators (SURVEY.md §2.1-K).

Over `embeddings` (vec_id, embedding ARRAY<FLOAT> dim=64, label):

- `ns_sim_topk` — brute-force cosine top-k against a query vector, computed
  with a FIXED-ORDER array fold (zip_with + aggregate / list_reduce) so both
  engines add products in the same sequence → bit-identical scores.
- `ns_dedup_embed_cosine` — near-dup pairs with cosine ≥ τ, LSH-GATED:
  banded-signature equi-join generates candidates, a fixed-order fold
  reranks them exactly. Never an all-pairs join.
- `ns_sim_ann_lsh` — ANN search: probe the query's band buckets, exact
  cosine rerank, top-k neighbors. Brute force is O(n²·d); LSH makes
  candidate generation an equi-join on (band, sig).

Float discipline: products/sums of doubles from identical inputs; the only
order-nondeterministic sums (relational group-sums over 64 dims) carry
~1e-15 error against the oracle and every emitted score is q6-quantized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register
from ..common import checkpointed, session_key
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
  {synth.q6(f"{dot} / nullif(sqrt({na}) * sqrt({nb}), 0e0)")} AS cosine
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
# Banded random-hyperplane LSH signatures — shared candidate-generation stage
# for ns_sim_ann_lsh and ns_dedup_embed_cosine. Deterministic-LCG hyperplanes
# → sign bits → _BANDS bands × b bits: two vectors are CANDIDATES iff they
# agree on all b bits of at least one band. This is the 100 TB pattern:
# candidate generation is an equi-join on (band, sig) — a shuffle on a small
# key — never an all-pairs join.
#
# Band WIDTH is scale-derived, not a constant: random collisions per band
# ≈ C(n,2)/2^b, so b must grow with log₂(n) for the rerank to stay ~linear
# in n (a fixed 8-bit setup measured ~260k correlated candidates on the
# clustered sf0.1 corpus). Both engines compute b = clamp(⌈log₂(count(*))⌉,
# 8, 16) from the SAME scalar subquery, so the gate — and therefore the
# emitted pair set — stays bit-identical cross-engine at every sf. The
# literal plane table carries _BANDS·16 rows (the b=16 ceiling, ~65k
# vectors); beyond that, bands (recall knob) and the plane budget grow
# together — components are seed-derived, so extending the table is free.
# ---------------------------------------------------------------------------

_BANDS = 4
_MAX_BITS = 16
_MAX_PLANES = _BANDS * _MAX_BITS  # 64 hyperplanes emitted; first 4·b used


def _bits_sql(rel: str = "embeddings") -> str:
    """Scalar (b INT): band width ⌈log₂(n)⌉ clamped to [8, 16] — shared
    text, so both engines derive the identical gate from the corpus size.
    log2 is exact in both libms at powers of two, so the ceil boundary
    cannot disagree cross-engine."""
    # greatest(count, 1) guards the empty relation: DuckDB raises on
    # log2(0) where Spark returns NULL; either way b must stay defined.
    return (
        "SELECT least(16, greatest(8, "
        "CAST(ceil(log2(CAST(greatest(count(*), 1) AS DOUBLE))) AS INT))) AS b "
        f"FROM {rel}"
    )


def _plane_components() -> list[list[float]]:
    """Hyperplane components, driver-computed: the exact doubles
    synth.lcg_u(plane*64+dim, seed=1234, draw=0) - 0.5 produces in-engine
    (pinned by tests/test_properties.py's lcg==python property). Emitting
    them as flit literals lets the projection be a plain zip_with multiply
    instead of 4M interpreted LCG chains — the kernel is a query constant,
    exactly like the Gaussian taps (synth.gaussian_kernel)."""
    m31, a, c, seed = synth.M31, synth.LCG_A, synth.LCG_C, 1234
    out = []
    for plane in range(_MAX_PLANES):
        row = []
        for dim in range(_DIM):
            key = plane * 64 + dim
            x = (key * 1000003 + seed * 7919 + c) % m31
            x = (a * x + c) % m31
            row.append(x / m31 - 0.5)
        out.append(row)
    return out


def _plane_values(dialect: str) -> str:
    """(plane, comps ARRAY<DOUBLE>) literal table, both dialects."""
    rows = []
    for plane, comps in enumerate(_plane_components()):
        lits = ", ".join(synth.flit(v) for v in comps)
        arr = f"array({lits})" if dialect == "spark" else f"[{lits}]"
        rows.append(f"({plane}, {arr})")
    vals = ", ".join(rows)
    if dialect == "spark":
        return f"(SELECT * FROM VALUES {vals} AS p(plane, comps))"
    return f"(SELECT * FROM (VALUES {vals}) AS p(plane, comps))"


def _band_sig_sql(dialect: str, rel: str = "embeddings") -> str:
    """(vec_id, band, sig) — banded LSH signature per vector of `rel`.

    Projections are FIXED-ORDER array folds per (vector, plane): the same
    sequential dim order on both engines makes every dot bit-identical, so
    the sign test has no reorder noise at all (the earlier long-format
    group-sum formulation left a measure-zero zero-crossing hazard and
    shuffled a rows×dims×planes relation; the fold is map-side only —
    measured 6.2 s → ~1 s for the sf0.1 signature build).
    """
    pow2m = (
        "CAST(floor(pow(2e0, CAST(plane % b AS DOUBLE)) + 0.5e0) AS BIGINT)"
    )
    band = "CAST(floor(CAST(plane AS DOUBLE) / CAST(b AS DOUBLE)) AS BIGINT)"
    planes = _plane_values(dialect)
    if dialect == "spark":
        dot = (
            "aggregate(zip_with(embedding, p.comps, "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0e0, (acc, v) -> acc + v)"
        )
    else:
        dot = (
            f"list_reduce(list_prepend(0e0, list_transform(generate_series(1, {_DIM}), "
            "j -> CAST(embedding[j] AS DOUBLE) * p.comps[j])), (acc, v) -> acc + v)"
        )
    return f"""
SELECT vec_id, {band} AS band,
  sum(CASE WHEN dot > 0e0 THEN {pow2m} ELSE 0 END) AS sig
FROM (
  SELECT e.vec_id, p.plane, nb.b, {dot} AS dot
  FROM {rel} e
  CROSS JOIN {planes} p
  CROSS JOIN ({_bits_sql(rel)}) nb
  WHERE p.plane < {_BANDS} * nb.b
) proj
GROUP BY vec_id, {band}
"""


_BAND_SIG_CACHE: dict[tuple, DataFrame] = {}


def _cached_band_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band signatures persisted per (session, sf): both consumers reference
    the relation twice (self-join sides / corpus+query probe) and Catalyst
    inlines CTEs, so the naive form re-runs the 32-plane projection per
    reference — the checkpoint makes each reference a materialized scan."""
    def build():
        _view(spark, sf_dir)
        return spark.sql(_band_sig_sql("spark")).coalesce(4)

    return checkpointed(_BAND_SIG_CACHE, (session_key(spark), sf_dir.rstrip("/")), build)


def _band_sig_ref(dialect: str) -> str:
    """Binding for the band_sig CTE: cached temp view on Spark, inline SQL
    (self-materialized) on DuckDB."""
    if dialect == "spark":
        return "SELECT vec_id, band, sig FROM embeddings_band_sig"
    return _band_sig_sql("duckdb")


def _emb_norm_sql(dialect: str, rel: str = "embeddings", label: bool = True) -> str:
    """(vec_id[, label], embedding, nrm) — vectors with their norm computed
    ONCE: sqrt of the fixed-order self-fold. The pair rerank then does one
    dot fold per pair instead of three (dot + two norms) — same doubles,
    same q6 output, a third of the fold work."""
    na = _dot_fold(dialect, "embedding", "embedding")
    cols = "vec_id, label, embedding" if label else "vec_id, embedding"
    return f"SELECT {cols}, sqrt({na}) AS nrm FROM {rel}"


_EMB_NORM_CACHE: dict[tuple, DataFrame] = {}


def _cached_emb_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build():
        _view(spark, sf_dir)
        return spark.sql(_emb_norm_sql("spark")).coalesce(4)

    return checkpointed(_EMB_NORM_CACHE, (session_key(spark), sf_dir.rstrip("/")), build)


def _emb_norm_ref(dialect: str) -> str:
    if dialect == "spark":
        return "SELECT vec_id, label, embedding, nrm FROM embeddings_norm"
    return _emb_norm_sql("duckdb")


# ---------------------------------------------------------------------------
# ns_dedup_embed_cosine — embedding near-dup pairs, LSH-gated, with EXACT-
# DUPLICATE COLLAPSE first. A duplicate-heavy corpus (the normal case in
# web-scale training data) makes the vector-level pair relation quadratic
# in group size: a vector duplicated d× turns one near-dup pair into d²
# pairs, and no band width can split bit-identical signatures (measured:
# 41× wall at 10× duplication in the vector-level plan). So the plan runs
# dedup the way a production pipeline does: group identical embeddings to
# one representative (exact dedup, a hash aggregate), run the banded-LSH
# gate + cosine rerank on REPRESENTATIVES only, then expand confirmed
# group pairs back to member pairs — an output-bound join. At a FIXED
# band width b the emitted pair set is IDENTICAL to the vector-level
# plan: members share their rep's signature, so a member pair collides
# iff its rep pair collides, and identical bytes give identical cosines.
# Note b itself is scale-derived as ceil(log2(n_reps)) — on a
# duplicate-heavy corpus that is narrower than ceil(log2(n_vectors)), so
# the gate admits a (different, generally wider) candidate set than the
# vector-level plan would have; the oracle is rep-level too, so
# cross-engine parity is unaffected.
# ---------------------------------------------------------------------------

_COS_T = "0.4e0"


def _rep_sql(dialect: str) -> str:
    """(vec_id, embedding) — one representative (min vec_id) per distinct
    embedding. GROUP BY on the array is exact float equality in both
    engines."""
    del dialect
    return "SELECT min(vec_id) AS vec_id, embedding FROM embeddings GROUP BY embedding"


def _gm_sql(dialect: str, rep_ref: str) -> str:
    """(vec_id, gid) — member vector → its representative."""
    del dialect
    return (
        f"SELECT e.vec_id, r.vec_id AS gid FROM embeddings e "
        f"JOIN ({rep_ref}) r ON e.embedding = r.embedding"
    )


def _embed_pairs_sql(
    dialect: str,
    band_sig_ref: str,
    norm_ref: str,
    gm_ref: str,
) -> str:
    dot = _dot_fold(dialect, "ea.embedding", "eb.embedding")
    selfdot = _dot_fold(dialect, "embedding", "embedding")
    return f"""
WITH band_sig AS ({band_sig_ref}),
emb AS ({norm_ref}),
gm AS ({gm_ref}),
cand AS (
  SELECT a.vec_id AS ga, b.vec_id AS gb
  FROM band_sig a JOIN band_sig b ON a.band = b.band AND a.sig = b.sig
    AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.ga, c.gb, {dot} / nullif(ea.nrm * eb.nrm, 0e0) AS cos
  FROM cand c
  JOIN emb ea ON c.ga = ea.vec_id
  JOIN emb eb ON c.gb = eb.vec_id
),
gpairs AS (
  SELECT DISTINCT ga, gb, {synth.q6("cos")} AS cosine
  FROM scored WHERE cos >= {_COS_T}
),
self_cos AS (
  SELECT vec_id AS g, {synth.q6(f"{selfdot} / nullif(nrm * nrm, 0e0)")} AS cosine
  FROM emb
)
SELECT ai, bi, cosine FROM (
  SELECT least(ma.vec_id, mb.vec_id) AS ai,
    greatest(ma.vec_id, mb.vec_id) AS bi, p.cosine
  FROM gpairs p
  JOIN gm ma ON ma.gid = p.ga
  JOIN gm mb ON mb.gid = p.gb
  UNION ALL
  SELECT ma.vec_id AS ai, mb.vec_id AS bi, sc.cosine
  FROM self_cos sc
  JOIN gm ma ON ma.gid = sc.g
  JOIN gm mb ON mb.gid = sc.g AND ma.vec_id < mb.vec_id
) pairs
ORDER BY cosine DESC, ai, bi
"""


def _embed_pairs_oracle() -> str:
    rep = _rep_sql("duckdb")
    return _embed_pairs_sql(
        "duckdb",
        band_sig_ref=_band_sig_sql("duckdb", rel=f"({rep})"),
        norm_ref=_emb_norm_sql("duckdb", rel=f"({rep})", label=False),
        gm_ref=_gm_sql("duckdb", rep),
    )


_CELLS_CACHE: dict[tuple, DataFrame] = {}
_REP_CACHE: dict[tuple, DataFrame] = {}
_REP_SIG_CACHE: dict[tuple, DataFrame] = {}
_REP_NORM_CACHE: dict[tuple, DataFrame] = {}
_GM_CACHE: dict[tuple, DataFrame] = {}


def _rep_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the representative relations once per (session, sf):
    reps, rep band signatures, rep norms, and the member→rep map — every
    one is consumed at least twice by the pair plan."""
    key = (session_key(spark), sf_dir.rstrip("/"))

    def reps():
        _view(spark, sf_dir)
        return spark.sql(_rep_sql("spark")).coalesce(4)

    checkpointed(_REP_CACHE, key, reps).createOrReplaceTempView("embeddings_reps")

    def sig():
        return spark.sql(_band_sig_sql("spark", rel="embeddings_reps")).coalesce(4)

    def norm():
        return spark.sql(
            _emb_norm_sql("spark", rel="embeddings_reps", label=False)
        ).coalesce(4)

    def gm():
        _view(spark, sf_dir)
        return spark.sql(
            _gm_sql("spark", "SELECT vec_id, embedding FROM embeddings_reps")
        ).coalesce(4)

    checkpointed(_REP_SIG_CACHE, key, sig).createOrReplaceTempView("reps_band_sig")
    checkpointed(_REP_NORM_CACHE, key, norm).createOrReplaceTempView("reps_norm")
    checkpointed(_GM_CACHE, key, gm).createOrReplaceTempView("embeddings_gm")


@register(
    "ns_dedup_embed_cosine",
    oracle=_embed_pairs_oracle(),
    doc="Embedding-cosine near-dup pairs (τ=0.4): exact-duplicate collapse "
    "(GROUP BY embedding → representative) FIRST, then the banded-LSH "
    "candidate gate with scale-derived band width (b=⌈log₂ n_reps⌉) and "
    "exact fixed-order cosine rerank on representatives only, then an "
    "output-bound expansion of confirmed group pairs to member pairs. "
    "Identical pair set to the vector-level plan, but duplicate-heavy "
    "corpora cost rerank work linear in DISTINCT vectors — the 100 TB "
    "shape (NS).",
    tags=("ns", "dedup", "similarity", "scale"),
)
def ns_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _rep_views(spark, sf_dir)
    return spark.sql(
        _embed_pairs_sql(
            "spark",
            band_sig_ref="SELECT vec_id, band, sig FROM reps_band_sig",
            norm_ref="SELECT vec_id, embedding, nrm FROM reps_norm",
            gm_ref="SELECT vec_id, gid FROM embeddings_gm",
        )
    )


# ---------------------------------------------------------------------------
# ns_sim_ann_lsh — banded LSH ANN search returning actual neighbors:
# probe the query's band buckets, exact-cosine rerank the candidates, top-k.
# ---------------------------------------------------------------------------


def _lsh_sql(dialect: str) -> str:
    dot = _dot_fold(dialect, "cv.embedding", "qv.embedding")
    return f"""
WITH band_sig AS ({_band_sig_ref(dialect)}),
emb AS ({_emb_norm_ref(dialect)}),
qb AS (SELECT band, sig FROM band_sig WHERE vec_id = {_QUERY_ID}),
cand AS (
  SELECT DISTINCT b.vec_id
  FROM band_sig b JOIN qb ON b.band = qb.band AND b.sig = qb.sig
  WHERE b.vec_id != {_QUERY_ID}
)
SELECT cv.vec_id, cv.label,
  {synth.q6(f"{dot} / nullif(cv.nrm * qv.nrm, 0e0)")} AS cosine
FROM cand c
JOIN emb cv ON c.vec_id = cv.vec_id
CROSS JOIN (SELECT embedding, nrm FROM emb WHERE vec_id = {_QUERY_ID}) qv
ORDER BY cosine DESC, cv.vec_id
LIMIT {_TOPK}
"""


@register(
    "ns_sim_ann_lsh",
    oracle=_lsh_sql("duckdb"),
    doc="ANN scale path: banded random-hyperplane LSH — probe the query's "
    "band buckets (equi-join on (band, sig)), exact fixed-order cosine "
    "rerank of candidates only, top-k neighbors. Mirrors the IVF probe/"
    "rerank shape; candidate generation never leaves O(n·planes) (NS).",
    tags=("ns", "similarity", "scale"),
)
def ns_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    _cached_band_sig(spark, sf_dir).createOrReplaceTempView("embeddings_band_sig")
    _cached_emb_norm(spark, sf_dir).createOrReplaceTempView("embeddings_norm")
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


def _centroid_components() -> list[list[float]]:
    """Seeded centroid components, driver-computed: the exact doubles
    synth.uniform(c*64+dim, seed=4242, draw=0, -1, 1) evaluates to
    in-engine (the LCG==python property is pinned by
    tests/test_properties.py). Literal arrays let cell assignment be a
    map-side fold instead of a rows×dims×cells join + group-sum shuffle."""
    m31, a, c_, seed = synth.M31, synth.LCG_A, synth.LCG_C, _IVF_SEED
    out = []
    for cell in range(_IVF_CELLS):
        row = []
        for dim in range(_DIM):
            key = cell * 64 + dim
            x = (key * 1000003 + seed * 7919 + c_) % m31
            x = (a * x + c_) % m31
            row.append(-1.0 + (x / m31) * 2.0)
        out.append(row)
    return out


def _centroid_values(dialect: str) -> str:
    """(c, comps ARRAY<DOUBLE>) literal centroid table, both dialects."""
    rows = []
    for cell, comps in enumerate(_centroid_components()):
        lits = ", ".join(synth.flit(v) for v in comps)
        arr = f"array({lits})" if dialect == "spark" else f"[{lits}]"
        rows.append(f"({cell}, {arr})")
    vals = ", ".join(rows)
    if dialect == "spark":
        return f"(SELECT * FROM VALUES {vals} AS ct(c, comps))"
    return f"(SELECT * FROM (VALUES {vals}) AS ct(c, comps))"


def _ivf_d2(dialect: str) -> str:
    """Squared distance of `e.embedding` to centroid `ct.comps` — the
    FIXED-ORDER fold shared by the full assignment chain and the
    persist-variant's query-only probe (identical text → identical
    doubles → identical cell choice)."""
    if dialect == "spark":
        return (
            "aggregate(zip_with(e.embedding, ct.comps, "
            "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            "0e0, (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_prepend(0e0, list_transform(generate_series(1, {_DIM}), "
        "j -> (CAST(e.embedding[j] AS DOUBLE) - ct.comps[j]) * "
        "(CAST(e.embedding[j] AS DOUBLE) - ct.comps[j]))), (acc, v) -> acc + v)"
    )


def _ivf_assign_ctes(dialect: str) -> str:
    """Shared coarse-quantizer CTE chain: dist → assign → cells (vec_id,
    cell). Consumed by the IVF probe search AND the SemDeDup within-cell
    pruning. Squared distance to each centroid is a FIXED-ORDER fold of
    the embedding against a literal centroid array — map-side only, no
    rows×dims×cells shuffle; q6 quantization before the argmin keeps the
    assignment the deterministic cross-engine contract."""
    d2 = _ivf_d2(dialect)
    return f"""dist AS (
  SELECT e.vec_id, ct.c, {synth.q6(d2)} AS dq
  FROM embeddings e CROSS JOIN {_centroid_values(dialect)} ct
),
assign AS (
  SELECT vec_id, c AS cell,
    row_number() OVER (PARTITION BY vec_id ORDER BY dq, c) AS rn
  FROM dist
),
cells AS (SELECT vec_id, cell FROM assign WHERE rn = 1)"""


def _ivf_sql(dialect: str) -> str:
    dot = _dot_fold(dialect, "cv.embedding", "qv.embedding")
    na = _dot_fold(dialect, "cv.embedding", "cv.embedding")
    nb = _dot_fold(dialect, "qv.embedding", "qv.embedding")
    return f"""
WITH {_ivf_assign_ctes(dialect)},
probe AS (
  SELECT cell FROM assign WHERE vec_id = {_QUERY_ID} AND rn <= {_IVF_PROBE}
)
SELECT cl.vec_id, cl.cell,
  {synth.q6(f"{dot} / nullif(sqrt({na}) * sqrt({nb}), 0e0)")} AS cosine
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


# ---------------------------------------------------------------------------
# ns_sim_ann_ivf_persist — the INDEX LIFECYCLE half of IVF ANN (sibling of
# ns_dedup_incremental_persist): ns_sim_ann_ivf recomputes the full
# corpus→cell assignment on every query, but a serving deployment builds
# the inverted file ONCE (the "index build" job writes (vec_id, cell) as
# parquet) and each query computes only ITS OWN probe cells (1 row × 8
# centroids, map-side) before scanning the persisted cells for the probed
# subset and reranking by exact cosine. Oracle is ns_sim_ann_ivf's
# in-flight text verbatim — the driver proves the persisted index returns
# the identical top-k. The centroid table is seeded/deterministic, so the
# persisted assignment equals the in-flight one bit-for-bit (same d2 fold
# text, same q6-then-argmin contract); the stamp keys cells/seed so a
# quantizer change rebuilds the index instead of silently reusing it.
# ---------------------------------------------------------------------------


@register(
    "ns_sim_ann_ivf_persist",
    oracle=_ivf_sql("duckdb"),
    doc="Persist-and-probe IVF ANN: the inverted file (vec_id → cell) is "
    "written once as parquet scratch (build_once, stamp-keyed) and each "
    "query computes only its own probe cells map-side, scans the "
    "PERSISTED index for the probed subset, and exact-cosine reranks — "
    "output (and oracle) identical to ns_sim_ann_ivf, proving index "
    "persistence changes only the cost model (NS; index-lifecycle "
    "sibling of ns_dedup_incremental_persist).",
    tags=("ns", "similarity", "scale"),
)
def ns_sim_ann_ivf_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..common import build_once
    from ..sources.files import _scratch

    _view(spark, sf_dir)
    out = _scratch(sf_dir, "ivfidx")

    def build(tmp: str) -> None:
        spark.sql(
            f"WITH {_ivf_assign_ctes('spark')} SELECT vec_id, cell FROM cells"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "cells.parquet"))

    build_once(out, build, stamp=f"v1:c{_IVF_CELLS}:s{_IVF_SEED}:p{_IVF_PROBE}")
    spark.read.parquet(
        os.path.join(out, "cells.parquet")
    ).createOrReplaceTempView("w32bd_ivf_cells")
    dot = _dot_fold("spark", "cv.embedding", "qv.embedding")
    na = _dot_fold("spark", "cv.embedding", "cv.embedding")
    nb = _dot_fold("spark", "qv.embedding", "qv.embedding")
    return spark.sql(f"""
WITH qdist AS (
  SELECT ct.c, {synth.q6(_ivf_d2("spark"))} AS dq
  FROM (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID}) e
  CROSS JOIN {_centroid_values("spark")} ct
),
probe AS (
  SELECT c AS cell FROM (
    SELECT c, row_number() OVER (ORDER BY dq, c) AS rn FROM qdist
  ) q WHERE rn <= {_IVF_PROBE}
)
SELECT cl.vec_id, cl.cell,
  {synth.q6(f"{dot} / nullif(sqrt({na}) * sqrt({nb}), 0e0)")} AS cosine
FROM w32bd_ivf_cells cl
JOIN probe p ON cl.cell = p.cell
JOIN embeddings cv ON cl.vec_id = cv.vec_id
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID}) qv
WHERE cl.vec_id != {_QUERY_ID}
ORDER BY cosine DESC, cl.vec_id
LIMIT {_TOPK}
""")


# ---------------------------------------------------------------------------
# ns_semdedup — semantic deduplication, SemDeDup-shaped (Abbas et al. 2023,
# arXiv:2303.09540): assign every embedding to its nearest coarse-quantizer
# cell (the IVF chain above), compute exact cosine only WITHIN each cell,
# and drop every vector that duplicates (cos ≥ τ) a lower-id vector of its
# cell — one keeper per semantic duplicate group. The cluster step is what
# bounds the quadratic term: pairwise work is Σ|cell|², never n², and at
# 100 TB the cell count grows with n (k ∝ √n keeps cells ~constant-sized)
# while the per-cell work stays an equi-join on `cell`.
# ---------------------------------------------------------------------------


def _semdedup_sql(
    dialect: str,
    norm_ref: str | None = None,
    gm_ref: str | None = None,
    cells_ref: str | None = None,
) -> str:
    # Pairwise work at REPRESENTATIVE level only (exact-duplicate collapse,
    # same reduction as ns_dedup_embed_cosine): a non-rep vector is always
    # dominated by its own rep (identical bytes, cos = 1 ≥ τ), and a rep is
    # dominated iff a LOWER-ID REP in its cell clears τ — a lower-id
    # non-rep v implies its rep r_v < v also clears τ (cos(r, v) =
    # cos(r, r_v)), so restricting the dominance join to reps loses
    # nothing. keep ⇔ (is-rep AND not dominated). Duplicate-heavy corpora
    # cost Σ|rep-cell|², not Σ|cell|².
    dot = _dot_fold(dialect, "ea.embedding", "eb.embedding")
    rep = _rep_sql(dialect)
    norm_ref = norm_ref or _emb_norm_sql(dialect, rel=f"({rep})", label=False)
    gm_ref = gm_ref or _gm_sql(dialect, rep)
    # The cells relation is consumed TWICE (pair generation + final member
    # scan); the Spark builder passes a checkpointed view so the inlined
    # CTE is not re-evaluated per reference.
    cells = (
        f"cells AS ({cells_ref})"
        if cells_ref
        else _ivf_assign_ctes(dialect)
    )
    return f"""
WITH {cells},
emb AS ({norm_ref}),
gm AS ({gm_ref}),
rcells AS (
  SELECT c.vec_id, c.cell
  FROM cells c JOIN (SELECT DISTINCT gid FROM gm) g ON c.vec_id = g.gid
),
pairs AS (
  SELECT ca.cell, ca.vec_id AS ra, cb.vec_id AS rb
  FROM rcells ca JOIN rcells cb
    ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
),
dom AS (
  SELECT DISTINCT p.rb
  FROM pairs p
  JOIN emb ea ON p.ra = ea.vec_id
  JOIN emb eb ON p.rb = eb.vec_id
  WHERE {dot} / nullif(ea.nrm * eb.nrm, 0e0) >= {_COS_T}
)
SELECT cl.vec_id, cl.cell,
  (gm.gid = cl.vec_id AND dom.rb IS NULL) AS keep
FROM cells cl
JOIN gm ON cl.vec_id = gm.vec_id
LEFT JOIN dom ON gm.gid = dom.rb
ORDER BY cl.vec_id
"""


@register(
    "ns_semdedup",
    oracle=_semdedup_sql("duckdb"),
    doc="SemDeDup-style semantic dedup (public method, arXiv:2303.09540): "
    "IVF cell assignment bounds the pairwise cosine pass to within-cell "
    "pairs, computed at exact-duplicate-collapsed representative level "
    "(dominance provably reduces to reps); a vector duplicating "
    "(cos ≥ 0.4) any lower-id cell-mate is dropped, keeping one "
    "representative per semantic group. Fixed-order folds keep the τ "
    "boundary bit-identical cross-engine (NS).",
    tags=("ns", "dedup", "similarity", "scale"),
)
def ns_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    _rep_views(spark, sf_dir)
    key = (session_key(spark), sf_dir.rstrip("/"))

    def cells():
        return spark.sql(
            f"WITH {_ivf_assign_ctes('spark')} SELECT vec_id, cell FROM cells"
        ).coalesce(4)

    checkpointed(_CELLS_CACHE, key, cells).createOrReplaceTempView(
        "embeddings_cells"
    )
    return spark.sql(
        _semdedup_sql(
            "spark",
            norm_ref="SELECT vec_id, embedding, nrm FROM reps_norm",
            gm_ref="SELECT vec_id, gid FROM embeddings_gm",
            cells_ref="SELECT vec_id, cell FROM embeddings_cells",
        )
    )


# ---------------------------------------------------------------------------
# ml_pca_power — top principal component of the embedding covariance by
# POWER ITERATION (8 rounds), fully relational: the 64×64 covariance is a
# long-format cell aggregation (q6-quantized per cell, so both engines
# iterate from the IDENTICAL matrix), each round is one matvec join +
# normalization with the new vector re-quantized — engines stay in
# lockstep round over round. Deterministic start (uniform unit vector)
# fixes the eigenvector sign. Output: 64 loadings + the Rayleigh-quotient
# eigenvalue. The PCA front half of embedding compression/whitening
# pipelines; at scale the cell aggregation is the only data-sized pass
# (dims² cells, partitionable), every iteration touches 64² cells only.
# DuckDB materializes each round (iter_kcore lesson); the Spark builder
# runs the equivalent checkpointed loop.
# ---------------------------------------------------------------------------

_PCA_ROUNDS = 8


def _pca_cov_sql(dialect: str) -> str:
    """(a, b, cell) — q6-quantized centered covariance cells.

    EXACT-INTEGER discipline (ADVICE r3: unordered sum(double) before q6
    is summation-order noise at the quantization boundary): values are
    quantized to BIGINT micro-units at the scan, the cross-product sum
    accumulates as DECIMAL(38,0) (n·1e12 per cell overflows int64 past
    ~9e6 rows), and the per-dim mean sums stay BIGINT. The centered cell
    is then ONE IEEE expression over those exact integers, so both
    engines quantize the identical double regardless of aggregation
    order/partitioning.
    """
    cell = synth.q6(
        "CAST(s.s12 AS DOUBLE) / s.n / 1e12"
        " - (CAST(ma.s1 AS DOUBLE) / s.n / 1e6)"
        " * (CAST(mb.s1 AS DOUBLE) / s.n / 1e6)"
    )
    # Saturate embedding components to ±100 before micro-unit
    # quantization (synth.sat): corrupt vectors (±1e30 floats) otherwise
    # overflow the BIGINT cast in BOTH engines, and every magnitude bound
    # in the integer chain below (v6² ≤ 1e16·n in DECIMAL, cell6·l6 ≤
    # 1e16, r6² ≤ 4e35) is derived from this input domain.
    sat_v = synth.sat("val", 100.0)
    long6 = (
        f"SELECT vec_id, dim, CAST(floor({sat_v} * 1e6 + 0.5e0) AS BIGINT) AS v6 "
        f"FROM ({_long_cast(dialect)}) lc"
    )
    return f"""
SELECT s.a, s.b, {cell} AS cell
FROM (
  SELECT la.dim AS a, lb.dim AS b,
    sum(CAST(la.v6 * lb.v6 AS DECIMAL(38,0))) AS s12,
    (SELECT count(*) + 0e0 FROM embeddings) AS n
  FROM ({long6}) la
  JOIN ({long6}) lb ON la.vec_id = lb.vec_id
  GROUP BY la.dim, lb.dim
) s
JOIN (SELECT dim, CAST(sum(v6) AS BIGINT) AS s1 FROM ({long6}) l0 GROUP BY dim) ma
  ON s.a = ma.dim
JOIN (SELECT dim, CAST(sum(v6) AS BIGINT) AS s1 FROM ({long6}) l1 GROUP BY dim) mb
  ON s.b = mb.dim
"""


def _pca_v0_sql(dialect: str) -> str:
    comp = synth.flit(1.0 / 8.0)  # 1/sqrt(64), exact binary fraction
    return f"SELECT dim, {comp} AS l FROM {synth.series_sql(_DIM, 'dim', dialect)} s"


def _pca_round_sql(cov: str, v: str) -> str:
    """One power-iteration round: matvec → normalize → re-quantize. A zero
    matvec (degenerate zero covariance, e.g. a single vector) keeps the
    zero vector instead of dividing by a zero norm.

    The matvec accumulates exact integers: cell and l are both q6 doubles,
    so their 1e6-scaled integer forms are recovered losslessly and
    sum(c6·l6) is an exact BIGINT (64 terms × ≤1e12 each); the norm sums
    r6² as DECIMAL(38,0). r/‖r‖ = r6/s12 since the 1e12 scale cancels —
    both engines divide the identical doubles, so the re-quantized vector
    is bit-identical regardless of partial-aggregation order.
    """
    mv = f"""
  SELECT c.a AS dim,
    CAST(sum(CAST(floor(c.cell * 1e6 + 0.5e0) AS BIGINT)
             * CAST(floor(v.l * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS r6
  FROM ({cov}) c JOIN ({v}) v ON c.b = v.dim GROUP BY c.a
"""
    return f"""
SELECT mv.dim,
  CASE WHEN nrm.s12 = 0e0 THEN 0e0
       ELSE {synth.q6("CAST(mv.r6 AS DOUBLE) / nrm.s12")} END AS l
FROM ({mv}) mv
CROSS JOIN (
  SELECT sqrt(CAST(sum(CAST(r6 AS DECIMAL(38,0)) * r6) AS DOUBLE)) AS s12
  FROM ({mv}) m2
) nrm
"""


def _ray_sql(cov_ref: str, v_ref: str) -> str:
    """Rayleigh quotient vᵀCv with the same exact-integer discipline: all
    three factors are q6 doubles, so the 1e6-scaled integer triple product
    is exact in DECIMAL(38,0) (≤1e18 per term × 64² terms) and the single
    final division is order-independent cross-engine."""
    return (
        "SELECT CAST(sum("
        "CAST(CAST(floor(c.cell * 1e6 + 0.5e0) AS BIGINT) AS DECIMAL(38,0))"
        " * CAST(floor(va.l * 1e6 + 0.5e0) AS BIGINT)"
        " * CAST(floor(vb.l * 1e6 + 0.5e0) AS BIGINT)"
        ") AS DOUBLE) / 1e18 AS lam "
        f"FROM {cov_ref} c JOIN {v_ref} va ON c.a = va.dim "
        f"JOIN {v_ref} vb ON c.b = vb.dim"
    )


def _pca_sql(dialect: str) -> str:
    mat = " MATERIALIZED" if dialect == "duckdb" else ""
    chain = [f"cov AS{mat} ({_pca_cov_sql(dialect)})",
             f"v0 AS{mat} ({_pca_v0_sql(dialect)})"]
    for r in range(1, _PCA_ROUNDS + 1):
        chain.append(
            f"v{r} AS{mat} ({_pca_round_sql('SELECT a, b, cell FROM cov', f'SELECT dim, l FROM v{r-1}')})"
        )
    last = f"v{_PCA_ROUNDS}"
    lam = _ray_sql("cov", last)
    return f"""
WITH {",".join(chain)},
ray AS{mat} ({lam})
SELECT v.dim, v.l AS loading, {synth.q6("ray.lam")} AS eigenvalue
FROM {last} v CROSS JOIN ray
ORDER BY v.dim
"""


@register(
    "ml_pca_power",
    oracle=_pca_sql("duckdb"),
    doc="Top principal component of the embedding covariance via 8 power-"
    "iteration rounds: q6-quantized covariance cells (identical matrix "
    "both engines), matvec join + re-quantized normalization per round, "
    "Rayleigh-quotient eigenvalue. Deterministic start fixes the sign "
    "(REF-ANALOG statml / NS embedding pipeline).",
    tags=("statml", "ns", "similarity", "iterative"),
)
def ml_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    cov = spark.sql(_pca_cov_sql("spark")).localCheckpoint(eager=True)
    cov.createOrReplaceTempView("pca_cov")
    v = spark.sql(_pca_v0_sql("spark")).localCheckpoint(eager=True)
    for _ in range(_PCA_ROUNDS):
        v.createOrReplaceTempView("pca_v")
        v = spark.sql(
            _pca_round_sql("SELECT a, b, cell FROM pca_cov", "SELECT dim, l FROM pca_v")
        ).localCheckpoint(eager=True)
    v.createOrReplaceTempView("pca_v")
    return spark.sql(f"""
WITH ray AS ({_ray_sql("pca_cov", "pca_v")})
SELECT v.dim, v.l AS loading, {synth.q6("ray.lam")} AS eigenvalue
FROM pca_v v CROSS JOIN ray
ORDER BY v.dim
""")


# ---------------------------------------------------------------------------
# iter_kmeans_embed — embedding k-means topic clustering (r9, VERDICT r8
# item 5): the topic-balancing stage real pretraining mixes run — cluster
# the embedding corpus into K topics with Lloyd iterations, then convert
# the cluster shares into a balanced-sampling weight (uniform-topic
# target: w_c = total / (K·n_c), micro-units).
#
# Spark shape (the plan you'd run at 100 TB): ASSIGNMENT IS A PURE
# PROJECTION — the K=8 centroids are literal arrays folded against each
# embedding with the IVF fixed-order fold, argmin via array_min over
# (dq, c) structs (struct ordering = exact (dq, c) tie-break; pinned by
# tests) — no rows×K join, no per-vector window, NO shuffle. The only
# corpus shuffle per round is the partial-agg groupBy on (cell, dim)
# (map-side combine → K·64 rows per partition). The Lloyd loop moves
# driver-side: each round collects the K×64 micro-unit sums (bounded
# summary, like the BFS frontier stats) and embeds the next centroids as
# literals — exactly how a production k-means ships centroids back each
# round. Rounds 1-2 stats are emitted as literal rows; round 3 stays a
# LIVE lazy plan (assignment + stats + weights), so the returned
# DataFrame re-runs real corpus work under the driver.
#
# Exactness discipline (the iter_kmeans_points contract over real
# embeddings): per-round distances are q6-quantized BEFORE the argmin;
# centroid components are EXACT micro-unit BIGINT sums divided once
# (comp = CAST(sx_u AS DOUBLE) / (CAST(n AS DOUBLE)·1e6) — the identical
# IEEE parse tree in Python, Spark, and DuckDB, so round r's literals
# equal the oracle's relationally-computed centroids bit-for-bit);
# inertia is the exact micro-unit sum of the (saturated) assigned
# distances; weights are pure BIGINT floor division. Empty cells keep
# their previous centroid and emit n_vecs = 0, weight 0. The DuckDB
# oracle is the fully unrolled 3-round MATERIALIZED-CTE chain (window
# argmin over the cross join — a different derivation of the same
# values).
# ---------------------------------------------------------------------------

_KME_K = _IVF_CELLS  # 8 topics; init = the shared IVF seeded centroids
_KME_ROUNDS = 3
_KME_SAT_X = 4.0  # component clamp for the micro-unit centroid sums
_KME_SAT_D = 1e6  # squared-distance clamp for the inertia micro units


def _kme_xu(dialect: str, expr: str) -> str:
    return (
        f"CAST(floor({synth.sat(expr, _KME_SAT_X)} * 1000000e0 + 0.5e0) "
        "AS BIGINT)"
    )


def _kme_du(dialect: str, expr: str) -> str:
    return (
        f"CAST(floor({synth.sat(expr, _KME_SAT_D)} * 1000000e0 + 0.5e0) "
        "AS BIGINT)"
    )


def _kme_cents_literal(cents: list[list[float]]) -> str:
    """Spark literal array-of-arrays for the current centroids."""
    rows = ", ".join(
        "array(" + ", ".join(synth.flit(v) for v in comps) + ")"
        for comps in cents
    )
    return f"array({rows})"


def _kme_amin(cents: list[list[float]]) -> str:
    """Projection argmin: fold the embedding against each literal centroid
    (the IVF fixed-order fold), q6 the distance, array_min over
    named_struct('dq', …, 'c', cc) — struct ordering gives the exact
    (dq, c) tie-break with zero joins and zero windows."""
    fold = (
        "aggregate(zip_with(embedding, element_at("
        + _kme_cents_literal(cents)
        + ", cc + 1), (x, y) -> (CAST(x AS DOUBLE) - y) "
        "* (CAST(x AS DOUBLE) - y)), 0e0, (acc, v) -> acc + v)"
    )
    return (
        f"array_min(transform(sequence(0, {_KME_K - 1}), cc -> "
        f"named_struct('dq', coalesce({synth.q6(fold)}, 1e300), 'c', cc)))"
    )


def _kme_round_sql(cents: list[list[float]]) -> str:
    """One Lloyd round's combined one-pass stats (Spark): per (cell, dim)
    micro-unit component sums + per-cell n and inertia (the d = 0 rows
    carry them) — a single corpus scan, assignment in the projection."""
    return f"""
WITH asg AS (
  SELECT {_kme_amin(cents)} AS am, embedding
  FROM embeddings
  WHERE embedding IS NOT NULL AND size(embedding) = {_DIM}
)
SELECT am.c AS cell, pos AS d,
  sum({_kme_xu("spark", "CAST(x AS DOUBLE)")}) AS sx_u,
  count(*) AS n, sum({_kme_du("spark", "am.dq")}) AS si_u
FROM asg LATERAL VIEW posexplode(embedding) t AS pos, x
GROUP BY am.c, pos
"""


def _kme_final_sql(cents: list[list[float]]) -> str:
    """Round-3 LIVE stats + balanced-topic sampling weights (Spark): the
    sum(n) OVER () is an unpartitioned window over the ≤ K-row stats
    summary (bounded by construction — window-audit exempt)."""
    return f"""
WITH asg AS (
  SELECT {_kme_amin(cents)} AS am
  FROM embeddings
  WHERE embedding IS NOT NULL AND size(embedding) = {_DIM}
),
stats AS (
  SELECT am.c AS cell, count(*) AS n,
    sum({_kme_du("spark", "am.dq")}) AS si
  FROM asg GROUP BY am.c
),
spine AS (SELECT explode(sequence(0, {_KME_K - 1})) AS cluster),
w AS (
  SELECT cell, n, si, sum(n) OVER () AS total FROM stats
)
SELECT CAST({_KME_ROUNDS} AS INT) AS round, CAST(s.cluster AS INT) AS cluster,
  coalesce(w.n, CAST(0 AS BIGINT)) AS n_vecs,
  coalesce(w.si, CAST(0 AS BIGINT)) AS inertia_u,
  CASE WHEN w.n IS NULL THEN CAST(0 AS BIGINT)
       ELSE w.total * 1000000 DIV ({_KME_K} * w.n) END AS weight_u
FROM spine s LEFT JOIN w ON s.cluster = w.cell
"""


def _kme_oracle_ctes() -> str:
    """The unrolled 3-round MATERIALIZED Lloyd CTE chain (DuckDB WITH
    body, through asg/stats of every round) — shared by the
    iter_kmeans_embed oracle and the ns_topic_mixture oracle."""
    d2 = _ivf_d2("duckdb")
    parts = [
        f"""WITH ev AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {_DIM}
),
dims AS (SELECT unnest(generate_series(1, {_DIM})) AS j),
spine AS (SELECT unnest(generate_series(0, {_KME_K - 1})) AS cluster),
cent0 AS MATERIALIZED (SELECT c, comps FROM {_centroid_values("duckdb")} ct0)"""
    ]
    for r in range(1, _KME_ROUNDS + 1):
        parts.append(f""",
asg{r} AS MATERIALIZED (
  SELECT vec_id, embedding, c AS cell,
    {_kme_du("duckdb", "dq")} AS dq_u
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dq, c) AS rn
    FROM (
      SELECT e.vec_id, e.embedding, ct.c, coalesce({synth.q6(d2)}, 1e300) AS dq
      FROM ev e CROSS JOIN cent{r - 1} ct
    ) d0
  ) d1 WHERE rn = 1
),
stats{r} AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(dq_u) AS BIGINT) AS si
  FROM asg{r} GROUP BY cell
)""")
        if r < _KME_ROUNDS:
            parts.append(f""",
sums{r} AS (
  SELECT a.cell, d.j,
    CAST(sum({_kme_xu("duckdb", "CAST(a.embedding[d.j] AS DOUBLE)")}) AS BIGINT) AS sx
  FROM asg{r} a CROSS JOIN dims d GROUP BY a.cell, d.j
),
cent{r} AS MATERIALIZED (
  SELECT p.c, list(
    CASE WHEN st.n IS NULL THEN p.comps[d.j]
         ELSE CAST(su.sx AS DOUBLE) / (CAST(st.n AS DOUBLE) * 1000000e0)
    END ORDER BY d.j) AS comps
  FROM cent{r - 1} p CROSS JOIN dims d
  LEFT JOIN stats{r} st ON st.cell = p.c
  LEFT JOIN sums{r} su ON su.cell = p.c AND su.j = d.j
  GROUP BY p.c
)""")
    return "".join(parts)


def _kme_oracle_sql() -> str:
    """Full iter_kmeans_embed oracle: the shared Lloyd chain + the
    spine-completed per-round stats with BIGINT floor-division weights.
    Every sum is CAST AS BIGINT (HUGEINT trap)."""
    parts = [_kme_oracle_ctes()]
    rounds = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS INT) AS round, CAST(s.cluster AS INT) AS cluster,
  coalesce(st.n, 0) AS n_vecs, coalesce(st.si, 0) AS inertia_u,
  CASE WHEN st.n IS NULL THEN CAST(0 AS BIGINT)
       ELSE (t{r}.total * 1000000) // ({_KME_K} * st.n) END AS weight_u
FROM spine s
LEFT JOIN stats{r} st ON s.cluster = st.cell
CROSS JOIN (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS total
            FROM stats{r}) t{r}"""
        for r in range(1, _KME_ROUNDS + 1)
    )
    parts.append(f"\n{rounds}\nORDER BY round, cluster")
    return "".join(parts)


def _kme_lloyd(spark: SparkSession, sf_dir: str):
    """Run the driver-side Lloyd rounds 1..R−1 (each ONE corpus pass
    collecting the K×64 micro-unit summary) and return (final centroids,
    literal per-round stat rows). Shared by iter_kmeans_embed (which
    appends the live round-R plan) and ns_topic_mixture (which consumes
    only the final centroids)."""
    _view(spark, sf_dir)
    cents = [list(c) for c in _centroid_components()]
    lit_rows = []
    for rnd in range(1, _KME_ROUNDS):
        per: dict[int, dict[int, dict]] = {}
        for row in spark.sql(_kme_round_sql(cents)).collect():
            per.setdefault(row["cell"], {})[row["d"]] = row
        new_cents, stats = [], {}
        for c in range(_KME_K):
            if c in per:
                n = int(per[c][0]["n"])
                stats[c] = (n, int(per[c][0]["si_u"]))
                new_cents.append(
                    [int(per[c][d]["sx_u"]) / (n * 1e6) for d in range(_DIM)]
                )
            else:
                stats[c] = (0, 0)
                new_cents.append(cents[c])
        total = sum(n for n, _ in stats.values())
        for c in range(_KME_K):
            n, si = stats[c]
            w = (total * 1_000_000) // (_KME_K * n) if n else 0
            lit_rows.append(f"({rnd}, {c}, {n}, {si}, {w})")
        cents = new_cents
    return cents, lit_rows



@register(
    "iter_kmeans_embed",
    oracle=_kme_oracle_sql(),
    doc="Embedding k-means topic clustering + balanced-topic sampling "
    "weights: 3 Lloyd rounds over the 64-dim embedding corpus, K=8 "
    "seeded (IVF-shared) initial centroids. Assignment is a pure "
    "PROJECTION (literal-centroid fixed-order fold + array_min struct "
    "argmin — no join, no window, no shuffle); one partial-agg corpus "
    "shuffle per round; Lloyd loop driver-side over K×64 micro-unit "
    "summaries. q6 distances before argmin, exact BIGINT centroid/ "
    "inertia sums, BIGINT floor-division weights; oracle = unrolled "
    "MATERIALIZED 3-round chain (NS; the topic-balancing mixture stage).",
    tags=("iterative", "ns", "similarity", "scale"),
)
def iter_kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents, lit_rows = _kme_lloyd(spark, sf_dir)
    lits = ", ".join(lit_rows)
    return spark.sql(f"""
SELECT CAST(round AS INT) AS round, CAST(cluster AS INT) AS cluster,
  CAST(n_vecs AS BIGINT) AS n_vecs, CAST(inertia_u AS BIGINT) AS inertia_u,
  CAST(weight_u AS BIGINT) AS weight_u
FROM VALUES {lits} AS t(round, cluster, n_vecs, inertia_u, weight_u)
UNION ALL
({_kme_final_sql(cents)})
ORDER BY round, cluster
""")


# ---------------------------------------------------------------------------
# ns_topic_mixture — topic-balanced token-budget allocation (r9): the
# composition VERDICT r8 item 5 points at — the k-means topic weights
# actually FEEDING a mixture plan. The final Lloyd centroids assign every
# embedding to its topic; the 1:1 vec_id ↔ doc_id join brings in each
# document's token mass; per topic the output carries the doc count,
# token mass, the balanced-sampling weight w_c = total_docs·1e6 DIV
# (K·n_c), and the allocated token budget alloc_u = w_c · token_mass —
# the per-topic expected sampled tokens under uniform-topic resampling
# (alloc_u/1e6 sums to ~total tokens when topics are balanced; skewed
# topics are up/down-weighted exactly).
#
# Plan shape: the assignment is the same shuffle-free projection argmin;
# ONE corpus join (embeddings ⋈ documents on the id, both sides pruned
# to two columns) feeds a K-row partial agg; weights/allocations are
# pure BIGINT arithmetic over the ≤K-row summary (the sum OVER () is
# window-audit-exempt bounded). Oracle = the shared unrolled Lloyd CTE
# chain + the same join/rollup, every sum CAST AS BIGINT.
# ---------------------------------------------------------------------------


def _topic_mixture_live_sql(cents: list[list[float]]) -> str:
    return f"""
WITH asg AS (
  SELECT vec_id, {_kme_amin(cents)} AS am
  FROM embeddings
  WHERE embedding IS NOT NULL AND size(embedding) = {_DIM}
),
docs AS (
  SELECT doc_id,
    CASE WHEN text IS NULL THEN CAST(0 AS BIGINT)
         ELSE CAST(size(split(text, ' ')) AS BIGINT) END AS tok
  FROM documents
),
tm AS (
  SELECT asg.am.c AS cell, count(*) AS n_docs,
    coalesce(sum(d.tok), CAST(0 AS BIGINT)) AS n_tokens
  FROM asg JOIN docs d ON asg.vec_id = d.doc_id
  GROUP BY asg.am.c
),
w AS (SELECT cell, n_docs, n_tokens, sum(n_docs) OVER () AS total FROM tm),
spine AS (SELECT explode(sequence(0, {_KME_K - 1})) AS topic)
SELECT CAST(s.topic AS INT) AS topic,
  coalesce(w.n_docs, CAST(0 AS BIGINT)) AS n_docs,
  coalesce(w.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
  CASE WHEN w.n_docs IS NULL THEN CAST(0 AS BIGINT)
       ELSE w.total * 1000000 DIV ({_KME_K} * w.n_docs) END AS weight_u,
  CASE WHEN w.n_docs IS NULL THEN CAST(0 AS BIGINT)
       ELSE (w.total * 1000000 DIV ({_KME_K} * w.n_docs)) * w.n_tokens
  END AS alloc_tokens_u
FROM spine s LEFT JOIN w ON s.topic = w.cell
ORDER BY topic
"""


def _topic_mixture_oracle() -> str:
    return _kme_oracle_ctes() + f""",
docs AS (
  SELECT doc_id,
    CASE WHEN text IS NULL THEN CAST(0 AS BIGINT)
         ELSE CAST(len(string_split(text, ' ')) AS BIGINT) END AS tok
  FROM documents
),
tm AS (
  SELECT a.cell, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(coalesce(sum(d.tok), 0) AS BIGINT) AS n_tokens
  FROM asg{_KME_ROUNDS} a JOIN docs d ON a.vec_id = d.doc_id
  GROUP BY a.cell
),
tot AS (SELECT CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS total FROM tm)
SELECT CAST(s.cluster AS INT) AS topic,
  coalesce(tm.n_docs, 0) AS n_docs,
  coalesce(tm.n_tokens, 0) AS n_tokens,
  CASE WHEN tm.n_docs IS NULL THEN CAST(0 AS BIGINT)
       ELSE (t.total * 1000000) // ({_KME_K} * tm.n_docs) END AS weight_u,
  CASE WHEN tm.n_docs IS NULL THEN CAST(0 AS BIGINT)
       ELSE ((t.total * 1000000) // ({_KME_K} * tm.n_docs)) * tm.n_tokens
  END AS alloc_tokens_u
FROM spine s
LEFT JOIN tm ON s.cluster = tm.cell
CROSS JOIN tot t
ORDER BY topic
"""


@register(
    "ns_topic_mixture",
    oracle=_topic_mixture_oracle(),
    doc="Topic-balanced mixture allocation: the k-means topic assignment "
    "(final Lloyd centroids, shuffle-free projection argmin) joined 1:1 "
    "to the documents' token mass, rolled up per topic with the balanced "
    "sampling weight total·1e6 DIV (K·n) and the allocated token budget "
    "weight·tokens — cluster shares feeding an actual sampling plan, all "
    "BIGINT-exact over a ≤K-row summary (NS; composes iter_kmeans_embed "
    "into the mixture family).",
    tags=("ns", "similarity", "iterative", "scale"),
)
def ns_topic_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents, _ = _kme_lloyd(spark, sf_dir)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_topic_mixture_live_sql(cents))
