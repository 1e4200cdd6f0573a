"""Source operators (SURVEY.md §2.1-A).

`src_range_gen` is the reference's seeded blob-parameter generation
(random.seed + random.uniform loop, app.py:117-118,136-146) as a
deterministic distributed generator: `spark.range`-style series + the
cross-engine LCG (synth.py). `src_sequence` is np.linspace/arange
(app.py:26,41,141). `src_param_lookup` is the palette / theme-dict small
lookup (app.py:11-20,126-130). `src_parquet_scan` is the driver-table scan
surface (absent in the reference, REF-ANALOG by driver contract).

Scale notes: generators are embarrassingly parallel (each row's value is a
pure function of its index — no sequential RNG state), which is exactly why
the LCG is keyed by row id rather than replaying a stream; `spark.range`
partitions the id space across executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import TABLES, load_table
from ..registry import register
from .. import synth

_SEED, _NB = 42, 14


def _blobs_q6_sql(dialect: str) -> str:
    cols = ", ".join(
        f"{synth.q6(c)} AS {c}"
        for c in ("r", "wobble", "cx", "cy", "depth", "col_r", "col_g", "col_b")
    )
    return (
        f"SELECT blob_id, {cols} FROM ({synth.blobs_sql(_SEED, _NB, dialect)}) b "
        "ORDER BY blob_id"
    )


@register(
    "src_range_gen",
    oracle=_blobs_q6_sql("duckdb"),
    doc="Seeded deterministic blob-parameter generation (app.py:117-118,"
    "136-146): id-keyed LCG uniforms + HSV palette color, fully parallel.",
    tags=("source", "generative"),
)
def src_range_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_blobs_q6_sql("spark"))


_SEQ_N = 280


def _sequence_sql(dialect: str) -> str:
    theta = synth.linspace("i", "0e0", synth.TWO_PI, _SEQ_N)
    return (
        f"SELECT i, {synth.q6(theta)} AS theta FROM {synth.series_sql(_SEQ_N, 'i', dialect)} "
        "ORDER BY i"
    )


@register(
    "src_sequence",
    oracle=_sequence_sql("duckdb"),
    doc="Evenly spaced series — np.linspace(0, 2π, 280) (app.py:141).",
    tags=("source", "generative"),
)
def src_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_sequence_sql("spark"))


def _palette_sql(dialect: str) -> str:
    """Palette: n rows of (color_id, r, g, b) — diverse_palette, app.py:11-20."""
    p = synth.blob_param_exprs(_SEED, _NB, id_expr="color_id")
    return (
        f"SELECT color_id, {synth.q6(p['col_r'])} AS r, {synth.q6(p['col_g'])} AS g, "
        f"{synth.q6(p['col_b'])} AS b "
        f"FROM {synth.series_sql(_NB, 'color_id', dialect)} ORDER BY color_id"
    )


@register(
    "src_param_lookup",
    oracle=_palette_sql("duckdb"),
    doc="Small static lookup generation: the HSV palette table "
    "(app.py:11-20); broadcast-joined downstream (proj_mod_cycle).",
    tags=("source", "generative"),
)
def src_param_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_palette_sql("spark"))


_SCAN_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in TABLES
) + "\nORDER BY table_name"


@register(
    "src_parquet_scan",
    oracle=_SCAN_ORACLE,
    doc="Scan surface over all 10 driver parquet tables (REF-ANALOG; "
    "driver contract).",
    tags=("source",),
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = None
    for t in TABLES:
        df = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(t).alias("table_name"), "n_rows")
        )
        counts = df if counts is None else counts.unionByName(df)
    return counts.orderBy("table_name")
