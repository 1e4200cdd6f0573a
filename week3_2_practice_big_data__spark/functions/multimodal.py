"""NORTH-STAR multimodal-column operators (SURVEY.md §2.1-K `ns_multimodal_cols`).

Pattern: media lives in opaque BinaryType columns next to typed metadata;
compute that needs the bytes runs as Arrow-batched pandas UDFs / mapInPandas
(never per-row Python), everything else stays relational on the metadata.

The engine's own generative renders (plans/generative.py) supply real PNG
bytes; metadata decode parses the PNG IHDR for real. Deep decode (full pixel
decode / resize / frame sampling) would need image/video libs the container
doesn't ship — per the driver brief those steps are STUBBED deterministically
(`_stub_feature`) while the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..session import ensure_package_on_workers
from ..plans.generative import udf_grouped_map_render


def _posters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return udf_grouped_map_render(spark, sf_dir)


@register(
    "ns_multimodal_cols",
    oracle=None,  # binary column → rows-only; pytest validates bytes
    doc="Multimodal rows: PNG BinaryType column + typed metadata (width, "
    "height, byte size) side by side, produced fully in-executor (NS).",
    tags=("ns", "multimodal"),
)
def ns_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    posters = _posters(spark, sf_dir)
    return posters.select(
        "blob_id",
        "width",
        "height",
        F.octet_length("png").alias("n_bytes"),
        "png",
    ).orderBy("blob_id")


@register(
    "ns_mm_decode_meta",
    oracle=None,  # parses binary — rows-only; pytest asserts consistency
    doc="Metadata decode from the binary column: IHDR width/height parsed "
    "from PNG bytes by an Arrow-batched pandas UDF, cross-checked against "
    "the stored metadata columns (NS).",
    tags=("ns", "multimodal", "udf"),
)
def ns_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_on_workers(spark)

    @F.pandas_udf("w int, h int")
    def parsed_dims(png: pd.Series) -> pd.DataFrame:
        from week3_2_practice_big_data__spark.plans.png import png_dimensions

        dims = png.map(lambda b: png_dimensions(bytes(b)))
        return pd.DataFrame({"w": dims.map(lambda d: d[0]), "h": dims.map(lambda d: d[1])})

    posters = _posters(spark, sf_dir)
    return (
        posters.withColumn("parsed", parsed_dims("png"))  # one parse per PNG
        .select(
            "blob_id",
            "width",
            "height",
            F.col("parsed.w").alias("parsed_width"),
            F.col("parsed.h").alias("parsed_height"),
            (
                (F.col("parsed.w") == F.col("width"))
                & (F.col("parsed.h") == F.col("height"))
            ).alias("meta_consistent"),
        )
        .orderBy("blob_id")
    )


def _stub_feature(png: bytes, n: int = 8) -> list[float]:
    """Deterministic FAKE feature extractor (real decode needs image libs
    absent from this container). Features are byte-histogram moments over
    the compressed stream — stable, reproducible, obviously not semantic.
    A real deployment swaps this body for a true decoder; the Spark-side
    contract (bytes in → fixed-dim float vector out) is unchanged."""
    chunk = max(1, len(png) // n)
    return [
        round(sum(png[i * chunk : (i + 1) * chunk]) / (255.0 * chunk + 1e-9), 6)
        for i in range(n)
    ]


def real_decode(png: bytes):
    """Full pixel decode — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "pixel decode requires an image library not shipped in this "
        "container; use _stub_feature for the deterministic fake path"
    )


@register(
    "ns_mm_feature_stub",
    oracle=None,  # stubbed decode — rows-only
    doc="Feature extraction over binary media via mapInPandas: Arrow batches "
    "of (id, bytes) → fixed-dim float vectors. Decode step is a documented "
    "deterministic stub (no image libs in container); batch shape, schema "
    "and partitioning are the real 100 TB plumbing (NS).",
    tags=("ns", "multimodal", "udf"),
)
def ns_mm_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_on_workers(spark)
    posters = _posters(spark, sf_dir)

    def extract(batches):
        for pdf in batches:
            feats = pdf["png"].map(lambda b: _stub_feature(bytes(b)))
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "n_bytes": pdf["png"].map(len),
                    "features": feats,
                }
            )

    return (
        posters.select("blob_id", "png")
        .mapInPandas(extract, "blob_id bigint, n_bytes bigint, features array<double>")
        .orderBy("blob_id")
    )
