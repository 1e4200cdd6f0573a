"""Local replay of the driver's DuckDB-oracle comparison (SURVEY.md §5.2.1).

Stricter than the driver: float columns must match EXACTLY, because the whole
engine is designed for bit-identical cross-engine results (decimal-exact money
sums, LCG integer randomness, rounded transcendental outputs). Any nonzero
float drift here is a design bug to fix, not tolerance to widen.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from week3_2_practice_big_data__spark.io import TABLES  # noqa: E402


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table (a DIRECTORY of part files, e.g. the
            # .tmp/sf1 fixture): DuckDB needs the part glob.
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con.execute(sql).fetch_df()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def compare(spark_df, duck_pdf: pd.DataFrame, key: str = "?") -> None:
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_pdf)
    assert list(s.columns) == list(d.columns), (
        f"[{key}] column mismatch: spark={list(s.columns)} duck={list(d.columns)}"
    )
    assert len(s) == len(d), f"[{key}] row count: spark={len(s)} duck={len(d)}"
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, (
                    f"[{key}] float drift col={col} row={i}: "
                    f"spark={a!r} duck={b!r} (diff={abs(a - b):g})"
                )
            else:
                if a is None or b is None:
                    assert a is b or (pd.isna(a) and pd.isna(b)), (
                        f"[{key}] null mismatch col={col} row={i}: {a!r} vs {b!r}"
                    )
                    continue
                assert a == b, f"[{key}] value mismatch col={col} row={i}: {a!r} vs {b!r}"
