#!/usr/bin/env python
"""Full-registry oracle sweep over the adversarial-distribution fixture
(r13, VERDICT r12 item 7 — the skew/NULL/unicode regime gen_skew.py
builds at sf1-class scale).

For every registered key: run the Spark builder AND the DuckDB oracle
on .tmp/sf_skew, compare bit-for-bit (the driver's value semantics,
NULL/NaN-aware), and record per-key wall seconds — a key whose wall
explodes here but not at sf1 is sitting on a straggler partition (the
hot user/part/supplier own ~10% of their tables). Rows-only keys run
for spark_rows >= 0. Output: one JSON artifact
(SKEW_sweep_{round}.json) with per-key status/rows/wall plus a summary
header; prints progress lines as it goes.

Uses a VANILLA local[8] session like the correctness driver (not the
tuned get_spark) so session-conf dependencies surface too.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SKEW_DIR = os.path.join(REPO, ".tmp", "sf_skew")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].map(
            lambda v: hasattr(v, "__iter__") and not isinstance(v, (str, bytes))
        ).any():
            pdf[c] = pdf[c].map(
                lambda v: repr(list(v))
                if hasattr(v, "__iter__") and not isinstance(v, (str, bytes))
                else v
            )
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def _cells_eq(a, b):
    import pandas as pd

    if (
        a is None
        or b is None
        or (isinstance(a, float) and a != a)
        or (isinstance(b, float) and b != b)
    ):
        return bool(pd.isna(a)) and bool(pd.isna(b))
    return a == b


def main() -> None:
    import duckdb
    import importlib.util

    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("w32bd-skew-sweep")
        # Heap is machine capacity, not a SQL conf: the vanilla-session
        # point is catching SQL-conf dependencies, but the 1g default
        # driver heap OOMs on the first 6M-row aggregation at this scale.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SKEW_DIR, f"{t}.parquet")
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    qs, oracles = m.queries(), m.oracle_sql()
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    keys = only if only else sorted(qs)
    report: dict[str, dict] = {}
    bad = 0
    import faulthandler

    for key in keys:
        # Watchdog: a key that sits >10 min dumps all stacks to stderr
        # (run continues) — the r13 first run burned 15 min inside a
        # DuckDB CROSS_PRODUCT misplan with nothing in the log to show
        # which statement was stuck.
        faulthandler.cancel_dump_traceback_later()
        faulthandler.dump_traceback_later(600, exit=False)
        print("RUN", key, flush=True)
        t0 = time.perf_counter()
        row: dict = {}
        try:
            sdf = qs[key](spark, SKEW_DIR)
            spdf = _norm(sdf.toPandas())
            row["spark_rows"] = int(len(spdf))
            row["spark_wall_s"] = round(time.perf_counter() - t0, 2)
            if key in oracles:
                t1 = time.perf_counter()
                dpdf = _norm(con.execute(oracles[key]).fetch_df())
                row["oracle_wall_s"] = round(time.perf_counter() - t1, 2)
                row["oracle_rows"] = int(len(dpdf))
                ok = spdf.shape == dpdf.shape and list(spdf.columns) == list(
                    dpdf.columns
                )
                if ok:
                    for c in spdf.columns:
                        if not all(
                            _cells_eq(x, y)
                            for x, y in zip(spdf[c].tolist(), dpdf[c].tolist())
                        ):
                            ok = False
                            row["first_bad_col"] = c
                            break
                row["status"] = "MATCH" if ok else "MISMATCH"
            else:
                row["status"] = "ROWS-ONLY"
        except Exception as ex:
            row["status"] = "ERROR"
            row["err"] = repr(ex)[:400]
            row["spark_wall_s"] = round(time.perf_counter() - t0, 2)
        if row["status"] in ("MISMATCH", "ERROR"):
            bad += 1
        report[key] = row
        print(
            row["status"],
            key,
            row.get("spark_rows", "-"),
            f"{row.get('spark_wall_s', 0)}s",
            flush=True,
        )

    summary = {
        "fixture": SKEW_DIR,
        "regime": "hot10pct keys / null90 columns / unicode30 text @10x sf0.1",
        "keys": len(report),
        "match": sum(1 for r in report.values() if r["status"] == "MATCH"),
        "rows_only": sum(
            1 for r in report.values() if r["status"] == "ROWS-ONLY"
        ),
        "mismatch": sorted(
            k for k, r in report.items() if r["status"] == "MISMATCH"
        ),
        "error": sorted(k for k, r in report.items() if r["status"] == "ERROR"),
        "slowest": sorted(
            (
                (r.get("spark_wall_s", 0), k)
                for k, r in report.items()
            ),
            reverse=True,
        )[:15],
    }
    round_tag = os.environ.get("SPARK_GRAFT_ROUND", "r13")
    out = os.path.join(REPO, f"SKEW_sweep_{round_tag}.json")
    if os.path.exists(out) and "--force" not in sys.argv:
        n = 2
        while os.path.exists(
            os.path.join(REPO, f"SKEW_sweep_{round_tag}_run{n}.json")
        ):
            n += 1
        out = os.path.join(REPO, f"SKEW_sweep_{round_tag}_run{n}.json")
    with open(out, "w") as f:
        json.dump({"summary": summary, "keys": report}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
    print(json.dumps(summary))
    print("bad =", bad)


if __name__ == "__main__":
    main()
