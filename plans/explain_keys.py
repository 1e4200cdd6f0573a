#!/usr/bin/env python
"""Dump .explain('formatted') for registry keys → plans/<tag>/<key>_<suffix>.txt.

Usage: python plans/explain_keys.py <suffix> key [key ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PLAN_TAG (default r13).

Streaming keys execute inside their builders and return a memory-sink
table, so their 'plan' here is just the sink scan — only batch keys give a
meaningful snapshot.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from week3_2_practice_big_data__spark import REGISTRY, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r13")


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    spark = get_spark("w32bd-explain")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), TAG)
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        df = REGISTRY[key].builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
