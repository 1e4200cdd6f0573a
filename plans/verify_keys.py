#!/usr/bin/env python
"""Re-prove changed keys against their DuckDB oracles at several SFs.

Usage: python plans/verify_keys.py [--sf 0.001,0.01,0.1] key [key ...]
Runs each key's builder and compares against the registered oracle with
tests.oracle.compare (order-insensitive, exact floats). Keys with no
oracle get a rows-only run (builder must not raise; row count printed).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from week3_2_practice_big_data__spark import REGISTRY, get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sfs = ["0.001", "0.01", "0.1"]
    if args and args[0] == "--sf":
        sfs = args[1].split(",")
        args = args[2:]
    keys = args
    from tests.oracle import compare, duck_run

    spark = get_spark("w32bd-verify-keys")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        for key in keys:
            q = REGISTRY[key]
            try:
                df = q.builder(spark, sf_dir)
                if q.oracle is None:
                    n = df.count()
                    print(f"OK(rows-only) {key}@sf{sf}: {n} rows")
                    continue
                compare(df, duck_run(q.oracle, sf_dir), f"{key}@sf{sf}")
                print(f"MATCH {key}@sf{sf}")
            except Exception as e:
                print(f"FAIL {key}@sf{sf}: {e}")
                failures.append((key, sf))
            sys.stdout.flush()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL GREEN")


if __name__ == "__main__":
    main()
