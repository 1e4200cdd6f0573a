#!/usr/bin/env python
"""Decompose streaming-key wall time via StreamingQueryProgress durationMs.

Usage: python plans/profile_stream.py key [key ...]
Runs each key once (warm) then once profiled; prints per-batch
durationMs components and stateOperators commit times, summed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from week3_2_practice_big_data__spark import REGISTRY, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Tap(StreamingQueryListener):
    def __init__(self) -> None:
        super().__init__()
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        try:
            self.progress.append(json.loads(event.progress.json))
        except Exception:
            pass

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


def main() -> None:
    keys = sys.argv[1:]
    spark = get_spark("w32bd-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tap = Tap()
    spark.streams.addListener(tap)
    for key in keys:
        b = REGISTRY[key].builder
        # warm
        t0 = time.perf_counter()
        b(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        tap.progress.clear()
        t0 = time.perf_counter()
        b(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        comp: dict[str, float] = {}
        commit_ms = 0.0
        nbatch = 0
        rows = 0
        for p in tap.progress:
            nbatch += 1
            rows += int(p.get("numInputRows") or 0)
            for k, v in (p.get("durationMs") or {}).items():
                comp[k] = comp.get(k, 0.0) + float(v)
            for so in p.get("stateOperators") or []:
                commit_ms += float(so.get("commitTimeMs") or 0)
        print(f"== {key}: warm={warm:.2f}s wall={wall:.2f}s "
              f"batches={nbatch} rows={rows}")
        for k in sorted(comp, key=comp.get, reverse=True):
            print(f"   {k:<24} {comp[k]/1000.0:8.3f} s")
        print(f"   stateCommitTimeMs(sum)   {commit_ms/1000.0:8.3f} s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
