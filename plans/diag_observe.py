#!/usr/bin/env python
"""Diagnose the dq_observe_metrics in-bench anomaly (VERDICT r13 item 2).

Hypothesis: Observation.get blocks on a SQL-execution-end event delivered
through the session's async listener bus; in a bench session the bus is
backlogged with task/stage events from the preceding keys, so obs.get
waits for the BACKLOG to drain, not for its own query. Isolated probes
(quiet bus) sit at ~0.9 s while in-bench medians read 2-4x that, and the
8-core bench (fewer tasks => fewer events) reads FASTER than 32-core —
both signatures of bus wait, not compute.

Method: decompose the builder's wall into (noop write) vs (obs.get wait)
twice — first on a quiet session, then immediately after generating heavy
event traffic (a burst of multi-stage jobs run right before, WITHOUT
waiting for the bus). Prints the components; if obs.get dominates only in
the noisy case, the hypothesis is confirmed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from week3_2_practice_big_data__spark import get_spark  # noqa: E402
from week3_2_practice_big_data__spark.io import load_table  # noqa: E402
from week3_2_practice_big_data__spark import synth  # noqa: E402
from week3_2_practice_big_data__spark.operators.quality import (  # noqa: E402
    _OBS_VALUE_U,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def observe_decomposed(spark) -> tuple[float, float]:
    """(noop_write_s, obs_get_s) for the dq_observe_metrics pipeline."""
    ev = load_table(spark, SF_DIR, "events")
    obs = Observation()
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("props").isNull().cast("long")).alias("n_null_props"),
        F.coalesce(
            F.sum(
                F.expr(
                    _OBS_VALUE_U.format(
                        sat=synth.sat("coalesce(value, 0e0)", 1e9)
                    )
                )
            ),
            F.lit(0).cast("long"),
        ).alias("sum_value_u"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )
    t0 = time.perf_counter()
    (
        observed.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    t1 = time.perf_counter()
    _ = obs.get
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1


def burst(spark, n_jobs: int) -> None:
    """Generate a burst of multi-stage jobs (event traffic) without
    waiting for the listener bus."""
    li = load_table(spark, SF_DIR, "lineitem")
    for i in range(n_jobs):
        (
            li.repartition(64, "l_orderkey")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )


def main() -> None:
    spark = get_spark("w32bd-diag-observe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    observe_decomposed(spark)
    quiet = [observe_decomposed(spark) for _ in range(4)]
    for w, g in quiet:
        print(f"quiet: noop={w:.3f}s obs.get={g:.3f}s")
    burst(spark, 8)
    noisy1 = observe_decomposed(spark)
    print(f"noisy(after 8-job burst): noop={noisy1[0]:.3f}s obs.get={noisy1[1]:.3f}s")
    burst(spark, 16)
    noisy2 = observe_decomposed(spark)
    print(f"noisy(after 16-job burst): noop={noisy2[0]:.3f}s obs.get={noisy2[1]:.3f}s")
    # drain the bus, then re-probe: should return to quiet levels
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception as e:  # private API; report if it moved
        print("waitUntilEmpty unavailable:", e)
    drained = observe_decomposed(spark)
    print(f"after drain: noop={drained[0]:.3f}s obs.get={drained[1]:.3f}s")


if __name__ == "__main__":
    main()
