"""Statistics / ML-adjacent relational operators (REF-ANALOG).

Three shapes every analytics+ML user runs on tabular data, each expressed
as one declarative plan with the repo's cross-engine float discipline:

- `agg_histogram` — adaptive equi-width histogram. min/max are order-free
  (exact), the bucket width and floor() bucketing are single IEEE ops, so
  bucketing is bit-identical cross-engine without width_bucket dialects.
- `win_interpolate_gaps` — time-series gap filling: masked readings are
  linearly interpolated between the nearest non-null neighbors per user
  (IGNORE NULLS window frames carry both the neighbor value and ITS event
  time), edges carry the nearest observation.
- `ml_linreg_closed` — closed-form simple linear regression per group from
  EXACT decimal moments (the agg_corr_moments discipline): slope,
  intercept, R², and a point prediction. This is distributed model
  fitting as a 6-number-per-group aggregation — the single-pass shape
  that trains on 100 TB with one shuffle.

Scale notes: histogram and regression shuffle one bounded row per
(group/bucket); interpolation shuffles once on user_id for its ordered
windows — identical to the sessionization discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import synth
from ..io import load_table
from ..registry import register

_N_BUCKETS = 20


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# agg_histogram
# ---------------------------------------------------------------------------


def _histogram_sql(dialect: str) -> str:
    del dialect  # shared text
    width = f"((ext.hi - ext.lo) / {_N_BUCKETS}e0)"
    return f"""
WITH ext AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
),
bucketed AS (
  SELECT least(CAST(floor((o_totalprice - ext.lo) / {width}) AS BIGINT),
               {_N_BUCKETS - 1}) AS bucket,
    ext.lo, ext.hi
  FROM orders CROSS JOIN ext
)
SELECT bucket, count(*) AS n,
  {synth.q6(f"lo + bucket * {'((hi - lo) / ' + str(_N_BUCKETS) + 'e0)'}")} AS bucket_lo
FROM bucketed
GROUP BY bucket, lo, hi
ORDER BY bucket
"""


@register(
    "agg_histogram",
    oracle=_histogram_sql("duckdb"),
    doc="Adaptive equi-width histogram (20 buckets over the observed "
    "min/max of order totals): order-free extremes + one floor() per row, "
    "bit-identical bucketing cross-engine; top bucket closed on the max "
    "(REF-ANALOG of the reference's min-max normalization, app.py:76).",
    tags=("agg", "stats"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders")
    return spark.sql(_histogram_sql("spark"))


# ---------------------------------------------------------------------------
# win_interpolate_gaps
# ---------------------------------------------------------------------------


def _ignore_nulls(dialect: str, fn: str, expr: str, frame: str) -> str:
    """IGNORE NULLS window dialect seam: Spark puts the clause after the
    call, DuckDB inside the argument list."""
    if dialect == "spark":
        return f"{fn}({expr}) IGNORE NULLS OVER ({frame})"
    return f"{fn}({expr} IGNORE NULLS) OVER ({frame})"


def _interpolate_sql(dialect: str) -> str:
    us = "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"
    base = "PARTITION BY user_id ORDER BY us, event_id"
    prev = f"{base} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    nxt = f"{base} ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING"
    pv = _ignore_nulls(dialect, "last_value", "v", prev)
    pus = _ignore_nulls(
        dialect, "last_value", "CASE WHEN v IS NOT NULL THEN us END", prev
    )
    nv = _ignore_nulls(dialect, "first_value", "v", nxt)
    nus = _ignore_nulls(
        dialect, "first_value", "CASE WHEN v IS NOT NULL THEN us END", nxt
    )
    # Equal neighbor timestamps (possible once micros collide at scale)
    # would make the weight 0/0 = NaN; prefer the backward neighbor then.
    interp = (
        "CASE WHEN nus = pus THEN pv "
        "ELSE pv + (nv - pv) * ((us - pus) / (nus - pus + 0e0)) END"
    )
    return f"""
WITH ev AS (
  SELECT event_id, user_id, {us} AS us,
    CASE WHEN event_id % 7 = 0 THEN CAST(NULL AS DOUBLE) ELSE value END AS v
  FROM events
),
ctx AS (
  SELECT event_id, user_id, us, v,
    {pv} AS pv, {pus} AS pus, {nv} AS nv, {nus} AS nus
  FROM ev
)
SELECT event_id, user_id,
  CASE WHEN v IS NOT NULL THEN 'observed'
       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interpolated'
       ELSE 'edge' END AS fill_kind,
  {synth.q6(
        "CASE WHEN v IS NOT NULL THEN v "
        f"WHEN pv IS NOT NULL AND nv IS NOT NULL THEN {interp} "
        "ELSE coalesce(pv, nv, 0e0) END"
    )} AS v_filled
FROM ctx
ORDER BY user_id, us, event_id
"""


@register(
    "win_interpolate_gaps",
    oracle=_interpolate_sql("duckdb"),
    doc="Time-series gap filling: every 7th reading masked to NULL, then "
    "linearly interpolated between the nearest non-null neighbors per user "
    "(IGNORE NULLS frames carry neighbor value AND its event time); edges "
    "take the nearest observation. One user_id shuffle (REF-ANALOG).",
    tags=("window", "stats", "timeseries"),
)
def win_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events")
    return spark.sql(_interpolate_sql("spark"))


# ---------------------------------------------------------------------------
# ml_linreg_closed
# ---------------------------------------------------------------------------

_PRED_X = "25e0"


def _linreg_sql(dialect: str) -> str:
    del dialect  # shared text
    dx = "CAST(l_quantity AS DECIMAL(18,2))"
    dy = "CAST(l_extendedprice AS DECIMAL(18,2))"
    slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    intercept = f"(sy - ({slope}) * sx) / n"
    r2 = (
        f"(n * sxy - sx * sy) * (n * sxy - sx * sy) / "
        f"((n * sxx - sx * sx) * (n * syy - sy * sy))"
    )
    return f"""
WITH m AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM({dx}) AS DOUBLE) AS sx,
    CAST(SUM({dy}) AS DOUBLE) AS sy,
    CAST(SUM({dx} * {dx}) AS DOUBLE) AS sxx,
    CAST(SUM({dy} * {dy}) AS DOUBLE) AS syy,
    CAST(SUM({dx} * {dy}) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  {synth.q6(slope)} AS slope,
  {synth.q6(intercept)} AS intercept,
  {synth.q6(r2)} AS r2,
  {synth.q6(f"({intercept}) + ({slope}) * {_PRED_X}")} AS yhat_at_25
FROM m ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# agg_skew_kurt — population skewness / excess kurtosis per group from raw
# integer power sums: l_quantity is integer-valued, so Σx..Σx⁴ are exact
# BIGINTs (max ~50⁴·6·10⁵ ≈ 3.8e12 ≪ 2⁶³); the central-moment combination
# runs on identical doubles in both engines. The builtin skewness()/
# kurtosis() stream doubles in partition order → drift; this is order-free.
# ---------------------------------------------------------------------------


def _skew_kurt_sql(dialect: str) -> str:
    del dialect  # shared text
    q = "CAST(l_quantity AS BIGINT)"
    mom = f"""
  SELECT l_returnflag,
    CAST(count(*) AS DOUBLE) AS n,
    CAST(sum({q}) AS DOUBLE) AS s1,
    CAST(sum({q} * {q}) AS DOUBLE) AS s2,
    CAST(sum({q} * {q} * {q}) AS DOUBLE) AS s3,
    CAST(sum({q} * {q} * {q} * {q}) AS DOUBLE) AS s4
  FROM lineitem GROUP BY l_returnflag"""
    mean = "(s1 / n)"
    m2 = f"(s2 / n - {mean} * {mean})"
    m3 = f"(s3 / n - 3e0 * {mean} * s2 / n + 2e0 * {mean} * {mean} * {mean})"
    m4 = (
        f"(s4 / n - 4e0 * {mean} * s3 / n + 6e0 * {mean} * {mean} * s2 / n "
        f"- 3e0 * {mean} * {mean} * {mean} * {mean})"
    )
    return f"""
WITH m AS ({mom})
SELECT l_returnflag,
  {synth.q6(mean)} AS mean_qty,
  {synth.q6(f"{m3} / pow({m2}, 1.5e0)")} AS skewness,
  {synth.q6(f"{m4} / ({m2} * {m2}) - 3e0")} AS excess_kurtosis
FROM m ORDER BY l_returnflag
"""


@register(
    "agg_skew_kurt",
    oracle=_skew_kurt_sql("duckdb"),
    doc="Population skewness and excess kurtosis per group from exact "
    "integer power sums (Σx..Σx⁴ are BIGINT-exact for the integer-valued "
    "quantity) — order-free higher-moment statistics in one pass, the "
    "agg_corr_moments discipline extended to 3rd/4th moments "
    "(REF-ANALOG).",
    tags=("agg", "stats"),
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem")
    return spark.sql(_skew_kurt_sql("spark"))


@register(
    "ml_linreg_closed",
    oracle=_linreg_sql("duckdb"),
    doc="Closed-form simple linear regression (price ~ quantity) per "
    "return flag from exact decimal moments: slope, intercept, R², and a "
    "point prediction — distributed model fitting as one 6-number "
    "aggregation per group (REF-ANALOG; agg_corr_moments discipline).",
    tags=("agg", "stats", "ml"),
)
def ml_linreg_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem")
    return spark.sql(_linreg_sql("spark"))
