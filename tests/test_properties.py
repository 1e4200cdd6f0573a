"""Property-based tests (hypothesis) for the cross-engine determinism layer.

No SparkSession needed: properties are checked by evaluating the generated
SQL text in DuckDB and/or plain Python — fast, wide input coverage.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from week3_2_practice_big_data__spark import synth


@given(st.integers(min_value=0, max_value=10**6), st.integers(min_value=0, max_value=999))
@settings(max_examples=50, deadline=None)
def test_lcg_uniform_in_unit_interval(key, seed):
    # key expressions must be BIGINT (engine series are BIGINT-cast)
    (u,) = duckdb.sql(
        f"SELECT {synth.lcg_u(f'CAST({key} AS BIGINT)', seed, 0)}"
    ).fetchone()
    assert 0.0 <= u < 1.0


@given(
    st.integers(min_value=0, max_value=10**6),
    st.floats(min_value=-100, max_value=100, allow_nan=False),
    st.floats(min_value=0.001, max_value=100, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_uniform_respects_bounds(key, lo, width):
    hi = lo + width
    (u,) = duckdb.sql(
        f"SELECT {synth.uniform(f'CAST({key} AS BIGINT)', 42, 0, lo, hi)}"
    ).fetchone()
    assert lo <= u <= hi


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_q6_idempotent_and_close(x):
    (q1,) = duckdb.sql(f"SELECT {synth.q6(synth.flit(x))}").fetchone()
    (q2,) = duckdb.sql(f"SELECT {synth.q6(synth.flit(q1))}").fetchone()
    assert q2 == q1  # quantizer is idempotent
    assert abs(q1 - x) <= 5.0000001e-7 + abs(x) * 1e-12


@given(st.floats(min_value=0.05, max_value=8.0))
@settings(max_examples=50, deadline=None)
def test_gaussian_kernel_normalized(sigma):
    taps = synth.gaussian_kernel(sigma)
    assert abs(sum(w for _, w in taps) - 1.0) < 1e-12
    offs = [o for o, _ in taps]
    assert offs == sorted(offs) and offs[0] == -offs[-1]


@given(st.integers(min_value=1, max_value=60))
@settings(max_examples=30, deadline=None)
def test_blobs_sql_bounds_any_n(n):
    rows = duckdb.sql(synth.blobs_sql(7, n, "duckdb")).fetchall()
    assert len(rows) == n
    for r in rows:
        d = dict(zip(("blob_id", "r", "wobble", "cx", "cy", "depth", "col_r", "col_g", "col_b"), r))
        assert 0.1 <= d["r"] <= 0.26 and 0.12 <= d["cx"] <= 0.88
        assert 0.0 <= min(d["col_r"], d["col_g"], d["col_b"])
        assert max(d["col_r"], d["col_g"], d["col_b"]) <= 1.0
