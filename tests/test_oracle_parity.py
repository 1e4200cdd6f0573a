"""Replays the driver's correctness gate for every oracle-checked key at
sf0.001 (fast), exactly as the driver will at sf0.01 (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

from week3_2_practice_big_data__spark import REGISTRY

from .conftest import SF_SMALL
from .oracle import compare, duck_run

ORACLE_KEYS = sorted(k for k, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, key):
    q = REGISTRY[key]
    sdf = q.builder(spark, SF_SMALL)
    ddf = duck_run(q.oracle, SF_SMALL)
    compare(sdf, ddf, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, key):
    q = REGISTRY[key]
    df = q.builder(spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
