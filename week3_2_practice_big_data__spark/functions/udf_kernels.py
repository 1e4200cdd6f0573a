"""pandas_udf kernels that REQUIRE evaluated type hints.

No ``from __future__ import annotations`` here on purpose: pandas_udf
infers its eval type (SCALAR vs SCALAR_ITER) from the function's
resolved annotations, and the future-import turns them into strings it
cannot resolve — so the decorated kernels live in this hint-preserving
module and the registering builders import them.
"""

from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def w32bd_pumicro(v: pd.Series) -> pd.Series:
    """Vectorized saturating micro-quantizer (numpy twin of synth.sat:
    NaN/NULL→0, ±1e9 clip, ×1e6, floor)."""
    import numpy as np

    x = v.to_numpy(dtype="float64", na_value=0.0)
    x = np.where(np.isnan(x), 0.0, x)
    x = np.clip(x, -1e9, 1e9)
    return pd.Series(np.floor(x * 1e6 + 0.5).astype("int64"))


@pandas_udf("bigint")
def iter_micro(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """SCALAR_ITER form of the same quantizer — the eval type built for
    one-time per-partition state reused across Arrow batches."""
    import numpy as np

    for v in batches:
        x = v.to_numpy(dtype="float64", na_value=0.0)
        x = np.where(np.isnan(x), 0.0, x)
        x = np.clip(x, -1e9, 1e9)
        yield pd.Series(np.floor(x * 1e6 + 0.5).astype("int64"))


@pandas_udf("string")
def iter_parity(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """One-time per-partition init (the model-load pattern) reused
    across every batch of the partition."""
    table = {0: "even", 1: "odd"}
    for ids in batches:
        yield (ids % 2).map(table)
