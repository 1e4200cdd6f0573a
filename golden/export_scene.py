#!/usr/bin/env python
"""Export the engine's scene inputs for the matplotlib golden render.

Runs IN THIS repo's environment (no matplotlib needed): dumps the
default-config (seed 42, 6 blobs, 96px canvas) blob boundary polylines
and the engine's even-odd containment mask to `golden/engine_scene/` as
CSV. `golden/render_golden.py` (which DOES need matplotlib) consumes
these to produce `golden/golden.npz`, and
`tests/test_golden_parity.py` then compares engine vs matplotlib —
measured parity instead of construction-by-citation.

The polyline vertices are the engine's q6-quantized doubles (synth
.boundary_sql), so both sides rasterize the IDENTICAL polygon; the
comparison isolates the containment/rasterization semantics.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from week3_2_practice_big_data__spark import REGISTRY, get_spark  # noqa: E402
from week3_2_practice_big_data__spark import synth  # noqa: E402

OUT = os.path.join(_REPO, "golden", "engine_scene")
SF = "/root/testdata/sf0.001"  # scene keys are generative; sf dir unused


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("w32bd-golden-export")
    spark.sparkContext.setLogLevel("ERROR")

    boundary = spark.sql(
        synth.boundary_sql(42, 6, "spark") + " ORDER BY blob_id, k"
    ).toPandas()[["blob_id", "k", "px", "py"]]
    boundary.to_csv(os.path.join(OUT, "boundary.csv"), index=False)

    mask = (
        REGISTRY["filt_point_in_polygon"]
        .builder(spark, SF)
        .toPandas()[["blob_id", "row", "col", "inside"]]
    )
    mask.to_csv(os.path.join(OUT, "mask.csv"), index=False)
    print(f"wrote {OUT}: boundary {len(boundary)} rows, mask {len(mask)} rows")


if __name__ == "__main__":
    main()
