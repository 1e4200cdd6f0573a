"""Measured parity vs the REAL matplotlib stack (VERDICT r4 item 6).

The build container has no matplotlib, so the golden is produced
offline: `golden/export_scene.py` (here) dumps the engine's scene,
`golden/render_golden.py` (any env with matplotlib) writes
`golden/golden.npz`, and this test — auto-skipped until that file
exists — upgrades the "matplotlib-faithful" claims (containment
semantics, colormap LUT sampling) from construction-by-citation to a
numeric comparison with documented tolerances:

- containment: >= 99.9% of (blob, pixel) decisions must agree with
  Path.contains_points on identical q6 vertices and grid points (the
  residual is edge-on-boundary tie-breaking, where matplotlib's Agg
  point-in-path and exact even-odd ray casting legitimately differ);
- colormaps: engine LUT samples within 1/255 per channel of the real
  coolwarm/Wistia maps at all 600 gradient positions (LUT-256
  quantization granularity).
"""

from __future__ import annotations

import os

import pytest

_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "golden",
    "golden.npz",
)

_needs_golden = pytest.mark.skipif(
    not os.path.exists(_GOLDEN),
    reason="golden/golden.npz absent (needs offline matplotlib render — "
    "see golden/render_golden.py)",
)


@_needs_golden
def test_containment_matches_matplotlib(spark):
    import numpy as np

    from week3_2_practice_big_data__spark import REGISTRY

    g = np.load(_GOLDEN, allow_pickle=False)
    rows = (
        REGISTRY["filt_point_in_polygon"]
        .builder(spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    engine = {
        (b, r, c): i
        for b, r, c, i in rows[["blob_id", "row", "col", "inside"]].itertuples(
            index=False
        )
    }
    golden = {
        (b, r, c): i
        for b, r, c, i in zip(g["blob_id"], g["row"], g["col"], g["inside"])
    }
    assert engine.keys() == golden.keys()
    agree = sum(1 for k, v in engine.items() if bool(v) == bool(golden[k]))
    assert agree / len(engine) >= 0.999, f"{agree}/{len(engine)}"


@_needs_golden
def test_colormap_luts_match_matplotlib(spark):
    import numpy as np

    from week3_2_practice_big_data__spark.plans.generative import (
        _CMAP_COOLWARM,
        _CMAP_WISTIA,
        _LUT_N,
    )

    g = np.load(_GOLDEN, allow_pickle=False)
    t = np.linspace(0.0, 1.0, 600)
    j = np.minimum(np.floor(t * _LUT_N), _LUT_N - 1)
    x = j / (_LUT_N - 1)
    for name, anchors in (("coolwarm", _CMAP_COOLWARM), ("wistia", _CMAP_WISTIA)):
        a = np.asarray(anchors)
        nseg = len(a) - 1
        seg = np.minimum(np.floor(x * nseg).astype(int), nseg - 1)
        frac = x * nseg - seg
        engine = a[seg] + (a[seg + 1] - a[seg]) * frac[:, None]
        assert np.abs(engine - g[name]).max() <= 1.0 / 255.0, name


def test_scene_export_inputs_valid():
    """Runs IN-CONTAINER (no matplotlib needed): the committed scene
    export that the offline render consumes must stay structurally valid,
    so the one offline step can never fail on input drift."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "render_golden",
        os.path.join(os.path.dirname(_GOLDEN), "render_golden.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    boundary, mask = mod.check_inputs()
    assert len(mask) > 0 and len(boundary) > 0
