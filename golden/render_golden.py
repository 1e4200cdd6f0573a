#!/usr/bin/env python
"""Render the matplotlib-side golden for the parity test (OFFLINE step).

REQUIRES matplotlib — which the build container does NOT ship, so this
script is run once in any ordinary Python environment
(`pip install matplotlib pandas numpy`) and the resulting
`golden/golden.npz` is committed; `tests/test_golden_parity.py`
auto-skips until the file exists and runs the measured comparison once
it does.

What it produces (all straight from matplotlib, no engine code):
- `inside`: matplotlib.path.Path.contains_points evaluated at the
  ENGINE's canvas grid points for each exported blob polyline — the
  reference's containment semantics (app.py:44-45) on identical
  vertices and identical query points.
- `coolwarm`, `wistia`: the real matplotlib colormaps sampled at the
  app's 600 gradient positions (app.py:132-133) — LUT build,
  quantization and all.

Determinism: Path.contains_points and colormap LUTs are pure
deterministic code; the npz is reproducible bit-for-bit for a given
matplotlib version (record it — it lands in the npz as `meta`).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

_HERE = os.path.dirname(os.path.abspath(__file__))
_SCENE = os.path.join(_HERE, "engine_scene")

CANVAS = 96  # must match the engine's default scene config
GRAD_ROWS = 600


def check_inputs() -> tuple["pd.DataFrame", "pd.DataFrame"]:
    """Validate the committed scene export WITHOUT matplotlib (r6:
    `--check` mode, runnable in the build container) so the one offline
    step can never fail on input drift: every blob in the mask has a
    closed polyline of >= 3 vertices with contiguous k, grid indices are
    inside the canvas, and the row counts match CANVAS² per blob."""
    boundary = pd.read_csv(os.path.join(_SCENE, "boundary.csv"))
    mask = pd.read_csv(os.path.join(_SCENE, "mask.csv"))
    blobs = sorted(mask["blob_id"].unique())
    assert blobs == sorted(boundary["blob_id"].unique()), "blob sets differ"
    for blob_id in blobs:
        ks = boundary.loc[boundary.blob_id == blob_id, "k"].sort_values()
        assert len(ks) >= 3, f"blob {blob_id}: degenerate polyline"
        assert ks.tolist() == list(range(len(ks))), f"blob {blob_id}: k gaps"
        sub = mask[mask.blob_id == blob_id]
        # the export stores each blob's bbox-restricted dense grid
        rspan = sub["row"].max() - sub["row"].min() + 1
        cspan = sub["col"].max() - sub["col"].min() + 1
        assert len(sub) == rspan * cspan, f"blob {blob_id}: bbox grid holes"
    assert mask["row"].between(0, CANVAS - 1).all()
    assert mask["col"].between(0, CANVAS - 1).all()
    assert np.isfinite(boundary[["px", "py"]].to_numpy()).all()
    return boundary, mask


def main() -> None:
    import sys

    if "--check" in sys.argv:
        check_inputs()
        print("scene export OK (boundary.csv + mask.csv consistent); "
              "run WITHOUT --check in a matplotlib env to write golden.npz")
        return

    import matplotlib
    from matplotlib import cm
    from matplotlib.path import Path

    boundary = pd.read_csv(os.path.join(_SCENE, "boundary.csv"))
    mask = pd.read_csv(os.path.join(_SCENE, "mask.csv"))

    # engine grid coordinate: linspace(0, 1, CANVAS) by integer index
    step = 1.0 / (CANVAS - 1)
    inside = np.zeros(len(mask), dtype=bool)
    for blob_id, rows in mask.groupby("blob_id"):
        verts = boundary[boundary.blob_id == blob_id].sort_values("k")[
            ["px", "py"]
        ].to_numpy()
        # app.py:62-64: MOVETO + LINETO chain (implicitly closed)
        codes = [Path.MOVETO] + [Path.LINETO] * (len(verts) - 1)
        path = Path(verts, codes)
        pts = np.column_stack(
            [rows["col"].to_numpy() * step, rows["row"].to_numpy() * step]
        )
        inside[rows.index.to_numpy()] = path.contains_points(pts)

    t = np.linspace(0.0, 1.0, GRAD_ROWS)
    coolwarm = cm.get_cmap("coolwarm")(t)[:, :3]
    wistia = cm.get_cmap("Wistia")(t)[:, :3]

    np.savez_compressed(
        os.path.join(_HERE, "golden.npz"),
        blob_id=mask["blob_id"].to_numpy(),
        row=mask["row"].to_numpy(),
        col=mask["col"].to_numpy(),
        inside=inside,
        coolwarm=coolwarm,
        wistia=wistia,
        meta=np.array([f"matplotlib={matplotlib.__version__}"]),
    )
    print(f"wrote {os.path.join(_HERE, 'golden.npz')}")


if __name__ == "__main__":
    main()
