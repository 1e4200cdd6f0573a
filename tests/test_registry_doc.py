"""OPERATORS.md must stay in sync with the live REGISTRY (VERDICT r4
item 8): the coverage ledger is generated, never hand-maintained."""

from __future__ import annotations

import os


def test_operators_md_in_sync():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys

    sys.path.insert(0, repo)
    from gen_operators import render

    path = os.path.join(repo, "OPERATORS.md")
    assert os.path.exists(path), "run `python gen_operators.py`"
    with open(path) as f:
        on_disk = f.read()
    assert on_disk == render(), (
        "OPERATORS.md is stale — regenerate with `python gen_operators.py`"
    )


def test_registration_shape_builder_names_match_keys():
    """VERDICT r9 item 7 — the decorator trap (three rounds running):
    extracting a helper between `@register(...)` and its builder silently
    attaches the decorator to the WRONG def. Catch it at commit time:
    every REGISTRY value's builder must be named after its key, except
    the documented factory aliases below."""
    from week3_2_practice_big_data__spark import REGISTRY

    # the five shared-projection keys are built by the `_q` factory in
    # functions/projections.py (one closure per key, by design)
    factory_aliases = {
        "proj_dist_radial": "_q",
        "proj_dot_light": "_q",
        "proj_minmax_norm": "_q",
        "proj_shade_affine": "_q",
        "proj_color_scale": "_q",
    }
    bad = {
        key: q.builder.__name__
        for key, q in REGISTRY.items()
        if q.builder.__name__ != factory_aliases.get(key, key)
    }
    assert not bad, f"decorator-trap suspects (builder name != key): {bad}"
