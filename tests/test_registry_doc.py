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
