"""docs/OPERATORS.md is generated from the live registry
(tools/gen_operators_doc.py); a hand edit or a registry change without a
regeneration is drift — the exact failure mode test_registry_complete's
stale-count checks exist for, applied to the operator reference doc."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _gen_module():
    spec = importlib.util.spec_from_file_location(
        "gen_operators_doc", REPO / "tools" / "gen_operators_doc.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("gen_operators_doc", mod)
    spec.loader.exec_module(mod)
    return mod


def test_operators_doc_matches_registry():
    committed = (REPO / "docs" / "OPERATORS.md").read_text()
    assert committed == _gen_module().render(), (
        "docs/OPERATORS.md drifted from the registry — regenerate with "
        "`python tools/gen_operators_doc.py`"
    )


def test_operators_doc_lists_every_query():
    from annotations_ingester_spark.plans.queries import REGISTRY

    committed = (REPO / "docs" / "OPERATORS.md").read_text()
    missing = [n for n in REGISTRY if f"`{n}`" not in committed]
    assert not missing, f"queries absent from docs/OPERATORS.md: {missing[:5]}"
