"""Fast oracle-parity smoke: a representative subset of the catalog vs
DuckDB at sf0.001 (the full sweep is ``python tools/parity.py``, which
this repo keeps green at sf0.01 — the driver's correctness scale)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.parity import run  # noqa: E402

SUBSET = [
    "pipeline_w1_flat_medcat",
    "pipeline_gate_flat",
    "q1_pricing_summary",
    "minhash_lsh_pairs",
    "embedding_cosine_topk",
    "text_quality_scores",
]


def test_oracle_parity_subset():
    assert run("/root/testdata/sf0.001", SUBSET) == 0
