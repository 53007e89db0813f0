"""Round-10 independent recomputes: every operator added or changed this
round gets a from-raw-data Python/synthetic-graph check (the r9 lesson —
parity alone cannot catch a shared-formula bug)."""

from __future__ import annotations

import pytest

from annotations_ingester_spark.plans.queries import REGISTRY  # noqa: F401

SF = "/root/testdata/sf0.001"


def test_two_hop_reach_hub_cap_excludes_super_node(spark):
    """Star: hub 0 — leaves 1..70 (hub degree 70 > default cap 64).
    With the cap, a leaf's 2-hop frontier through the hub is EXCLUDED:
    reach = 1-hop only = {hub}. Raising the cap restores the full
    69-sibling reach. The hub's own row is unaffected (its MIDDLE nodes
    are the leaves, degree 1)."""
    from annotations_ingester_spark.operators.graph import two_hop_reach

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 71)], ["src", "dst"]
    )
    capped = {r.node: r for r in two_hop_reach(edges).collect()}
    assert capped[0].deg == 70 and capped[0].reach_2hop == 70
    assert capped[1].deg == 1 and capped[1].reach_2hop == 1

    uncapped = {r.node: r for r in two_hop_reach(edges, hub_cap=100).collect()}
    assert uncapped[1].reach_2hop == 70  # hub + 69 siblings


def test_two_hop_reach_cap_is_inclusive(spark):
    """A middle node of degree EXACTLY hub_cap still pivots (<=, not <)."""
    from annotations_ingester_spark.operators.graph import two_hop_reach

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    out = {r.node: r for r in two_hop_reach(edges, hub_cap=2).collect()}
    assert out[0].reach_2hop == 2  # node 1 (deg 2 == cap) pivots 0 -> 2
