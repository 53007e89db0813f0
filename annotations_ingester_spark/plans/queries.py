"""The full query catalog: importing the group modules populates REGISTRY.

Imports are deliberately loud: a broken group module must fail the whole
catalog import rather than silently shrinking the registry (a silent drop
combined with a stale driver snapshot is exactly how a certification hole
stays invisible). ``EXPECTED_MIN_QUERIES`` is asserted by both
``tools/parity.py`` and ``tests/test_registry_complete.py``.
"""

from annotations_ingester_spark.plans.catalog import REGISTRY, QuerySpec  # noqa: F401

# Group modules register on import. NO try/except — failures must propagate.
import annotations_ingester_spark.plans.queries_core  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_pipeline  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_scale  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_ext  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_search  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_tpch2  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_llm  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_curation  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_analytics  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_warehouse  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_stats  # noqa: F401,E402
import annotations_ingester_spark.plans.queries_eval  # noqa: F401,E402  (last: composes earlier oracles)

# Floor, not exact count: adding queries must not break this, losing a whole
# group module must. Keep >= the current registry size — the guard is about
# REGISTRATION (a silently-failing group module), not certification, so it
# rises with every batch of additions (no numeral in this comment on
# purpose — hand-typed totals drift; the value below is the only copy).
EXPECTED_MIN_QUERIES = 385

if len(REGISTRY) < EXPECTED_MIN_QUERIES:  # pragma: no cover - guard
    raise RuntimeError(
        f"Query registry holds {len(REGISTRY)} queries; expected at least "
        f"{EXPECTED_MIN_QUERIES}. A group module failed to register."
    )

__all__ = ["REGISTRY", "QuerySpec", "EXPECTED_MIN_QUERIES"]
