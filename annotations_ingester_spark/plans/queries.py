"""The full query catalog: importing the group modules populates REGISTRY."""

from annotations_ingester_spark.plans.catalog import REGISTRY, QuerySpec  # noqa: F401

# Group modules register on import.
import annotations_ingester_spark.plans.queries_core  # noqa: F401,E402

try:  # populated as build rounds progress
    import annotations_ingester_spark.plans.queries_pipeline  # noqa: F401,E402
except ImportError:
    pass
try:
    import annotations_ingester_spark.plans.queries_scale  # noqa: F401,E402
except ImportError:
    pass
try:
    import annotations_ingester_spark.plans.queries_ext  # noqa: F401,E402
except ImportError:
    pass
try:
    import annotations_ingester_spark.plans.queries_search  # noqa: F401,E402
except ImportError:
    pass
try:
    import annotations_ingester_spark.plans.queries_tpch2  # noqa: F401,E402
except ImportError:
    pass
try:
    import annotations_ingester_spark.plans.queries_llm  # noqa: F401,E402
except ImportError:
    pass

__all__ = ["REGISTRY", "QuerySpec"]
