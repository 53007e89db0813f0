"""Pipeline metrics (SURVEY §2.4 A4: the failure counter, generalized).

The reference counts failed bulk ops in its streaming_bulk consumer
(reference: ingester/es_common.py:198-207) and logs skipped docs. Spark-side
equivalents:

- ``annotation_outcome_counts``: one aggregation over the annotated frame
  → how many docs produced entities, how many failed/were skipped (NULL
  entities — the B3 retry-next-run population).
- ``QueryProgressCollector``: a ``StreamingQueryListener`` capturing
  per-micro-batch row counts and durations for the streaming variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # StreamingQueryListener is importable without a running stream
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore


def annotation_outcome_counts(annotated: DataFrame, entities_col: str = "entities") -> DataFrame:
    """(n_docs, n_annotated, n_failed, n_entities) in ONE pass — counts of
    enrichment successes/failures plus total entity yield."""
    e = F.col(entities_col)
    return annotated.agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(e.isNotNull(), 1)).alias("n_annotated"),
        F.count(F.when(e.isNull(), 1)).alias("n_failed"),
        F.coalesce(F.sum(F.when(e.isNotNull(), F.size(e))), F.lit(0)).alias("n_entities"),
    )


class QueryProgressCollector(StreamingQueryListener):
    """Collects micro-batch progress (rows/sec, batch durations) —
    attach with ``spark.streams.addListener(collector)``."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
