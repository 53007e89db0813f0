"""B1: tumbling date windows (SURVEY §2.7).

The reference's driver loop splits [date-start, date-end] into interval-day
segments, advancing ``seg_start = prev_end`` and clamping the final segment
(ingester/annotations_indexer.py:842-861). Because its range scan is
both-ends-inclusive, boundary-date docs are processed twice — an overlap the
idempotency layer absorbs (SURVEY §7.4.2). Our engine offers both:

- ``date_windows``: the reference-parity segment list (inclusive ends),
  for the windowed batch driver.
- ``window_segment``: a *partitioning* column assigning each row to exactly
  one segment — the non-overlapping Spark-first form, computable inside the
  scan (no driver loop, no double processing), usable in batch and
  streaming (`F.window` is the streaming twin).
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_windows(
    date_start: str,
    date_end: str,
    interval_days: int = 30,
    date_format: str = "%Y-%m-%d",
) -> list[tuple[str, str]]:
    """Reference-parity segment list: [(seg_start, seg_end)...], last segment
    clamped to ``date_end``; consecutive segments share a boundary date
    (both-inclusive, annotations_indexer.py:847-861)."""
    start = datetime.strptime(date_start, date_format).date()
    end = datetime.strptime(date_end, date_format).date()
    out: list[tuple[str, str]] = []
    seg_start = start
    while seg_start < end:
        seg_end = min(seg_start + timedelta(days=interval_days), end)
        out.append((seg_start.strftime(date_format), seg_end.strftime(date_format)))
        seg_start = seg_end
    return out


def window_segment(
    date_col: Column | str,
    date_start: str | date,
    interval_days: int = 30,
) -> Column:
    """Non-overlapping segment index: ``floor(datediff(d, start) / interval)``
    as BIGINT. Each row lands in exactly one window — the scalable form of
    B1 (a pure scan expression: no shuffle, prunes with partition columns)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    start = F.lit(str(date_start)).cast("date")
    return F.floor(F.datediff(F.to_date(c), start) / F.lit(interval_days)).cast("long")
