"""Driver-side utilities: service health gate (S11) and admin ops (S9).

Reference: ingester/utils.py:7-14 (``check_url_available``),
ingester/es_common.py:162-167 (``drop_index``). The duplicate-record
removal util (utils.py:16-19) is subsumed by ``dropDuplicates`` /
``sinks.writers.merge_annotation_sets``.
"""

from __future__ import annotations

import logging

log = logging.getLogger(__name__)


def check_url_available(urls: list[str], timeout: float = 10.0) -> bool:
    """Pre-flight liveness probe on service endpoints before starting a
    job/stream (reference: utils.py:7-14 — GET each URL, all must answer)."""
    import urllib.request

    for url in urls:
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                if resp.status >= 400:
                    return False
        except Exception as exc:
            log.warning("endpoint %s unavailable: %s", url, exc)
            return False
    return True


def drop_table(spark, path_or_name: str) -> None:
    """S9 drop-index equivalent for the parquet backend (admin util)."""
    import shutil

    try:
        spark.catalog.dropTempView(path_or_name)
    except Exception:
        pass
    if "/" in path_or_name:
        shutil.rmtree(path_or_name, ignore_errors=True)
