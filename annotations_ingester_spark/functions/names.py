"""Index-name normalization and id synthesis (SURVEY §2.6 F1/F2).

Semantics match the reference's ES naming rules
(reference: ingester/es_common.py:116-151): lowercase, strip leading/trailing
``._-+`` characters, replace ``#\\/*?"<>| `` (incl. space) with ``_``.
All column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters replaced with '_' (reference: es_common.py:121-128).
_REPLACE_CLASS = r'[#\\/\*\?"<>\|,\s]'
# Leading/trailing trim set (reference: es_common.py:129-130).
_TRIM_EDGES = r"(^[._\-+]+)|([._\-+]+$)"


def normalize_index_name(col: Column | str) -> Column:
    """F1: normalize a string to a valid index/table name."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, _TRIM_EDGES, "")
    c = F.regexp_replace(c, _REPLACE_CLASS, "_")
    return c


def format_index_name(name: str) -> str:
    """Driver-side (plain Python) twin of :func:`normalize_index_name`."""
    out = name.lower().strip("._-+")
    for ch in '#\\/*?"<>|, \t\n':
        out = out.replace(ch, "_")
    return out


def index_name(base: Column | str, suffix: Column | str | None = None) -> Column:
    """F2: ``{base}-{suffix}`` name concat (reference: es_common.py:140-146)."""
    b = F.col(base) if isinstance(base, str) else base
    if suffix is None:
        return b
    s = F.col(suffix) if isinstance(suffix, str) else suffix
    return F.concat_ws("-", b, s)


def synth_row_id(doc_id: Column | str, ann_id: Column | str) -> Column:
    """F2: deterministic sink row id ``doc-{docid}-ann-{annid}``
    (reference: ingester/annotations_indexer.py:221). Determinism is what
    makes re-runs idempotent (SURVEY §2.7 B2)."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    a = F.col(ann_id) if isinstance(ann_id, str) else ann_id
    return F.format_string("doc-%s-ann-%s", d.cast("string"), a.cast("string"))
