"""Local parity harness mimicking the driver's correctness gate:
run each catalog query on Spark and its oracle on DuckDB over the same
parquet tables, compare row count + column names + order-insensitive
canonical values.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v) -> str:
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (np.bool_, bool)):
        return "T" if v else "F"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or (hasattr(v, "__iter__") and not isinstance(v, str)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_canon(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(tuple(canon(v) for v in row) for row in pdf[cols].itertuples(index=False))
    return cols, rows


def run(sf_dir: str, names: list[str] | None = None) -> int:
    import duckdb

    sys.path.insert(0, ".")
    from annotations_ingester_spark.plans.queries import EXPECTED_MIN_QUERIES, REGISTRY
    from annotations_ingester_spark.session import get_spark

    assert len(REGISTRY) >= EXPECTED_MIN_QUERIES, (
        f"registry shrank: {len(REGISTRY)} < {EXPECTED_MIN_QUERIES}"
    )

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = matched = rows_only = 0
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        try:
            sdf = spec.spark(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if spec.oracle is None:
            rows_only += 1
            print(f"ok   {name}: rows={len(sdf)} (no oracle — rows-only)")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            failures += 1
            continue
        scols, srows = frame_canon(sdf)
        ocols, orows = frame_canon(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        if srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failures += 1
            continue
        matched += 1
        print(f"ok   {name}: rows={len(srows)} cols={len(scols)} MATCH")
    print(
        f"SUMMARY: {matched} hash-matched, {rows_only} rows-only, "
        f"{failures} failed, {matched + rows_only + failures} run"
    )
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or None
    sys.exit(1 if run(sf_dir, names) else 0)
