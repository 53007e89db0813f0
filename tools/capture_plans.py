"""Dump .explain("formatted") for named queries to files.

Usage:
  python tools/capture_plans.py OUTDIR SUFFIX name1 name2 ...

Writes OUTDIR/<name>_<SUFFIX>.txt for each query. Plan capture is
driver-side; eager checkpoint sites inside builders still run their
materialization jobs, so avoid running this concurrently with timing runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from annotations_ingester_spark.plans.queries import REGISTRY
    from annotations_ingester_spark.session import get_spark

    spark = get_spark("capture_plans")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = Path(outdir) / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
