"""Vectorized Pandas UDFs (Arrow-batched; SURVEY §2.9 UDAF surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the eval type from *runtime* type hints; postponed (stringified)
annotations break the inference.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("long")
def n_heavy_qty(qty: pd.Series) -> int:
    """GROUPED_AGG: count of rows with quantity > 25 (integer-exact)."""
    return int((qty > 25).sum())
