from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from annotations_ingester_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture()
def docs_df(spark):
    """Tiny corpus exercising the P3 edge cases (FIXTURES.md §1)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, None),  # NULL text → filtered
        (3, "tiny"),  # len 4 < MIN_TEXT_LEN → filtered
        (4, "hello world this is a test document body"),
        (5, "exact duplicate text body right here okay"),
        (6, "exact duplicate text body right here okay"),
        (7, ""),  # empty → filtered
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")
