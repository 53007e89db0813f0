"""Binary media columns with typed metadata + mapInPandas feature extraction.

Design for 100 TB of media: the binary payload stays opaque to Catalyst
(no per-row JVM↔Python chatter except inside Arrow batches); metadata is a
plain struct so filters on (kind, width, duration, …) prune *before* any
decode work; decode/feature-extraction runs per-partition in ``mapInPandas``
with bounded batch sizes (``spark.sql.execution.arrow.maxRecordsPerBatch``)
so a partition of large blobs can't OOM an executor.

The decode step itself is STUBBED: ``fake_decode`` is a deterministic
stand-in (real codecs aren't in this container). ``extract_features``
accepts any ``decode_fn(payload: bytes, kind: str) -> dict`` with the same
contract — swap in PIL/ffmpeg-backed decoders in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("format", T.StringType(), True),  # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_FIELDS = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_table_schema(extra: list[T.StructField] | None = None) -> T.StructType:
    return T.StructType(list(MEDIA_SCHEMA.fields) + list(extra or []))


def fake_decode(payload: bytes, kind: str) -> dict[str, Any]:
    """Deterministic decode stub: an 8-dim 'feature' derived from the
    payload digest. Real decoders (PIL image decode → resize → embed;
    ffmpeg frame-sample; librosa spectrogram) plug in with the same
    signature but raise here:

    >>> # raise NotImplementedError("image decode requires PIL")
    """
    digest = hashlib.md5(payload or b"").hexdigest()
    feature = [int(digest[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(8)]
    return {"digest": digest, "feature": feature}


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, str], dict[str, Any]] = fake_decode,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "meta.kind",
) -> DataFrame:
    """Per-partition Arrow-batched decode → (media_id, n_bytes, digest,
    feature). Filters on metadata should be applied by the caller *before*
    this stage — Catalyst can't push predicates through the UDF."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized bookkeeping; only the decode itself is per-blob
            # (inherently per-row — each payload is one opaque object)
            payloads = [b"" if p is None else bytes(p) for p in pdf["_payload"]]
            decoded = [decode_fn(p, k) for p, k in zip(payloads, pdf["_kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["_id"].to_numpy(),
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "digest": [d.get("digest") for d in decoded],
                    "feature": [d.get("feature") for d in decoded],
                }
            )

    from pyspark.sql import functions as F

    from annotations_ingester_spark.pyfiles import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    slim = df.select(
        F.col(id_col).alias("_id"),
        F.col(payload_col).alias("_payload"),
        F.col(kind_col).alias("_kind"),
    )
    return slim.mapInPandas(run, schema=FEATURE_FIELDS)
