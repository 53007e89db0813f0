"""Binary media columns with typed metadata + mapInPandas feature extraction.

Design for 100 TB of media: the binary payload stays opaque to Catalyst
(no per-row JVM↔Python chatter except inside Arrow batches); metadata is a
plain struct so filters on (kind, width, duration, …) prune *before* any
decode work; decode/feature-extraction runs per-partition in ``mapInPandas``
with bounded batch sizes (``spark.sql.execution.arrow.maxRecordsPerBatch``)
so a partition of large blobs can't OOM an executor.

Decoders: ``decode_media`` is REAL for container formats stdlib can parse
— PNG (IHDR width/height via ``struct``), JPEG (SOF marker scan), WAV
(``wave`` module: sample rate / frame count → duration). Pixel/sample
*content* decode (resize, frame-sample, spectrogram) still needs
PIL/ffmpeg/librosa and stays behind the same ``decode_fn(payload, kind)``
contract; ``fake_decode`` remains the hermetic stand-in for tests.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


PNG_SIG = b"\x89PNG\r\n\x1a\n"

DECODED_FIELDS = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)


def decode_media(payload: bytes, kind: str) -> dict[str, Any]:
    """REAL header decode for PNG / JPEG / WAV using only the stdlib,
    plus the digest/feature baseline. Unrecognized payloads degrade to the
    digest-only result (format=None) instead of raising — at 100 TB a
    corrupt blob must cost one null row, not a task retry storm."""
    out = fake_decode(payload, kind)
    p = payload or b""
    if p.startswith(PNG_SIG) and len(p) >= 24 and p[12:16] == b"IHDR":
        width, height = struct.unpack(">II", p[16:24])
        out.update({"format": "png", "width": width, "height": height})
    elif p[:2] == b"\xff\xd8":  # JPEG SOI; scan for a frame (SOFn) marker
        i = 2
        while i + 9 < len(p) and p[i] == 0xFF:
            marker = p[i + 1]
            if marker == 0xFF:  # fill byte padding before a marker
                i += 1
                continue
            if marker in (0xDA, 0xD9):  # SOS/EOI: entropy data or end —
                break  # no SOF seen, stop scanning
            seglen = int.from_bytes(p[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                height, width = struct.unpack(">HH", p[i + 5 : i + 9])
                out.update({"format": "jpeg", "width": width, "height": height})
                break
            i += 2 + seglen
    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(p)) as wf:
                rate, frames = wf.getframerate(), wf.getnframes()
                out.update(
                    {
                        "format": "wav",
                        "sample_rate": rate,
                        "duration_ms": frames * 1000 // rate if rate else None,
                    }
                )
        except (wave.Error, EOFError):
            pass
    return out


def pil_available() -> bool:
    """True when Pillow is importable — gates the content-level decode
    path (sandbox images lack PIL; production clusters install it)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_pixels(payload: bytes, kind: str) -> dict[str, Any]:
    """CONTENT-level image decode via Pillow: width/height/mode verified
    from the actual pixel data (not just container headers) plus a 64-bit
    average-hash perceptual fingerprint (8×8 grayscale thumbnail, bit i set
    iff pixel i ≥ mean — Hamming distance ≈ visual difference, the standard
    near-dup key for images). Corrupt payloads degrade to the digest-only
    row, same rule as decode_media. Raises ImportError without PIL —
    callers gate on :func:`pil_available`."""
    from PIL import Image

    out = fake_decode(payload, kind)
    try:
        img = Image.open(io.BytesIO(payload or b""))
        img.load()
    except Exception:
        return out
    out.update(
        {
            "format": (img.format or "").lower() or None,
            "width": img.width,
            "height": img.height,
            "mode": img.mode,
        }
    )
    gray = img.convert("L").resize((8, 8))
    px = list(gray.getdata())
    avg = sum(px) / 64.0
    bits = 0
    for i, v in enumerate(px):
        if v >= avg:
            bits |= 1 << i
    # keep the value signed-BIGINT-portable (same rule as the md5 hashes)
    out["phash"] = bits - (1 << 63) if bits >= (1 << 63) else bits
    return out


PIXEL_FIELDS = T.StructType(
    list(DECODED_FIELDS.fields)
    + [
        T.StructField("mode", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def decode_content(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "meta.kind",
) -> DataFrame:
    """Arrow-batched PIXEL decode → PIXEL_FIELDS (header fields + mode +
    perceptual hash). Same 100 TB shape as decode_metadata — metadata
    pruning happens before this stage, blobs never leave their partition,
    Arrow batch size bounds memory. Fails fast with a clear dependency
    error when Pillow is missing rather than shipping a silent stub."""
    if not pil_available():
        raise ImportError(
            "decode_content requires Pillow (PIL) on driver and executors: "
            "pip install Pillow. Header-level decode (decode_metadata) "
            "works without it."
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [b"" if p is None else bytes(p) for p in pdf["_payload"]]
            decoded = [decode_pixels(p, k) for p, k in zip(payloads, pdf["_kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["_id"].to_numpy(),
                    "format": [d.get("format") for d in decoded],
                    "width": pd.array([d.get("width") for d in decoded], dtype="Int32"),
                    "height": pd.array([d.get("height") for d in decoded], dtype="Int32"),
                    "duration_ms": pd.array(
                        [d.get("duration_ms") for d in decoded], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [d.get("sample_rate") for d in decoded], dtype="Int32"
                    ),
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "digest": [d.get("digest") for d in decoded],
                    "mode": [d.get("mode") for d in decoded],
                    "phash": pd.array([d.get("phash") for d in decoded], dtype="Int64"),
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
    return slim.mapInPandas(run, schema=PIXEL_FIELDS)


def decode_metadata(
    df: DataFrame,
    decode_fn: Callable[[bytes, str], dict[str, Any]] = decode_media,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "meta.kind",
) -> DataFrame:
    """Arrow-batched header decode → typed media metadata
    (format/width/height/duration_ms/sample_rate) + n_bytes/digest.
    The write-side twin of filtering on ``meta``: run once at ingest, store
    the struct, and every later filter prunes without touching payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [b"" if p is None else bytes(p) for p in pdf["_payload"]]
            decoded = [decode_fn(p, k) for p, k in zip(payloads, pdf["_kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["_id"].to_numpy(),
                    "format": [d.get("format") for d in decoded],
                    "width": pd.array([d.get("width") for d in decoded], dtype="Int32"),
                    "height": pd.array([d.get("height") for d in decoded], dtype="Int32"),
                    "duration_ms": pd.array(
                        [d.get("duration_ms") for d in decoded], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [d.get("sample_rate") for d in decoded], dtype="Int32"
                    ),
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "digest": [d.get("digest") for d in decoded],
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
    return slim.mapInPandas(run, schema=DECODED_FIELDS)


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
