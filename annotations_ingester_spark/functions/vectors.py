"""Vector math over ``array<float>`` embedding columns.

Pure built-in higher-order functions (``zip_with`` + ``aggregate``) — the
whole computation stays JVM-side inside whole-stage codegen; no Python
boundary, no UDF. Inputs are cast to double first so results are
bit-identical to a double-precision oracle (DuckDB ``list_dot_product`` /
``list_cosine_similarity`` over ``DOUBLE[]``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; 0 for zero-norm inputs."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def cosine_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """Cosine with PRE-FOLDED norms: identical value to
    :func:`cosine_similarity` when ``na``/``nb`` hold ``l2_norm(a/b)``
    (the denominator is the same product of the same sequential
    sqrt-of-fold), but the per-pair cost drops from three array folds to
    one cross dot product. Use in pair-join shapes where each vector
    meets many partners — fold the norm once per vector before the join."""
    denom = _c(na) * _c(nb)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def cosine_similarity_sql(a: str, b: str) -> str:
    """DuckDB twin — same accumulation order (sequential left fold)."""
    return (
        f"(CASE WHEN sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
        f" * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])) > 0 THEN"
        f" list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
        f" / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
        f" * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))) ELSE 0.0 END)"
    )


def quantize_int8(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``q_i = floor(x_i/scale + 0.5)`` (round-half-up, engine-portable —
    never a rounding-mode builtin). Values land in [-127, 127] by
    construction; zero vectors get a floor scale of 1e-12. Kept as
    ``array<double>`` holding exact integers so downstream dot products
    are EXACT in IEEE double (|q|≤127, so 64-dim sums stay ≲1e6 — far
    inside the 2^53 integer-exact range) and reproduce bit-for-bit in any
    engine regardless of summation order. This is the storage/IO lever at
    100 TB: int8 vectors are 4× smaller than float32, and the scale
    cancels out of cosine entirely."""
    arr = _dbl(a)
    scale = F.greatest(
        F.array_max(F.transform(arr, F.abs)) / F.lit(127.0), F.lit(1e-12)
    )
    return F.transform(arr, lambda x: F.floor(x / scale + F.lit(0.5)).cast("double"))


def quantize_int8_sql(a: str) -> str:
    """DuckDB twin of :func:`quantize_int8` (same scale floor, same
    round-half-up)."""
    scale = (
        f"greatest(list_max(list_transform({a}::DOUBLE[], y -> abs(y))) / 127.0,"
        " 0.000000000001)"
    )
    return f"list_transform({a}::DOUBLE[], x -> floor(x / {scale} + 0.5))"


def sign_bucket(a: Column | str, n_bits: int = 8) -> Column:
    """Random-hyperplane-style LSH bucket id from the signs of the first
    ``n_bits`` dimensions (axis-aligned hyperplanes — deterministic and
    portable). Near vectors share buckets with high probability; used by
    the bucketed ANN scale path to turn O(N·Q) brute force into a
    per-bucket join."""
    arr = _dbl(a)
    bit = lambda i: F.when(F.element_at(arr, i + 1) >= 0, F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    out = F.lit(0)
    for i in range(n_bits):
        out = out * F.lit(2) + bit(i)
    return out.cast("long")


def sign_bucket_sql(a: str, n_bits: int = 8) -> str:
    terms = " + ".join(
        f"(CASE WHEN ({a}::DOUBLE[])[{i + 1}] >= 0 THEN 1 ELSE 0 END) * {2 ** (n_bits - 1 - i)}"
        for i in range(n_bits)
    )
    return f"(({terms})::BIGINT)"
