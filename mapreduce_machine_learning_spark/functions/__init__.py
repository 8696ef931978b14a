"""Shared column-expression helpers: vector math over ``array<float>`` and
text tokenization.

All pure JVM higher-order functions (``zip_with``/``transform``/
``aggregate``) — no Python in the data path; elements are cast to double
before arithmetic so results are precision-stable across engines and across
Spark's float codegen paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def sqnorm(a: Column | str) -> Column:
    """Σ aᵢ² in double precision."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def l2norm(a: Column | str) -> Column:
    return F.sqrt(sqnorm(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; the caller is responsible for zero-vector guards."""
    return dot(a, b) / (l2norm(a) * l2norm(b))


def tokens(text_col: Column | str = "text") -> Column:
    """The contract tokenization: single-space split (≡ DuckDB
    string_split)."""
    return F.split(text_col, " ")
