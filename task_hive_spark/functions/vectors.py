"""Vector column functions: dot / norm / cosine over array<float>.

Built-in higher-order functions (zip_with + aggregate) keep the math
JVM-side with a fixed left-to-right accumulation order — bit-identical
to DuckDB's sequential list functions, which is what makes similarity
scores oracle-checkable. Elements are cast to double before any
arithmetic (float32 intermediates would drift).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
