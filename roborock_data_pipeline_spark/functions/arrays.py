"""Array/vector column functions — JVM-side higher-order functions.

All math stays in whole-stage codegen: `zip_with`/`aggregate` compile
to codegen'd loops over the array, no Python round-trip. Elements are
cast float→double before accumulation so Spark and DuckDB (and any
other IEEE-754 engine summing left-to-right) agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential double sum)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
