"""Vector column expressions — JVM-side (codegen'd), no Python in the path.

Cosine/dot over ``array<float>`` embedding columns using higher-order
functions (zip_with / aggregate). Everything is computed in double precision
with explicit rounding helpers so results can be compared against a DuckDB
oracle despite differing summation orders.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_to_double(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))
