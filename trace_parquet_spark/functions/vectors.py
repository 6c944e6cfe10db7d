"""Vector math over array<float> embedding columns.

All built from Spark higher-order functions (zip_with / aggregate) —
JVM-side, no Python in the hot path. Elements are cast to double
before any arithmetic so the sequential left-to-right summation
matches DuckDB's ``list_*`` double-precision semantics; results are
rounded before comparison in the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_as_double(_c(a)), _as_double(_c(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(ea: str, eb: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip(CAST({ea} AS DOUBLE[]), "
        f"CAST({eb} AS DOUBLE[])), p -> p[1] * p[2]), 'sum')"
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(ea: str, eb: str) -> str:
    d = dot_sql(ea, eb)
    na = f"sqrt({dot_sql(ea, ea)})"
    nb = f"sqrt({dot_sql(eb, eb)})"
    return f"({d}) / (({na}) * ({nb}))"
