"""Embedding-vector column expressions (cosine / dot / norm) + oracle SQL.

Engine-portable determinism: both sides cast FLOAT elements to DOUBLE, form
the products in index order, and fold left-to-right, so the IEEE result is
bit-identical between Spark and DuckDB; consumers round to a fixed precision
before hashing anyway. Pure built-ins (``zip_with``/``aggregate``) — JVM-side,
no UDF, no shuffle.

At 100 TB the brute-force form is only for bounded candidate sets (post-LSH);
`operators/similarity.py` provides the bucketed path that bounds the join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns, computed in DOUBLE."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str, dim: int) -> str:
    """DuckDB fold in the same order as :func:`dot` (init 0.0, left-to-right)."""
    prods = f"[CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) for i in range(1, {dim + 1})]"
    return f"list_reduce(list_prepend(0.0, {prods}), (x, y) -> x + y)"


def sql_norm(a: str, dim: int) -> str:
    return f"sqrt({sql_dot(a, a, dim)})"


def sql_cosine(a: str, b: str, dim: int) -> str:
    return f"({sql_dot(a, b, dim)} / ({sql_norm(a, dim)} * {sql_norm(b, dim)}))"
