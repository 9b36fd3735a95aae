"""Vector math over array<float> embedding columns — JVM expressions.

Dot products and norms are computed as explicit sequential left-folds
(``aggregate(zip_with(...))``) in double precision. That choice is
deliberate: a left fold is the one summation order every engine can
reproduce (the DuckDB oracles use list_reduce(list_zip(...)) — the
same fold), so cosine scores are bit-identical across engines. The
expressions stay inside WholeStageCodegen; no UDF, no Arrow transfer.

For 100 TB: these are O(d) per row with no shuffle; the scale lever is
candidate reduction (LSH bucketing in operators.similarity), not the
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str, dim: int | None = None) -> Column:
    """Sequential-fold double dot product of two float-array columns.

    With ``dim`` (a statically known vector length, e.g. the embeddings
    table's 64) the fold is UNROLLED into left-associated arithmetic:
    ``((0 + a[0]*b[0]) + a[1]*b[1]) + …`` — the exact same IEEE op
    sequence as the higher-order ``aggregate`` fold (bit-identical
    result), but inside WholeStageCodegen instead of the interpreted
    per-element lambda evaluator, which is ~2× faster in the pair-
    scoring hot loops. Never pass ``dim`` larger than the real array
    length (ANSI mode makes out-of-bounds indexing an error).
    """
    if dim is not None:
        terms = " + ".join(
            f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
            for i in range(dim))
        return F.expr(f"(CAST(0 AS DOUBLE) + {terms})")
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f"  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f"  CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str, dim: int | None = None) -> Column:
    """L2 norm via the same sequential fold (see dot() re: ``dim``)."""
    if dim is not None:
        terms = " + ".join(
            f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)"
            for i in range(dim))
        return F.sqrt(F.expr(f"(CAST(0 AS DOUBLE) + {terms})"))
    return F.sqrt(F.expr(
        f"aggregate({a}, CAST(0 AS DOUBLE),"
        f"  (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    ))


def cosine(a: str, b: str, dim: int | None = None) -> Column:
    """Cosine similarity, engine-reproducible."""
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


# DuckDB spellings of the SAME folds (list_zip structs are indexed
# numerically; list_reduce is a sequential left fold like aggregate).
def sql_dot(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(list_zip({a}, {b}),"
            f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),"
            f" (acc, v) -> acc + v)")


def sql_norm(a: str) -> str:
    return (f"sqrt(list_reduce(list_transform({a},"
            f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            f" (acc, v) -> acc + v))")


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
