"""[EXT] Similarity search over embedding columns (SURVEY.md section 2.10 E2/E4).

Vectors are first-class ``array<float>`` columns; dot products / norms are
computed with ``zip_with`` + ``aggregate`` — JVM-side, codegen'd, no Python.
Every element is cast to double BEFORE multiplying and accumulated strictly
left-to-right, so Spark and DuckDB (``list_transform``+``list_sum`` over the
same order) produce bit-identical doubles.

Scale design:

- brute-force top-k broadcasts the (small) query set against the full vector
  table: one narrow pass + a per-query top-k (window over query_id) — the
  right baseline when |queries| << |corpus|.
- the LSH path buckets vectors by deterministic random-hyperplane signs
  (hyperplanes derived from md5, so both engines agree) and only pairs
  within a bucket — candidate count ~ n^2 / 2^bits per band, tunable;
  the bucket join shuffles on uniformly-distributed sign patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"

#: Number of sign-hyperplanes for the LSH bucket key.
LSH_PLANES = 8


def dot_expr(a: str, b: str) -> str:
    """Exact-order double dot product of two float-array columns."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def cosine_expr(a: str = "emb_a", b: str = "emb_b") -> Column:
    return (
        F.expr(dot_expr(a, b))
        / F.sqrt(F.expr(dot_expr(a, a)) * F.expr(dot_expr(b, b)))
    )


def hyperplane_dot_expr(vec: str, plane: int) -> str:
    """Dot of ``vec`` with deterministic pseudo-random hyperplane ``plane``.

    Component i of the plane is md5('h<plane>_<i>')'s first hex digit mapped
    to {-7.5 ... 7.5} — reproducible in any engine with md5 + instr.
    """
    h = (
        f"(instr('{_HEX}', substr(md5(concat('h{plane}_', i)), 1, 1)) - 1) - 7.5"
    )
    return (
        f"aggregate(zip_with({vec}, sequence(1, size({vec})),"
        f" (x, i) -> CAST(x AS DOUBLE) * ({h})),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append the sign-pattern bucket string ('0'/'1' per hyperplane)."""
    bits = [
        F.when(F.expr(hyperplane_dot_expr(vec_col, p)) > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(LSH_PLANES)
    ]
    return df.withColumn("bucket", F.concat(*bits))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (broadcast the query side)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("emb_q")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb_n")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_raw", cosine_expr("emb_q", "emb_n"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# DuckDB twin fragments.
# ---------------------------------------------------------------------------
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / sqrt({duck_dot(a, a)} * {duck_dot(b, b)}))"


def duck_hyperplane_dot(vec: str, plane: int) -> str:
    h = f"(instr('{_HEX}', substr(md5('h{plane}_' || i), 1, 1)) - 1) - 7.5"
    return (
        f"list_sum(list_transform(range(1, len({vec}) + 1),"
        f" i -> CAST({vec}[i] AS DOUBLE) * ({h})))"
    )


def duck_bucket(vec: str) -> str:
    bits = " || ".join(
        f"(CASE WHEN {duck_hyperplane_dot(vec, p)} > 0 THEN '1' ELSE '0' END)"
        for p in range(LSH_PLANES)
    )
    return "(" + bits + ")"
