"""Isotonic regression (pool-adjacent-violators) over BOUNDED aggregate
tables — the calibration fit that turns a classifier's reliability curve
into a usable monotone score->probability map (Zadrozny & Elkan 2002;
`sklearn.isotonic` is the single-node reference implementation).

PAV itself is sequential, but its closed form is a minimax over interval
averages (Robertson, Wright & Dykstra 1988, Thm 1.4.4):

    iso(i) = max_{j<=i} min_{k>=i} ( sum_{b in [j,k]} num_b
                                   / sum_{b in [j,k]} den_b )

which is pure relational algebra once the input is a BOUNDED bin table
(score deciles, margin buckets — tens of rows, never the corpus). The
100 TB shape is therefore: one full-scale aggregation reduces the corpus
to B rows, then O(B^2) interval averages materialize through
broadcast-nested-loop self-joins of that tiny table. Nothing here ever
touches raw rows; every join side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def isotonic_fit(
    bins: DataFrame, key: str, num: str, den: str
) -> DataFrame:
    """Weighted isotonic (non-decreasing in ``key``) fit of ``num/den``.

    ``bins`` must be a small aggregate table (one row per ``key``); the
    caller is responsible for that boundedness — this function cross-pairs
    it with itself. Returns one row per input row with an ``iso_avg``
    double column appended: the PAV-pooled value of ``num/den`` at that
    key, computed via the interval-average minimax (exact integer sums,
    one IEEE division per interval — engine-reproducible).
    """
    bins = bins.localCheckpoint(eager=False)  # one upstream compute, 4 uses
    bj = bins.select(F.col(key).alias("jb"))
    bk = bins.select(F.col(key).alias("kb"))
    bx = bins.select(
        F.col(key).alias("xb"),
        F.col(num).alias("_num"),
        F.col(den).alias("_den"),
    )
    intervals = (
        bj.join(F.broadcast(bk), F.col("jb") <= F.col("kb"))
        .join(
            F.broadcast(bx),
            (F.col("xb") >= F.col("jb")) & (F.col("xb") <= F.col("kb")),
        )
        .groupBy("jb", "kb")
        .agg(
            (
                F.sum("_num").cast("double") / F.sum("_den").cast("double")
            ).alias("avg_jk")
        )
    )
    inner_min = (
        bins.select(F.col(key).alias("ib"))
        .join(
            F.broadcast(intervals),
            (F.col("jb") <= F.col("ib")) & (F.col("kb") >= F.col("ib")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("avg_jk").alias("_mn"))
    )
    iso = inner_min.groupBy("ib").agg(F.max("_mn").alias("iso_avg"))
    return bins.join(F.broadcast(iso), bins[key] == iso["ib"]).drop("ib")


def duckdb_isotonic_ctes(bins_cte: str, key: str, num: str, den: str) -> str:
    """The DuckDB twin of :func:`isotonic_fit`, as appendable CTE text:
    given an existing CTE named ``bins_cte`` with (key, num, den) columns,
    emits ``iso_intervals``/``iso_inner``/``iso`` CTEs where ``iso`` has
    (key, iso_avg) — the identical minimax with identical integer sums, so
    value-hash parity holds bit-for-bit on the doubles."""
    return f"""
iso_intervals AS (
  SELECT j.{key} AS jb, k.{key} AS kb,
         CAST(sum(x.{num}) AS DOUBLE) / CAST(sum(x.{den}) AS DOUBLE)
           AS avg_jk
  FROM {bins_cte} j
  JOIN {bins_cte} k ON j.{key} <= k.{key}
  JOIN {bins_cte} x ON x.{key} BETWEEN j.{key} AND k.{key}
  GROUP BY j.{key}, k.{key}
),
iso_inner AS (
  SELECT i.{key} AS ib, p.jb, min(p.avg_jk) AS mn
  FROM {bins_cte} i
  JOIN iso_intervals p ON p.jb <= i.{key} AND p.kb >= i.{key}
  GROUP BY i.{key}, p.jb
),
iso AS (
  SELECT ib AS {key}, max(mn) AS iso_avg FROM iso_inner GROUP BY ib
)"""
