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


def with_sq_norm(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Append the raw self-dot (squared norm, no sqrt) — computed once per
    row so pair stages stop recomputing it per candidate."""
    return df.withColumn(out_col, F.expr(dot_expr(vec_col, vec_col)))


def cosine_precomp(a: str, b: str, na2: str, nb2: str) -> Column:
    """``dot(a,b) / sqrt(na2 * nb2)`` with the self-dots read from columns.

    Bit-identical to :func:`cosine_expr` (same IEEE expression tree over the
    same self-dot doubles — sqrt of their product), but the pair stage does
    1 dot instead of 3."""
    return F.expr(dot_expr(a, b)) / F.sqrt(F.col(na2) * F.col(nb2))


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


def topk_per_query(scored: DataFrame, k: int = 10) -> DataFrame:
    """Two-phase top-k over a scored candidate set
    (``query_id, neighbor_id, cos_raw``).

    Each scan partition keeps only its local top-k per query (groupBy
    ``(query_id, spark_partition_id)`` -> sorted-slice of a
    ``collect_list``), then a tiny global merge over ``partitions x k``
    candidates per query. A single ``row_number`` window per query_id would
    route EVERY scored candidate row for a query onto one task — |corpus|
    rows per partition at 100 TB; here the wide stages only ever move
    ``O(partitions * k)`` rows per query. Ordering matches the window form
    exactly: descending cosine, ascending ``neighbor_id`` tie-break (encoded
    as an ascending struct sort on ``(-cosine, neighbor_id)``; doubles
    negate losslessly so the semantics are identical).
    """
    cand = F.struct(
        (-F.col("cos_raw")).alias("neg_cos"), F.col("neighbor_id").alias("nid")
    )
    local = scored.groupBy("query_id", F.spark_partition_id().alias("_pid")).agg(
        F.slice(F.array_sort(F.collect_list(cand)), 1, k).alias("cands")
    )
    merged = local.groupBy("query_id").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("cands"))), 1, k).alias("topk")
    )
    return merged.select(
        "query_id", F.posexplode("topk").alias("pos", "c")
    ).select(
        "query_id",
        F.col("c.nid").alias("neighbor_id"),
        F.round(-F.col("c.neg_cos"), 6).alias("cosine"),
        (F.col("pos") + 1).cast("long").alias("rank"),
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (broadcast the query side) — the
    right baseline when |queries| << |corpus|; one narrow scan pass feeding
    the two-phase :func:`topk_per_query` merge."""
    q = with_sq_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("emb_q")
        ),
        "emb_q",
        "nq2",
    )
    v = with_sq_norm(
        vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb_n")
        ),
        "emb_n",
        "nn2",
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_raw", cosine_precomp("emb_q", "emb_n", "nq2", "nn2"))
    )
    return topk_per_query(scored, k)


def ivf_flat_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF centroid set: the ``n_centroids`` vectors with the
    smallest ``md5(id)`` — a reproducible pseudo-random sample any engine can
    recompute (no trained state), numbered 1..n in md5 order. Freeze this at
    index-build time to keep later assignments incremental (the real IVF
    maintenance contract: centroids retrain rarely, assignment is per-vector).
    """
    from pyspark.sql import Window

    return (
        vectors.select(
            F.col(id_col).alias("_cid_src"), F.col(vec_col).alias("emb_c")
        )
        .withColumn("_h", F.md5(F.col("_cid_src").cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        # n_centroids rows: the single-partition window is a no-op at scale.
        .withColumn(
            "centroid_id", F.row_number().over(Window.orderBy("_h")).cast("long")
        )
        .select("centroid_id", "emb_c")
        .withColumn("nc2", F.expr(dot_expr("emb_c", "emb_c")))
    )


def assign_to_centroids(
    vectors: DataFrame,
    cent: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, cluster)`` for every vector against a given (frozen)
    centroid set: broadcast centroids, argmax-cosine via a map-side
    ``min(struct)`` partial aggregation (tie-break: smaller centroid id) —
    no per-vector window, no skewed shuffle key; the only wide stage groups
    on ``vec_id`` (uniform). Per-vector independence is what makes index
    maintenance incremental: assigning a new batch never touches old rows."""
    return (
        with_sq_norm(
            vectors.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_emb")
            ),
            "_emb",
            "nv2",
        )
        .crossJoin(F.broadcast(cent))
        .withColumn("_neg_cos", -cosine_precomp("_emb", "emb_c", "nv2", "nc2"))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(F.col("_neg_cos").alias("neg"), F.col("centroid_id").alias("cid"))
            ).alias("_best")
        )
        .select("vec_id", F.col("_best.cid").alias("cluster"))
    )


def assign_ivf_flat_clusters(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: ``(vec_id, cluster)`` for every
    vector (centroids derived from the same set — see
    :func:`ivf_flat_centroids` / :func:`assign_to_centroids`)."""
    cent = ivf_flat_centroids(vectors, n_centroids, id_col, vec_col)
    return assign_to_centroids(vectors, cent, id_col, vec_col)


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


# ---------------------------------------------------------------------------
# Product quantization (PQ): the FAISS-style codebook compression — split
# the vector into M subspaces, quantize each against its own K-entry
# codebook, store M small codes per vector.
# ---------------------------------------------------------------------------
def _sub_sq_dist(vec: str, cent: str, lo: int, hi: int) -> str:
    """Exact-order squared L2 distance over 1-based dims [lo, hi]."""
    d = f"(CAST(element_at({vec}, i) AS DOUBLE) - CAST(element_at({cent}, i) AS DOUBLE))"
    return (
        f"aggregate(sequence({lo}, {hi}), CAST(0 AS DOUBLE),"
        f" (acc, i) -> acc + {d} * {d})"
    )


def pq_codes(
    vectors: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, code_0..code_{m-1}, recon)`` — per-subspace argmin-L2
    codes against deterministic codebooks (the md5-smallest ``k`` vectors'
    subvectors, the same frozen-sample scheme as the IVF coarse quantizer)
    plus the reconstructed vector.

    Scale shape: codebooks are k rows and BROADCAST; assignment is one
    cross-join against the broadcast set folded into a single map-side
    ``min(struct)`` partial aggregation per subspace — no per-vector
    window, no skewed shuffle (the only wide stage groups on the uniform
    ``vec_id``). Reconstruction joins each code to its broadcast codebook
    slice. Per-vector independence keeps index maintenance incremental.
    """
    from pyspark.sql import Window

    sub = dim // m
    cent = (
        vectors.select(
            F.col(vec_col).alias("emb_c"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h")
        .limit(k)
        # k rows: the single-partition window is a no-op at scale.
        .withColumn("centroid_id", F.row_number().over(Window.orderBy("_h")).cast("long"))
        .select("centroid_id", "emb_c")
    )
    pairs = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_emb")
    ).crossJoin(F.broadcast(cent))
    dists = pairs.select(
        "vec_id",
        "centroid_id",
        *[
            F.expr(_sub_sq_dist("_emb", "emb_c", s * sub + 1, (s + 1) * sub)).alias(
                f"d{s}"
            )
            for s in range(m)
        ],
    )
    codes = dists.groupBy("vec_id").agg(
        *[
            F.min(
                F.struct(F.col(f"d{s}").alias("d"), F.col("centroid_id").alias("cid"))
            )["cid"].alias(f"code_{s}")
            for s in range(m)
        ]
    )
    recon = codes
    for s in range(m):
        sl = F.broadcast(
            cent.select(
                F.col("centroid_id").alias(f"code_{s}"),
                F.slice("emb_c", s * sub + 1, sub).alias(f"_sub{s}"),
            )
        )
        recon = recon.join(sl, f"code_{s}")
    return recon.withColumn(
        "recon", F.concat(*[F.col(f"_sub{s}") for s in range(m)])
    ).select("vec_id", *[f"code_{s}" for s in range(m)], "recon")
