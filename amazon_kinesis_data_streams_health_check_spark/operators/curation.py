"""Training-data curation operators: deterministic sampling, mixture
planning, sequence packing, duplicate-cluster resolution.

These are the [EXT] operations a 100 TB pretraining pipeline runs after
dedup/quality scoring (SURVEY.md section 2.10 scope; no reference citations —
the reference has no batch-curation surface).

Design rules shared with the rest of the engine:

- **Determinism across engines and runs**: no ``rand()`` anywhere. Sampling
  decisions hash the row key with md5 (bit-identical in Spark and DuckDB and
  stable across cluster sizes/restarts — a rerun keeps the same rows, which
  is what makes training runs reproducible). The md5-uint32 idiom:
  Spark ``conv(substr(md5(k),1,8),16,10)`` == DuckDB
  ``('0x' || substr(md5(k),1,8))::BIGINT``.
- **Exact arithmetic at decision points**: keep/drop compares integers
  (``h * 100 < pct * 2^32``), never floats.
- **Scale**: every operator is a scan + narrow projection or a keyed
  aggregation; nothing collects to the driver except the O(iterations)
  convergence scalars of connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^32 — the md5-uint32 sample space.
HASH_SPACE = 4_294_967_296


def hash_uniform(key_col: str) -> F.Column:
    """Deterministic uint32 in [0, 2^32) from a row key (md5-based)."""
    return F.expr(f"CAST(conv(substr(md5(CAST({key_col} AS STRING)), 1, 8), 16, 10) AS BIGINT)")


def duck_hash_uniform(key_expr: str) -> str:
    """DuckDB twin of :func:`hash_uniform` (same bits)."""
    return f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT)"


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, rates_pct: dict[str, int]
) -> DataFrame:
    """Keep each row iff md5-uniform(key) falls under its stratum's rate.

    Exactly-reproducible stratified sampling: the decision depends only on
    the row key, so it is stable under repartitioning, retries, and scale-out
    (unlike ``df.sample``/``sampleBy``, whose draw depends on partition
    layout). Filter is a narrow map — predicate-pushdown-friendly, no
    shuffle.
    """
    rate = F.coalesce(
        *[
            F.when(F.col(stratum_col) == s, F.lit(p))
            for s, p in rates_pct.items()
        ],
        F.lit(0),
    )
    return df.filter(hash_uniform(key_col) * 100 < rate * F.lit(HASH_SPACE))


def mixture_plan(
    token_counts: DataFrame, weights: dict[str, int]
) -> DataFrame:
    """Given per-stratum available token counts (``stratum``, ``avail``) and
    integer mixture weights, compute the largest total token budget T with
    ``w_s/W * T <= avail_s`` for every stratum, and each stratum's take.

    All-integer planning: T = min_s floor(avail_s * W / w_s); take_s =
    floor(w_s * T / W). The min is a 1-row aggregate broadcast back — no
    driver round-trip, no floats until the reported fraction.
    """
    spark = token_counts.sparkSession
    w = spark.createDataFrame(
        [(s, int(p)) for s, p in weights.items()], "stratum string, weight int"
    )
    total_w = sum(weights.values())
    per = token_counts.join(F.broadcast(w), "stratum")
    cap = per.agg(
        F.min(F.floor(F.col("avail") * F.lit(total_w) / F.col("weight"))).alias("t_max")
    )
    return (
        per.crossJoin(F.broadcast(cap))
        .select(
            "stratum",
            "avail",
            "weight",
            F.floor(F.col("weight") * F.col("t_max") / F.lit(total_w))
            .cast("long")
            .alias("take_tokens"),
        )
        .withColumn(
            "utilization",
            F.round(F.col("take_tokens").cast("double") / F.col("avail"), 6),
        )
    )


def pack_sequences(
    docs_tokens: DataFrame,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign docs to fixed-token training bins by greedy cumulative packing.

    Docs are ordered by the deterministic md5 shuffle (training-order
    randomization that is still reproducible), then binned where the running
    token total crosses multiples of ``budget`` — the classic concat-and-
    chunk packing of LLM pretraining, expressed as one window cumsum.

    The window partitions by ``part_col``: at 100 TB a global ordering would
    serialize into one task, while per-source packing keeps every partition
    independent (and training mixes sources anyway). Oversized docs (>
    budget) get their own bin by construction.
    """
    order_key = hash_uniform(id_col)
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs_tokens.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .withColumn(
            "bin",
            F.floor((F.col("cum_tokens") - F.lit(1)) / F.lit(budget)).cast("long"),
        )
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Resolve duplicate clusters: (a, b) edges -> (doc_id, cluster_id) with
    cluster_id = min doc id reachable (the canonical "keep" doc).

    Iterative min-label propagation — the standard large-graph CC algorithm
    (each round: every vertex takes the min of its own and its neighbors'
    labels; converges in O(diameter) rounds). Each round is one shuffle-join
    + aggregate over the EDGE set only, so cost scales with near-dup pairs,
    not the corpus. The only driver traffic is one boolean ("any label
    changed?") per round.

    Near-dup graphs are overwhelmingly tiny cliques/chains (diameter <= 3-4
    in practice), so the loop exits almost immediately; ``max_iterations``
    bounds adversarial chains.

    Each round's labels are pinned with an EAGER ``localCheckpoint``: it
    materializes the round (the convergence count then reads cached data,
    exactly what the old per-round ``persist`` bought) *and* truncates
    lineage, so an adversarial long chain never accumulates an r-deep join
    tree in the driver. Unlike SQL-level ``persist`` — which parks every
    round's relation in the CacheManager until an explicit unpersist (the
    r01-flagged session-lifetime leak) — checkpoint blocks are freed by the
    ContextCleaner as soon as the previous round's DataFrame is
    garbage-collected.
    """
    sym = (
        edges.selectExpr("a", "b")
        .union(edges.selectExpr("b AS a", "a AS b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.v)
            .groupBy(sym.a.alias("v2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(neighbor_min, labels.v == F.col("v2"), "left")
            .select(
                F.col("v"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.least(F.col("label"), F.coalesce("nbr_label", "label")) != F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        any_changed = stepped.filter("changed").limit(1).count() > 0
        labels = stepped.select("v", "label")
        if not any_changed:
            break
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("cluster_id"))


def label_propagation(
    edges: DataFrame, nodes: DataFrame, iterations: int = 4
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007): ``iterations``
    rounds of "take the neighbor-majority label, smallest label on ties",
    starting from label = own id. Finds DENSE communities where
    ``connected_components`` only finds reachability.

    Inputs: ``edges`` with (src, dst) — pass the graph pre-symmetrized if
    undirected semantics are wanted — and ``nodes`` with (vec_id).

    Determinism device: the per-node argmax is ``min()`` over fixed-width
    ``lpad(inverted_count) || lpad(label)`` strings — a total order, so the
    synchronous rounds are reproducible under any partitioning and twin
    SQL engines compute the identical sequence. Each round is one
    uniform-key join plus two keyed aggregations over the EDGE set
    (Pregel-by-joins); rounds unroll into one lazy DAG, no driver traffic.
    """
    # Field widths cover the full BIGINT range: labels are vec_ids (<= 19
    # digits), neighbor counts invert against 10^18 (degree bound far above
    # any real graph). lpad TRUNCATES over-length strings, so an undersized
    # field would silently corrupt the substr() decode — hence 19/19.
    inv = 10**18
    enc = (
        f"lpad(CAST({inv} - c AS STRING), 19, '0')"
        " || lpad(CAST(label AS STRING), 19, '0')"
    )
    labels = nodes.select("vec_id", F.col("vec_id").cast("long").alias("label"))
    for _ in range(iterations):
        cnt = (
            edges.join(
                labels.select(F.col("vec_id").alias("src"), "label"), "src"
            )
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        best = cnt.groupBy("dst").agg(F.min(F.expr(enc)).alias("enc"))
        labels = (
            nodes.join(best.withColumnRenamed("dst", "vec_id"), "vec_id", "left")
            .join(labels.withColumnRenamed("label", "old_label"), "vec_id")
            .select(
                "vec_id",
                F.coalesce(
                    F.expr("CAST(substr(enc, 20) AS BIGINT)"),
                    F.col("old_label"),
                ).alias("label"),
            )
        )
    return labels
