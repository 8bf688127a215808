"""Dedup band-join unit tests: salted self-join invariance under a giant
duplicate class (the one skew source md5 band keys can't smooth)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
    lsh_candidate_pairs,
    simhash_near_pairs,
    simhash_signatures,
    with_bands,
    with_minhash,
    with_shingles,
)


def _skewed_docs(spark, n_dup: int = 120, n_unique: int = 30):
    """One n_dup-doc duplicate class (identical text => identical bands) plus
    unique riff docs."""
    dup = [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(n_dup)]
    uniq = [
        (1000 + i, f"unique document number {i} with its own words entirely {i * 7}")
        for i in range(n_unique)
    ]
    return spark.createDataFrame(dup + uniq, "doc_id long, text string")


def test_salted_lsh_pairs_equal_unsalted(spark):
    docs = _skewed_docs(spark)
    banded = with_bands(with_minhash(with_shingles(docs)))
    unsalted = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(banded, salt=1).collect()}
    salted = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(banded, salt=8).collect()}
    assert salted == unsalted
    # The duplicate class really is the hot key: all C(120,2) pairs present.
    dup_pairs = {p for p in salted if p[0] < 1000 and p[1] < 1000}
    assert len(dup_pairs) == 120 * 119 // 2


def test_salted_simhash_pairs_equal_unsalted(spark):
    docs = _skewed_docs(spark, n_dup=60, n_unique=20)
    sigs = simhash_signatures(docs)
    unsalted = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(sigs, salt=1).collect()
    }
    salted = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(sigs, salt=8).collect()
    }
    assert salted == unsalted
    assert len({(a, b) for a, b, _ in salted if a < 1000 and b < 1000}) == 60 * 59 // 2


def test_salted_join_shuffles_on_salt_bucket(spark):
    """The scale contract: the pair-join exchange must include the salt
    bucket, so a single hot band key spreads over BAND_SALT reducers."""
    docs = _skewed_docs(spark, n_dup=10, n_unique=5)
    banded = with_bands(with_minhash(with_shingles(docs)))
    df = lsh_candidate_pairs(banded, salt=8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    parts = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert any("_salt" in p for p in parts), plan


def test_phash_prefix_probes_ignore_tail_edits(spark):
    """The fixed-stride probes cover only the payload prefix: two docs that
    share the first _PHASH_MIN_BYTES bytes but diverge afterwards must hash
    identically (Hamming 0) — the robustness property the length-relative
    stride lacked."""
    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        _PHASH_MIN_BYTES,
        _PHASH_SPARK_SIG,
    )

    base = "a quick brown fox jumps over the lazy dog " * 3  # > prefix bytes
    assert len(base) >= _PHASH_MIN_BYTES
    docs = spark.createDataFrame(
        [(1, base + "original tail content"), (2, base + "completely different ending XYZXYZ")],
        "doc_id long, text string",
    ).withColumn("n", F.length(F.encode("text", "UTF-8")))
    sigs = [r.sig for r in docs.selectExpr(f"cast(({_PHASH_SPARK_SIG}) as bigint) as sig").collect()]
    assert sigs[0] == sigs[1]


def test_fuzzy_edit_finds_typo_pair_and_skips_distinct_docs(spark):
    """A near-identical typo pair must survive blocking + verify; unrelated
    docs must not pair."""
    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        simhash_near_pairs as snp,
    )
    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        simhash_signatures as ss,
    )

    a = "the training corpus contains exactly this sentence with shared words " * 8
    b = a.replace("exactly", "exactlq", 1)  # one typo in ~90 tokens: sig moves
    # 2 bits (verified), inside the <=3 blocking gate
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, "entirely unrelated text about astronomy and chemistry topics")],
        "doc_id long, text string",
    )
    cand = snp(ss(docs)).select("doc_a", "doc_b")
    pfx = docs.select("doc_id", F.substring("text", 1, 80).alias("p"))
    pairs = (
        cand.join(pfx.select(F.col("doc_id").alias("doc_a"), F.col("p").alias("pa")), "doc_a")
        .join(pfx.select(F.col("doc_id").alias("doc_b"), F.col("p").alias("pb")), "doc_b")
        .withColumn("d", F.levenshtein("pa", "pb"))
        .filter(F.col("d") <= 20)
    )
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_semantic_dedup_keeps_member_closest_to_centroid(spark, tmp_path):
    """A planted near-dup pair inside one cluster: the member nearer the
    (quantized) centroid survives, the other is dropped, and untouched
    clusters keep everything."""
    import numpy as np
    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        dedup_semantic,
    )

    rows = []
    # Cluster 0: two near-identical vectors (cosine ~1) plus two spread
    # vectors pulling the centroid toward vec 1's side.
    rows.append((0, [1.0, 0.02, 0.0, 0.0], 0))
    rows.append((1, [1.0, 0.0, 0.0, 0.0], 0))
    rows.append((2, [-0.02, -0.9, 0.0, 0.0], 0))
    # Cluster 1: orthogonal vectors — no pair above tau, all kept.
    rows.append((10, [0.0, 0.0, 1.0, 0.0], 1))
    rows.append((11, [0.0, 0.0, 0.0, 1.0], 1))
    import pandas as pd

    pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [np.array(r[1], dtype="float32") for r in rows],
         "label": np.array([r[2] for r in rows], dtype="int32")}
    ).to_parquet(tmp_path / "embeddings.parquet")
    out = {r.vec_id: r for r in dedup_semantic(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2, 10, 11}
    # Exactly one of the planted near-dups is dropped, by centroid proximity.
    pair_kept = [v for v in (0, 1) if out[v].keep]
    pair_dropped = [v for v in (0, 1) if not out[v].keep]
    assert len(pair_kept) == 1 and len(pair_dropped) == 1
    assert out[pair_kept[0]].centroid_sim > out[pair_dropped[0]].centroid_sim
    assert out[2].keep and out[10].keep and out[11].keep


def test_simhash_verified_kills_chance_collisions_keeps_true_dups(spark, tmp_path):
    """The r06 dedup_simhash caveat, as a model: short docs over a tiny
    shared vocab collide at Hamming <= 6 BY CHANCE (bit agreement without
    text overlap); the Jaccard-dominance verify must drop every such pair
    while a planted true near-dup pair (one typo in ~60 tokens) survives
    with its hamming + integer ppm intact."""
    import itertools

    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        dedup_simhash_verified,
    )

    base = "shared corpus sentence with mostly common tokens repeated often " * 10
    rows = [(1, base), (2, base.replace("mostly", "mostlq", 1))]
    # Dense chance-collision pool: 3-token docs from a 6-word vocab — many
    # signature pairs land within Hamming 6 with near-zero shingle overlap.
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i, combo in enumerate(itertools.permutations(vocab, 3)):
        rows.append((100 + i, " ".join(combo)))
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        (r.doc_a, r.doc_b): (r.hamming, r.jaccard_ppm)
        for r in dedup_simhash_verified(spark, sf).collect()
    }
    assert (1, 2) in got
    h, ppm = got[(1, 2)]
    assert h <= 6 and ppm >= 500_000
    # No chance-collision pair may survive the verify unless its docs
    # genuinely share >= half their shingles (permutations of the same
    # 3 words share NO word-3-gram except identical ordering — excluded).
    assert all(a < 100 for (a, b) in got), got
