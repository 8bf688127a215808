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
