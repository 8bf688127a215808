"""Mining-query tests: the BPE canonical-form replace contract (the one
primitive whose cross-engine semantics the whole merge step rests on), plan
pins for the association joins, and layout invariance for the learned merges.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries
from tests.test_plans import plan_of

QUERIES = all_queries()

#: (canonical word string, merge pair (a, b), expected result).
#: Cases: consecutive occurrences (must BOTH merge — the pattern ends inside
#: the right separator so matches never share consumed characters),
#: overlapping triple (greedy left-to-right: only the first merges),
#: false prefix (symbol "bc" must not match pair-member "b"),
#: multi-char symbols from an earlier round.
_REPLACE_CASES = [
    ("||a||b||a||b||", ("a", "b"), "||ab||ab||"),
    ("||a||a||a||", ("a", "a"), "||aa||a||"),
    ("||a||bc||", ("a", "b"), "||a||bc||"),
    ("||xa||b||", ("a", "b"), "||xa||b||"),
    ("||ab||cd||ab||cd||e||", ("ab", "cd"), "||abcd||abcd||e||"),
    ("||t||h||e||$||", ("e", "$"), "||t||h||e$||"),
]


@pytest.mark.parametrize("word,pair,expected", _REPLACE_CASES)
def test_bpe_replace_semantics_spark(spark, word, pair, expected):
    a, b = pair
    got = (
        spark.range(1)
        .select(
            F.expr(
                f"replace('{word}', '|{a}||{b}|', '|{a}{b}|')"
            ).alias("w")
        )
        .collect()[0]["w"]
    )
    assert got == expected


@pytest.mark.parametrize("word,pair,expected", _REPLACE_CASES)
def test_bpe_replace_semantics_duckdb(word, pair, expected):
    a, b = pair
    got = duckdb.sql(
        f"SELECT replace('{word}', '|{a}||{b}|', '|{a}{b}|')"
    ).fetchone()[0]
    assert got == expected


def test_market_basket_lift_plan(spark, sf_small):
    """Marginals and the basket-count scalar broadcast; the only big joins
    are the order-key pair join and nothing is a cartesian product."""
    plan = plan_of(spark, sf_small, "market_basket_lift")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 3, plan
    # The pair self-join must be an equi-join on the order key — a hash or
    # sort-merge join node keyed on okey, never a nested loop over parts.
    assert re.search(r"Left keys \[\d+\]: \[okey#", plan), plan


def test_collocation_pmi_plan(spark, sf_small):
    """Both marginal vocab tables broadcast — the pair table never shuffles
    on a bare token key (hot-key safety)."""
    plan = plan_of(spark, sf_small, "collocation_pmi")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 3, plan


def test_bpe_learn_layout_invariance(spark, sf_small):
    """The learned merges must not depend on input partitioning."""
    name = "bpe_merge_learn"
    base = {tuple(r) for r in QUERIES[name].builder(spark, sf_small).collect()}

    import amazon_kinesis_data_streams_health_check_spark.sources.tables as tables

    orig = tables.parallel_scan

    def skewed(spark_, sf_dir, table, **kw):
        df = orig(spark_, sf_dir, table, **kw)
        return df.repartition(7) if table == "documents" else df

    try:
        tables.parallel_scan = skewed
        import amazon_kinesis_data_streams_health_check_spark.plans.mining_queries as mq

        mq_orig = mq.parallel_scan
        mq.parallel_scan = skewed
        try:
            again = {tuple(r) for r in QUERIES[name].builder(spark, sf_small).collect()}
        finally:
            mq.parallel_scan = mq_orig
    finally:
        tables.parallel_scan = orig
    assert base == again


def test_cusum_closed_form_model():
    """The prefix-sum closed form equals the textbook recurrence on a
    hand-rolled series (independent Python model)."""
    xs = [5, 5, 9, 9, 9, 2, 2, 14, 1, 5]
    mu = sum(xs) // len(xs)
    k = mu // 20
    # textbook recurrences
    sp = sn = 0
    expected = []
    for x in xs:
        sp = max(0, sp + (x - mu - k))
        sn = max(0, sn + (mu - x - k))
        expected.append((sp, sn))
    # closed form
    pp = pn = 0
    lop = lon = 0
    got = []
    for x in xs:
        pp += x - mu - k
        pn += mu - x - k
        lop = min(lop, pp)
        lon = min(lon, pn)
        got.append((pp - min(0, lop), pn - min(0, lon)))
    assert got == expected


def test_waterfill_closed_form_vs_bruteforce():
    """The closed-form waterline equals the brute-force 'largest L with
    sum(min(s, L)) <= B' on assorted size vectors."""

    def closed_form(sizes, budget):
        ss = sorted(sizes)
        k = len(ss)
        prefix = [0]
        for s in ss:
            prefix.append(prefix[-1] + s)
        best = None
        for i in range(1, k + 1):
            s_prev = ss[i - 2] if i >= 2 else 0
            lvl = (budget - prefix[i - 1]) // (k - i + 1)
            if lvl >= s_prev:
                best = lvl if best is None else max(best, lvl)
        return best

    def brute(sizes, budget):
        lo = 0
        while sum(min(s, lo + 1) for s in sizes) <= budget:
            lo += 1
        return lo

    cases = [
        ([10, 20, 100], 60),
        ([10, 20, 100], 25),
        ([5, 5, 5, 5], 12),
        ([1, 2, 3, 4, 100], 50),
        ([7], 3),
        ([3, 3, 3], 4),
        ([100, 200, 300], 599),
    ]
    for sizes, b in cases:
        assert closed_form(sizes, b) == brute(sizes, b), (sizes, b)
        alloc = sum(min(s, closed_form(sizes, b)) for s in sizes)
        assert alloc <= b


def test_ks_integer_statistic_vs_float_model():
    """max|a*n2 - b*n1| / (n1*n2) equals the float two-sample KS D on
    hand-rolled samples (computed at every distinct point)."""
    s1 = [1, 3, 3, 7, 9, 9, 9, 12]
    s2 = [2, 3, 5, 7, 11, 13]
    n1, n2 = len(s1), len(s2)
    pts = sorted(set(s1) | set(s2))
    d_scaled = max(
        abs(sum(1 for x in s1 if x <= p) * n2 - sum(1 for x in s2 if x <= p) * n1)
        for p in pts
    )
    d_float = max(
        abs(sum(1 for x in s1 if x <= p) / n1 - sum(1 for x in s2 if x <= p) / n2)
        for p in pts
    )
    assert abs(d_scaled / (n1 * n2) - d_float) < 1e-12


def test_decayed_pow2_cast_is_exact(spark):
    """decayed_activity_rank divides by CAST(pow(2, age) AS BIGINT): pin
    that the double pow round-trips exactly to 2^k for every age the decay
    can see (doubles represent powers of two exactly well past 2^52)."""
    rows = (
        spark.range(60)
        .select(
            F.col("id").alias("k"),
            F.expr("CAST(pow(2, id) AS BIGINT)").alias("p"),
        )
        .collect()
    )
    for r in rows:
        assert r["p"] == 1 << r["k"], (r["k"], r["p"])


def test_dispersion_identity_model():
    """sum_{i!=j} <vi,vj> == ||sum vi||^2 - sum ||vi||^2 on integer vectors."""
    vecs = [(3, -1, 2), (0, 4, -2), (1, 1, 1), (-5, 2, 0)]
    lhs = sum(
        sum(a * b for a, b in zip(v, w))
        for i, v in enumerate(vecs)
        for j, w in enumerate(vecs)
        if i != j
    )
    sumvec = [sum(v[k] for v in vecs) for k in range(3)]
    rhs = sum(x * x for x in sumvec) - sum(sum(x * x for x in v) for v in vecs)
    assert lhs == rhs


def test_bootstrap_poisson_ladder_is_valid_cdf():
    from amazon_kinesis_data_streams_health_check_spark.plans.mining_queries import (
        _BOOT_THRESH,
        _DP_LADDER,
    )

    assert list(_BOOT_THRESH) == sorted(_BOOT_THRESH)
    assert all(0 < t < 2**32 for t in _BOOT_THRESH)
    dp_ts = [t for _, t in _DP_LADDER]
    assert dp_ts == sorted(dp_ts)
    assert all(0 < t < 2**32 for t in dp_ts)
    # symmetric mechanism: P(k<=-1) + P(0) block crosses 1/2 at k=0
    below = dict(_DP_LADDER)[-1]
    at0 = dict(_DP_LADDER)[0]
    assert below < 2**31 < at0


def test_fixed_point_log2_accuracy(spark):
    """The milli-bit log2 (bit length + 16-entry mantissa LUT) must track
    math.log2 within ~0.1 bits over a wide range, in BOTH engines."""
    import math

    from amazon_kinesis_data_streams_health_check_spark.plans.mining_queries import (
        _DUCK_BITS,
        _DUCK_SHIFT,
        _SPARK_BITS,
        _SPARK_SHIFT,
        _log2_milli,
    )

    xs = [1, 2, 3, 7, 16, 17, 100, 999, 4096, 5000, 123456, 10**6, 10**9]
    got_spark = (
        spark.createDataFrame([(x,) for x in xs], "x long")
        .select(F.expr(_log2_milli("x", _SPARK_BITS, _SPARK_SHIFT)).alias("l"))
        .collect()
    )
    got_duck = duckdb.sql(
        "SELECT "
        + _log2_milli("x", _DUCK_BITS, _DUCK_SHIFT)
        + " FROM (SELECT unnest(["
        + ",".join(map(str, xs))
        + "]) AS x)"
    ).fetchall()
    for x, rs, rd in zip(xs, got_spark, got_duck):
        assert rs["l"] == rd[0], (x, rs["l"], rd[0])
        assert abs(rs["l"] / 1000 - math.log2(x)) <= 0.1, (x, rs["l"])


def test_bm25_plan_broadcasts_query_terms(spark, sf_small):
    """Only postings for the 3 query terms may materialize: the term table
    must broadcast into the tf pass (no corpus-wide shuffle on term)."""
    plan = plan_of(spark, sf_small, "bm25_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2, plan


def test_theil_sen_plan_is_stream_keyed(spark, sf_small):
    """The pairwise-slope join must be keyed on stream_name (bounded pairs
    per stream), never a nested loop across streams."""
    plan = plan_of(spark, sf_small, "theil_sen_trend")
    assert "CartesianProduct" not in plan
    assert re.search(r"Left keys \[\d+\]: \[stream_name#", plan), plan


def test_wordpiece_segmentation_reconstructs_words(spark, sf_small):
    """Greedy longest-match invariants: concatenating the pieces (with
    '##' continuation markers stripped) must reconstruct each word exactly,
    piece counts must match the segmentation, the first piece must never
    carry a marker, and every continuation must."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("wordpiece_segment").builder(spark, sf_small).collect()
    assert rows
    multi = 0
    for r in rows:
        pieces = r.wordpiece.split(" ")
        assert len(pieces) == r.n_pieces, r
        assert not pieces[0].startswith("##"), r
        assert all(p.startswith("##") for p in pieces[1:]), r
        assert "".join(p.removeprefix("##") for p in pieces) == r.word, r
        multi += len(pieces) > 1
    assert multi > 0, "threshold degenerated to whole-word vocab"
