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
