"""Curation operators: determinism, packing edges, CC on known graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.curation import (
    connected_components,
    mixture_plan,
    pack_sequences,
    stratified_sample,
)


def test_stratified_sample_is_repartition_invariant(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    rates = {"en": 30, "zh": 100}
    kept1 = {r.doc_id for r in stratified_sample(df, "lang", "doc_id", rates).collect()}
    kept2 = {
        r.doc_id
        for r in stratified_sample(df.repartition(13), "lang", "doc_id", rates).collect()
    }
    assert kept1 == kept2  # decision depends only on the key
    # zh stratum at 100% is fully kept; en at 30% lands near 300 of 1000.
    assert sum(1 for d in kept1 if d % 2 == 1) == 1000
    n_en = sum(1 for d in kept1 if d % 2 == 0)
    assert 200 < n_en < 400
    # Unknown stratum -> rate 0 -> dropped.
    df2 = df.withColumn("lang", F.lit("xx"))
    assert stratified_sample(df2, "lang", "doc_id", rates).count() == 0


def test_mixture_plan_binding_stratum_is_fully_used(spark):
    avail = spark.createDataFrame(
        [("en", 1000), ("zh", 10)], "stratum string, avail long"
    )
    plan = {r.stratum: r for r in mixture_plan(avail, {"en": 9, "zh": 1}).collect()}
    # zh is the binding constraint: T = 10*10/1 = 100 -> en take 90, zh take 10.
    assert plan["zh"].take_tokens == 10 and plan["zh"].utilization == 1.0
    assert plan["en"].take_tokens == 90
    # Never over-allocate any stratum.
    for r in plan.values():
        assert r.take_tokens <= r.avail


def test_pack_sequences_bins_respect_budget(spark):
    rows = [(i, "s", t) for i, t in enumerate([100, 100, 100, 100, 700, 50, 50])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = pack_sequences(df, budget=256).collect()
    by_bin: dict[int, list] = {}
    for r in out:
        by_bin.setdefault(r.bin, []).append(r)
    # Bins are consecutive in the shuffled order and cumsum-consistent:
    # every bin except possibly the last ends at/before crossing its edge.
    for b, rs in by_bin.items():
        assert all(r.cum_tokens > b * 256 and r.cum_tokens <= (b + 1) * 256 or r.n_tokens > 256
                   for r in rs)
    # The oversized doc (700 > budget) spans bins by cumsum; it still gets
    # exactly one bin assignment.
    assert sum(len(rs) for rs in by_bin.values()) == len(rows)


def test_connected_components_long_chain_truncates_lineage(spark):
    """An adversarial 30-edge chain: every round must checkpoint, so the
    returned plan is a projection over a materialized RDD — not a 30-deep
    join tree — and convergence still reaches the full component."""
    n = 31
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    labels = connected_components(edges, max_iterations=n)
    plan = labels._sc._jvm.PythonSQLUtils.explainString(
        labels._jdf.queryExecution(), "formatted"
    )
    assert "Scan ExistingRDD" in plan, plan
    assert "Join" not in plan, plan  # lineage truncated at the last round
    rows = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert set(rows.values()) == {0} and len(rows) == n


def test_connected_components_chain_and_islands(spark):
    # Components: {1,2,3,4} (chain), {10,11} (pair); isolated docs have no
    # edges and therefore no row (nothing to deduplicate).
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_merges_two_cliques_via_bridge(spark):
    c1 = [(1, 2), (2, 3), (1, 3)]
    c2 = [(7, 8), (8, 9), (7, 9)]
    bridge = [(3, 7)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "a long, b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert set(got.values()) == {1}
    assert set(got) == {1, 2, 3, 7, 8, 9}


def test_curriculum_order_is_phase_contiguous_permutation(spark, sf_small):
    """global_pos must be a 1..n permutation whose traversal visits phases
    in nondecreasing (easy-first) order, with every phase's members
    md5-shuffled rather than length-sorted inside the phase."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("curriculum_order").builder(spark, sf_small).collect()
    assert sorted(r.global_pos for r in rows) == list(range(1, len(rows) + 1))
    ordered = sorted(rows, key=lambda r: r.global_pos)
    phases = [r.phase for r in ordered]
    assert phases == sorted(phases)
    # within the largest phase, order must not be monotone in n_chars
    from collections import Counter

    top_phase, n = Counter(phases).most_common(1)[0]
    chars = [r.n_chars for r in ordered if r.phase == top_phase]
    assert n > 3 and chars != sorted(chars), "phase interior is not shuffled"


def test_streaming_cascade_slicing_invariance(spark):
    """The cumulative funnel must be identical whatever the feed chunking
    (2-chunk vs 4-chunk drive) — the prefix-decomposability claim that
    makes the batch cascade SQL a valid oracle for the streaming twin."""
    from amazon_kinesis_data_streams_health_check_spark.plans.curation_queries import (
        _scc_drive,
    )

    sf = "/root/testdata/sf0.001"
    four = {tuple(r) for r in _scc_drive(spark, sf, n_chunks=4).collect()}
    two = {tuple(r) for r in _scc_drive(spark, sf, n_chunks=2).collect()}
    assert four == two
    assert len(four) == 4
