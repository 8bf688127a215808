"""Data-quality expectations (operators/quality.py): violation metrics,
NULL-predicate handling, quarantine splitting."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.quality import (
    check_expectations,
    quarantine,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 5.0),
            ("a", 2, -1.0),   # violates v_pos
            ("b", 3, None),   # NULL predicate -> violation
            ("b", 4, 2.0),
        ],
        "grp string, id int, v double",
    )


def test_violation_counts_and_null_predicates(spark):
    out = {
        r.rule: (r.n_rows, r.n_violations, r.violation_rate)
        for r in check_expectations(
            _df(spark), {"v_pos": "v >= 0", "id_present": F.col("id").isNotNull()}
        ).collect()
    }
    assert out == {"v_pos": (4, 2, 0.5), "id_present": (4, 0, 0.0)}


def test_grouped_expectations(spark):
    out = {
        (r.grp, r.rule): r.n_violations
        for r in check_expectations(
            _df(spark), {"v_pos": "v >= 0"}, group_by=["grp"]
        ).collect()
    }
    assert out == {("a", "v_pos"): 1, ("b", "v_pos"): 1}


def test_quarantine_splits_exhaustively(spark):
    df = _df(spark)
    clean, bad = quarantine(df, {"v_pos": "v >= 0", "id_small": "id < 4"})
    assert {r.id for r in clean.collect()} == {1}
    assert {r.id for r in bad.collect()} == {2, 3, 4}
    assert clean.count() + bad.count() == df.count()
