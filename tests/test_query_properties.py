"""Property-based pins for the continuation-session operators, black-box:
each example writes a small randomized table as parquet, runs the REAL
registry builder against it, and compares with an independent pure-Python
model (brute-force skyline, interval merge, packed-fold Holt reference,
``re``-based journey counting).

Example counts are kept small: each example drives real Spark jobs.
"""

from __future__ import annotations

import datetime as dt
import re as _re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries

QUERIES = all_queries()
UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _write_events(spark, tmpdir, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                # user
        st.integers(0, 7_000),            # minute offset (~5 days)
        st.sampled_from(_EVENT_TYPES),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(evs=events_strategy)
def test_journey_patterns_match_python_re(spark, tmp_path_factory, evs):
    tmpdir = str(tmp_path_factory.mktemp("jrn"))
    rows = [
        (i, u, k, T0 + dt.timedelta(minutes=m)) for i, (u, m, k) in enumerate(evs)
    ]
    _write_events(spark, tmpdir, rows)
    got = {
        r.user_id: (r.n_events, r.n_funnel_matches, r.n_error_bursts, r.converted)
        for r in QUERIES["event_journey_patterns"].builder(spark, tmpdir).collect()
    }
    by_user: dict[int, list] = {}
    for i, (u, m, k) in enumerate(evs):
        by_user.setdefault(u, []).append((m, i, k[0]))
    for u, items in by_user.items():
        s = "".join(c for _, _, c in sorted(items))
        assert got[u] == (
            len(s),
            len(_re.findall("v[vc]*p", s)),
            len(_re.findall("e+", s)),
            "p" in s,
        ), (u, s)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(evs=events_strategy)
def test_interval_coalesce_matches_python_merge(spark, tmp_path_factory, evs):
    span = 30 * 60 * 1_000_000
    tmpdir = str(tmp_path_factory.mktemp("ivl"))
    rows = [
        (i, u, k, T0 + dt.timedelta(minutes=m)) for i, (u, m, k) in enumerate(evs)
    ]
    _write_events(spark, tmpdir, rows)
    got = {
        r.user_id: (r.n_intervals, r.active_micros, r.longest_micros)
        for r in QUERIES["interval_coalesce_activity"].builder(spark, tmpdir).collect()
    }
    by_user: dict[int, list[int]] = {}
    for u, m, _ in evs:
        start = int((T0 + dt.timedelta(minutes=m)).timestamp() * 1_000_000)
        by_user.setdefault(u, []).append(start)
    for u, starts in by_user.items():
        merged: list[list[int]] = []
        for s in sorted(starts):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], s + span)
            else:
                merged.append([s, s + span])
        lens = [hi - lo for lo, hi in merged]
        assert got[u] == (len(merged), sum(lens), max(lens)), (u, merged)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(evs=events_strategy)
def test_holt_forecast_matches_python_fold(spark, tmp_path_factory, evs):
    from amazon_kinesis_data_streams_health_check_spark.plans.healthcheck_queries import (
        _HOLT_B0,
        _HOLT_L0,
        _HOLT_M,
    )

    tmpdir = str(tmp_path_factory.mktemp("holt"))
    rows = [
        (i, u, k, T0 + dt.timedelta(minutes=m)) for i, (u, m, k) in enumerate(evs)
    ]
    _write_events(spark, tmpdir, rows)
    got = {
        r.event_type: (r.n_days, r.level_milli, r.trend_milli, r.forecast_2)
        for r in QUERIES["holt_forecast_daily"].builder(spark, tmpdir).collect()
    }
    days = [m // 1440 for _, m, _ in evs]
    d0, dmax = min(days), max(days)
    n_days = dmax - d0 + 1
    for etype in {k for _, _, k in evs}:
        per_day = [0] * n_days
        for _, m, k in evs:
            if k == etype:
                per_day[m // 1440 - d0] += 1
        ys = [n * 1000 for n in per_day]

        def enc(y: int) -> int:
            return (y + _HOLT_L0) * _HOLT_M + _HOLT_B0

        acc = enc(ys[0])
        for y in ys[1:]:
            l, b = acc // _HOLT_M - _HOLT_L0, acc % _HOLT_M - _HOLT_B0
            err = (enc(y) // _HOLT_M - _HOLT_L0) - l - b
            e4 = (1 if err >= 0 else -1) * (abs(err) // 4)
            l2 = l + b + e4
            b2 = b + (1 if e4 >= 0 else -1) * (abs(e4) // 4)
            acc = (l2 + _HOLT_L0) * _HOLT_M + (b2 + _HOLT_B0)
        l, b = acc // _HOLT_M - _HOLT_L0, acc % _HOLT_M - _HOLT_B0
        assert got[etype] == (n_days, l, b, l + 2 * b), etype


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pts=st.lists(
        st.tuples(st.integers(1, 8), st.integers(0, 40)),
        min_size=1,
        max_size=20,
    )
)
def test_pareto_skyline_matches_brute_force(spark, tmp_path_factory, pts):
    tmpdir = str(tmp_path_factory.mktemp("sky"))
    spark.createDataFrame(
        [(i, sz, pr / 100.0) for i, (sz, pr) in enumerate(pts)],
        "p_partkey long, p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/part.parquet")
    got = {r.p_partkey for r in QUERIES["pareto_skyline_parts"].builder(spark, tmpdir).collect()}
    expect = {
        i
        for i, (sz, pr) in enumerate(pts)
        if not any(
            (sz2 >= sz and pr2 >= pr and (sz2 > sz or pr2 > pr))
            for j, (sz2, pr2) in enumerate(pts)
            if j != i
        )
    }
    assert got == expect, (pts, got, expect)
