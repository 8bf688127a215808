"""Property-based semantic pins (hypothesis) against independent oracles:

- asof_join vs pandas.merge_asof (independent reference implementation),
- the CloudWatch alarm pipeline (grid + treat-missing + N-of-M + transitions)
  vs a direct Python state-machine model.

Example counts are kept small: each example drives real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_kinesis_data_streams_health_check_spark.operators.alarm import (
    evaluate_alarm,
    with_period_grid,
)
from amazon_kinesis_data_streams_health_check_spark.operators.temporal import asof_join

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _t(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


# ---------------------------------------------------------------------------
# asof_join == pandas merge_asof
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
        min_size=1,
        max_size=12,
    ),
    right=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
        max_size=12,
        unique=True,  # unique (key, ts): ties among identical right rows are
    ),             # resolved by pre-dedup in real queries
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, _t(m), i) for i, (k, m) in enumerate(left)],
        "k string, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, _t(m), i) for i, (k, m) in enumerate(right)],
        "k string, ts timestamp, rid long",
    ) if right else spark.createDataFrame([], "k string, ts timestamp, rid long")

    got = {
        r.lid: r.asof_rid
        for r in asof_join(ldf, rdf, on=["k"], right_cols=["rid"]).collect()
    }

    lp = pd.DataFrame(
        {"k": [k for k, _ in left], "ts": [_t(m) for _, m in left],
         "lid": range(len(left))}
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {"k": [k for k, _ in right], "ts": [_t(m) for _, m in right],
         "rid": range(len(right))}
    ).sort_values("ts", kind="stable")
    if rp.empty:
        expected = {lid: None for lid in lp["lid"]}
    else:
        m = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
        )
        expected = {
            int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
            for row in m.itertuples()
        }
    assert got == expected


# ---------------------------------------------------------------------------
# alarm pipeline == Python state-machine model
# ---------------------------------------------------------------------------
def _alarm_model(observed, threshold, M, N, policy):
    lo, hi = min(observed), max(observed)
    out = {}
    last_resolved = None
    prev = None
    for t in range(lo, hi + 1):
        breaches = present = 0
        for u in range(t - M + 1, t + 1):
            if u < lo or u > hi:
                continue
            v = observed.get(u)
            if v is None:
                if policy == "breaching":
                    breaches += 1
            else:
                present += 1
                if v > threshold:
                    breaches += 1
        raw = "ALARM" if breaches >= N else "OK"
        if policy == "missing" and present == 0:
            state = "INSUFFICIENT_DATA"
        elif policy == "ignore":
            if observed.get(t) is not None:
                # Evaluate over the most recent M PRESENT datapoints
                # (missing periods neither vote nor occupy slots).
                recent = [
                    observed[u]
                    for u in range(lo, t + 1)
                    if observed.get(u) is not None
                ][-M:]
                raw_p = "ALARM" if sum(1 for v in recent if v > threshold) >= N else "OK"
                last_resolved = raw_p
                state = raw_p
            else:
                state = last_resolved if last_resolved is not None else "OK"
        else:
            state = raw
        out[t] = (state, prev, prev is not None and state != prev)
        prev = state
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    points=st.dictionaries(
        st.integers(0, 12), st.sampled_from([0.5, 1.5, 3.0]), min_size=1, max_size=8
    ),
    m=st.integers(1, 3),
    policy=st.sampled_from(["breaching", "notBreaching", "ignore", "missing"]),
    data=st.data(),
)
def test_alarm_matches_model(spark, points, m, policy, data):
    n = data.draw(st.integers(1, m))
    metrics = spark.createDataFrame(
        [("s", _t(i), _t(i + 1), float(v), 1) for i, v in points.items()],
        "stream_name string, window_start timestamp, window_end timestamp, "
        "max_value double, n_datapoints long",
    )
    evaluated = evaluate_alarm(
        with_period_grid(metrics),
        threshold=1.0,
        treat_missing=policy,
        evaluation_periods=m,
        datapoints_to_alarm=n,
    )
    got = {
        int((r.window_start.replace(tzinfo=UTC) - T0).total_seconds() // 60): (
            r.state,
            r.prev_state,
            bool(r.transitioned),
        )
        for r in evaluated.collect()
    }
    assert got == _alarm_model(points, 1.0, m, n, policy)


# ---------------------------------------------------------------------------
# Curation operators vs direct Python models.
# ---------------------------------------------------------------------------
import hashlib


def _md5_u32(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["en", "zh", "xx"])),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    rates=st.fixed_dictionaries(
        {"en": st.integers(0, 100), "zh": st.integers(0, 100)}
    ),
)
def test_stratified_sample_matches_python_model(spark, docs, rates):
    from amazon_kinesis_data_streams_health_check_spark.operators.curation import (
        stratified_sample,
    )

    df = spark.createDataFrame(docs, "doc_id long, lang string")
    got = {r.doc_id for r in stratified_sample(df, "lang", "doc_id", rates).collect()}
    want = {
        d
        for d, lang in docs
        if _md5_u32(d) * 100 < rates.get(lang, 0) * 4_294_967_296
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 700)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    budget=st.sampled_from([64, 256, 1000]),
)
def test_pack_sequences_matches_python_model(spark, docs, budget):
    """Packing == greedy cumsum binning over the md5-shuffled order, per the
    direct model; bins are dense from 0 and tokens are conserved."""
    from amazon_kinesis_data_streams_health_check_spark.operators.curation import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(d, "s", t) for d, t in docs], "doc_id long, source string, n_tokens long"
    )
    got = {r.doc_id: r.bin for r in pack_sequences(df, budget).collect()}

    order = sorted(docs, key=lambda t: (_md5_u32(t[0]), t[0]))
    cum, want = 0, {}
    for d, tok in order:
        cum += tok
        want[d] = (cum - 1) // budget
    assert got == want


# ---------------------------------------------------------------------------
# repetition_stats == direct Counter model over generated corpora
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["spark", "row", "scan", "agg", "a"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_repetition_stats_matches_counter_model(spark, tmp_path_factory, texts):
    import collections
    import re

    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    sf_dir = str(tmp_path_factory.mktemp("repcorpus"))
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {
        r["doc_id"]: r.asDict()
        for r in get("repetition_stats").builder(spark, sf_dir).collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        toks = re.findall("[a-z0-9]+", t.lower())
        g2 = collections.Counter(
            " ".join(toks[j : j + 2]) for j in range(len(toks) - 1)
        )
        g3 = collections.Counter(
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        )
        n2, n3 = sum(g2.values()), sum(g3.values())
        row = got[i]
        assert row["n_tokens"] == len(toks)
        assert row["n_2grams"] == n2
        assert row["n_distinct_2grams"] == len(g2)
        assert row["top_2gram_n"] == (max(g2.values()) if g2 else 0)
        assert row["dup_2gram_frac"] == (
            round((n2 - len(g2)) / n2, 6) if n2 else 0.0
        )
        assert row["top_2gram_frac"] == (
            round(max(g2.values()) / n2, 6) if g2 else 0.0
        )
        assert row["dup_3gram_frac"] == (
            round((n3 - len(g3)) / n3, 6) if n3 else 0.0
        )


# ---------------------------------------------------------------------------
# AllPairs prefix filtering == Python brute force (losslessness property)
# ---------------------------------------------------------------------------
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _py_shingles(text: str, n: int = 3) -> set[str]:
    import re as _re

    toks = _re.findall(r"[a-z0-9]+", text.lower())
    upper = max(len(toks) - (n - 1), 1)
    return {" ".join(toks[i : i + n]) for i in range(upper)}


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
def test_jaccard_allpairs_prefix_filter_is_lossless(spark, docs):
    """The prefix filter must generate EVERY pair at Jaccard >= 1/2 — the
    losslessness theorem checked against a brute-force Python model on
    adversarially small token sets (where prefixes are shortest)."""
    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        jaccard_allpairs_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in jaccard_allpairs_pairs(df, t_num=1, t_den=2).collect()
    }
    sh = [_py_shingles(t) for t in docs]
    want = {
        (a, b)
        for a in range(len(docs))
        for b in range(a + 1, len(docs))
        if 2 * len(sh[a] & sh[b]) >= len(sh[a] | sh[b])
    }
    assert got == want
