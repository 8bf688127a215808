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


# ---------------------------------------------------------------------------
# SemDeDup (dedup_semantic_clusters): full-pipeline Python model — exact
# integer HIERARCHICAL k-means (the round-7 sf10 redesign: coarse k1 ~
# sqrt(k) cells with md5 seeding, then k2 = k/k1 fine centroids fitted
# WITHIN each cell; argmin with id tie-breaks, sign-aware integer-mean
# updates) + rank-ordered eps-cosine pruning. Seeds chosen so both the
# k = 4 and k = 8 cluster-count branches are exercised.
# ---------------------------------------------------------------------------
def _sem_model(vecs: dict[int, list[float]]):
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        _SEM_DEN,
        _SEM_NUM,
        _SEM_Q,
        _SEM_T,
        _sem_k,
        _sem_k1,
    )

    def rnd(x: float) -> int:  # HALF_UP like Spark/DuckDB round(), not banker's
        q = x * _SEM_Q
        return int(q + 0.5) if q >= 0 else -int(-q + 0.5)

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def imean(members: list[list[int]]) -> list[int]:
        n = len(members)
        return [
            (1 if (s := sum(col)) >= 0 else -1) * (abs(s) // n)
            for col in zip(*members)
        ]

    q = {v: [rnd(x) for x in xs] for v, xs in vecs.items()}
    k = _sem_k(len(q))
    k1 = _sem_k1(k)
    k2 = k // k1

    def lloyd(members: dict[int, list[int]], keyer, seed_bucket):
        """md5-seeded exact-integer Lloyd over the given id->vector map:
        seed one centroid per bucket (min (md5(id), id) wins), then _SEM_T
        assign/update rounds; returns the final assignment {id: (j, dist)}."""
        seeds: dict[int, tuple] = {}
        for v in members:
            h = hashlib.md5(str(v).encode()).hexdigest()
            b = seed_bucket(v)
            if b not in seeds or (h, v) < seeds[b][:2]:
                seeds[b] = (h, v, list(members[v]))
        cents = {b: c for b, (_, _, c) in seeds.items()}

        def assign():
            out = {}
            for v, qv in members.items():
                best = min(
                    (sum((a - b) ** 2 for a, b in zip(qv, c)), j)
                    for j, c in cents.items()
                )
                out[v] = (best[1], best[0])
            return out

        for _ in range(_SEM_T):
            a = assign()
            by_j: dict[int, list] = {}
            for v, (j, _) in a.items():
                by_j.setdefault(j, []).append(members[v])
            for j, ms in by_j.items():
                cents[j] = imean(ms)
        return assign()

    # Coarse level: one Lloyd chain over the whole corpus, k1 buckets.
    ga = {v: jd[0] for v, jd in lloyd(q, None, lambda v: h32(str(v)) % k1).items()}
    # Fine level: an independent Lloyd chain WITHIN each coarse cell,
    # seeded by the 'f|'-salted hash mod k2 (the builder's hu2).
    fin: dict[int, tuple[int, int]] = {}
    for g in sorted(set(ga.values())):
        cell = {v: q[v] for v, gv in ga.items() if gv == g}
        for v, (j2, dist) in lloyd(cell, None, lambda v: h32(f"f|{v}") % k2).items():
            fin[v] = (g * k2 + j2, dist)

    by_j: dict[int, list] = {}
    for v, (j, dist) in fin.items():
        by_j.setdefault(j, []).append((v, dist))
    out = {}
    for j, members in by_j.items():
        ranked = sorted(members, key=lambda t: (-t[1], t[0]))
        n2 = {v: sum(x * x for x in q[v]) for v, _ in ranked}
        for i, (v, _) in enumerate(ranked):
            keep = True
            for w, _ in ranked[:i]:
                dot = sum(x * y for x, y in zip(q[v], q[w]))
                if dot > 0 and _SEM_DEN * dot * dot >= _SEM_NUM * n2[v] * n2[w]:
                    keep = False
                    break
            out[v] = (j, len(members), i + 1, keep)
    return out


@pytest.mark.parametrize("seed,n", [(11, 60), (12, 300)])
def test_semantic_dedup_matches_python_model(spark, tmp_path_factory, seed, n):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, size=(6, 64))
    vecs = (centers[rng.integers(0, 6, size=n)] + rng.normal(0, 0.4, size=(n, 64))).astype(
        np.float32
    )
    tmpdir = str(tmp_path_factory.mktemp("sem"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        f"{tmpdir}/embeddings.parquet",
    )
    got = {
        r.vec_id: (r.cluster, r.cluster_size, r.c_rank, r.keep)
        for r in QUERIES["dedup_semantic_clusters"].builder(spark, tmpdir).collect()
    }
    want = _sem_model({i: [float(x) for x in vecs[i]] for i in range(n)})
    assert got == want


def test_semantic_blocking_recall_matches_python_model(spark, tmp_path_factory):
    """semantic_blocking_recall full-model check: at n < sample target the
    md5 sample mod is 1 (every vector sampled), so the per-eps true-pair
    and found-pair counts are computable exactly in Python — truth from the
    quantized integer cosine predicate, found from the hierarchical model's
    cluster ids (_sem_model)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        _SEM_DEN,
        _SEM_Q,
        _SEMBR_NUMS,
    )

    rng = np.random.default_rng(21)
    n = 50
    centers = rng.normal(0, 1.0, size=(3, 64))
    vecs = (
        centers[rng.integers(0, 3, size=n)] + rng.normal(0, 0.25, size=(n, 64))
    ).astype(np.float32)
    tmpdir = str(tmp_path_factory.mktemp("sbr"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        f"{tmpdir}/embeddings.parquet",
    )

    def rnd(x: float) -> int:
        q = x * _SEM_Q
        return int(q + 0.5) if q >= 0 else -int(-q + 0.5)

    q = {i: [rnd(float(x)) for x in vecs[i]] for i in range(n)}
    cluster = {
        v: j for v, (j, _, _, _) in _sem_model(
            {i: [float(x) for x in vecs[i]] for i in range(n)}
        ).items()
    }
    n2 = {v: sum(x * x for x in qv) for v, qv in q.items()}
    want = {}
    for num in _SEMBR_NUMS:
        true_pairs = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if (dot := sum(x * y for x, y in zip(q[a], q[b]))) > 0
            and _SEM_DEN * dot * dot >= num * n2[a] * n2[b]
        ]
        if true_pairs:
            found = sum(1 for a, b in true_pairs if cluster[a] == cluster[b])
            want[num] = (
                len(true_pairs),
                found,
                1_000_000 * found // len(true_pairs),
            )
    got = {
        r.eps_sq_x10k: (r.n_true, r.n_found, r.recall_ppm)
        for r in QUERIES["semantic_blocking_recall"].builder(spark, tmpdir).collect()
    }
    assert got == want
    assert want  # the planted clusters must actually produce true pairs


# ---------------------------------------------------------------------------
# Gopher rule battery: independent pure-Python re-implementation over
# randomized texts with newlines, bullets, ellipses, '#' symbols, digit
# tokens, and canonical stop words — every flag compared per doc.
# ---------------------------------------------------------------------------
_GOPHER_WORDS = ["spark", "batch", "the", "of", "and", "x9", "42", "query", "to"]
_GOPHER_PIECES = _GOPHER_WORDS + ["\n", "\n- ", "\n* ", "...", "#", "..."]

gopher_strategy = st.lists(
    st.sampled_from(_GOPHER_PIECES), min_size=0, max_size=120
)


def _gopher_model(text: str):
    toks = _re.findall("[a-z0-9]+", text.lower())
    n = len(toks)
    chars = sum(len(t) for t in toks)
    sym = text.count("#") + text.count("...")
    lines = text.split("\n")
    nl = len(lines)
    bull = sum(1 for l in lines if l.startswith("- ") or l.startswith("* "))
    ell = sum(1 for l in lines if l.endswith("..."))
    alpha = sum(1 for t in toks if _re.search("[a-z]", t))
    stops = sum(
        1
        for w in ("and", "be", "have", "of", "that", "the", "to", "with")
        if w in toks
    )
    flags = (
        50 <= n <= 100000,
        n > 0 and 3 * n <= chars <= 10 * n,
        n > 0 and 10 * sym <= n,
        10 * bull <= 9 * nl,
        10 * ell <= 3 * nl,
        n > 0 and 5 * alpha >= 4 * n,
        stops >= 2,
    )
    return (n, *flags, all(flags))


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(gopher_strategy, min_size=1, max_size=12))
def test_gopher_rules_match_python_model(spark, tmp_path_factory, docs):
    tmpdir = str(tmp_path_factory.mktemp("gq"))
    texts = [" ".join(p for p in d) for d in docs]
    spark.createDataFrame(
        [(i, t, "src0") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    rows = QUERIES["gopher_quality_rules"].builder(spark, tmpdir).collect()
    got = {
        r.doc_id: (
            r.n_tokens, r.r_word_count, r.r_mean_word_len, r.r_symbol_ratio,
            r.r_bullet_lines, r.r_ellipsis_lines, r.r_alpha_words,
            r.r_stop_words, r.passes_gopher,
        )
        for r in rows
    }
    want = {i: _gopher_model(t) for i, t in enumerate(texts)}
    assert got == want


# ---------------------------------------------------------------------------
# Packing-budget audit: independent Python greedy-cumsum model over the
# same md5-shuffle order — bins, tail waste, straddles per budget.
# ---------------------------------------------------------------------------
def _pack_audit_model(docs):
    """docs: list of (doc_id, source, n_tokens)."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.curation_queries import (
        _PACK_AUDIT_BUDGETS,
    )

    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)

    out = {}
    for b in _PACK_AUDIT_BUDGETS:
        srcs = {}
        for doc_id, source, n in docs:
            srcs.setdefault(source, []).append((h(doc_id), doc_id, n))
        n_bins = waste = straddles = total = n_docs = 0
        for source, items in srcs.items():
            cum = 0
            for _, _, n in sorted(items):
                prev = cum
                cum += n
                n_docs += 1
                if n > 0 and (cum - n) // b < (cum - 1) // b:
                    straddles += 1
            total += cum
            n_bins += (cum + b - 1) // b
            waste += (b - cum % b) % b
        out[b] = (
            len(srcs), n_bins, total, waste, straddles,
            10**6 * straddles // n_docs,
        )
    return out


@settings(max_examples=4, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), st.integers(0, 700)),
        min_size=1,
        max_size=30,
    )
)
def test_pack_audit_matches_python_model(spark, tmp_path_factory, docs):
    tmpdir = str(tmp_path_factory.mktemp("pa"))
    rows = [
        (i, "w " * n, src)  # n whitespace-separated 'w' tokens
        for i, (src, n) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    got = {
        r.budget: (
            r.n_sources, r.n_bins, r.total_tokens, r.tail_waste_tokens,
            r.straddling_docs, r.straddle_ppm,
        )
        for r in QUERIES["pack_efficiency_audit"].builder(spark, tmpdir).collect()
    }
    want = _pack_audit_model([(i, src, n) for i, (src, n) in enumerate(docs)])
    assert got == want


# ---------------------------------------------------------------------------
# DSIR importance weights: independent Python model — md5 bucket hashing,
# Laplace-smoothed bucket counts, floor-log2 bit deltas, per-doc sums.
# ---------------------------------------------------------------------------
def _dsir_model(docs):
    """docs: list of (doc_id, lang, token list)."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _DSIR_BUCKETS,
        _DSIR_TARGET_LANG,
    )

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS

    grams = []
    for doc_id, lang, toks in docs:
        for a, b in zip(toks, toks[1:]):
            grams.append((doc_id, lang, bucket(f"{a} {b}")))
    c_r, c_t = {}, {}
    for _, lang, bk in grams:
        c_r[bk] = c_r.get(bk, 0) + 1
        if lang == _DSIR_TARGET_LANG:
            c_t[bk] = c_t.get(bk, 0) + 1
    tot_r = sum(c_r.values()) + _DSIR_BUCKETS
    tot_t = sum(c_t.values()) + _DSIR_BUCKETS
    dbits = {
        bk: len(bin(tot_r // (c_r[bk] + 1))) - 2
            - (len(bin(tot_t // (c_t.get(bk, 0) + 1))) - 2)
        for bk in c_r
    }
    out = {}
    for doc_id, lang, toks in docs:
        bks = [bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        w = sum(dbits[bk] for bk in bks)
        out[doc_id] = (lang, len(bks), w, w > 0)
    return out


@settings(max_examples=4, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=0, max_size=12),
        ),
        min_size=2,
        max_size=16,
    ).filter(lambda d: any(lang == "en" and len(t) >= 2 for lang, t in d))
)
def test_dsir_weights_match_python_model(spark, tmp_path_factory, docs):
    tmpdir = str(tmp_path_factory.mktemp("dsir"))
    rows = [
        (i, " ".join(toks), lang, "src0")
        for i, (lang, toks) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    got = {
        r.doc_id: (r.lang, r.n_bigrams, r.dsir_weight_bits, r.target_leaning)
        for r in QUERIES["dsir_importance_weights"].builder(spark, tmpdir).collect()
    }
    want = _dsir_model([(i, lang, toks) for i, (lang, toks) in enumerate(docs)])
    assert got == want


# ---------------------------------------------------------------------------
# Winnowing: independent Python model of the rightmost-min window selection
# plus the sharing rollup, and the MOSS guarantee asserted directly — two
# docs sharing a >= w+k-1 token run must share a fingerprint hash.
# ---------------------------------------------------------------------------
def _winnow_model(docs):
    """docs: list of (doc_id, source, token list)."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _WIN_K,
        _WIN_W,
    )

    def fps(toks):
        grams = [
            " ".join(toks[i : i + _WIN_K])
            for i in range(len(toks) - _WIN_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        m = len(hs)
        if m == 0:
            return [], 0
        wlen = min(_WIN_W, m)
        sel = []
        for j in range(1, max(m - _WIN_W + 1, 1) + 1):
            win = hs[j - 1 : j - 1 + wlen]
            mn = min(win)
            off = max(o + 1 for o, v in enumerate(win) if v == mn)
            sel.append((j - 1 + off) * 2**32 + mn)
        out, seen = [], set()
        for e in sel:
            if e not in seen:
                seen.add(e)
                out.append(e)
        return out, m

    per_doc = {}
    for doc_id, source, toks in docs:
        fp, m = fps(toks)
        per_doc[doc_id] = (source, len(toks), m, fp)
    hash_docs = {}
    for doc_id, (_, _, _, fp) in per_doc.items():
        for v in {e % 2**32 for e in fp}:
            hash_docs.setdefault(v, set()).add(doc_id)
    out = {}
    for doc_id, (source, n, m, fp) in per_doc.items():
        vs = {e % 2**32 for e in fp}
        out[doc_id] = (
            source, n, m, len(fp),
            0 if m == 0 else 10**6 * len(fp) // m,
            len(vs),
            sum(1 for v in vs if len(hash_docs[v]) >= 2),
        )
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=24),
        min_size=1,
        max_size=10,
    )
)
def test_winnowing_matches_python_model(spark, tmp_path_factory, docs):
    tmpdir = str(tmp_path_factory.mktemp("win"))
    rows = [(i, " ".join(t), "src0") for i, t in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    got = {
        r.doc_id: (
            r.source, r.n_tokens, r.n_kgrams, r.n_fingerprints,
            r.density_ppm, r.n_fp_hashes, r.n_shared_fp_hashes,
        )
        for r in QUERIES["winnowing_fingerprints"].builder(spark, tmpdir).collect()
    }
    want = _winnow_model([(i, "src0", t) for i, t in enumerate(docs)])
    assert got == want


def test_winnowing_moss_guarantee(spark, tmp_path_factory):
    """Two docs sharing an 8-token run (w + k - 1 = 5 + 4 - 1) MUST share
    a fingerprint hash — the Schleimer et al. detection guarantee."""
    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _WIN_K,
        _WIN_W,
    )

    run = [f"w{i}" for i in range(_WIN_W + _WIN_K - 1)]
    doc_a = ["x1", "x2"] + run + ["x3"]
    doc_b = ["y1"] + run + ["y2", "y3", "y4"]
    doc_c = ["z" + str(i) for i in range(12)]  # no shared run
    tmpdir = str(tmp_path_factory.mktemp("moss"))
    rows = [(i, " ".join(t), "src0") for i, t in enumerate([doc_a, doc_b, doc_c])]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    got = {
        r.doc_id: r.n_shared_fp_hashes
        for r in QUERIES["winnowing_fingerprints"].builder(spark, tmpdir).collect()
    }
    assert got[0] >= 1 and got[1] >= 1, got
    assert got[2] == 0, got
