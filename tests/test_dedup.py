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


def test_wide_band_join_shuffles_on_salt_bucket(spark):
    """The 128-bit half-split band self-join keeps the salted-join scale
    contract: the pair-join exchange includes the salt bucket and the
    plan contains no CartesianProduct."""
    import re

    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        SIMHASH_WIDE_BITS,
        simhash_signatures_centered,
        simhash_wide_near_pairs,
    )

    docs = _skewed_docs(spark, n_dup=10, n_unique=5)
    sigs = simhash_signatures_centered(docs, bits=SIMHASH_WIDE_BITS)
    df = simhash_wide_near_pairs(sigs, salt=8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, plan
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


def test_sampled_semantic_fit_properties(spark, tmp_path):
    """dedup_semantic_sampled: (a) when the derived sample mod is 1 (tiny
    corpus, n <= k * 16) the sampled fit IS the full fit and the output
    must equal dedup_semantic_clusters row-for-row; (b) on a corpus large
    enough to activate sampling, a planted exact-duplicate vector pair
    must still land in one cell and never BOTH survive the eps prune
    (each may additionally be eps-close to higher-ranked members of the
    dense random cluster, so both-dropped is legitimate)."""
    import numpy as np
    import pandas as pd

    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        _sem_k,
        _sems_mod,
        dedup_semantic_clusters,
        dedup_semantic_sampled,
    )

    d = 64
    rng = np.random.default_rng(7)

    def write(sf, n, planted_pair):
        vecs = rng.normal(size=(n, d)).astype("float32") * 50
        if planted_pair:
            vecs[1] = vecs[0] * 1.02  # cos ~1: an exact-ish re-encoding
        pd.DataFrame(
            {"vec_id": np.arange(n, dtype="int64"),
             "embedding": list(vecs),
             "label": np.zeros(n, dtype="int32")}
        ).to_parquet(f"{sf}/embeddings.parquet")

    # (a) mod = 1 regime: n = 60 -> k = 4 (_SEM_KS floor), target 64 >= n
    sf_a = str(tmp_path / "a"); (tmp_path / "a").mkdir()
    assert _sems_mod(60, _sem_k(60)) == 1
    write(sf_a, 60, planted_pair=False)
    full = sorted(map(tuple, dedup_semantic_clusters(spark, sf_a).collect()))
    samp = sorted(map(tuple, dedup_semantic_sampled(spark, sf_a).collect()))
    assert samp == full and len(full) == 60

    # (b) active-sampling regime: n = 600 -> k = 16, target 256, mod 3
    sf_b = str(tmp_path / "b"); (tmp_path / "b").mkdir()
    assert _sems_mod(600, _sem_k(600)) > 1
    write(sf_b, 600, planted_pair=True)
    out = {r.vec_id: r for r in dedup_semantic_sampled(spark, sf_b).collect()}
    assert len(out) == 600
    assert out[0].cluster == out[1].cluster
    assert not (out[0].keep and out[1].keep)  # the pair can't both survive
    assert any(r.keep for r in out.values())  # and the prune isn't vacuous


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


def test_streaming_semantic_ingest_probe_vs_bootstrap(spark, tmp_path):
    """Pinned 2-batch semantic ingest: even vecs bootstrap the index (one
    vector per axis -> after Lloyd, centroids ARE the bootstrap vectors);
    odd vecs probe it. A near-copy of a bootstrap vector must report
    is_dup; an odd vector at cos 0.2 to every member of its assigned
    cluster must not."""
    import numpy as np
    import pandas as pd

    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        streaming_semantic_ingest,
    )

    d = 64
    def axis(i, scale=100.0):
        v = np.zeros(d, dtype="float32"); v[i] = scale; return v

    rows = {0: axis(0), 2: axis(1), 4: axis(2), 6: axis(3)}  # bootstrap
    dup = axis(0); dup[1] = 1.0                      # cos ~1 vs vec 0
    lone = np.zeros(d, dtype="float32"); lone[0] = 20.0; lone[1] = -98.0
    # lone: nearest centroid is axis0's (L2 80^2+98^2 < 20^2+198^2);
    # cos(lone, vec0) = 20/100 = 0.2 < eps 0.3 -> not a dup
    rows[1] = dup
    rows[3] = lone
    ids = sorted(rows)
    pd.DataFrame(
        {"vec_id": np.array(ids, dtype="int64"),
         "embedding": [rows[i] for i in ids],
         "label": np.zeros(len(ids), dtype="int32")}
    ).to_parquet(tmp_path / "embeddings.parquet")
    out = {r.vec_id: r for r in streaming_semantic_ingest(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 3}
    # Hierarchical k-means may co-locate several axis vectors in one
    # (g, j2) cell (k1 = k2 = 2 at n = 4), so pin the verdicts, not the
    # cell occupancy: the near-copy is a dup of its cell, the cos-0.2
    # vector is not a dup of ANY member of its cell.
    assert out[1].is_dup and out[1].n_hist >= 1
    assert not out[3].is_dup and out[3].n_hist >= 1


def test_band_triples_lossless_to_hamming_5(spark):
    """b=3 (24-bit keys, 56 tables) must produce EXACTLY the b=2 pair set
    at a gate of Hamming <= 5 — both are pigeonhole-lossless there, so any
    divergence is a banding bug. Also pins the ValueError guard for a gate
    beyond the pigeonhole bound."""
    import pytest

    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        simhash_near_pairs as snp,
        simhash_signatures as ss,
    )

    docs = _skewed_docs(spark, n_dup=40, n_unique=25)
    sigs = ss(docs)
    two = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in snp(sigs, max_hamming=5, bands_per_key=2).collect()
    }
    three = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in snp(sigs, max_hamming=5, bands_per_key=3).collect()
    }
    assert three == two and len(two) >= 40 * 39 // 2
    with pytest.raises(ValueError, match="lossless"):
        snp(sigs, max_hamming=6, bands_per_key=3)


def test_centered_sig_finds_typo_pair_through_fuzzy_query(spark, tmp_path):
    """The centered-signature fuzzy query end-to-end: a planted one-typo
    pair must be reported; unrelated docs must not pair with it. Also pins
    bit de-biasing: on a boilerplate-heavy mini-corpus the centered sigs
    of the typo pair stay within the <= 5 blocking gate."""
    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        dedup_fuzzy_edit,
    )

    # High-diversity planted pair (60 word types x2): one changed token
    # moves the centered signature ~2 bits — well inside the <= 5 gate.
    # (A low-diversity doc quantizes the centered votes into few levels
    # and a single typo can flip more bits; that recall frontier is what
    # fuzzy_blocking_recall measures on real corpora.)
    a = " ".join(f"word{j}" for j in range(60)) + " " + " ".join(
        f"word{j}" for j in range(60)
    )
    b = a.replace("word30 ", "word30x ", 1)
    rows = [(1, a), (2, b)]
    # Boilerplate chaff (the bias source): many docs over a SMALL shared
    # vocab — distinct from the pair's content, so the pair keeps signal
    # against the corpus mean.
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    for i in range(30):
        rows.append(
            (100 + i, " ".join(vocab[(i + j) % 10] for j in range(40)))
        )
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {(r.doc_a, r.doc_b): r.edit_dist for r in dedup_fuzzy_edit(spark, sf).collect()}
    assert (1, 2) in got and got[(1, 2)] <= 2  # typo is past the 80-char prefix
    assert all(not ((x, y) != (1, 2) and (x in (1, 2) or y in (1, 2))) for x, y in got)


def test_neardup_decontamination_flags_planted_eval_copy(spark, tmp_path):
    """eval_decontamination_neardup end-to-end on a planted corpus: an
    exact copy of an eval-slice doc must be flagged (identical minhash ->
    all bands collide; Jaccard 1 passes the dominance verify); a
    half-overlap doc (Jaccard < 0.5) and an unrelated doc must not be
    flagged, whatever the banding does."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _CONTAM_MOD,
        eval_decontamination_neardup,
    )

    def in_bench(i: int) -> bool:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _CONTAM_MOD == 0

    bench_id = next(i for i in range(1, 10_000) if in_bench(i))
    train_ids = [i for i in range(1, 10_000) if not in_bench(i)][:3]
    etext = " ".join(f"tok{j}" for j in range(80))
    half = " ".join(f"tok{j}" for j in range(40)) + " " + " ".join(
        f"other{j}" for j in range(80)
    )
    rows = [
        (bench_id, "eval", etext),
        (train_ids[0], "dup", etext),  # exact copy of the eval doc
        (train_ids[1], "partial", half),  # 3-gram Jaccard well under 0.5
        (train_ids[2], "clean", " ".join(f"zzz{j}" for j in range(80))),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        r.source: (r.n_train_docs, r.n_candidate_docs, r.n_flagged)
        for r in eval_decontamination_neardup(spark, sf).collect()
    }
    assert "eval" not in got  # the bench slice is not reported as training
    assert got["dup"] == (1, 1, 1)
    assert got["partial"][0] == 1 and got["partial"][2] == 0
    assert got["clean"] == (1, 0, 0)


def test_streaming_decontamination_gate_planted(spark, tmp_path):
    """The streaming gate on a planted corpus: a train doc sharing a full
    13-gram with the registered eval doc is contaminated; a 12-token
    overlap is not (the GPT-3 rule is exact-13); short docs count as
    uncheckable."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _CONTAM_MOD,
        streaming_decontamination_gate,
    )

    def in_bench(i: int) -> bool:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _CONTAM_MOD == 0

    bench_id = next(i for i in range(1, 10_000) if in_bench(i))
    t0, t1, t2 = [i for i in range(1, 10_000) if not in_bench(i)][:3]
    bench_text = " ".join(f"ev{j}" for j in range(20))
    hit13 = " ".join(f"pre{j}" for j in range(5)) + " " + " ".join(
        f"ev{j}" for j in range(13)
    )
    near12 = " ".join(f"pre{j}" for j in range(5)) + " " + " ".join(
        f"ev{j}" for j in range(12)
    ) + " unrelated tail tokens here to pad the doc out past thirteen"
    rows = [
        (bench_id, "eval", bench_text),
        (t0, "hit", hit13),
        (t1, "miss", near12),
        (t2, "short", "tiny doc"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        r.source: (r.n_train_docs, r.n_checkable_docs, r.n_contaminated)
        for r in streaming_decontamination_gate(spark, sf).collect()
    }
    assert "eval" not in got
    assert got["hit"] == (1, 1, 1)
    assert got["miss"] == (1, 1, 0)
    assert got["short"] == (1, 0, 0)


def test_contam_eval_mod_bounded():
    """The derived benchmark-slice mod: bit-identical to the old fixed
    fraction through sf0.1 corpora, then caps the eval slice (and so the
    broadcast gram index) at ~target docs at every larger tier."""
    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _contam_eval_mod as corpus_mod,
    )
    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        _contam_eval_mod as ext_mod,
    )

    for n in (500, 5000):  # sf0.001 .. sf0.1 corpora: outputs unchanged
        assert corpus_mod(n) == 97, n
        assert ext_mod(n) == 23, n
    for n in (500_000, 5_000_000, 50_000_000):  # sf1.0 .. sf1000
        assert n // corpus_mod(n) <= 512, (n, corpus_mod(n))
        assert n // ext_mod(n) <= 2176, (n, ext_mod(n))


def test_lsh_config_ladder():
    """The corpus-size-adaptive MinHash ladder: rung boundaries, rows
    growing with corpus size (chance band collisions ~ b * n^2 * Jbar^r
    need r ~ log n), and a roughly flat S-curve threshold J* = (1/b)^(1/r)
    so the semantic operating point doesn't lurch between rungs."""
    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        LSH_CONFIG_LADDER,
        lsh_config_for,
    )

    assert lsh_config_for(1) == (4, 3)
    assert lsh_config_for(1 << 16) == (4, 3)
    assert lsh_config_for((1 << 16) + 1) == (9, 6)
    assert lsh_config_for(1 << 22) == (9, 6)
    assert lsh_config_for((1 << 22) + 1) == (14, 8)
    js = [(1 / b) ** (1 / r) for _, b, r in LSH_CONFIG_LADDER]
    assert all(0.6 <= j <= 0.75 for j in js), js
    rows = [r for _, _, r in LSH_CONFIG_LADDER]
    assert rows == sorted(set(rows)), rows


def test_lsh_upper_rung_configs_cross_engine(spark):
    """The (9,6) and (14,8) rungs never fire at the sf0.001/sf0.01 oracle
    tiers (both corpora are <= 65k docs), so pin their cross-engine
    equality directly: Spark band candidates under each config must equal
    DuckDB's twin SQL pair set on a planted corpus, and the planted
    near-dup pair must collide under every rung (its Jaccard ~0.97 is
    above every rung's threshold)."""
    import duckdb

    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        LSH_CONFIG_LADDER,
        duck_band_union,
        duck_minhash_cols,
        duck_shingles,
        lsh_candidate_pairs,
        with_bands,
        with_minhash,
        with_shingles,
    )

    # High-Jaccard planted pair (~0.95: one token of 60 distinct changed)
    # so collision is near-certain under every rung's S-curve, including
    # the strictest (14, 8) threshold J* ~ 0.72.
    base_txt = " ".join(f"word{j}" for j in range(60))
    rows = [(1, base_txt), (2, base_txt.replace("word30 ", "word30x ", 1))]
    for i in range(30):
        rows.append((100 + i, f"standalone doc {i} about topic {i * 13} " * 4))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    for _, bands_n, rows_n in LSH_CONFIG_LADDER:
        got = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(
                with_bands(
                    with_minhash(with_shingles(docs), perms=bands_n * rows_n),
                    bands=bands_n,
                    rows=rows_n,
                ),
                bands=bands_n,
            ).collect()
        }
        sql = f"""
        WITH sh2 AS (SELECT doc_id, {duck_shingles()} AS sh FROM documents),
        mh AS (SELECT doc_id, {duck_minhash_cols(bands_n * rows_n)} FROM sh2),
        bands AS ({duck_band_union(bands_n, rows_n)})
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x
        JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
                    AND x.doc_id < y.doc_id
        """
        want = {(int(a), int(b)) for a, b in con.execute(sql).fetchall()}
        assert got == want, (bands_n, rows_n)
        assert (1, 2) in got, (bands_n, rows_n)


def test_wide_band_combo_structure():
    """The half-split covering design's structural invariants: 140 combos
    (C(8,4) per half), every combo confined to one half, 32-bit keys, and
    the pigeonhole gate 2*(8-4)+1 = 9."""
    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        SIMHASH_WIDE_BAND_BITS,
        SIMHASH_WIDE_BITS,
        SIMHASH_WIDE_KEY_BANDS,
        SIMHASH_WIDE_MAX_HAMMING,
        wide_band_combos,
    )

    combos = wide_band_combos()
    assert len(combos) == 140 and len(set(combos)) == 140
    assert SIMHASH_WIDE_BITS == 128 and SIMHASH_WIDE_BAND_BITS == 8
    assert SIMHASH_WIDE_KEY_BANDS * SIMHASH_WIDE_BAND_BITS == 32
    assert SIMHASH_WIDE_MAX_HAMMING == 9
    for combo in combos:
        assert len(combo) == SIMHASH_WIDE_KEY_BANDS
        halves = {i // 8 for i in combo}
        assert len(halves) == 1, combo  # never straddles the split


def test_wide_banding_lossless_to_hamming_9(spark):
    """simhash_wide_near_pairs must return EXACTLY the brute-force
    Hamming <= 9 pair set (half-split pigeonhole: <= 9 dirty bands leave
    one half with >= 4 clean bands, so some 4-band key matches), and the
    ValueError guard must fire past the pigeonhole bound."""
    import itertools

    import pytest

    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        SIMHASH_WIDE_BITS,
        simhash_signatures_centered,
        simhash_wide_near_pairs,
    )

    # Mutation ladder: doc 0 is the 400-token base; doc k replaces k tokens
    # (one replaced token moves the centered sig ~8 bits on this corpus),
    # walking signature Hamming through and past the <= 9 gate. Plus the
    # skewed duplicate class to exercise the salted join.
    base = [f"tok{j}" for j in range(400)]
    rows = []
    for k in range(12):
        toks = list(base)
        for m in range(k):
            toks[m * 30] = f"mut{k}_{m}"
        rows.append((k, " ".join(toks)))
    for i in range(40):
        rows.append((100 + i, "the quick brown fox jumps over the lazy dog again"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash_signatures_centered(docs, bits=SIMHASH_WIDE_BITS).localCheckpoint()
    sig_by_id = {r.doc_id: r.sig for r in sigs.collect()}
    brute = {
        (a, b, sum(ca != cb for ca, cb in zip(sig_by_id[a], sig_by_id[b])))
        for a, b in itertools.combinations(sorted(sig_by_id), 2)
    }
    brute9 = {(a, b, h) for a, b, h in brute if h <= 9}
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_wide_near_pairs(sigs).collect()
    }
    assert got == brute9
    # the ladder must actually probe the gate from both sides
    assert any(6 <= h <= 9 for _, _, h in brute9), sorted(h for *_, h in brute)
    assert any(h > 9 for *_, h in brute)
    with pytest.raises(ValueError, match="lossless"):
        simhash_wide_near_pairs(sigs, max_hamming=10)


def test_bloom_dedup_fpr_audit_full_model(spark, tmp_path):
    """bloom_dedup_fpr_audit vs an independent pure-Python Bloom filter on a
    planted corpus: same md5 position hashes, same md5 half-split — every
    output cell must match the model exactly, a planted cross-half exact
    dup must be flagged with missed = 0 (Bloom filters have no false
    negatives), and flagged - true_dups must equal false_pos."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _BLOOM_CFGS,
        bloom_dedup_fpr_audit,
    )

    def side(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2

    build_ids = [i for i in range(1, 10_000) if side(i) == 0][:40]
    probe_ids = [i for i in range(1, 10_000) if side(i) == 1][:40]
    rows = [(i, f"build doc {i} " + "w " * (i % 7)) for i in build_ids]
    rows += [(i, f"probe doc {i} " + "x " * (i % 5)) for i in probe_ids[:-1]]
    # planted cross-half exact dup: last probe doc copies a build doc's text
    rows.append((probe_ids[-1], rows[0][1]))
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )

    texts = dict(rows)
    build_keys = {hashlib.md5(texts[i].encode()).hexdigest() for i in build_ids}

    def positions(tk: str, m_bits: int, k: int) -> set[int]:
        return {
            int(hashlib.md5(f"{j}:{tk}".encode()).hexdigest()[:12], 16) % m_bits
            for j in range(k)
        }

    model = {}
    for _, m_mult, k in _BLOOM_CFGS:
        m_bits = m_mult * len(build_keys)
        filt = set()
        for tk in build_keys:
            filt |= positions(tk, m_bits, k)
        flagged = false_pos = true_dups = 0
        for i in probe_ids:
            tk = hashlib.md5(texts[i].encode()).hexdigest()
            is_dup = tk in build_keys
            hit = positions(tk, m_bits, k) <= filt
            flagged += hit
            true_dups += is_dup
            false_pos += hit and not is_dup
        model[m_mult] = (m_bits, len(filt), flagged, true_dups, false_pos)

    got = {r.m_mult: r for r in bloom_dedup_fpr_audit(spark, sf).collect()}
    assert set(got) == set(m for _, m, _ in _BLOOM_CFGS)
    for m_mult, (m_bits, bits_set, flagged, true_dups, false_pos) in model.items():
        r = got[m_mult]
        assert (r.m_bits, r.bits_set) == (m_bits, bits_set)
        assert (r.flagged, r.true_dups, r.false_pos) == (
            flagged,
            true_dups,
            false_pos,
        )
        assert r.missed == 0  # no false negatives, structurally
        assert r.flagged - r.true_dups == r.false_pos
        assert r.true_dups == 1  # the planted cross-half copy


def test_bloom_dedup_presized_full_model(spark, tmp_path):
    """bloom_dedup_presized vs an independent pure-Python Bloom model on a
    planted corpus: same md5 position hashes, same md5 half-split, same
    63-bit word packing — every output cell must match, the planted
    cross-half exact dup must be flagged with missed = 0, and the filter
    sizing must be the CONSTANT 2^26 / k=5 regardless of corpus size (the
    whole point of the variant: `words_present` is structurally capped at
    ceil(m_bits / 63) ~= 1.07M rows at every tier, so the broadcast filter
    never grows with the corpus)."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _BLOOMP_K,
        _BLOOMP_M_BITS,
        bloom_dedup_presized,
    )

    def side(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2

    build_ids = [i for i in range(1, 10_000) if side(i) == 0][:40]
    probe_ids = [i for i in range(1, 10_000) if side(i) == 1][:40]
    rows = [(i, f"build doc {i} " + "w " * (i % 7)) for i in build_ids]
    rows += [(i, f"probe doc {i} " + "x " * (i % 5)) for i in probe_ids[:-1]]
    # planted cross-half exact dup: last probe doc copies a build doc's text
    rows.append((probe_ids[-1], rows[0][1]))
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )

    texts = dict(rows)
    build_keys = {hashlib.md5(texts[i].encode()).hexdigest() for i in build_ids}

    def positions(tk: str) -> set[int]:
        return {
            int(hashlib.md5(f"{j}:{tk}".encode()).hexdigest()[:12], 16)
            % _BLOOMP_M_BITS
            for j in range(_BLOOMP_K)
        }

    filt: set[int] = set()
    for tk in build_keys:
        filt |= positions(tk)
    words: dict[int, int] = {}
    for p in filt:
        words[p // 63] = words.get(p // 63, 0) | (1 << (p % 63))
    flagged = false_pos = true_dups = 0
    for i in probe_ids:
        tk = hashlib.md5(texts[i].encode()).hexdigest()
        is_dup = tk in build_keys
        hit = positions(tk) <= filt
        flagged += hit
        true_dups += is_dup
        false_pos += hit and not is_dup

    r = bloom_dedup_presized(spark, sf).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.m_bits, r.k) == (_BLOOMP_M_BITS, _BLOOMP_K)  # constant sizing
    assert r.n_build_keys == len(build_keys)
    assert (r.words_present, r.bits_set) == (len(words), len(filt))
    assert r.words_present <= -(-_BLOOMP_M_BITS // 63)  # structural cap
    assert sum(w.bit_count() for w in words.values()) == r.bits_set
    assert (r.flagged, r.true_dups, r.false_pos) == (
        flagged,
        true_dups,
        false_pos,
    )
    assert r.missed == 0  # no false negatives, structurally
    assert r.flagged - r.true_dups == r.false_pos
    assert r.true_dups == 1  # the planted cross-half copy


def test_bloom_presized_probe_is_broadcast_join(spark, tmp_path):
    """bloom_dedup_presized's scale contract in the plan: the probe side
    joins the packed filter via BroadcastHashJoin (the filter is the
    constant-capped word table — shuffling probes against it would spend a
    corpus-sized exchange on constant state), and no CartesianProduct
    appears anywhere."""
    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        bloom_dedup_presized,
    )

    rows = [(i, f"doc {i} text") for i in range(1, 60)]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    df = bloom_dedup_presized(spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_contamination_span_stats_planted(spark, tmp_path):
    """contamination_span_stats span arithmetic on planted overlaps with a
    40-token eval doc: a 20-token embedded copy reports span 20 / coverage
    20; an exact-13 copy reports 13; a 12-token overlap is clean (the rule
    is exact-13); two disjoint 13-token copies merge to coverage 26 but max
    span 13; a doc with >half its tokens copied is counted dirty."""
    import hashlib

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _CONTAM_MOD,
        contamination_span_stats,
    )

    def in_bench(i: int) -> bool:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _CONTAM_MOD == 0

    bench_id = next(i for i in range(1, 10_000) if in_bench(i))
    tids = [i for i in range(1, 10_000) if not in_bench(i)][:5]
    b = [f"b{j}" for j in range(40)]

    def words(*parts):
        return " ".join(w for p in parts for w in p)

    n = lambda tag, c: [f"{tag}{j}" for j in range(c)]
    rows = [
        (bench_id, "eval", words(b)),
        # 3 noise + b5..b24 (20-token copy) + 2 noise -> span 20, covered 20
        (tids[0], "copy20", words(n("p", 3), b[5:25], n("q", 2))),
        # 3 noise + exactly 13 copied + 14 noise -> span 13, not dirty
        (tids[1], "exact13", words(n("r", 3), b[10:23], n("s", 14))),
        # 12-token overlap: below the exact-13 rule -> clean
        (tids[2], "only12", words(n("u", 3), b[10:22], n("v", 14))),
        # two disjoint 13-token copies, 13-noise gap -> covered 26, max 13
        (tids[3], "twospans", words(n("x", 5), b[0:13], n("y", 13), b[20:33], n("z", 10))),
        # 4 noise + 16 copied of 20 tokens -> covered 16, 2*16 >= 20: dirty
        (tids[4], "dirty", words(n("w", 4), b[0:16])),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {r.source: r for r in contamination_span_stats(spark, sf).collect()}
    assert "eval" not in got
    exp = {
        # source: (docs, tokens, contaminated, max_span, covered, dirty)
        "copy20": (1, 25, 1, 20, 20, 1),
        "exact13": (1, 30, 1, 13, 13, 0),
        "only12": (1, 29, 0, 0, 0, 0),
        "twospans": (1, 54, 1, 13, 26, 0),
        "dirty": (1, 20, 1, 16, 16, 1),
    }
    for src, (docs, tokens, contam, span, covered, dirty) in exp.items():
        r = got[src]
        assert (
            r.n_train_docs,
            r.total_tokens,
            r.n_contaminated,
            r.max_span_tokens,
            r.contaminated_tokens,
            r.n_dirty_docs,
        ) == (docs, tokens, contam, span, covered, dirty), src
        assert r.contaminated_token_ppm == 1_000_000 * covered // tokens, src


def test_streaming_bloom_ingest_slicing_invariance(spark, tmp_path):
    """First-setter semantics make the Bloom ingest verdicts a pure
    function of the corpus: driving the same planted corpus as 2 chunks
    and as 3 chunks must produce identical sheets; the planted later exact
    dup must be flagged AND counted as a true dup with missed = 0 (Bloom
    filters have no false negatives, and the dup's setter precedes it in
    the ascending feed even when both land in the same micro-batch)."""
    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _sbloom_drive,
    )

    rows = [(i, "uniq", f"unique doc {i} " + "t " * (i % 9)) for i in range(1, 61)]
    dup_text = rows[2][2]
    rows.append((61, "dup", dup_text))  # exact copy of doc 3, arrives last
    rows.append((62, "dup", dup_text))  # and a same-batch copy of doc 61
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    two = {r.source: r.asDict() for r in _sbloom_drive(spark, sf, n_chunks=2).collect()}
    three = {r.source: r.asDict() for r in _sbloom_drive(spark, sf, n_chunks=3).collect()}
    assert two == three
    assert two["dup"]["n_docs"] == 2
    assert two["dup"]["true_dups"] == 2
    assert two["dup"]["flagged"] == 2
    assert two["dup"]["missed"] == 0
    assert two["uniq"]["true_dups"] == 0
    assert two["uniq"]["missed"] == 0
    assert two["uniq"]["false_pos"] == two["uniq"]["flagged"]


def test_streaming_bloom_ingest_empty_corpus(spark, tmp_path):
    """An empty documents table short-circuits to an empty verdict sheet
    with the production schema instead of raising int(None) on the doc_id
    span (round-7 ADVICE)."""
    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _sbloom_drive,
    )

    sf = str(tmp_path)
    spark.createDataFrame([], "doc_id long, source string, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = _sbloom_drive(spark, sf, n_chunks=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "source", "n_docs", "true_dups", "flagged", "false_pos", "missed", "fpr_ppm",
    ]
