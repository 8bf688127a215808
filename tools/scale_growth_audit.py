"""Scale-growth audit: do the heavy-tail queries grow ~linearly in rows?

The driver testdata tops out at sf0.1, so cost growth is invisible from the
sweep alone — a candidate-quadratic plan looks fine until the corpus grows.
This tool synthesizes self-similar documents/events/embeddings tables at 1x
and Kx the sf0.1 row counts WITH THE SAME generator (so the two points are
apples-to-apples), runs the requested queries at both sizes, and reports
the growth exponent  log(t_K / t_1) / log(K)  per query. Exponent ~1 means
linear; >1.5 flags a super-linear plan that needs a fix before 100 TB.

The generator mirrors the observed driver-table distributions (31-word
vocab word-salad text of 44-577 chars, 20 uniform sources, 5 langs, ~2%
mutated near-dups + ~0.2% exact dups; 30-day event stream over 1500 users
and 5 types; 64-dim embeddings in 10 loose clusters). Non-scaled tables
(region..lineitem) are copied from sf0.1 so any query runs unchanged.

Usage:  python tools/scale_growth_audit.py [--mult 3] [--queries a,b,c]
Writes nothing outside /tmp/scale_audit.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
BASE = "/tmp/scale_audit"
N_DOCS, N_EVENTS, N_VECS = 5000, 100_000, 2000

VOCAB = (
    "batch part spark line column order small sort fast value scan query agg "
    "table hash lag key group stream filter customer vector slow join shard "
    "metric window state alarm count dedup"
).split()
LANGS = ["en", "en", "zh", "de", "fr", "es"]  # en at double weight
TYPES = ["error", "view", "signup", "click", "purchase"]


def gen_documents(n: int, rng: np.random.Generator) -> pd.DataFrame:
    n_words = rng.integers(8, 100, size=n)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.002:  # exact dup of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.022:  # near-dup: mutate a few words
            words = texts[rng.integers(0, i)].split()
            for _ in range(max(1, len(words) // 20)):
                words[rng.integers(0, len(words))] = VOCAB[
                    rng.integers(0, len(VOCAB))
                ]
            texts.append(" ".join(words))
            continue
        idx = rng.integers(0, len(VOCAB), size=n_words[i])
        texts.append(" ".join(VOCAB[j] for j in idx))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), size=n)],
            "source": [f"src{i}" for i in rng.integers(0, 20, size=n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_events(n: int, rng: np.random.Generator) -> pd.DataFrame:
    span_us = 30 * 86400 * 1_000_000
    ts_us = np.sort(rng.integers(0, span_us, size=n)) + 1_704_067_200_000_000
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "user_id": rng.integers(0, 1500, size=n).astype(np.int64),
            "event_type": [TYPES[i] for i in rng.integers(0, 5, size=n)],
            "value": np.round(rng.exponential(60.0, size=n), 2),
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)],
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pd.DataFrame:
    centers = rng.normal(0, 1.0, size=(10, 64))
    labels = rng.integers(0, 10, size=n)
    vecs = centers[labels] + rng.normal(0, 0.6, size=(n, 64))
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in vecs],
            "label": labels.astype(np.int32),
        }
    )


def build_dir(mult: int, seed: int = 7) -> str:
    out = os.path.join(BASE, f"x{mult}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)  # same seed: x3 is a superset-shaped x1
    pq.write_table(
        pa.Table.from_pandas(gen_documents(N_DOCS * mult, rng)),
        os.path.join(out, "documents.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(gen_events(N_EVENTS * mult, rng)),
        os.path.join(out, "events.parquet"),
    )
    emb = gen_embeddings(N_VECS * mult, rng)
    tbl = pa.Table.from_pandas(emb)
    # match the driver schema: list<float>, int32 label
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{out}/{t}.parquet")
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


DEFAULT_QUERIES = [
    "dedup_fuzzy_edit",
    "incremental_minhash_index",
    "dedup_simhash",
    "bpe_merge_learn",
    "ts_motif_search",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=3)
    ap.add_argument("--queries", type=str, default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    d1 = build_dir(1)
    dk = build_dir(args.mult)

    from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries
    from amazon_kinesis_data_streams_health_check_spark.session import get_spark

    spark = get_spark(app_name="scale-growth-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    report = {}
    for name in names:
        q = qs[name]
        times = {}
        rows = {}
        for label, d in (("x1", d1), (f"x{args.mult}", dk)):
            best = float("inf")
            for _ in range(max(1, args.samples)):
                t0 = time.perf_counter()
                q.builder(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[label] = round(best, 3)
            rows[label] = q.builder(spark, d).count()
        k = f"x{args.mult}"
        t_exp = math.log(times[k] / times["x1"]) / math.log(args.mult)
        r_exp = (
            math.log(max(rows[k], 1) / max(rows["x1"], 1)) / math.log(args.mult)
            if rows["x1"]
            else float("nan")
        )
        # A plan is scale-safe when its runtime grows no faster than max(
        # input, answer): runtime_exponent <= max(1, output_exponent) + noise.
        report[name] = {
            "sec": times,
            "out_rows": rows,
            "runtime_exponent": round(t_exp, 3),
            "output_exponent": round(r_exp, 3),
            "plan_ok": t_exp <= max(1.0, r_exp) + 0.25,
        }
        print(json.dumps({name: report[name]}), flush=True)
    print(json.dumps({"mult": args.mult, "report": report}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
