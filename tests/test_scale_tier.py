"""Pins for the sf-tier builder (tools/build_sf1.py): tile-and-shift must
preserve the star schema exactly — shifted foreign keys still resolve, no
key collisions between replicas, and per-key group sizes are preserved
(the property that makes sf0.1 -> sf1.0 exponents apples-to-apples)."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def tier_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tier") / "sf0.2")
    r = subprocess.run(
        [sys.executable, "tools/build_sf1.py", "--out", out, "--mult", "2"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    return out


def test_tile_counts_and_fk_integrity(tier_dir):
    con = duckdb.connect()
    q = lambda sql: con.execute(sql).fetchone()[0]  # noqa: E731
    for t in ("customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tier_dir}/{t}.parquet')"
        )
        base = q(f"SELECT count(*) FROM read_parquet('/root/testdata/sf0.1/{t}.parquet')")
        assert q(f"SELECT count(*) FROM {t}") == 2 * base, t
    # keys stay dense and collision-free across replicas
    assert q("SELECT count(DISTINCT o_orderkey) FROM orders") == 300_000
    assert q("SELECT max(o_orderkey) - min(o_orderkey) FROM orders") == 299_999
    # every FK resolves after the shift
    assert q(
        "SELECT count(*) FROM orders o LEFT JOIN customer c"
        " ON c.c_custkey = o.o_custkey WHERE c.c_custkey IS NULL"
    ) == 0
    assert q(
        "SELECT count(*) FROM lineitem l LEFT JOIN orders o"
        " ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey IS NULL"
    ) == 0
    assert q(
        "SELECT count(*) FROM lineitem l LEFT JOIN part p"
        " ON p.p_partkey = l.l_partkey WHERE p.p_partkey IS NULL"
    ) == 0
    # per-key group sizes preserved: max lines per order unchanged
    base_max = q(
        "SELECT max(c) FROM (SELECT count(*) AS c FROM"
        " read_parquet('/root/testdata/sf0.1/lineitem.parquet') GROUP BY l_orderkey)"
    )
    assert q(
        "SELECT max(c) FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey)"
    ) == base_max
    # key-formatted names re-derived from the shifted key, still 1:1
    assert q(
        "SELECT count(*) FROM customer"
        " WHERE c_name <> 'Customer#' || lpad(CAST(c_custkey AS VARCHAR), 9, '0')"
    ) == 0


def test_generated_corpus_tables_scale(tier_dir):
    con = duckdb.connect()
    for t, base in (("documents", 5000), ("events", 100_000), ("embeddings", 2000)):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{tier_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert n == 2 * base, (t, n)
    # documents must NOT be row replicas: exact-dup fraction stays ~0.2%,
    # not 50% (the property that keeps dedup timings honest)
    dups = con.execute(
        f"SELECT count(*) - count(DISTINCT text) FROM"
        f" read_parquet('{tier_dir}/documents.parquet')"
    ).fetchone()[0]
    assert dups < 500, dups
