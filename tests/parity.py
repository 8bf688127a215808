"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query through Spark AND its oracle SQL through DuckDB on the
same parquet tables, then compares row count, column names, and values
order-insensitively (columns sorted by name, rows sorted by string form).
Exact equality is required — queries are designed so both engines produce
bit-identical values (integral doubles, identical rounding).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from amazon_kinesis_data_streams_health_check_spark.schemas import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v: Any) -> str:
    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v):
        return "<NULL>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 2**53:
            return f"{int(v)}.0"
        return repr(v)
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else list(v)
        return "[" + ",".join(_norm_cell(x) for x in seq) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def assert_no_scale_red_flags(spark_df) -> None:
    """Every oracle-checked plan must be free of the two unconditional
    100 TB killers: a CartesianProduct anywhere, and a global
    range-partitioned sort that is not a TakeOrderedAndProject top-N.
    Currently the whole registry passes with zero exceptions — keep it
    that way (bounded-dimension windows don't trigger either pattern)."""
    plan = spark_df._sc._jvm.PythonSQLUtils.explainString(
        spark_df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, "cartesian product in plan"
    assert (
        "rangepartitioning" not in plan or "TakeOrderedAndProject" in plan
    ), "global sort (non-top-N) in plan"


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Raise AssertionError with a useful diff on any mismatch."""
    assert_no_scale_red_flags(spark_df)
    sp = spark_df.toPandas()
    du = run_oracle(oracle_sql, sf_dir)
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duckdb={len(du)}"
    nsp, ndu = normalize(sp), normalize(du)
    if nsp != ndu:
        diffs = [(a, b) for a, b in zip(nsp, ndu) if a != b][:5]
        only_sp = [r for r in nsp if r not in set(ndu)][:3]
        only_du = [r for r in ndu if r not in set(nsp)][:3]
        raise AssertionError(
            f"value mismatch ({len(diffs)}+ diffs)\nfirst diffs: {diffs}\n"
            f"spark-only: {only_sp}\nduckdb-only: {only_du}\ncols: {sorted(sp.columns)}"
        )
