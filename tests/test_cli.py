"""CLI surface: list/oracle paths are pure-Python (no Spark session)."""

from __future__ import annotations

from amazon_kinesis_data_streams_health_check_spark.__main__ import main


def test_cli_list_filters_by_tag(capsys):
    assert main(["list", "--tag", "bench"]) == 0
    out = capsys.readouterr().out
    assert "health_lag_alarm" in out and "dedup_minhash_lsh" in out
    assert "kinesis_sim_scan" not in out  # not bench-tagged


def test_cli_oracle_prints_sql(capsys):
    assert main(["oracle", "q6_forecast_revenue"]) == 0
    assert "FROM lineitem" in capsys.readouterr().out


def test_cli_oracle_rows_only_exits_nonzero(capsys, monkeypatch):
    # No registered query is rows-only anymore (ann_ivf gained its accuracy
    # contract); pin the CLI branch with a synthetic oracle-less entry.
    from amazon_kinesis_data_streams_health_check_spark.plans import registry

    q = registry.get("ann_ivf")
    monkeypatch.setitem(registry._REGISTRY, "_rows_only_probe", type(q)(
        name="_rows_only_probe", builder=q.builder, oracle=None
    ))
    assert main(["oracle", "_rows_only_probe"]) == 1


def test_cli_oracle_ann_ivf_contract_sql(capsys):
    # ann_ivf now carries its accuracy-contract oracle (round-4).
    assert main(["oracle", "ann_ivf"]) == 0
    assert "mean_recall_ge_150_milli" in capsys.readouterr().out


def test_cli_unknown_query(capsys):
    assert main(["oracle", "no_such_query"]) == 2
