"""Module CLI: python -m mirror_lake_kusto_spark (Program.cs:76,
CommandLineOptions.cs:10-20 parity)."""

from __future__ import annotations

from mirror_lake_kusto_spark.__main__ import main
from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink


def test_cli_one_shot_sync(spark, tmp_path, capsys):
    src = str(tmp_path / "cli_src")
    DeltaSink(spark, src).append(spark.range(25).toDF("id"))
    rc = main([
        "--storage", src,
        "--target", str(tmp_path / "cli_dst"),
        "--checkpoint", str(tmp_path / "cli_state"),
        "--table", "cli",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "adds staged" in out
    mirrored = DeltaSink(spark, str(tmp_path / "cli_dst")).to_df()
    assert sorted(r["id"] for r in mirrored.collect()) == list(range(25))
    # idle second run
    rc = main([
        "--storage", src,
        "--target", str(tmp_path / "cli_dst"),
        "--checkpoint", str(tmp_path / "cli_state"),
        "--table", "cli",
    ])
    assert rc == 0
    assert "up-to-date" in capsys.readouterr().out


def test_cli_continuous_bounded_polls(spark, tmp_path):
    src = str(tmp_path / "clic_src")
    DeltaSink(spark, src).append(spark.range(10).toDF("id"))
    rc = main([
        "--storage", src,
        "--target", str(tmp_path / "clic_dst"),
        "--checkpoint", str(tmp_path / "clic_state"),
        "--table", "clic",
        "--continuous", "--poll-seconds", "0.05", "--max-polls", "2",
    ])
    assert rc == 0
    mirrored = DeltaSink(spark, str(tmp_path / "clic_dst")).to_df()
    assert mirrored.count() == 10
