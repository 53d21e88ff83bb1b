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


def test_kql_subcommand_runs_query(spark, tmp_path, capsys):
    """CLI kql mode: bind a Delta table, run the pipe text, render
    csv; `render` visualization hints are accepted and dropped."""
    src = str(tmp_path / "kqlcli_src")
    DeltaSink(spark, src).append(
        spark.createDataFrame(
            [("a", 1), ("a", 5), ("b", 9)], "k string, v long"
        )
    )
    rc = main([
        "kql",
        "t | where v > 1 | summarize n = count(), mx = max(v) by k"
        " | order by k asc | render timechart",
        "--table", f"t={src}",
        "--format", "csv",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "k,n,mx"
    assert out[1:] == ["a,1,5", "b,1,9"]


def test_vacuum_cli(spark, tmp_path, capsys):
    import pyspark.sql.functions as F

    from mirror_lake_kusto_spark.__main__ import main
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    sink = DeltaSink(spark, str(tmp_path / "vac"), checkpoint_interval=2)
    sink.append(spark.range(10).toDF("id").coalesce(1))
    sink.append(spark.range(10, 20).toDF("id").coalesce(1))
    sink.delete("id < 5")  # leaves an orphaned pre-image file
    rc = main(["vacuum", sink.path])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"data_files": 1' in out


def test_clone_cli(spark, tmp_path, capsys):
    from mirror_lake_kusto_spark.__main__ import main
    from mirror_lake_kusto_spark.sources.delta_sink import DeltaSink

    src = DeltaSink(spark, str(tmp_path / "clsrc"))
    src.append(spark.range(25).toDF("id").coalesce(1))
    rc = main(["clone", src.path, str(tmp_path / "cltgt")])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"files": 1' in out and '"rows": 25' in out
