"""One-pass profiler: stats correctness and the CLI path."""

from __future__ import annotations

from data_ingestors_spark.profile import profile, top_values


def test_profile_single_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, None), (3, "a", 40.0)],
        "k long, s string, v double",
    )
    rows = {(r.column, r.metric): r.value for r in profile(df).collect()}
    assert rows[("*", "rows")] == "4"
    assert rows[("s", "nulls")] == "1"
    assert rows[("v", "nulls")] == "1"
    assert rows[("k", "min")] == "1" and rows[("k", "max")] == "3"
    assert rows[("v", "mean")] is not None and rows[("v", "stddev")] is not None
    # approx distinct exact at this cardinality
    assert rows[("k", "approx_distinct")] == "3"
    assert rows[("s", "min")] == "a"  # strings are orderable


def test_top_values_deterministic(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("y",), ("z",)], "c string"
    )
    got = [(r.value, r.n) for r in top_values(df, "c", k=2).collect()]
    # x and y tie at 2; tiebreak is value ascending
    assert got == [("x", 2), ("y", 2)]


def test_profile_cli(spark, tmp_path, capsys):
    import textwrap

    from data_ingestors_spark.cli.frontend import main, run_from_yaml

    csv = tmp_path / "m.csv"
    csv.write_text("age,target\n31,yes\n42,no\n")
    yml = tmp_path / "ingest.yaml"
    yml.write_text(
        textwrap.dedent(
            f"""\
            apiVersion: spark-ingest/v1
            kind: IngestConfig
            category: tabular_classification
            table: prof
            intent: train
            csv: {csv}
            schema:
              age: INT
            label: target
            warehouse: {tmp_path / "wh"}
            """
        )
    )
    run_from_yaml(spark, str(yml))
    rc = main(["profile", str(tmp_path / "wh"), "prof"])
    out = capsys.readouterr().out
    assert rc == 0 and "approx_distinct" in out and "rows" in out
    assert main(["profile", "only-two"]) == 2


def test_column_quantiles_digest(spark):
    """The profiler's quantile drill-down must land within the digest
    rank-error bound on a known distribution."""
    from data_ingestors_spark.profile import column_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(1000)], "x double")
    got = {r.q: r.est for r in column_quantiles(df, "x", [0.25, 0.5, 0.75], b=50).collect()}
    for q, truth in [(0.25, 250.0), (0.5, 500.0), (0.75, 750.0)]:
        assert abs(got[q] - truth) <= 1000 * 2.5 / 50, (q, got[q])


def test_quantiles_cli(spark, tmp_path, capsys):
    import textwrap

    from data_ingestors_spark.cli.frontend import main, run_from_yaml

    csv = tmp_path / "m.csv"
    csv.write_text("age,target\n" + "\n".join(f"{20 + i},yes" for i in range(50)) + "\n")
    yml = tmp_path / "ingest.yaml"
    yml.write_text(
        textwrap.dedent(
            f"""\
            apiVersion: spark-ingest/v1
            kind: IngestConfig
            category: tabular_classification
            table: qprof
            intent: train
            csv: {csv}
            schema:
              age: INT
            label: target
            warehouse: {tmp_path / "wh"}
            """
        )
    )
    run_from_yaml(spark, str(yml))
    rc = main(["quantiles", str(tmp_path / "wh"), "qprof", "age"])
    out = capsys.readouterr().out
    assert rc == 0 and "0.5" in out and "est" in out
    assert main(["quantiles", "only", "three"]) == 2
