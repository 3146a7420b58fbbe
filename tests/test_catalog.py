"""Warehouse catalog: ingested tables become queryable by name."""

from __future__ import annotations

import textwrap

from data_ingestors_spark import catalog


def test_attach_and_sql(spark, tmp_path):
    from data_ingestors_spark.cli.frontend import run_from_yaml

    csv = tmp_path / "m.csv"
    csv.write_text("age,target\n31,yes\n42,no\n55,yes\n")
    yml = tmp_path / "ingest.yaml"
    yml.write_text(
        textwrap.dedent(
            f"""\
            apiVersion: spark-ingest/v1
            kind: IngestConfig
            category: tabular_classification
            table: people
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

    names = catalog.attach(spark, str(tmp_path / "wh"))
    assert "people" in names
    got = catalog.sql(
        spark, str(tmp_path / "wh"),
        "SELECT label, count(*) AS n FROM people GROUP BY label ORDER BY label",
    ).collect()
    assert [(r.label, r.n) for r in got] == [("no", 1), ("yes", 2)]
    # the internal bucket column is hidden from SQL users
    cols = catalog.sql(spark, str(tmp_path / "wh"), "SELECT * FROM people LIMIT 1").columns
    assert "__bucket" not in cols


def test_attach_missing_dir(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        catalog.attach(spark, str(tmp_path / "nope"))


def test_cli_query_subcommand(spark, tmp_path, capsys):
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
            table: cliq
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
    rc = main(["query", str(tmp_path / "wh"), "SELECT count(*) AS n FROM cliq"])
    assert rc == 0
    assert "2" in capsys.readouterr().out
    assert main(["query", "just-one-arg"]) == 2


def test_user_story_ingest_query_profile_export(spark, tmp_path):
    """The full user journey in one flow: declarative ingest -> SQL
    over the catalog -> profile -> doctor-clean -> sharded export."""
    import os
    import textwrap

    from data_ingestors_spark.cli.frontend import run_from_yaml
    from data_ingestors_spark.doctor import diagnose
    from data_ingestors_spark.io.writers import export_table
    from data_ingestors_spark.profile import profile

    csv = tmp_path / "m.csv"
    csv.write_text(
        "age,plan,target\n31,basic,yes\n42,pro,no\n55,pro,yes\n23,basic,no\n"
    )
    yml = tmp_path / "ingest.yaml"
    yml.write_text(
        textwrap.dedent(
            f"""\
            apiVersion: spark-ingest/v1
            kind: IngestConfig
            category: tabular_classification
            table: journey
            intent: train
            csv: {csv}
            schema:
              age: INT
              plan: VARCHAR(20)
            label: target
            warehouse: {tmp_path / "wh"}
            spec:
              expectations:
                - column: age
                  between: [0, 120]
              post_expectations:
                - column: data_id
                  checks: [not_null, unique]
            """
        )
    )
    run_from_yaml(spark, str(yml))

    result = catalog.sql(
        spark, str(tmp_path / "wh"),
        "SELECT plan, count(*) AS n, avg(age) AS avg_age FROM journey GROUP BY plan",
    )
    assert {(r.plan, r.n) for r in result.collect()} == {("basic", 2), ("pro", 2)}
    assert not [f for f in diagnose(result) if f.startswith(("D1", "D2", "D3"))]

    prof = {(r.column, r.metric): r.value for r in profile(spark.table("journey")).collect()}
    assert prof[("*", "rows")] == "4" and prof[("age", "nulls")] == "0"

    out = str(tmp_path / "export")
    export_table(spark.table("journey"), out, "parquet", partition_by=["label"])
    shards = {d for d in os.listdir(out) if d.startswith("label=")}
    assert shards == {"label=yes", "label=no"}
