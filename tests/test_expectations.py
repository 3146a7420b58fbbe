"""Declarative data expectations: unit evaluation semantics plus the
YAML-driven fail-loud path through the ingest pipeline."""

from __future__ import annotations

import textwrap

import pytest

from data_ingestors_spark.validators.expectations import evaluate_expectations


@pytest.fixture
def frame(spark):
    return spark.createDataFrame(
        [
            ("a", "x", 10.0, "r1"),
            ("b", "x", 20.0, "r2"),
            ("b", "y", -5.0, "r3"),
            (None, "z", 50.0, "r4"),
        ],
        "k string, cat string, price double, row string",
    )


def test_not_null_and_unique(frame):
    rep = evaluate_expectations(
        frame, [{"column": "k", "checks": ["not_null", "unique"]}]
    )
    by = {r.name: r for r in rep.results}
    assert by["k.not_null"].n_violations == 1
    # 3 non-null values, 2 distinct -> 1 duplicate
    assert by["k.unique"].n_violations == 1
    assert not rep.is_valid


def test_accepted_values_and_between_and_matches(frame):
    rep = evaluate_expectations(
        frame,
        [
            {"column": "cat", "accepted_values": ["x", "y"]},
            {"column": "price", "between": [0, 100]},
            {"column": "row", "matches": "^r[0-9]$"},
        ],
    )
    by = {r.name: r for r in rep.results}
    assert by["cat.accepted_values"].n_violations == 1
    assert by["cat.accepted_values"].sample == "z"
    assert by["price.between[0,100]"].n_violations == 1
    assert by["price.between[0,100]"].sample == "-5.0"
    assert by["row.matches"].n_violations == 0


def test_expression_fails_closed_on_null(spark):
    df = spark.createDataFrame(
        [(10.0, 5.0), (3.0, 7.0), (None, 1.0)], "price double, cost double"
    )
    rep = evaluate_expectations(df, [{"expression": "price >= cost"}])
    # one real violation (3 < 7) and one NULL predicate -> 2
    assert rep.results[0].n_violations == 2


def test_empty_expectations_noop(frame):
    assert evaluate_expectations(frame, []).is_valid


def test_unknown_check_raises(frame):
    with pytest.raises(ValueError, match="unknown check"):
        evaluate_expectations(frame, [{"column": "k", "checks": ["positive"]}])


def test_yaml_expectations_gate_ingest(spark, tmp_path):
    from data_ingestors_spark.cli.frontend import run_from_yaml

    csv = tmp_path / "m.csv"
    csv.write_text("age,target\n31,yes\n-3,no\n")
    yml = tmp_path / "ingest.yaml"
    yml.write_text(
        textwrap.dedent(
            f"""\
            apiVersion: spark-ingest/v1
            kind: IngestConfig
            category: tabular_classification
            table: t_expect
            intent: train
            csv: {csv}
            schema:
              age: INT
            label: target
            warehouse: {tmp_path / "wh"}
            spec:
              expectations:
                - column: age
                  checks: [not_null]
                  between: [0, 150]
            """
        )
    )
    with pytest.raises(ValueError, match=r"expectations failed[\s\S]*between"):
        run_from_yaml(spark, str(yml))

    # fix the data -> same config ingests cleanly
    csv.write_text("age,target\n31,yes\n42,no\n")
    run_from_yaml(spark, str(yml))


def test_post_expectations_see_transformed_frame(spark, tmp_path):
    """post_expectations run on the transformed frame: framework
    columns like data_id/label exist there (they don't in the source),
    and violations fail the ingest loudly."""
    from data_ingestors_spark.cli.frontend import run_from_yaml

    csv = tmp_path / "m.csv"
    csv.write_text("age,target\n31,yes\n42,\n")  # one row with NO label
    base = f"""\
apiVersion: spark-ingest/v1
kind: IngestConfig
category: tabular_classification
table: t_postexp
intent: train
csv: {csv}
schema:
  age: INT
label: target
warehouse: {tmp_path / "wh"}
spec:
  post_expectations:
    - column: label
      checks: [not_null]
    - column: data_id
      checks: [not_null, unique]
"""
    yml = tmp_path / "ingest.yaml"
    yml.write_text(base)
    with pytest.raises(ValueError, match=r"post-transform expectations[\s\S]*label\.not_null"):
        run_from_yaml(spark, str(yml))

    csv.write_text("age,target\n31,yes\n42,no\n")
    run_from_yaml(spark, str(yml))  # clean data passes


def test_doctor_cli_subcommand(spark, tmp_path, capsys):
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
            table: docti
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
    rc = main(["doctor", str(tmp_path / "wh"), "SELECT age FROM docti WHERE age > 30"])
    assert rc == 0
    assert "clean" in capsys.readouterr().out
    # a cartesian self-join should be flagged (exit 1, D1 printed)
    rc_bad = main([
        "doctor", str(tmp_path / "wh"),
        "SELECT a.age FROM docti a CROSS JOIN docti b",
    ])
    assert rc_bad == 1
    assert "D1" in capsys.readouterr().out
