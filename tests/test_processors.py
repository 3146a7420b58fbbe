"""T8 declared processors: spec.processors entries resolve to real
DataFrame transforms and run in order inside the YAML ingest path —
the capability the reference accepts but defers (cli/run.py:112-119)."""

from __future__ import annotations

import pytest
import yaml

from data_ingestors_spark.cli.frontend import run_from_yaml
from data_ingestors_spark.ingest.processors import (
    apply_processors,
    clip_column,
    drop_full_null_rows,
    resolve_processor,
)


def test_resolve_colon_and_dotted_paths():
    fn, kwargs, _ = resolve_processor(
        "data_ingestors_spark.ingest.processors:drop_full_null_rows"
    )
    assert fn is drop_full_null_rows and kwargs == {}
    fn2, _, _ = resolve_processor(
        "data_ingestors_spark.ingest.processors.clip_column"
    )
    assert fn2 is clip_column


def test_resolve_object_form_with_args():
    fn, kwargs, _ = resolve_processor(
        {
            "function": "data_ingestors_spark.ingest.processors:clip_column",
            "args": {"column": "x", "lo": 0.0, "hi": 1.0},
        }
    )
    assert fn is clip_column and kwargs == {"column": "x", "lo": 0.0, "hi": 1.0}


@pytest.mark.parametrize(
    "bad, match",
    [
        ("no_such_module:fn", "cannot import"),
        ("data_ingestors_spark.ingest.processors:no_such_fn", "not a callable"),
        ("justaname", "expected"),
    ],
)
def test_resolve_fails_loud(bad, match):
    with pytest.raises(ValueError, match=match):
        resolve_processor(bad)


def test_apply_in_order_and_type_check(spark):
    df = spark.createDataFrame([(5.0,), (-3.0,), (None,)], "x double")
    out = apply_processors(
        df,
        [
            "data_ingestors_spark.ingest.processors:drop_full_null_rows",
            {
                "function": "data_ingestors_spark.ingest.processors:clip_column",
                "args": {"column": "x", "lo": 0.0, "hi": 4.0},
            },
        ],
    )
    assert sorted(r.x for r in out.collect()) == [0.0, 4.0]


def test_bad_entry_rejected_before_any_applies(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="cannot import"):
        apply_processors(
            df,
            [
                "data_ingestors_spark.ingest.processors:drop_full_null_rows",
                "nope.nope:fn",
            ],
        )


def test_yaml_pipeline_runs_processors(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("price,label\n50.0,a\n999999.0,b\n-7.0,c\n")
    cfg = {
        "apiVersion": "spark-ingest/v1",
        "kind": "IngestConfig",
        "intent": "train",
        "table": "proc_t",
        "category": "tabular_classification",
        "csv": str(csv),
        "schema": {"price": "FLOAT", "label": "VARCHAR"},
        "label": "label",
        "warehouse": str(tmp_path / "wh"),
        "spec": {
            "processors": [
                {
                    "function": "data_ingestors_spark.ingest.processors:clip_column",
                    "args": {"column": "price", "lo": 0.0, "hi": 100.0},
                }
            ]
        },
    }
    p = tmp_path / "ingest.yaml"
    p.write_text(yaml.safe_dump(cfg))
    summary = run_from_yaml(spark, str(p))
    assert not summary.has_failures
    table = spark.read.parquet(str(tmp_path / "wh" / "proc_t"))
    assert sorted(r.price for r in table.select("price").collect()) == [0.0, 50.0, 100.0]


def test_yaml_bad_processor_fails_before_write(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("price,label\n1.0,a\n")
    cfg = {
        "apiVersion": "spark-ingest/v1",
        "kind": "IngestConfig",
        "intent": "train",
        "table": "proc_bad",
        "category": "tabular_classification",
        "csv": str(csv),
        "schema": {"price": "FLOAT", "label": "VARCHAR"},
        "label": "label",
        "warehouse": str(tmp_path / "wh"),
        "spec": {"processors": ["ghost.module:fn"]},
    }
    p = tmp_path / "ingest.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="cannot import"):
        run_from_yaml(spark, str(p))
    assert not (tmp_path / "wh" / "proc_bad").exists()
