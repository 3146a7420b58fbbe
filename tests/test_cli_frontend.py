"""YAML frontend: schema validation, resolver conventions, e2e drive,
and the template-equivalence contract (reference
tests/test_template_equivalence.py:1-50 analog: a YAML-driven run
produces the same table as a hand-constructed ResolvedConfig run).
"""

from __future__ import annotations

import textwrap

import pytest

from data_ingestors_spark.cli.frontend import (
    IngestConfigError,
    load_ingest_yaml,
    resolve,
    run_from_yaml,
    validate_config,
)
from data_ingestors_spark.ingest import Ingestor, ResolvedConfig


def write_yaml(tmp_path, body, name="ingest.yaml"):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


BASE = """\
apiVersion: spark-ingest/v1
kind: IngestConfig
category: tabular_classification
table: t_yaml
intent: train
csv: {csv}
schema:
  age: INT
  name: VARCHAR(50)
label:
  column: target
  policy: bucket
"""


@pytest.fixture
def csv_source(tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("age,name,target\n31,alice,yes\n42,bob,no\n")
    return str(p)


# --- validation ---------------------------------------------------------


def test_valid_yaml_loads(tmp_path, csv_source):
    raw = load_ingest_yaml(write_yaml(tmp_path, BASE.format(csv=csv_source)))
    assert raw["category"] == "tabular_classification"


@pytest.mark.parametrize(
    "mutation, expect",
    [
        ("apiVersion: wrong/v9", "apiVersion"),
        ("category: cat_videos", "category"),
        ("intent: maybe", "intent"),
        ("bogus_key: 1", "bogus_key"),
    ],
)
def test_invalid_values_error_with_path(tmp_path, csv_source, mutation, expect):
    body = BASE.format(csv=csv_source)
    key = mutation.split(":")[0]
    body = "\n".join(
        mutation if line.startswith(key + ":") else line for line in body.splitlines()
    )
    if key == "bogus_key":
        body += "\n" + mutation
    with pytest.raises(IngestConfigError, match=expect):
        load_ingest_yaml(write_yaml(tmp_path, body))


def test_missing_required_keys(tmp_path):
    with pytest.raises(IngestConfigError, match="required"):
        load_ingest_yaml(
            write_yaml(tmp_path, "apiVersion: spark-ingest/v1\nkind: IngestConfig\n")
        )


def test_two_sources_rejected(tmp_path, csv_source):
    body = BASE.format(csv=csv_source) + f"json: {csv_source}\n"
    with pytest.raises(IngestConfigError):
        load_ingest_yaml(write_yaml(tmp_path, body))


def test_tabular_requires_schema():
    raw = {
        "apiVersion": "spark-ingest/v1", "kind": "IngestConfig",
        "category": "tabular_classification", "table": "t", "intent": "train",
        "csv": "x.csv",
    }
    with pytest.raises(IngestConfigError, match="schema"):
        validate_config(raw)


def test_file_category_requires_src_dest():
    raw = {
        "apiVersion": "spark-ingest/v1", "kind": "IngestConfig",
        "category": "image_classification", "table": "t", "intent": "train",
        "csv": "x.csv",
    }
    with pytest.raises(IngestConfigError, match="src"):
        validate_config(raw)


def test_not_yaml_and_not_mapping(tmp_path):
    with pytest.raises(IngestConfigError, match="not found"):
        load_ingest_yaml(str(tmp_path / "absent.yaml"))
    with pytest.raises(IngestConfigError, match="mapping"):
        load_ingest_yaml(write_yaml(tmp_path, "- a\n- b\n"))


# --- resolver conventions ----------------------------------------------


def test_resolver_defaults(tmp_path, csv_source):
    run = resolve(load_ingest_yaml(write_yaml(tmp_path, BASE.format(csv=csv_source))))
    cfg = run.config
    assert cfg.table_name == "t_yaml"
    assert cfg.data_format == "csv"
    assert cfg.label_column == "target" and cfg.label_policy == "bucket"
    assert cfg.data_id_strategy == "uuid"
    assert cfg.tabular is True
    assert cfg.ingestor_id == "tabular_classification_t_yaml"
    assert run.source_path == csv_source
    assert run.target_path.endswith("warehouse/t_yaml")


def test_resolver_label_shorthand_and_column_id(tmp_path, csv_source):
    body = BASE.format(csv=csv_source).replace(
        "label:\n  column: target\n  policy: bucket", "label: target"
    ) + "data_id:\n  strategy: column\n  column: name\n"
    run = resolve(load_ingest_yaml(write_yaml(tmp_path, body)))
    assert run.config.label_policy == "passthrough"
    assert run.config.data_id_strategy == "column"
    assert run.config.data_id_column == "name"


# --- e2e + template equivalence ----------------------------------------


def test_yaml_drives_ingest_end_to_end(spark, tmp_path, csv_source):
    body = BASE.format(csv=csv_source) + f"warehouse: {tmp_path}/wh\n"
    s = run_from_yaml(spark, write_yaml(tmp_path, body))
    assert s.inserted == 2 and not s.has_failures
    out = spark.read.parquet(str(tmp_path / "wh" / "t_yaml"))
    assert out.count() == 2


def test_template_equivalence(spark, tmp_path, csv_source):
    """YAML-driven and hand-constructed runs produce identical tables
    (modulo run timestamps and the table path)."""
    body = BASE.format(csv=csv_source) + f"warehouse: {tmp_path}/wh_yaml\n"
    run_from_yaml(spark, write_yaml(tmp_path, body))

    cfg = ResolvedConfig(
        table_name="t_yaml",
        category="tabular_classification",
        schema={"age": "INT", "name": "VARCHAR(50)"},
        label_column="target",
        label_policy="bucket",
        ingestor_id="tabular_classification_t_yaml",
    )
    Ingestor(spark, cfg, str(tmp_path / "wh_hand" / "t_yaml")).ingest(csv_source)

    a = spark.read.parquet(str(tmp_path / "wh_yaml" / "t_yaml"))
    b = spark.read.parquet(str(tmp_path / "wh_hand" / "t_yaml"))
    drop = ["created_at", "updated_at"]
    assert sorted(a.columns) == sorted(b.columns)
    ra = sorted(map(str, a.drop(*drop).collect()))
    rb = sorted(map(str, b.drop(*drop).collect()))
    assert ra == rb


def test_image_category_yaml_with_files(spark, tmp_path):
    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    # a minimal real JPEG header: the image battery is fail-loud now
    # (pure-python header parse), so fixtures must be decodable
    (src / "images" / "a.jpg").write_bytes(
        b"\xff\xd8"
        + b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + (32).to_bytes(2, "big") + (32).to_bytes(2, "big") + b"\x01\x11\x00"
    )
    dest = tmp_path / "dest"
    dest.mkdir()
    csv = tmp_path / "m.csv"
    csv.write_text("filename,target\na,cat\nmissing,dog\n")
    body = f"""\
    apiVersion: spark-ingest/v1
    kind: IngestConfig
    category: image_classification
    table: t_img
    intent: train
    csv: {csv}
    schema:
      filename: VARCHAR(255)
    label: target
    src: {src}
    dest: {dest}
    extension: .jpg
    warehouse: {tmp_path}/wh
    """
    s = run_from_yaml(spark, write_yaml(tmp_path, body))
    assert s.inserted == 1 and s.file_transfer_failures == 1
    assert (dest / "a.jpg").exists()


def test_cli_rollup_refresh_and_read(spark, tmp_path, capsys):
    """`cli rollup refresh/compact/read` drives the continuous
    aggregate from the command surface."""
    import datetime as dt

    from data_ingestors_spark.cli.frontend import main

    rows = [(i, dt.datetime(2024, 1, 1, i % 2), 1, "view", float(i), "{}") for i in range(6)]
    src = str(tmp_path / "events_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(src)
    store = str(tmp_path / "store")

    assert main(["rollup", "refresh", src, store]) == 0
    assert "refreshed 2 bucket(s)" in capsys.readouterr().out
    assert main(["rollup", "compact", store]) == 0
    capsys.readouterr()
    assert main(["rollup", "read", store]) == 0
    out = capsys.readouterr().out
    assert "2024-01-01-00" in out and "avg_value" in out
    assert main(["rollup", "refresh", src]) == 2  # bad arity -> usage
