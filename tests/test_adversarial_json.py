"""Adversarial JSON ingestion — the T7 per-record verdict battery
(reference json_ingestor.py:77-181) under the same contract as the CSV
harness: ingest faithfully or fail with a clear, actionable error.
Never silently truncate, coerce, or drop."""

from __future__ import annotations

import json

import pytest

from data_ingestors_spark.ingest import Ingestor, ResolvedConfig


def run_json(spark, tmp_path, records_or_text, schema, *, name="advj", **cfg_over):
    p = tmp_path / f"{name}.json"
    if isinstance(records_or_text, str):
        p.write_text(records_or_text)
    else:
        p.write_text("\n".join(json.dumps(r) for r in records_or_text))
    cfg = ResolvedConfig(
        table_name=f"t_{name}", schema=schema, data_format="json", **cfg_over
    )
    ing = Ingestor(spark, cfg, str(tmp_path / f"t_{name}"))
    return ing.ingest(str(p)), str(tmp_path / f"t_{name}")


def rows(spark, path):
    from data_ingestors_spark.io.writers import read_table

    return read_table(spark, path).collect()


def test_int_non_integral_is_error_not_truncation(spark, tmp_path):
    # 3.5 must NOT become 3 (json_ingestor.py INT integral check)
    with pytest.raises(ValueError, match="(?i)non_integer|integral|validation"):
        run_json(spark, tmp_path, [{"a": 3.5}], {"a": "INT"})


def test_int_float_typed_integral_accepted(spark, tmp_path):
    s, t = run_json(spark, tmp_path, [{"a": 3.0}, {"a": 7}], {"a": "INT"}, name="fint")
    assert s.inserted == 2 and not s.has_failures
    assert sorted(r.a for r in rows(spark, t)) == [3, 7]


def test_bool_numeric_coercibles(spark, tmp_path):
    # the reference's BOOL vocab includes numeric-coercible "00"/"1e0".
    # distinct `i` keeps content-hash data_ids distinct (T4: identical
    # rows legitimately merge in the upsert)
    recs = [
        {"i": 1, "b": "1e0"},
        {"i": 2, "b": "00"},
        {"i": 3, "b": True},
        {"i": 4, "b": "no"},
    ]
    s, t = run_json(spark, tmp_path, recs, {"i": "INT", "b": "BOOL"}, name="bools")
    assert s.inserted == 4 and not s.has_failures
    got = {r.i: r.b for r in rows(spark, t)}
    assert got == {1: True, 2: False, 3: True, 4: False}


def test_bool_garbage_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="(?i)bool|vocab|validation"):
        run_json(spark, tmp_path, [{"b": "definitely"}], {"b": "BOOL"}, name="boolbad")


def test_nested_object_in_scalar_column_is_error(spark, tmp_path):
    # non-scalar reject: a dict where a VARCHAR belongs
    with pytest.raises(Exception, match="(?i)scalar|struct|malformed|cannot|validation"):
        run_json(
            spark, tmp_path, '{"v": {"nested": 1}}\n', {"v": "VARCHAR(20)"}, name="nest"
        )


def test_huge_number_in_float_column(spark, tmp_path):
    # 1e400 overflows double: must be loud, not silent inf
    with pytest.raises(Exception, match="(?i)finite|overflow|inf|malformed|validation"):
        run_json(spark, tmp_path, '{"x": 1e400}\n', {"x": "FLOAT"}, name="huge")


def test_varchar_length_enforced(spark, tmp_path):
    with pytest.raises(ValueError, match="(?i)length|validation"):
        run_json(spark, tmp_path, [{"v": "toolongvalue"}], {"v": "VARCHAR(4)"}, name="len")


def test_missing_key_is_null_not_error(spark, tmp_path):
    # JSON records legitimately omit keys; omitted != malformed
    s, t = run_json(
        spark, tmp_path, [{"a": 1, "v": "x"}, {"a": 2}], {"a": "INT", "v": "VARCHAR(8)"},
        name="mkey",
    )
    assert s.inserted == 2 and not s.has_failures
    got = {r.a: r.v for r in rows(spark, t)}
    assert got == {1: "x", 2: None}


def test_datetime_unparseable_is_error(spark, tmp_path):
    with pytest.raises(ValueError, match="(?i)parse|datetime|date|validation"):
        run_json(spark, tmp_path, [{"d": "not-a-date"}], {"d": "DATETIME"}, name="dt")


def test_datetime_iso_roundtrip(spark, tmp_path):
    s, t = run_json(
        spark, tmp_path, [{"d": "2024-03-01 12:30:00"}], {"d": "DATETIME"}, name="dtok"
    )
    assert s.inserted == 1
    assert str(rows(spark, t)[0].d) == "2024-03-01 12:30:00"


def test_unicode_text_roundtrip(spark, tmp_path):
    recs = [{"v": "müller–łódź"}, {"v": "日本語テキスト"}]
    s, t = run_json(spark, tmp_path, recs, {"v": "VARCHAR(40)"}, name="uni")
    assert s.inserted == 2
    assert {r.v for r in rows(spark, t)} == {"müller–łódź", "日本語テキスト"}
