"""Adversarial ingestion harness — Murphy's-law coverage for raw user
data, ported from the reference's contract
(tests/test_adversarial_ingestion_harness.py:1-40 +
tests/test_i18n_adversarial_csv.py:1-30).

THE CONTRACT each case enforces: for any input the ingestor must
either (1) ingest it faithfully, or (2) fail with a clear, actionable
error naming what is wrong. It must never crash cryptically, silently
corrupt a value, or silently drop rows while reporting success.

``xfail(strict=True)`` marks known gaps: when a gap is fixed the xfail
flips to a suite failure and the marker must be deleted — a
self-updating checklist, not tribal knowledge.
"""

from __future__ import annotations

import pytest

from data_ingestors_spark.ingest import Ingestor, IngestionSummary, ResolvedConfig


def run_csv(spark, tmp_path, content: str, schema, *, encoding="utf-8", raw_bytes=None,
            name="adv", **cfg_over):
    p = tmp_path / f"{name}.csv"
    if raw_bytes is not None:
        p.write_bytes(raw_bytes)
    else:
        p.write_text(content, encoding=encoding, newline="")
    cfg = ResolvedConfig(table_name=f"t_{name}", schema=schema, **cfg_over)
    ing = Ingestor(spark, cfg, str(tmp_path / f"t_{name}"))
    return ing.ingest(str(p)), str(tmp_path / f"t_{name}")


def table_rows(spark, path):
    from data_ingestors_spark.io.writers import read_table
    return read_table(spark, path).collect()


# --- encodings ----------------------------------------------------------


def test_utf8_clean_round_trips(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "name\nmüller\nçağrı\n", {"name": "VARCHAR(50)"})
    assert s.inserted == 2 and not s.has_failures
    assert {r.name for r in table_rows(spark, t)} == {"müller", "çağrı"}


def test_latin1_read_as_utf8_errors_with_offset(spark, tmp_path):
    blob = "name\nmüller\n".encode("latin-1")
    with pytest.raises(ValueError, match="offset"):
        run_csv(spark, tmp_path, "", {"name": "VARCHAR(50)"}, raw_bytes=blob, name="lat1")


def test_latin1_with_correct_encoding_parses(spark, tmp_path):
    blob = "name\nmüller\n".encode("latin-1")
    s, t = run_csv(
        spark, tmp_path, "", {"name": "VARCHAR(50)"}, raw_bytes=blob, name="lat1ok",
        csv_options={"encoding": "ISO-8859-1"},
    )
    assert s.inserted == 1
    assert table_rows(spark, t)[0].name == "müller"


def test_latin1_directory_source_header_honors_encoding(spark, tmp_path):
    """Directory sources must probe the header with the CONFIGURED
    encoding, not spark.read.text's UTF-8 (ADVICE r2: Latin-1 headers
    in a directory source were silently mangled)."""
    from data_ingestors_spark.io.readers import read_csv_header

    d = tmp_path / "lat1dir"
    d.mkdir()
    (d / "part0.csv").write_bytes("straße,wert\na,1\n".encode("latin-1"))
    (d / "part1.csv").write_bytes("straße,wert\nb,2\n".encode("latin-1"))
    names = read_csv_header(spark, str(d), {"encoding": "ISO-8859-1"})
    assert names == ["straße", "wert"]
    # and the UTF-8 default still fails loud with the byte offset
    with pytest.raises(ValueError, match="offset"):
        read_csv_header(spark, str(d), None)


def test_utf8_bom_header_not_mangled(spark, tmp_path):
    blob = "﻿name,age\nalice,3\n".encode("utf-8")
    s, t = run_csv(
        spark, tmp_path, "", {"name": "VARCHAR(50)", "age": "INT"},
        raw_bytes=blob, name="bom",
    )
    assert s.inserted == 1
    row = table_rows(spark, t)[0]
    assert row.name == "alice" and row.age == 3  # header "name", not "﻿name"


def test_utf16_read_as_utf8_is_loud(spark, tmp_path):
    blob = "name\nalice\n".encode("utf-16")
    with pytest.raises(ValueError, match="not valid"):
        run_csv(spark, tmp_path, "", {"name": "VARCHAR(50)"}, raw_bytes=blob, name="u16")


# --- structure ----------------------------------------------------------


def test_crlf_line_endings_no_trailing_cr(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "name,age\r\nalice,3\r\nbob,4\r\n",
                   {"name": "VARCHAR(50)", "age": "INT"}, name="crlf")
    assert s.inserted == 2
    assert {r.name for r in table_rows(spark, t)} == {"alice", "bob"}  # no "bob\r"


def test_quoted_embedded_comma_preserved(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, 'name,age\n"Doe, Jane",3\n',
                   {"name": "VARCHAR(50)", "age": "INT"}, name="qc")
    assert table_rows(spark, t)[0].name == "Doe, Jane"


def test_quoted_comma_in_header_survives(spark, tmp_path):
    # the biomarker-style header: delimiter inside a quoted header name
    s, t = run_csv(spark, tmp_path, '"P01033|TIMP1","a,b"\n1.5,x\n',
                   {"P01033|TIMP1": "DOUBLE", "a,b": "VARCHAR(10)"}, name="bio")
    row = table_rows(spark, t)[0]
    assert row["P01033|TIMP1"] == 1.5 and row["a,b"] == "x"


def test_ragged_row_is_a_hard_error_not_silent_drop(spark, tmp_path):
    with pytest.raises(Exception):  # FAILFAST surfaces the malformed row
        s, _ = run_csv(spark, tmp_path, "a,b\n1,2\n3,4,5\n",
                       {"a": "INT", "b": "INT"}, name="rag")
        _ = s.inserted


def test_duplicate_headers_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="duplicate column headers"):
        run_csv(spark, tmp_path, "age,age\n1,2\n", {"age": "INT"}, name="dup")


def test_empty_file_clear_error(spark, tmp_path):
    with pytest.raises(ValueError, match="empty source file"):
        run_csv(spark, tmp_path, "", {"a": "INT"}, name="empty")


def test_semicolon_delimiter_with_option_works(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "name;age\nalice;3\n",
                   {"name": "VARCHAR(50)", "age": "INT"}, name="semi",
                   csv_options={"delimiter": ";"})
    row = table_rows(spark, t)[0]
    assert row.name == "alice" and row.age == 3


def test_wrong_delimiter_is_not_silent(spark, tmp_path):
    # semicolon file read with default comma: the declared column can't
    # be found — the error must say so and point at csv_options.
    with pytest.raises(ValueError, match="csv_options"):
        run_csv(spark, tmp_path, "age;name\n3;alice\n", {"age": "INT"}, name="wd")


# --- i18n values --------------------------------------------------------


def test_german_excel_semicolon_and_decimal_comma(spark, tmp_path):
    s, t = run_csv(
        spark, tmp_path, "name;score\nmüller;1,5\nweber;2,25\n",
        {"name": "VARCHAR(50)", "score": "DOUBLE"}, name="de",
        csv_options={"delimiter": ";", "decimal": ","},
    )
    assert s.inserted == 2
    rows = {r.name: r.score for r in table_rows(spark, t)}
    assert rows == {"müller": 1.5, "weber": 2.25}


def test_decimal_comma_without_option_is_an_error_not_corruption(spark, tmp_path):
    # "1,5" in a DOUBLE column without decimal=",": must be a counted
    # validation error (clear), never silently stored as 15 or 1.
    with pytest.raises(ValueError, match="score"):
        run_csv(spark, tmp_path, "name;score\nmüller;1,5\n",
                {"name": "VARCHAR(50)", "score": "DOUBLE"}, name="decfail",
                csv_options={"delimiter": ";"})


def test_decimal_comma_does_not_touch_strings(spark, tmp_path):
    s, t = run_csv(
        spark, tmp_path, "label;score\na,b;1,5\n",
        {"label": "VARCHAR(50)", "score": "DOUBLE"}, name="decstr",
        csv_options={"delimiter": ";", "decimal": ","},
    )
    row = table_rows(spark, t)[0]
    assert row.label == "a,b" and row.score == 1.5


# --- typing faithfulness ------------------------------------------------


def test_varchar_leading_zero_codes_preserved(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "code\n007\n000123\n", {"code": "VARCHAR(10)"},
                   name="zeros")
    assert {r.code for r in table_rows(spark, t)} == {"007", "000123"}


def test_int_scientific_notation_clean(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "n\n1e3\n2\n", {"n": "INT"}, name="sci")
    assert {r.n for r in table_rows(spark, t)} == {1000, 2}


def test_bigint_beyond_double_precision_exact(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "n\n9007199254740993\n", {"n": "BIGINT"}, name="big")
    assert table_rows(spark, t)[0].n == 9007199254740993


def test_bigint_overflow_is_clear_error(spark, tmp_path):
    with pytest.raises(ValueError, match="overflow"):
        run_csv(spark, tmp_path, "n\n99999999999999999999999\n", {"n": "BIGINT"},
                name="ovf")


def test_float_infinity_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="non_numeric"):
        run_csv(spark, tmp_path, "x\ninf\n", {"x": "DOUBLE"}, name="inf")


def test_date_no_spurious_time_component(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "d\n2024-01-02\n", {"d": "DATE"}, name="date")
    assert str(table_rows(spark, t)[0].d) == "2024-01-02"


def test_value_exceeding_varchar_length_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="too_long"):
        run_csv(spark, tmp_path, "v\ntoolongvalue\n", {"v": "VARCHAR(4)"}, name="vlen")


def test_na_tokens_become_null_not_strings(spark, tmp_path):
    # distinct ids per row so the content-hash data_id (documented T4
    # divergence: exact-duplicate rows collapse) keeps all four rows
    s, t = run_csv(spark, tmp_path, "rid,v\n1,NA\n2,NULL\n3,None\n4,ok\n",
                   {"rid": "INT", "v": "VARCHAR(10)"}, name="na")
    vals = {r.rid: r.v for r in table_rows(spark, t)}
    assert vals == {1: None, 2: None, 3: None, 4: "ok"}


# --- identifiers --------------------------------------------------------


def test_reserved_column_collision_clear_error(spark, tmp_path):
    with pytest.raises(ValueError, match="reserved"):
        ResolvedConfig(table_name="t", schema={"data_id": "INT"}).validate()


def test_overlong_column_name_clear_error(spark, tmp_path):
    with pytest.raises(ValueError, match="64"):
        ResolvedConfig(table_name="t", schema={"c" * 65: "INT"}).validate()


def test_special_char_headers_ingest(spark, tmp_path):
    hdr = "P08253;P08253-2|P08253|MMP2"
    s, t = run_csv(
        spark, tmp_path, f'"{hdr}"\n1.5\n', {hdr: "DOUBLE"}, name="spec",
    )
    assert table_rows(spark, t)[0][hdr] == 1.5


# --- i18n edge cases (formerly the strict-xfail gap checklist) ----------


def test_time_fractional_seconds_preserved(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "t\n13:05:00.123\n", {"t": "TIME"}, name="timef")
    assert table_rows(spark, t)[0].t == "13:05:00.123"


def test_time_whole_seconds_still_canonical(spark, tmp_path):
    s, t = run_csv(spark, tmp_path, "t\n9:05:00\n", {"t": "TIME"}, name="timew")
    assert table_rows(spark, t)[0].t == "09:05:00"


def test_german_thousands_separator(spark, tmp_path):
    # German Excel pairs the ';' field separator with decimal comma —
    # with ',' as the field delimiter "1.234,5" is genuinely two fields
    s, t = run_csv(
        spark, tmp_path, "x;y\n1.234,5;ok\n",
        {"x": "DOUBLE", "y": "VARCHAR(5)"}, name="thou",
        csv_options={"sep": ";", "decimal": ","},
    )
    assert table_rows(spark, t)[0].x == 1234.5


def test_german_thousands_separator_no_decimal_part(spark, tmp_path):
    s, t = run_csv(
        spark, tmp_path, "x\n1.234.567\n", {"x": "DOUBLE"}, name="thou2",
        csv_options={"decimal": ","},
    )
    assert table_rows(spark, t)[0].x == 1234567.0


def test_quoted_embedded_newlines_multiline_option(spark, tmp_path):
    """A quoted field containing a newline (legal CSV; the reference's
    pandas reader handles it natively): without the multiline option
    the ingest FAILS LOUDLY (never mis-parses); with
    csv_options.multiline it ingests faithfully."""
    import pyspark.sql.types as T

    from data_ingestors_spark.io.readers import read_csv_source

    p = tmp_path / "m.csv"
    p.write_text('id,note\n1,"line one\nline two"\n2,simple\n')
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("note", T.StringType())]
    )
    with pytest.raises(Exception, match="(?i)failed|malformed|read"):
        read_csv_source(spark, str(p), schema).collect()

    df = read_csv_source(spark, str(p), schema, options={"multiline": True})
    rows = {r.id: r.note for r in df.collect()}
    assert rows == {"1": "line one\nline two", "2": "simple"}
