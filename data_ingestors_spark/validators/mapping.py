"""Category → validator-battery dispatch, mirroring the reference's
``utils/validators_mapping.py:30-236`` matrix (SURVEY.md §2.4 tail):

- every category: table-name sanity + destination duplicate check;
- tabular adds the full column battery (V1);
- time-series adds V2-V5 then V1-minus-timestamp;
- time-to-event adds V6 + V1;
- image classification adds file-type + resolution;
- object detection adds image/xml file-type, VOC XML, pairing,
  resolution; semantic segmentation pairs with '_mask' suffix;
- keypoint adds the keypoint/visibility JSON rules;
- text/token classification add txt file-type (+ optional tokenizer);
  MLM makes the tokenizer mandatory.

Each entry is a callable (spark, ctx) -> ValidationResult where ctx is
a dict with the run's paths/schema — keeps the battery composable and
the whole tabular battery still folds into ONE aggregation pass.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_ingestors_spark.validators.base import ValidationResult
from data_ingestors_spark.validators.files import (
    validate_bio_labels,
    validate_file_pairing,
    validate_file_types,
    validate_image_resolution,
    validate_tokenizer,
    validate_voc_xml,
)
from data_ingestors_spark.validators.keypoints import validate_keypoints
from data_ingestors_spark.validators.rules import validate_schema_single_pass
from data_ingestors_spark.validators.timeseries import (
    validate_numeric_columns,
    validate_time_format,
    validate_time_ordered,
    validate_time_ordered_scalable,
    validate_time_before_today,
    validate_time_to_event,
)

TABLE_NAME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]*$")

# Reserved-keyword warn list (table_name_validator.py:44-281 keeps
# ~120 entries). This is the MySQL 8 / ANSI reserved-word union —
# public knowledge, independently assembled.
SQL_KEYWORDS = frozenset(
    """accessible add all alter analyze and as asc asensitive before
    between bigint binary blob both by call cascade case change char
    character check collate column condition constraint continue convert
    create cross cube cume_dist current_date current_time
    current_timestamp current_user cursor database databases date day
    dayofmonth dec decimal declare default delayed delete dense_rank desc
    describe deterministic distinct distinctrow div double drop dual each
    else elseif enclosed escaped except exists exit explain false fetch
    first_value float for force foreign from fulltext function generated
    get grant group grouping groups having high_priority hour if ignore
    in index infile inner inout insensitive insert int integer interval
    into is iterate join json_table key keys kill lag last_value lateral
    lead leading leave left like limit linear lines load localtime
    localtimestamp lock long loop low_priority match maxvalue mediumint
    merge minute mod modifies natural not null nullif numeric ntile of on
    optimize option optionally or order out outer outfile over partition
    percent_rank precision primary procedure purge range rank read reads
    real recursive references regexp release rename repeat replace
    require resignal restrict return revoke right rlike row row_number
    rows schema schemas second select sensitive separator set show
    signal smallint spatial specific sql sqlexception sqlstate sqlwarning
    ssl starting stored straight_join system table terminated then
    tinyint to trailing trigger true undo union unique unlock unsigned
    update usage use using utc_date utc_time utc_timestamp values
    varbinary varchar varying virtual when where while window with
    write xor year year_month zerofill""".split()
)

Validator = Callable[[SparkSession, dict[str, Any]], ValidationResult]


def v_table_name(spark: SparkSession, ctx: dict[str, Any]) -> ValidationResult:
    name = ctx["config"].table_name
    if not TABLE_NAME_RE.match(name):
        return ValidationResult(False, errors=[f"invalid table name: {name!r}"])
    warnings = [f"table name {name!r} is a SQL keyword"] if name.lower() in SQL_KEYWORDS else []
    return ValidationResult(True, warnings=warnings)


def v_destination_duplicate(spark: SparkSession, ctx: dict[str, Any]) -> ValidationResult:
    """Destination must not already hold data (duplicate_validator.py:
    45-128); empty dir = warn + reuse."""
    dest = ctx.get("dest_path")
    if not dest or not os.path.exists(dest):
        return ValidationResult(True)
    if os.path.isdir(dest) and not os.listdir(dest):
        return ValidationResult(True, warnings=[f"destination {dest} exists but is empty; reusing"])
    return ValidationResult(False, errors=[f"destination already exists and is non-empty: {dest}"])


def v_columns(spark, ctx):
    return validate_schema_single_pass(ctx["df"], ctx["config"].schema)


def v_columns_minus_ts(spark, ctx):
    schema = {k: v for k, v in ctx["config"].schema.items() if k != ctx.get("ts_col", "timestamp")}
    return validate_schema_single_pass(ctx["df"], schema)


def _files(sub: str, ext: str) -> Validator:
    def v(spark, ctx):
        return validate_file_types(spark, os.path.join(ctx["src_path"], sub), ext)

    return v


def _pairing(primary: str, sidecar: str, suffix: str = "") -> Validator:
    def v(spark, ctx):
        return validate_file_pairing(
            spark,
            os.path.join(ctx["src_path"], primary),
            os.path.join(ctx["src_path"], sidecar),
            sidecar_suffix=suffix,
        )

    return v


def _resolution(sub: str = "images") -> Validator:
    def v(spark, ctx):
        return validate_image_resolution(
            spark, os.path.join(ctx["src_path"], sub), ctx.get("target_size")
        )

    return v


def _voc(sub: str = "annotations") -> Validator:
    def v(spark, ctx):
        return validate_voc_xml(spark, os.path.join(ctx["src_path"], sub))

    return v


def _tokenizer(mandatory: bool) -> Validator:
    def v(spark, ctx):
        return validate_tokenizer(ctx["src_path"], mandatory=mandatory)

    return v


def _keypoints(spark, ctx):
    return validate_keypoints(
        ctx["df"],
        ann_col=ctx.get("annotation_col", "annotation"),
        vis_col=ctx.get("visibility_col"),
        n_keypoints=ctx.get("n_keypoints"),
    )


def _bio(spark, ctx):
    return validate_bio_labels(spark, ctx["df"], os.path.join(ctx["src_path"], "texts"))


def _ts_checks(spark, ctx):
    col = ctx.get("ts_col", "timestamp")
    df = ctx["df"]
    out = validate_time_format(df, col, ctx["config"].schema)
    # scalable form: per-partition windows + boundary merge (identical
    # result on single-partition input, parallel on multi-split files)
    out = out.merge(validate_time_ordered_scalable(df, col))
    out = out.merge(validate_time_before_today(df, col))
    return out.merge(validate_numeric_columns(df, exclude=[col]))


def _tte(spark, ctx):
    return validate_time_to_event(ctx["df"], ctx.get("time_col", "time")).merge(
        validate_schema_single_pass(ctx["df"], ctx["config"].schema)
    )


_SEGMENTATION = [
    _files("images", "jpg"),
    _files("masks", "png"),
    _pairing("images", "masks", suffix="_mask"),
    _resolution(),
]

CATEGORY_VALIDATORS: dict[str, list[Validator]] = {
    "tabular_classification": [v_columns],
    "tabular_regression": [v_columns],
    "time_series_forecasting": [_ts_checks, v_columns_minus_ts],
    "time_to_event_prediction": [_tte],
    "image_classification": [_files("images", "jpg"), _resolution()],
    "object_detection": [
        _files("images", "jpg"),
        _files("annotations", "xml"),
        _voc(),
        _pairing("images", "annotations"),
        _resolution(),
    ],
    "semantic_segmentation": _SEGMENTATION,
    # no reference template exists for instance segmentation; it
    # mirrors semantic (conventions.py:111)
    "instance_segmentation": _SEGMENTATION,
    "keypoint_detection": [_files("images", "jpg"), _resolution(), _keypoints],
    "text_classification": [_files("texts", "txt"), _tokenizer(mandatory=False)],
    "token_classification": [_files("texts", "txt"), _bio, _tokenizer(mandatory=False)],
    "masked_language_modeling": [_files("sequences", "txt"), _tokenizer(mandatory=True)],
}

# Categories whose battery validates SOURCE ROW ORDER (V4 time-ordered
# runs over scan-partition arrival order): the ingest pipeline must NOT
# repartition the raw frame before this battery, or the order signal is
# destroyed.
ORDER_SENSITIVE_CATEGORIES = frozenset({"time_series_forecasting"})

# Categories whose battery already includes the full column battery —
# for the rest, a declared schema still gets the single-pass check.
_COLUMN_COVERED = frozenset(
    {
        "tabular_classification",
        "tabular_regression",
        "time_series_forecasting",
        "time_to_event_prediction",
    }
)


def validators_for(category: str, *, has_schema: bool = False) -> list[Validator]:
    """Battery for a category; every category ends with the common
    table-name + destination checks (validators_mapping.py pattern)."""
    specific = list(CATEGORY_VALIDATORS.get(category, []))
    if has_schema and category not in _COLUMN_COVERED:
        specific.append(v_columns)
    return [*specific, v_table_name, v_destination_duplicate]


def run_battery(spark: SparkSession, category: str, ctx: dict[str, Any]) -> ValidationResult:
    has_schema = bool(ctx.get("config") and ctx["config"].schema)
    out = ValidationResult(True)
    for v in validators_for(category, has_schema=has_schema):
        out = out.merge(v(spark, ctx))
    return out
