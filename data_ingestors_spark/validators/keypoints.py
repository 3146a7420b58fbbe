"""Keypoint annotation validators (SURVEY.md V13/V14) — fully
columnar: the reference parses each row's JSON with Python
(keypoint_annotation_validator.py:104-167); here ``from_json`` into
typed maps + higher-order functions do it inside codegen.

Annotation column: JSON object {kp_name: [x, y]}.
Visibility column: JSON object {kp_name: 0|1}; key set must equal the
annotation key set per row; cross-row key-set consistency is
``countDistinct(sorted key set) == 1``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestors_spark.validators.base import ValidationResult

_KP_SCHEMA = T.MapType(T.StringType(), T.ArrayType(T.DoubleType()))
_VIS_SCHEMA = T.MapType(T.StringType(), T.IntegerType())


def keypoint_check_cols(ann_col: str, n_keypoints: int | None) -> dict[str, Column]:
    kp = F.from_json(F.col(ann_col), _KP_SCHEMA)
    vals = F.map_values(kp)
    bad_parse = F.col(ann_col).isNotNull() & kp.isNull()
    bad_count = (
        kp.isNotNull() & (F.size(F.map_keys(kp)) != F.lit(n_keypoints))
        if n_keypoints is not None
        else F.lit(False)
    )
    # each kp must be [x, y], numeric, non-negative
    bad_point = kp.isNotNull() & F.exists(
        vals,
        lambda p: (F.size(p) != 2)
        | p[0].isNull()
        | p[1].isNull()
        | (p[0] < 0)
        | (p[1] < 0),
    )
    xs = F.transform(vals, lambda p: p[0])
    ys = F.transform(vals, lambda p: p[1])
    degenerate = kp.isNotNull() & (
        (F.size(F.array_distinct(xs)) < 2) | (F.size(F.array_distinct(ys)) < 2)
    )
    keyset = F.to_json(F.array_sort(F.map_keys(kp)))
    return {
        "kp_unparseable": F.sum(F.when(bad_parse, 1).otherwise(0)),
        "kp_wrong_count": F.sum(F.when(bad_count, 1).otherwise(0)),
        "kp_bad_point": F.sum(F.when(bad_point, 1).otherwise(0)),
        "kp_degenerate_bbox": F.sum(F.when(degenerate, 1).otherwise(0)),
        "kp_distinct_keysets": F.countDistinct(keyset),
    }


def visibility_check_cols(ann_col: str, vis_col: str) -> dict[str, Column]:
    kp = F.from_json(F.col(ann_col), _KP_SCHEMA)
    vis = F.from_json(F.col(vis_col), _VIS_SCHEMA)
    bad_parse = F.col(vis_col).isNotNull() & vis.isNull()
    bad_value = vis.isNotNull() & F.exists(
        F.map_values(vis), lambda v: v.isNull() | ~v.isin(0, 1)
    )
    keys_mismatch = (
        kp.isNotNull()
        & vis.isNotNull()
        & (
            (F.size(F.array_except(F.map_keys(kp), F.map_keys(vis))) > 0)
            | (F.size(F.array_except(F.map_keys(vis), F.map_keys(kp))) > 0)
        )
    )
    return {
        "vis_unparseable": F.sum(F.when(bad_parse, 1).otherwise(0)),
        "vis_bad_value": F.sum(F.when(bad_value, 1).otherwise(0)),
        "vis_key_mismatch": F.sum(F.when(keys_mismatch, 1).otherwise(0)),
    }


def validate_keypoints(
    df: DataFrame,
    ann_col: str = "annotation",
    vis_col: str | None = None,
    n_keypoints: int | None = None,
) -> ValidationResult:
    """One aggregation pass over both keypoint rule families."""
    aggs = keypoint_check_cols(ann_col, n_keypoints)
    if vis_col is not None and vis_col in df.columns:
        aggs.update(visibility_check_cols(ann_col, vis_col))
    row = df.agg(*[v.alias(k) for k, v in aggs.items()]).collect()[0].asDict()
    errors = []
    for k, v in row.items():
        if k == "kp_distinct_keysets":
            if v is not None and v > 1:
                errors.append(f"inconsistent keypoint key sets across rows ({v} variants)")
        elif isinstance(v, int) and v > 0:
            errors.append(f"{k}: {v} offending rows")
    return ValidationResult(not errors, errors=errors, metadata=row)
