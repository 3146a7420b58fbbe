"""ingest.yaml v1 schema (draft-07), the declarative frontend contract.

Modeled on the reference's ``schema/ingest.v1.json``: customers
describe the dataset (category / table / intent / source / schema /
label) and convention defaults fill in the rest. Differences are
engine-honest: the table lands at a warehouse path (parquet/Delta
layout) instead of cluster-internal MySQL, sidecar directories live
under one ``src`` root (the framework's images/ annotations/ masks/
texts/ sequences/ convention), and ``parquet`` is a first-class source
format alongside csv/json.
"""

_EXPECTATIONS_SCHEMA = {
    "type": "array",
    "items": {
        "type": "object",
        "additionalProperties": False,
        "properties": {
            "column": {"type": "string", "minLength": 1},
            "checks": {
                "type": "array",
                "items": {"type": "string", "enum": ["not_null", "unique"]},
            },
            "accepted_values": {"type": "array", "minItems": 1},
            "between": {
                "type": "array",
                "items": {"type": "number"},
                "minItems": 2,
                "maxItems": 2,
            },
            "matches": {"type": "string", "minLength": 1},
            "expression": {"type": "string", "minLength": 1},
        },
    },
}

CATEGORIES = [
    "image_classification",
    "object_detection",
    "keypoint_detection",
    "semantic_segmentation",
    "instance_segmentation",
    "text_classification",
    "token_classification",
    "tabular_classification",
    "tabular_regression",
    "time_series_forecasting",
    "time_to_event_prediction",
    "masked_language_modeling",
]

INGEST_V1 = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "title": "spark-ingest IngestConfig (v1)",
    "type": "object",
    "additionalProperties": False,
    "required": ["apiVersion", "kind", "category", "table", "intent"],
    "properties": {
        "apiVersion": {"const": "spark-ingest/v1"},
        "kind": {"const": "IngestConfig"},
        "category": {"type": "string", "enum": CATEGORIES},
        "table": {"type": "string", "minLength": 1, "maxLength": 64},
        "intent": {"type": "string", "enum": ["train", "test"]},
        # source — exactly one of csv / json / parquet / orc (oneOf below)
        "csv": {"type": "string", "minLength": 1},
        "json": {"type": "string", "minLength": 1},
        "parquet": {"type": "string", "minLength": 1},
        "orc": {"type": "string", "minLength": 1},
        # declared column types for tabular-ish sources
        "schema": {
            "type": "object",
            "minProperties": 1,
            "additionalProperties": {"type": "string", "minLength": 1},
        },
        # label: string shorthand or object form with a policy
        "label": {
            "oneOf": [
                {"type": "string", "minLength": 1},
                {
                    "type": "object",
                    "additionalProperties": False,
                    "required": ["column"],
                    "properties": {
                        "column": {"type": "string", "minLength": 1},
                        "policy": {"type": "string", "enum": ["passthrough", "bucket"]},
                    },
                },
            ]
        },
        "data_id": {
            "type": "object",
            "additionalProperties": False,
            "required": ["strategy"],
            "properties": {
                "strategy": {"type": "string", "enum": ["uuid", "column"]},
                "column": {"type": "string", "minLength": 1},
            },
        },
        # file-bearing categories: source tree root + copy destination
        "src": {"type": "string", "minLength": 1},
        "dest": {"type": "string", "minLength": 1},
        "extension": {"type": "string", "pattern": r"^\.[A-Za-z0-9]+$"},
        # category-battery parameters (reference config surface)
        "target_size": {
            "type": "array",
            "items": {"type": "integer", "minimum": 1},
            "minItems": 2,
            "maxItems": 2,
        },
        "number_of_keypoints": {"type": "integer", "minimum": 1},
        "time_column": {"type": "string", "minLength": 1},
        # where the table lands (parquet layout); default warehouse/<table>
        "warehouse": {"type": "string", "minLength": 1},
        "spec": {
            "type": "object",
            "additionalProperties": False,
            "properties": {
                "batch_size": {"type": "integer", "minimum": 1},
                "ingestor_id": {"type": "string", "minLength": 1},
                "lock_dir": {"type": "string", "minLength": 1},
                # declarative data expectations (dbt-test style);
                # any violation fails the ingest with counts + samples.
                # `expectations` run on the SOURCE frame;
                # `post_expectations` on the transformed frame (post
                # conformance/processors/label mapping).
                "expectations": _EXPECTATIONS_SCHEMA,
                "post_expectations": _EXPECTATIONS_SCHEMA,
                # T8: declared processors, applied in order (unlike the
                # reference, which accepts-but-skips them)
                "processors": {
                    "type": "array",
                    "items": {
                        "oneOf": [
                            {"type": "string", "minLength": 1},
                            {
                                "type": "object",
                                "additionalProperties": False,
                                "required": ["function"],
                                "properties": {
                                    "function": {"type": "string", "minLength": 1},
                                    "args": {"type": "object"},
                                },
                            },
                        ]
                    },
                },
                "csv_options": {
                    "type": "object",
                    "additionalProperties": False,
                    "properties": {
                        "delimiter": {"type": "string", "minLength": 1, "maxLength": 1},
                        "sep": {"type": "string", "minLength": 1, "maxLength": 1},
                        "quotechar": {"type": "string", "minLength": 1, "maxLength": 1},
                        "escapechar": {"type": "string", "maxLength": 1},
                        "encoding": {"type": "string", "minLength": 1},
                        "decimal": {"type": "string", "enum": [".", ","]},
                        # quoted embedded newlines; costs intra-file
                        # split parallelism (one task per file)
                        "multiline": {"type": "boolean"},
                    },
                },
                "api": {
                    "type": "object",
                    "additionalProperties": False,
                    "properties": {
                        "endpoint": {"type": "string", "minLength": 1},
                        "token": {"type": "string", "minLength": 1},
                        "client_id": {"type": "string"},
                        "client_password": {"type": "string"},
                    },
                    "required": ["endpoint"],
                },
            },
        },
    },
    "oneOf": [
        {
            "required": [fmt],
            "not": {
                "anyOf": [
                    {"required": [other]}
                    for other in ("csv", "json", "parquet", "orc")
                    if other != fmt
                ]
            },
        }
        for fmt in ("csv", "json", "parquet", "orc")
    ],
    # file-bearing categories need src+dest (conditional requirement,
    # mirroring the reference's per-category if/then blocks)
    "allOf": [
        {
            "if": {
                "properties": {
                    "category": {
                        "enum": [
                            "image_classification",
                            "object_detection",
                            "keypoint_detection",
                            "semantic_segmentation",
                            "instance_segmentation",
                            "text_classification",
                            "token_classification",
                            "masked_language_modeling",
                        ]
                    }
                }
            },
            "then": {"required": ["src", "dest"]},
        },
        {
            "if": {
                "properties": {
                    "category": {
                        "enum": [
                            "tabular_classification",
                            "tabular_regression",
                            "time_series_forecasting",
                            "time_to_event_prediction",
                        ]
                    }
                }
            },
            "then": {"required": ["schema"]},
        },
    ],
}
