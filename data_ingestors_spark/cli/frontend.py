"""Declarative YAML frontend: ingest.yaml → ResolvedConfig.

The reference's entry point #1 (tracebloc_ingestor/cli/run.py:73-166 +
cli/conventions.py:190-302): parse YAML, jsonschema-validate with
actionable error paths, then a pure I/O-free resolver that fills
convention defaults so a YAML-driven run is equivalent to a
hand-constructed ``ResolvedConfig`` run (the template-equivalence
contract, tests/test_template_equivalence.py:1-50).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml

try:
    import jsonschema

    _HAVE_JSONSCHEMA = True
except Exception:  # pragma: no cover - baked into this container
    _HAVE_JSONSCHEMA = False

from data_ingestors_spark.cli.schema import INGEST_V1
from data_ingestors_spark.ingest.config import ResolvedConfig


class IngestConfigError(ValueError):
    """ingest.yaml failed to parse, validate, or resolve."""


@dataclass
class ResolvedRun:
    """A ResolvedConfig plus the run-scoped paths the engine needs."""

    config: ResolvedConfig
    source_path: str
    target_path: str
    api: dict[str, Any] = field(default_factory=dict)


def load_ingest_yaml(path: str) -> dict:
    """Read + parse + validate one ingest.yaml; all error classes get
    one clear message (run.py:88-106 behavior)."""
    if not os.path.isfile(path):
        raise IngestConfigError(f"ingest config not found: {path}")
    try:
        raw = yaml.safe_load(open(path, encoding="utf-8").read())
    except yaml.YAMLError as e:
        raise IngestConfigError(f"ingest.yaml is not valid YAML:\n  {e}") from e
    if not isinstance(raw, dict):
        raise IngestConfigError(
            "ingest.yaml must be a mapping at the top level (apiVersion / kind / ...)"
        )
    validate_config(raw)
    return raw


def validate_config(raw: dict) -> None:
    """jsonschema validation with per-error YAML paths in the message."""
    if not _HAVE_JSONSCHEMA:  # pragma: no cover
        return
    validator = jsonschema.Draft7Validator(INGEST_V1)
    errors = sorted(validator.iter_errors(raw), key=lambda e: list(e.absolute_path))
    if errors:
        lines = []
        for e in errors:
            where = ".".join(str(p) for p in e.absolute_path) or "(top level)"
            lines.append(f"  {where}: {e.message}")
        raise IngestConfigError("ingest.yaml validation failed:\n" + "\n".join(lines))


_FORMAT_KEYS = ("csv", "json", "parquet", "orc")


def resolve(raw: dict) -> ResolvedRun:
    """Pure resolver (conventions.py:190-302): validated dict →
    ResolvedRun with convention defaults filled in."""
    category = raw["category"]
    fmt = next(k for k in _FORMAT_KEYS if k in raw)

    label = raw.get("label")
    if isinstance(label, str):
        label_column, label_policy = label, "passthrough"
    elif isinstance(label, dict):
        label_column = label["column"]
        label_policy = label.get("policy", "passthrough")
    else:
        label_column, label_policy = None, "passthrough"

    data_id = raw.get("data_id") or {}
    strategy = data_id.get("strategy", "uuid")
    if strategy == "column" and "column" not in data_id:
        raise IngestConfigError("data_id.strategy=column requires data_id.column")

    spec = raw.get("spec") or {}
    tabular = category in (
        "tabular_classification",
        "tabular_regression",
        "time_series_forecasting",
        "time_to_event_prediction",
    )

    cfg = ResolvedConfig(
        table_name=raw["table"],
        category=category,
        data_format=fmt,
        schema=dict(raw.get("schema") or {}),
        label_column=label_column,
        label_policy=label_policy,
        data_id_strategy=strategy,
        data_id_column=data_id.get("column"),
        data_intent=raw["intent"],
        ingestor_id=spec.get("ingestor_id", f"{category}_{raw['table']}"),
        batch_size=spec.get("batch_size", 4000),
        tabular=tabular,
        src_path=raw.get("src"),
        dest_path=raw.get("dest"),
        extension=raw.get("extension", ""),
        lock_dir=spec.get("lock_dir"),
        csv_options=dict(spec.get("csv_options") or {}),
        target_size=tuple(raw["target_size"]) if raw.get("target_size") else None,
        number_of_keypoints=raw.get("number_of_keypoints"),
        time_column=raw.get("time_column"),
        processors=tuple(spec.get("processors") or ()),
        expectations=tuple(spec.get("expectations") or ()),
        post_expectations=tuple(spec.get("post_expectations") or ()),
    )

    warehouse = raw.get("warehouse", "warehouse")
    return ResolvedRun(
        config=cfg,
        source_path=raw[fmt],
        target_path=os.path.join(warehouse, raw["table"]),
        api=dict(spec.get("api") or {}),
    )


def run_from_yaml(spark, path: str):
    """Build and run the ingest described by one ingest.yaml; returns
    the IngestionSummary (the CLI shell around this converts failures
    to exit codes — run.py:146-166)."""
    from data_ingestors_spark.ingest.pipeline import Ingestor

    raw = load_ingest_yaml(path)
    run = resolve(raw)
    sink = None
    if run.api:
        from data_ingestors_spark.api.client import HttpApiSink

        sink = HttpApiSink(
            run.api["endpoint"],
            token=run.api.get("token"),
            client_id=run.api.get("client_id"),
            client_password=run.api.get("client_password"),
        )
    ingestor = Ingestor(spark, run.config, run.target_path, api_sink=sink)
    return ingestor.ingest(run.source_path)


def main(argv: list[str] | None = None) -> int:
    """Console entry point: ``python -m data_ingestors_spark.cli
    [path]`` or INGEST_CONFIG env (run.py:73-166). Second form:
    ``python -m data_ingestors_spark.cli query <warehouse_dir> <sql>``
    runs SQL against the ingested tables (catalog views)."""
    import sys

    args = list(argv if argv is not None else sys.argv[1:])
    if args and args[0] == "refresh":
        if len(args) != 3:
            print(
                "usage: python -m data_ingestors_spark.cli refresh "
                "<store_dir> <batch_parquet>",
                file=sys.stderr,
            )
            return 2
        from data_ingestors_spark.ingest.refresh import refresh_corpus
        from data_ingestors_spark.session import get_spark

        try:
            spark = get_spark("refresh-cli")
            summary = refresh_corpus(spark, args[1], args[2])
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        import json as _json

        print(_json.dumps(summary, default=str))
        return 0
    if args and args[0] == "profile":
        if len(args) != 3:
            print(
                "usage: python -m data_ingestors_spark.cli profile <warehouse_dir> <table>",
                file=sys.stderr,
            )
            return 2
        from data_ingestors_spark import catalog
        from data_ingestors_spark.profile import profile
        from data_ingestors_spark.session import get_spark

        try:
            spark = get_spark("profile-cli")
            catalog.attach(spark, args[1])
            result = profile(spark.table(args[2]))
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        result.show(500, truncate=False)
        return 0
    if args and args[0] == "quantiles":
        if len(args) != 4:
            print(
                "usage: python -m data_ingestors_spark.cli quantiles "
                "<warehouse_dir> <table> <column>",
                file=sys.stderr,
            )
            return 2
        from data_ingestors_spark import catalog
        from data_ingestors_spark.profile import column_quantiles
        from data_ingestors_spark.session import get_spark

        try:
            spark = get_spark("quantiles-cli")
            catalog.attach(spark, args[1])
            result = column_quantiles(spark.table(args[2]), args[3])
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        result.show(100, truncate=False)
        return 0
    if args and args[0] == "rollup":
        usage = (
            "usage: python -m data_ingestors_spark.cli rollup "
            "refresh <events_parquet> <store> | compact <store> | read <store>"
        )
        if len(args) < 3:
            print(usage, file=sys.stderr)
            return 2
        sub = args[1]
        # validate arity BEFORE booting a SparkSession (same pattern
        # as profile/query/doctor)
        if (sub == "refresh" and len(args) != 4) or (
            sub in ("compact", "read") and len(args) != 3
        ):
            print(usage, file=sys.stderr)
            return 2
        from data_ingestors_spark.operators.rollup import (
            compact_rollup,
            read_rollup,
            rollup_upsert,
        )
        from data_ingestors_spark.session import get_spark

        try:
            spark = get_spark("rollup-cli")
            if sub == "refresh":
                batch = spark.read.parquet(args[2])
                touched = rollup_upsert(spark, batch, args[3])
                print(f"refreshed {touched} bucket(s)")
                return 0
            if sub == "compact":
                compact_rollup(spark, args[2])
                print("compacted")
                return 0
            if sub == "read":
                read_rollup(spark, args[2]).orderBy("bucket").show(100, truncate=False)
                return 0
            print(usage, file=sys.stderr)
            return 2
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    if args and args[0] in ("query", "doctor"):
        cmd = args[0]
        if len(args) != 3:
            print(
                f"usage: python -m data_ingestors_spark.cli {cmd} <warehouse_dir> <sql>",
                file=sys.stderr,
            )
            return 2
        from data_ingestors_spark import catalog
        from data_ingestors_spark.session import get_spark

        try:
            result = catalog.sql(get_spark(f"{cmd}-cli"), args[1], args[2])
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        if cmd == "doctor":
            from data_ingestors_spark.doctor import diagnose

            findings = diagnose(result)
            if findings:
                for f in findings:
                    print(f)
                return 1
            print("plan clean: no scale hazards found")
            return 0
        result.show(100, truncate=False)
        return 0
    path = args[0] if args else os.environ.get("INGEST_CONFIG")
    if not path:
        print("usage: python -m data_ingestors_spark.cli <ingest.yaml> "
              "(or set INGEST_CONFIG)", file=sys.stderr)
        return 2
    try:
        from data_ingestors_spark.session import get_spark

        summary = run_from_yaml(get_spark("ingest-cli"), path)
    except IngestConfigError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    except Exception as e:
        print(f"\nIngestion failed: {e}", file=sys.stderr)
        return 1
    print(summary.report())
    return 1 if summary.has_failures else 0
