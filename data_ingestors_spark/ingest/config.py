"""Resolved ingestion plan + framework-column model.

``ResolvedConfig`` mirrors the reference's fully-defaulted run plan
(tracebloc_ingestor/cli/conventions.py:129-183): the logical-plan-like
object the engine compiles into a DataFrame pipeline.

Standard framework columns (database.py:302-321) and the reserved-name
collision guard (database.py:203-215; ``label`` intentionally not
reserved), identifier-length (:221-229) and column-count (:240-248)
guards are enforced at plan validation, driver-side, before any scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Framework columns added to every target table (database.py:302-321).
# Surrogate auto-increment `id` is intentionally dropped: at cluster
# scale a global dense sequence is an anti-pattern; `data_id` is the
# key (SURVEY.md §1.4).
STANDARD_COLUMNS: dict[str, str] = {
    "created_at": "DATETIME",
    "updated_at": "DATETIME",
    "status": "INT",
    "label": "VARCHAR(255)",
    "data_intent": "VARCHAR(100)",
    "data_id": "VARCHAR(255)",
    "filename": "VARCHAR(255)",
    "extension": "VARCHAR(10)",
    "annotation": "TEXT",
    "ingestor_id": "VARCHAR(255)",
}

# `label` is excluded on purpose (users may map onto it).
RESERVED_COLUMNS = frozenset(STANDARD_COLUMNS) - {"label"} | {"id"}

MAX_IDENTIFIER_LEN = 64
MAX_FEATURE_COLUMNS = 4000

VALID_INTENTS = ("train", "test")


@dataclass
class ResolvedConfig:
    table_name: str
    category: str = "tabular_classification"
    data_format: str = "csv"  # csv | json | parquet
    schema: dict[str, str] = field(default_factory=dict)
    label_column: str | None = None
    label_policy: str = "passthrough"  # passthrough | bucket
    data_id_strategy: str = "uuid"  # uuid | column
    data_id_column: str | None = None
    data_intent: str = "train"
    ingestor_id: str = "spark-ingestor"
    batch_size: int = 4000
    tabular: bool = True

    def validate(self) -> None:
        """Fail-fast plan guards — same error classes as the reference
        (database.py:184-297; base.py:242-326)."""
        if self.data_intent not in VALID_INTENTS:
            raise ValueError(
                f"invalid data_intent {self.data_intent!r}; expected one of {VALID_INTENTS}"
            )
        collisions = sorted(set(self.schema) & RESERVED_COLUMNS)
        if collisions:
            raise ValueError(f"schema columns collide with reserved framework columns: {collisions}")
        too_long = sorted(c for c in self.schema if len(c) > MAX_IDENTIFIER_LEN)
        if too_long:
            raise ValueError(f"column names exceed {MAX_IDENTIFIER_LEN} chars: {too_long}")
        if len(self.schema) > MAX_FEATURE_COLUMNS:
            raise ValueError(
                f"{len(self.schema)} feature columns exceeds the {MAX_FEATURE_COLUMNS} cap"
            )
        if len(self.table_name) > MAX_IDENTIFIER_LEN or not self.table_name:
            raise ValueError(f"invalid table name: {self.table_name!r}")
        if self.data_id_strategy == "column" and not self.data_id_column:
            raise ValueError("data_id_strategy='column' requires data_id_column")
        if self.label_policy not in ("passthrough", "bucket"):
            raise ValueError(f"unknown label_policy: {self.label_policy!r}")
