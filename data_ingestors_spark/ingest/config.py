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
    "mask_id": "VARCHAR(255)",
    "ingestor_id": "VARCHAR(255)",
}

# `label` is excluded on purpose (users may map onto it).
RESERVED_COLUMNS = frozenset(STANDARD_COLUMNS) - {"label"} | {"id"}

# File-bearing categories SOURCE these columns from the manifest (the
# reference's column_mapping targets them — base.py:309-313), so they
# are not collisions there.
FILE_KEY_COLUMNS = frozenset({"filename", "annotation", "mask_id"})

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
    # CSV dialect overrides (delimiter/quotechar/escapechar/encoding/
    # decimal) merged over io.readers.DEFAULT_CSV_OPTIONS.
    csv_options: dict = field(default_factory=dict)
    # file-bearing categories (K5/T5/V17): source tree holding
    # images/ annotations/ masks/ texts/ sequences/, the destination
    # directory files are copied into, and the primary file extension.
    src_path: str | None = None
    dest_path: str | None = None
    extension: str = ""
    # V18: directory for the advisory per-table lock (defaults to the
    # parent of dest_path when unset; None + no dest_path = no lock).
    lock_dir: str | None = None
    # category-battery parameters (validators/mapping.py ctx):
    # expected image WxH (auto-detected from the first image when
    # unset), keypoint count per annotation, and the time column for
    # the time-series / time-to-event batteries.
    target_size: tuple[int, int] | None = None
    number_of_keypoints: int | None = None
    time_column: str | None = None
    # T8 declared processors (ingest/processors.py): tuple of
    # "pkg.mod:fn" strings or {"function":..., "args":{...}} dicts,
    # applied in order after type conformance.
    processors: tuple = ()
    # declarative data expectations (validators/expectations.py),
    # evaluated in one agg pass after the category battery; any
    # violation fails the ingest loudly with counts + samples.
    expectations: tuple = ()
    # same machinery over the TRANSFORMED frame (post conformance /
    # processors / label mapping / framework columns) — catches what
    # source-level checks cannot, e.g. "label is never null after
    # mapping" or invariants a processor must establish.
    post_expectations: tuple = ()

    def validate(self) -> None:
        """Fail-fast plan guards — same error classes as the reference
        (database.py:184-297; base.py:242-326)."""
        if self.data_intent not in VALID_INTENTS:
            raise ValueError(
                f"invalid data_intent {self.data_intent!r}; expected one of {VALID_INTENTS}"
            )
        from data_ingestors_spark.ingest.file_transfer import CATEGORY_FILES as _CF
        reserved = RESERVED_COLUMNS - (FILE_KEY_COLUMNS if self.category in _CF else frozenset())
        collisions = sorted(set(self.schema) & reserved)
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
        from data_ingestors_spark.ingest.file_transfer import CATEGORY_FILES
        if self.category in CATEGORY_FILES:
            from data_ingestors_spark.ingest.lock import preflight_src_path
            preflight_src_path(self.src_path)  # V17: one clear error
            if not self.dest_path:
                raise ValueError(
                    f"category {self.category!r} copies sidecar files and "
                    "requires dest_path"
                )
