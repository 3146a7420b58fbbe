"""K5: distributed sidecar file copy for file-bearing categories.

Re-expresses the reference's per-record ``map_file_transfer`` dispatch
(tracebloc_ingestor/file_transfer.py:326-431) as a DataFrame program:

1. **Resolve** — per category, each record needs one or more source
   files (image / annotation / text / mask). Source directories are
   listed ONCE with the ``binaryFile`` data source (distributed,
   metadata-only); the manifest LEFT-JOINs the listing on the resolved
   filename, splitting records into *found* and *missing* without a
   single driver-side ``os.path.exists`` per record (the reference
   stats the filesystem 1-3× per record — file_transfer.py:102-108).
2. **Atomic multi-file semantics** — a record whose category requires
   several files (object_detection: image+annotation,
   semantic_segmentation: image+mask — file_transfer.py:342-369,
   395-425) is copyable only when ALL sources exist; otherwise NO file
   is copied and the record is dropped (reference issue #99: a missing
   source must never leave orphans or report success).
3. **Copy** — the found set's (src, dst) pairs execute in an
   Arrow-batched ``mapInPandas`` with bounded exponential-backoff
   retry (reference retry policy: 3 attempts, 1-10s exponential —
   constants.py RETRY_*). Local-filesystem copies here; on HDFS/S3
   swap ``_copy_one`` for the storage client — the planning and
   accounting layers are storage-agnostic.
4. **Account** — copy statuses come back as a DataFrame; failures and
   missing-source records both land in
   ``IngestionSummary.file_transfer_failures`` and their records are
   excluded from the table insert, exactly the reference's
   record-skip-on-None contract (ingestors/base.py:713-820).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestors_spark.validators.files import list_files

# Reference vocabulary (constants.py:124-148) — extensions WITH dot.
KNOWN_EXTENSIONS = (".jpeg", ".jpg", ".png", ".xml", ".txt", ".text")
MASK_PROBE_EXTENSIONS = (".png", ".jpg", ".jpeg")  # file_transfer.py:276-285

RETRY_MAX_ATTEMPTS = 3
RETRY_WAIT_MIN = 1.0
RETRY_WAIT_MAX = 10.0


@dataclass(frozen=True)
class FileRequirement:
    """One file a category needs per record."""

    role: str  # image | annotation | text | mask
    subdir: str  # under src_path
    # extension resolution: "option" = the configured extension,
    # "fixed:<ext>" = always that extension (e.g. annotations → .xml),
    # "probe" = try MASK_PROBE_EXTENSIONS in priority order.
    ext_mode: str = "option"
    name_col: str = "filename"  # manifest column holding the base name


# Category → required files (file_transfer.py:326-431 dispatch table).
CATEGORY_FILES: dict[str, tuple[FileRequirement, ...]] = {
    "image_classification": (FileRequirement("image", "images"),),
    "keypoint_detection": (FileRequirement("image", "images"),),
    "object_detection": (
        FileRequirement("image", "images"),
        FileRequirement("annotation", "annotations", ext_mode="fixed:.xml"),
    ),
    "semantic_segmentation": (
        FileRequirement("image", "images"),
        FileRequirement("mask", "masks", ext_mode="probe", name_col="mask_id"),
    ),
    # mirrors semantic: no reference template exists (conventions.py:111)
    "instance_segmentation": (
        FileRequirement("image", "images"),
        FileRequirement("mask", "masks", ext_mode="probe", name_col="mask_id"),
    ),
    "text_classification": (FileRequirement("text", "texts"),),
    "token_classification": (FileRequirement("text", "texts"),),
    "masked_language_modeling": (FileRequirement("text", "sequences"),),
}

# Categories that ship an optional/mandatory tokenizer.json
# (file_transfer.py:310-323; mandatory for MLM via TokenizerValidator).
TOKENIZER_CATEGORIES = frozenset(
    {"text_classification", "token_classification", "masked_language_modeling"}
)


@dataclass
class TransferStats:
    """file-copy accounting for IngestionSummary."""

    planned: int = 0  # records in a file-bearing category
    complete: int = 0  # records with every required source present
    missing: int = 0  # records missing ≥1 source (nothing copied)
    copy_failed: int = 0  # records whose copy errored after retries
    files_copied: int = 0
    missing_samples: list[str] = field(default_factory=list)

    @property
    def failures(self) -> int:
        return self.missing + self.copy_failed


def _with_ext(name_col: "F.Column", ext: str) -> "F.Column":
    """filename → filename_with_ext, appending ``ext`` only when the
    name doesn't already end in a KNOWN extension (the reference's
    _has_extension fix — file_transfer.py:66-92, case-insensitive)."""
    pat = "(?i)(" + "|".join(e.replace(".", r"\.") + "$" for e in KNOWN_EXTENSIONS) + ")"
    has = F.regexp_extract(name_col, pat, 0) != ""
    return F.when(has, name_col).otherwise(F.concat(name_col, F.lit(ext)))


def _stem(c: "F.Column") -> "F.Column":
    return F.regexp_replace(c, r"\.[^.]*$", "")


def plan_transfers(
    spark: SparkSession,
    manifest: DataFrame,
    *,
    category: str,
    src_path: str,
    dest_path: str,
    extension: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Resolve every record's required source files against distributed
    directory listings.

    Returns ``(resolved, missing)``:

    - ``resolved`` — manifest rows with every required file found, plus
      ``__copies`` (array of src→dst structs), ``filename`` (stem) and
      ``extension`` standard columns populated (T5 —
      file_transfer.py:153-154).
    - ``missing`` — manifest rows missing ≥1 source, with a
      ``__missing`` column naming the unresolved file(s).
    """
    reqs = CATEGORY_FILES.get(category)
    if not reqs:
        raise ValueError(f"category {category!r} has no file requirements")

    out = manifest
    miss_cols: list[str] = []
    copy_cols: list[str] = []

    for i, req in enumerate(reqs):
        srcdir = os.path.join(src_path, req.subdir)
        listing_cols = ("path", "name", "stem", "ext")
        if os.path.isdir(srcdir):
            listing = list_files(spark, srcdir).select(*listing_cols)
        else:
            listing = spark.createDataFrame([], "path string, name string, stem string, ext string")

        if req.ext_mode == "probe":
            # mask_id (extension stripped) probed against
            # MASK_PROBE_EXTENSIONS in priority order
            # (file_transfer.py:276-285).
            pri = F.array_position(
                F.array(*[F.lit(e.lstrip(".")) for e in MASK_PROBE_EXTENSIONS]), F.col("ext")
            )
            cand = (
                listing.filter(F.col("ext").isin([e.lstrip(".") for e in MASK_PROBE_EXTENSIONS]))
                .withColumn("__pri", pri)
                .withColumn(
                    "__rn",
                    F.row_number().over(Window.partitionBy("stem").orderBy("__pri")),
                )
                .filter(F.col("__rn") == 1)
            )
            key = _stem(F.col(req.name_col))
            j = cand.select(
                F.col("stem").alias(f"__k{i}"),
                F.col("path").alias(f"__src{i}"),
                F.col("name").alias(f"__n{i}"),
            )
        else:
            ext = extension if req.ext_mode == "option" else req.ext_mode.split(":", 1)[1]
            key = _with_ext(F.col(req.name_col).cast("string"), ext)
            j = listing.select(
                F.col("name").alias(f"__k{i}"),
                F.col("path").alias(f"__src{i}"),
                F.col("name").alias(f"__n{i}"),
            )
        out = out.withColumn(f"__want{i}", key).join(
            j, F.col(f"__want{i}") == F.col(f"__k{i}"), "left"
        ).drop(f"__k{i}")
        miss_cols.append(f"__src{i}")
        copy_cols.append(f"__n{i}")

    found_cond = F.lit(True)
    for c in miss_cols:
        found_cond = found_cond & F.col(c).isNotNull()

    missing = out.filter(~found_cond).withColumn(
        "__missing",
        F.concat_ws(
            ", ",
            *[
                F.when(F.col(f"__src{i}").isNull(), F.col(f"__want{i}"))
                for i in range(len(reqs))
            ],
        ),
    )

    copies = F.array(
        *[
            F.struct(
                F.col(f"__src{i}").alias("src"),
                F.concat_ws("/", F.lit(dest_path.rstrip("/")), F.col(f"__n{i}")).alias("dst"),
            )
            for i in range(len(reqs))
        ]
    )
    prim_ext = F.lower(F.regexp_extract(F.col("__n0"), r"\.([^.]*)$", 1))
    resolved = (
        out.filter(found_cond)
        .withColumn("__copies", copies)
        # T5 standard columns (file_transfer.py:153-154): filename is
        # the extensionless stem, extension the resolved suffix.
        .withColumn("filename", _stem(F.col("__n0")))
        .withColumn("extension", F.concat(F.lit("."), prim_ext))
    )
    drop = [f"__want{i}" for i in range(len(reqs))] + [f"__src{i}" for i in range(len(reqs))] + [
        f"__n{i}" for i in range(len(reqs))
    ]
    return resolved.drop(*drop), missing


def _copy_one(src: str, dst: str) -> None:
    """Bounded-retry local copy (reference retry policy: 3 attempts,
    exponential 1-10s — file_transfer.py:40-62). Replace for object
    stores; planning/accounting above are storage-agnostic."""
    delay = RETRY_WAIT_MIN
    for attempt in range(RETRY_MAX_ATTEMPTS):
        try:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(dst):
                os.remove(dst)
            shutil.copy(src, dst)
            return
        except (OSError, shutil.Error):
            if attempt == RETRY_MAX_ATTEMPTS - 1:
                raise
            time.sleep(min(delay, RETRY_WAIT_MAX))
            delay *= 2


def execute_transfers(resolved: DataFrame, id_col: str = "data_id") -> DataFrame:
    """Run the planned copies executor-side; returns per-record status
    (id, ok, error). Arrow-batched ``mapInPandas`` — file bytes move
    executor-local, never through the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, oks, errs = [], [], []
            for rid, copies in zip(pdf["__id"], pdf["__copies"]):
                err = ""
                try:
                    for c in copies:
                        # strip the binaryFile file: URI prefix
                        src = c["src"]
                        if src.startswith("file:"):
                            src = src[len("file:"):]
                        _copy_one(src, c["dst"])
                except Exception as e:  # count, don't abort the batch
                    err = f"{type(e).__name__}: {e}"
                ids.append(rid)
                oks.append(err == "")
                errs.append(err)
            yield pd.DataFrame({"__id": ids, "ok": oks, "error": errs})

    plan = resolved.select(F.col(id_col).alias("__id"), "__copies")
    return plan.mapInPandas(run, schema="__id string, ok boolean, error string")


def copy_tokenizer_if_present(src_path: str, dest_path: str) -> bool:
    """Driver-side single-file tokenizer.json copy for NLP categories
    (file_transfer.py:310-323): no-op when absent or already copied."""
    src = os.path.join(src_path, "tokenizer.json")
    dst = os.path.join(dest_path, "tokenizer.json")
    if os.path.isfile(src) and not os.path.exists(dst):
        _copy_one(src, dst)
        return True
    return False


def transfer_files(
    spark: SparkSession,
    manifest: DataFrame,
    *,
    category: str,
    src_path: str,
    dest_path: str,
    extension: str = "",
    id_col: str = "data_id",
) -> tuple[DataFrame, TransferStats, DataFrame]:
    """Plan + execute + account. Returns ``(ok_manifest, stats,
    failed)`` where ``ok_manifest`` contains only records whose every
    file landed (T5 ``filename``/``extension`` populated) and
    ``failed`` carries ``(id_col, error)`` for every dropped record —
    the reference's ``failed_records`` list (base.py:818-823), kept
    distributed so a 100%-failure run at any scale surfaces every
    reason without collecting rows to the driver."""
    stats = TransferStats()
    if category not in CATEGORY_FILES:
        empty = manifest.sparkSession.createDataFrame(
            [], f"{id_col} string, error string"
        )
        return manifest, stats, empty  # tabular/time-series: nothing to move

    resolved, missing = plan_transfers(
        spark, manifest, category=category, src_path=src_path,
        dest_path=dest_path, extension=extension,
    )
    resolved = resolved.persist()
    stats.complete = resolved.count()
    stats.missing = missing.count()
    stats.planned = stats.complete + stats.missing
    stats.missing_samples = [
        r["__missing"] for r in missing.select("__missing").limit(5).collect()
    ]

    status = execute_transfers(resolved, id_col=id_col).persist()
    bad_ids = status.filter(~F.col("ok")).select(F.col("__id").alias(id_col))
    stats.copy_failed = bad_ids.count()
    stats.files_copied = (stats.complete - stats.copy_failed) * len(CATEGORY_FILES[category])

    ok = resolved.join(bad_ids, id_col, "left_anti").drop("__copies")
    failed = (
        missing.select(
            F.col(id_col).cast("string").alias(id_col),
            F.concat(F.lit("file_missing: "), F.col("__missing")).alias("error"),
        ).unionByName(
            bad_ids.select(
                F.col(id_col).cast("string").alias(id_col),
                F.lit("file_transfer_failed").alias("error"),
            )
        )
    )
    if category in TOKENIZER_CATEGORIES:
        copy_tokenizer_if_present(src_path, dest_path)
    return ok, stats, failed
