"""Bucketed incremental upsert: portability, determinism, and the
only-touched-buckets-rewrite contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestors_spark.io.writers import (
    BUCKET_COL,
    path_exists,
    read_table,
    upsert,
)


def bucket_files(path):
    """{bucket_dir: {file: mtime_ns}} for every parquet part file."""
    out = {}
    for d in os.listdir(path):
        if d.startswith(f"{BUCKET_COL}="):
            files = {}
            for f in os.listdir(os.path.join(path, d)):
                if f.endswith(".parquet"):
                    files[f] = os.stat(os.path.join(path, d, f)).st_mtime_ns
            out[d] = files
    return out


def test_upsert_counts_and_merge(spark, tmp_path):
    t = str(tmp_path / "t")
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["data_id", "v"])
    assert upsert(spark, t, df1) == (0, 2, 0)
    df2 = spark.createDataFrame([("b", 20), ("c", 3)], ["data_id", "v"])
    assert upsert(spark, t, df2) == (1, 1, 0)  # b updated, c inserted
    rows = {r.data_id: r.v for r in read_table(spark, t).collect()}
    assert rows == {"a": 1, "b": 20, "c": 3}
    # the internal bucket column never leaks to readers
    assert BUCKET_COL not in read_table(spark, t).columns


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    t = str(tmp_path / "t")
    base = spark.createDataFrame([(f"k{i}", i) for i in range(200)], ["data_id", "v"])
    upsert(spark, t, base, n_buckets=8)
    before = bucket_files(t)
    assert len(before) > 1  # data spread over several buckets

    one = spark.createDataFrame([("k0", 999)], ["data_id", "v"])
    upsert(spark, t, one, n_buckets=8)
    after = bucket_files(t)

    touched = [d for d in before if before[d] != after.get(d)]
    untouched = [d for d in before if before[d] == after.get(d)]
    assert len(touched) == 1  # exactly the bucket holding k0
    assert len(untouched) == len(before) - 1  # every other bucket untouched
    rows = {r.data_id: r.v for r in read_table(spark, t).collect()}
    assert rows["k0"] == 999 and rows["k1"] == 1 and len(rows) == 200


def test_upsert_batch_dedup_is_deterministic(spark, tmp_path):
    # two rows with the same key: the winner must be stable across runs
    # and partitionings (row_number over a content hash, not
    # dropDuplicates' arbitrary pick)
    rows = [("k", "alpha"), ("k", "beta")]
    winners = set()
    for rep in range(3):
        t = str(tmp_path / f"t{rep}")
        df = spark.createDataFrame(rows, ["data_id", "v"]).repartition(rep + 1)
        upsert(spark, t, df)
        winners.add(read_table(spark, t).collect()[0].v)
    assert len(winners) == 1


def test_path_exists_via_hadoop_fs(spark, tmp_path):
    assert not path_exists(spark, str(tmp_path / "nope"))
    (tmp_path / "yes").mkdir()
    assert path_exists(spark, str(tmp_path / "yes"))
    # scheme-qualified local URI also works (portability smoke)
    assert path_exists(spark, f"file://{tmp_path}/yes")


def test_upsert_upgrades_legacy_flat_layout(spark, tmp_path):
    # a table written before bucketing (flat parquet, no __bucket)
    t = str(tmp_path / "t")
    spark.createDataFrame([("a", 1), ("b", 2)], ["data_id", "v"]).write.parquet(t)
    df = spark.createDataFrame([("b", 20), ("c", 3)], ["data_id", "v"])
    assert upsert(spark, t, df, n_buckets=8) == (1, 1, 0)
    rows = {r.data_id: r.v for r in read_table(spark, t).collect()}
    assert rows == {"a": 1, "b": 20, "c": 3}
    # upgraded in place to the bucketed layout
    assert bucket_files(t)


def test_upsert_whole_table_rewrites_immune_to_dynamic_mode(spark, tmp_path):
    """Regression (ADVICE r12, medium): upsert's legacy-flat upgrade and
    schema-evolution branches rewrite the WHOLE table via an overwrite
    partitioned write. Under an ambient session
    partitionOverwriteMode=dynamic (set by callers like the concurrent
    refresh folds pre-r13, and a common cluster default) that write used
    to replace only the new __bucket=* partitions and leave the old flat
    parquet files at the table root — readers then returned duplicated
    rows. The writes now force static mode per-write."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        # legacy flat layout upgrade
        t = str(tmp_path / "legacy")
        spark.createDataFrame([("a", 1), ("b", 2)], ["data_id", "v"]).write.parquet(t)
        assert upsert(spark, t, spark.createDataFrame([("b", 20), ("c", 3)], ["data_id", "v"]), n_buckets=8) == (1, 1, 0)
        flat_leftovers = [f for f in os.listdir(t) if f.endswith(".parquet")]
        assert not flat_leftovers, f"stale flat files survived the upgrade: {flat_leftovers}"
        rows = {r.data_id: r.v for r in read_table(spark, t).collect()}
        assert rows == {"a": 1, "b": 20, "c": 3}

        # schema evolution rewrite
        t2 = str(tmp_path / "evolve")
        upsert(spark, t2, spark.createDataFrame([("a", 1)], ["data_id", "v"]), n_buckets=8)
        before = bucket_files(t2)
        upsert(
            spark, t2,
            spark.createDataFrame([("b", 2, "x")], ["data_id", "v", "extra"]),
            n_buckets=8, allow_evolution=True,
        )
        rows = {r.data_id: (r.v, r.extra) for r in read_table(spark, t2).collect()}
        assert rows == {"a": (1, None), "b": (2, "x")}
        # the rewrite replaced the whole table: no pre-evolution file may
        # survive (a mixed-schema directory silently drops the new column)
        after = bucket_files(t2)
        stale = [
            f for d, files in before.items() for f in files
            if f in after.get(d, {}) and after[d][f] == files[f]
        ]
        assert not stale, f"pre-evolution files survived the rewrite: {stale}"
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_upsert_idempotent_reingest(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["data_id", "v"])
    upsert(spark, t, df)
    assert upsert(spark, t, df) == (2, 0, 0)  # same batch: all updates
    assert read_table(spark, t).count() == 2


def test_export_table_formats(spark, tmp_path):
    from data_ingestors_spark.io.writers import export_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    for fmt in ("csv", "json", "parquet", "orc"):
        path = str(tmp_path / f"out_{fmt}")
        export_table(df, path, fmt, single_file=True)
        if fmt == "csv":
            back = spark.read.option("header", True).schema("k long, v string").csv(path)
        elif fmt == "json":
            back = spark.read.schema("k long, v string").json(path)
        else:
            back = getattr(spark.read, fmt)(path)
        assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported"):
        export_table(df, str(tmp_path / "x"), "xml")


def test_export_partitioned_by_column(spark, tmp_path):
    from data_ingestors_spark.io.writers import export_table

    df = spark.createDataFrame(
        [("en", 1), ("en", 2), ("de", 3)], "lang string, doc long"
    )
    path = str(tmp_path / "sharded")
    export_table(df, path, "parquet", partition_by=["lang"])
    import os

    shards = {d for d in os.listdir(path) if d.startswith("lang=")}
    assert shards == {"lang=en", "lang=de"}
    back = spark.read.parquet(path)
    assert back.count() == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        export_table(df, path, "parquet", single_file=True, partition_by=["lang"])


def test_compact_table_reduces_files_and_preserves_rows(spark, tmp_path):
    from data_ingestors_spark.io.writers import compact_table, read_table, upsert

    target = str(tmp_path / "t")
    for i in range(2):
        batch = spark.createDataFrame(
            [(f"id{j}", i) for j in range(i * 10, i * 10 + 10)], "data_id string, v long"
        )
        upsert(spark, target, batch, key="data_id", n_buckets=4)
    # the upsert path itself clusters writes to ~1 file per bucket, so
    # fabricate fragmentation the way an external appender would:
    # append extra files straight into the partitioned layout
    import os as _os

    frag = spark.createDataFrame(
        [(f"xid{j}", 100 + j) for j in range(20)], "data_id string, v long"
    )
    from pyspark.sql import functions as _F

    frag = frag.withColumn(
        "__bucket", _F.pmod(_F.xxhash64(_F.col("data_id")), _F.lit(4)).cast("int")
    ).repartition(6)
    frag.write.mode("append").partitionBy("__bucket").parquet(target)
    assert any(
        len([f for f in _os.listdir(_os.path.join(target, d)) if f.endswith(".parquet")]) > 1
        for d in _os.listdir(target)
        if d.startswith("__bucket=")
    )
    before = read_table(spark, target)
    rows_before = sorted((r.data_id, r.v) for r in before.collect())

    stats = compact_table(spark, target, files_per_bucket=1)
    assert stats["buckets"] > 0
    assert stats["files_after"] < stats["files_before"]

    after = read_table(spark, target)
    assert sorted((r.data_id, r.v) for r in after.collect()) == rows_before
    # compaction is invisible to the upsert path: another batch still works
    upsert(spark, target, spark.createDataFrame([("id0", 99)], "data_id string, v long"))
    assert read_table(spark, target).filter("data_id = 'id0'").collect()[0].v == 99


def test_upsert_schema_drift_is_loud_and_evolution_opt_in(spark, tmp_path):
    from data_ingestors_spark.io.writers import read_table, upsert

    target = str(tmp_path / "t")
    upsert(spark, target, spark.createDataFrame([("a", 1)], "data_id string, v long"))

    # missing column: clear error naming it
    with pytest.raises(ValueError, match=r"missing table columns \['v'\]"):
        upsert(spark, target, spark.createDataFrame([("b",)], "data_id string"))

    # extra column without opt-in: clear error naming it
    extra = spark.createDataFrame([("b", 2, "x")], "data_id string, v long, tag string")
    with pytest.raises(ValueError, match=r"new columns \['tag'\]"):
        upsert(spark, target, extra)

    # opt-in evolution: column appended, old rows read NULL, counts right
    updated, inserted, _ = upsert(spark, target, extra, allow_evolution=True)
    assert (updated, inserted) == (0, 1)
    rows = {r.data_id: (r.v, r.tag) for r in read_table(spark, target).collect()}
    assert rows == {"a": (1, None), "b": (2, "x")}

    # post-evolution schema is uniform: a plain upsert still works
    upsert(spark, target, spark.createDataFrame(
        [("a", 9, "y")], "data_id string, v long, tag string"))
    assert {r.data_id: (r.v, r.tag) for r in read_table(spark, target).collect()} == {
        "a": (9, "y"), "b": (2, "x"),
    }


def test_table_stats_drives_compaction(spark, tmp_path):
    from data_ingestors_spark.io.writers import compact_table, table_stats, upsert

    target = str(tmp_path / "t")
    for i in range(5):
        upsert(spark, target, spark.createDataFrame(
            [(f"id{j}", i) for j in range(i * 5, i * 5 + 5)], "data_id string, v long"
        ), n_buckets=4)
    # fragment one bucket externally (upserts themselves stay clustered
    # at ~1 file per bucket)
    from pyspark.sql import functions as _F

    frag = spark.createDataFrame(
        [(f"xid{j}", 100 + j) for j in range(12)], "data_id string, v long"
    ).withColumn(
        "__bucket", _F.pmod(_F.xxhash64(_F.col("data_id")), _F.lit(4)).cast("int")
    ).repartition(4)
    frag.write.mode("append").partitionBy("__bucket").parquet(target)
    before = table_stats(spark, target)
    assert before["n_buckets"] > 0 and before["total_files"] > before["n_buckets"]

    compact_table(spark, target, files_per_bucket=1)
    after = table_stats(spark, target)
    assert after["avg_files_per_bucket"] == 1.0
    assert after["total_bytes"] > 0


def test_purge_keys_deletes_and_touches_only_their_buckets(spark, tmp_path):
    """GDPR purge: requested keys vanish, the rest survive byte-for-byte
    (untouched bucket files unmodified), absent keys are a no-op, and a
    replayed purge is idempotent."""
    from data_ingestors_spark.io.writers import purge_keys

    t = str(tmp_path / "t")
    base = spark.createDataFrame([(f"k{i}", i) for i in range(200)], ["data_id", "v"])
    upsert(spark, t, base, n_buckets=8)
    before = bucket_files(t)

    victims = spark.createDataFrame([("k0",), ("k7",), ("nope",)], ["data_id"])
    n = purge_keys(spark, t, victims, n_buckets=8)
    assert n == 2  # 'nope' was never in the table

    rows = {r.data_id: r.v for r in read_table(spark, t).collect()}
    assert "k0" not in rows and "k7" not in rows
    assert len(rows) == 198 and rows["k1"] == 1

    after = bucket_files(t)
    untouched = [d for d in before if before[d] == after.get(d)]
    # at most 3 buckets held the 3 requested keys; every other bucket
    # file list is identical
    assert len(untouched) >= len(before) - 3

    # replay: same purge deletes nothing more
    assert purge_keys(spark, t, victims, n_buckets=8) == 0
    assert len(read_table(spark, t).collect()) == 198


def test_purge_keys_empties_whole_bucket(spark, tmp_path):
    """Purging EVERY key of a bucket must remove the bucket directory,
    not silently keep its rows (the dynamic-overwrite blind spot)."""
    from data_ingestors_spark.io.writers import purge_keys

    t = str(tmp_path / "t")
    base = spark.createDataFrame([(f"k{i}", i) for i in range(40)], ["data_id", "v"])
    upsert(spark, t, base, n_buckets=4)
    all_keys = spark.createDataFrame([(f"k{i}",) for i in range(40)], ["data_id"])
    n = purge_keys(spark, t, all_keys, n_buckets=4)
    assert n == 40
    assert read_table(spark, t).count() == 0


def test_purge_keys_legacy_flat_layout(spark, tmp_path):
    """A pre-bucketing flat parquet table purges via the one-time
    full rewrite path (same contract as upsert's legacy upgrade)."""
    from data_ingestors_spark.io.writers import purge_keys

    t = str(tmp_path / "flat")
    spark.createDataFrame(
        [(f"k{i}", i) for i in range(50)], ["data_id", "v"]
    ).write.parquet(t)
    n = purge_keys(spark, t, spark.createDataFrame([("k3",), ("k4",)], ["data_id"]))
    assert n == 2
    rows = {r.data_id for r in spark.read.parquet(t).collect()}
    assert "k3" not in rows and "k4" not in rows and len(rows) == 48
    # the temp swap dir must not linger after a successful purge
    import os

    assert not os.path.exists(t + "__purge_tmp")


def test_purge_keys_recovers_interrupted_legacy_swap(spark, tmp_path):
    """Crash window between the legacy path's target delete and the
    temp-dir rename: target is gone, <target>__purge_tmp holds the
    full keep-set. The next purge_keys on that target must finish the
    swap and then apply its own purge — converging, not returning 0."""
    import shutil

    from data_ingestors_spark.io.writers import purge_keys

    t = str(tmp_path / "flat")
    spark.createDataFrame(
        [(f"k{i}", i) for i in range(30)], ["data_id", "v"]
    ).write.parquet(t)
    # simulate the crash: keep-set (minus k0) durable at the swap
    # path, target deleted
    spark.read.parquet(t).filter("data_id <> 'k0'").write.parquet(t + "__purge_tmp")
    shutil.rmtree(t)
    # replayed purge (same keys: k0 already gone, k1 still present)
    victims = spark.createDataFrame([("k0",), ("k1",)], ["data_id"])
    n = purge_keys(spark, t, victims)
    assert n == 1  # only k1 remained to delete
    rows = {r.data_id for r in spark.read.parquet(t).collect()}
    assert rows == {f"k{i}" for i in range(2, 30)}
