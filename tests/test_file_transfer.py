"""K5 sidecar file transfer + V17 preflight + V18 lock.

Fixture-tree contract mirrors the reference e2e
(/root/reference/e2e/test_ingest_e2e.py:30-160): every file-bearing
category's bundled source tree ingests with files landed in dest and
failure accounting for missing sources.
"""

from __future__ import annotations

import json
import os
import textwrap
import time

import pytest

from data_ingestors_spark.ingest import Ingestor, ResolvedConfig
from data_ingestors_spark.ingest.file_transfer import (
    copy_tokenizer_if_present,
    transfer_files,
)
from data_ingestors_spark.ingest.lock import TableLock, TableLockError, preflight_src_path


# --- fixture tree -------------------------------------------------------


@pytest.fixture
def tree(tmp_path):
    src = tmp_path / "src"
    for sub in ("images", "annotations", "masks", "texts", "sequences"):
        (src / sub).mkdir(parents=True)
    for i in range(3):
        # FAKEIMG fixture format: decodable by the image battery (the
        # battery is fail-loud since the pure-python header parsers)
        (src / "images" / f"img{i}.jpg").write_bytes(b"FAKEIMG:32x32:" + bytes([i]))
        (src / "annotations" / f"img{i}.xml").write_text(f"<a>{i}</a>")
        (src / "texts" / f"doc{i}.txt").write_text(f"text {i}")
    # mask only for img0/img1 (img2's is missing), mixed extensions
    (src / "masks" / "img0.png").write_bytes(b"M0")
    (src / "masks" / "img1.jpeg").write_bytes(b"M1")
    (src / "tokenizer.json").write_text('{"vocab": {}}')
    dest = tmp_path / "dest"
    dest.mkdir()
    return src, dest


def manifest_df(spark, rows, cols=("data_id", "filename")):
    return spark.createDataFrame(rows, list(cols))


# --- unit: planning + copy ---------------------------------------------


def test_image_classification_copies_and_t5_columns(spark, tree):
    src, dest = tree
    m = manifest_df(spark, [("a", "img0"), ("b", "img1.jpg"), ("c", "nope")])
    ok, stats, _failed = transfer_files(
        spark, m, category="image_classification",
        src_path=str(src), dest_path=str(dest), extension=".jpg",
    )
    got = {r.data_id: r for r in ok.collect()}
    assert set(got) == {"a", "b"}  # "nope" has no source image
    assert stats.planned == 3 and stats.complete == 2
    assert stats.missing == 1 and stats.copy_failed == 0
    assert stats.failures == 1
    # files landed
    assert (dest / "img0.jpg").read_bytes() == b"FAKEIMG:32x32:\x00"
    assert (dest / "img1.jpg").exists()
    # T5: filename is the stem, extension the resolved suffix
    assert got["a"].filename == "img0" and got["a"].extension == ".jpg"
    assert got["b"].filename == "img1" and got["b"].extension == ".jpg"


def test_object_detection_atomic_pairs(spark, tree):
    src, dest = tree
    os.remove(src / "annotations" / "img1.xml")  # break one pair
    m = manifest_df(spark, [("a", "img0"), ("b", "img1")])
    ok, stats, _failed = transfer_files(
        spark, m, category="object_detection",
        src_path=str(src), dest_path=str(dest), extension=".jpg",
    )
    assert [r.data_id for r in ok.collect()] == ["a"]
    assert stats.missing == 1
    # atomic: img1's image must NOT have been copied without its xml
    assert not (dest / "img1.jpg").exists()
    assert (dest / "img0.jpg").exists() and (dest / "img0.xml").exists()


def test_semantic_segmentation_mask_probe(spark, tree):
    src, dest = tree
    m = spark.createDataFrame(
        [("a", "img0", "img0"), ("b", "img1", "img1.png"), ("c", "img2", "img2")],
        ["data_id", "filename", "mask_id"],
    )
    ok, stats, _failed = transfer_files(
        spark, m, category="semantic_segmentation",
        src_path=str(src), dest_path=str(dest), extension=".jpg",
    )
    assert {r.data_id for r in ok.collect()} == {"a", "b"}
    assert stats.missing == 1  # img2 has no mask
    assert (dest / "img0.png").read_bytes() == b"M0"  # probe found .png
    assert (dest / "img1.jpeg").read_bytes() == b"M1"  # ext stripped from mask_id, .jpeg probed
    assert not (dest / "img2.jpg").exists()  # atomic


def test_text_category_ships_tokenizer(spark, tree):
    src, dest = tree
    m = manifest_df(spark, [("a", "doc0"), ("b", "doc1.txt")])
    ok, stats, _failed = transfer_files(
        spark, m, category="text_classification",
        src_path=str(src), dest_path=str(dest), extension=".txt",
    )
    assert stats.complete == 2 and stats.failures == 0
    assert (dest / "doc0.txt").exists() and (dest / "doc1.txt").exists()
    assert json.loads((dest / "tokenizer.json").read_text()) == {"vocab": {}}


def test_tokenizer_copy_is_idempotent(tree):
    src, dest = tree
    assert copy_tokenizer_if_present(str(src), str(dest)) is True
    assert copy_tokenizer_if_present(str(src), str(dest)) is False  # already there


# --- e2e: pipeline integration -----------------------------------------


def test_pipeline_ingests_files_and_accounts_failures(spark, tmp_path, tree):
    src, dest = tree
    p = tmp_path / "manifest.csv"
    p.write_text(
        textwrap.dedent(
            """\
            filename,target
            img0,cat
            img1,dog
            ghost,cat
            """
        )
    )
    cfg = ResolvedConfig(
        table_name="t_images",
        category="image_classification",
        schema={"filename": "VARCHAR(255)"},
        label_column="target",
        src_path=str(src),
        dest_path=str(dest),
        extension=".jpg",
    )
    ing = Ingestor(spark, cfg, str(tmp_path / "table"))
    s = ing.ingest(str(p))
    assert s.total_records == 3
    assert s.file_transfer_failures == 1  # ghost
    assert s.inserted == 2
    assert s.has_failures  # the missing file must not report success
    out = spark.read.parquet(str(tmp_path / "table"))
    rows = {r.filename: r for r in out.collect()}
    assert set(rows) == {"img0", "img1"}
    assert rows["img0"].extension == ".jpg"
    assert (dest / "img0.jpg").exists() and (dest / "img1.jpg").exists()
    # lock released after the run
    assert not [f for f in os.listdir(os.path.dirname(str(dest))) if f.endswith(".lock")]


# --- V17 / V18 ----------------------------------------------------------


def test_preflight_src_path_errors():
    with pytest.raises(ValueError, match="SRC_PATH is not configured"):
        preflight_src_path(None)
    with pytest.raises(ValueError, match="absolute"):
        preflight_src_path("relative/path")
    with pytest.raises(ValueError, match="not a directory"):
        preflight_src_path("/definitely/not/a/real/dir")


def test_config_requires_src_for_file_categories(tmp_path):
    with pytest.raises(ValueError, match="SRC_PATH"):
        ResolvedConfig(
            table_name="t", category="image_classification",
            schema={"filename": "VARCHAR(255)"},
        ).validate()


def test_table_lock_conflict_and_stale(tmp_path):
    a = TableLock(str(tmp_path), "t1").acquire()
    with pytest.raises(TableLockError, match="already running"):
        TableLock(str(tmp_path), "t1").acquire()
    # other tables are unaffected
    TableLock(str(tmp_path), "t2").acquire().release()
    a.release()
    b = TableLock(str(tmp_path), "t1").acquire()  # reacquire after release
    # stale: age the lock beyond the cutoff and watch it self-clear
    old = time.time() - (13 * 3600)
    info = json.loads(open(b.path).read())
    from datetime import datetime, timezone
    info["started_at"] = datetime.fromtimestamp(old, timezone.utc).isoformat()
    with open(b.path, "w") as f:
        json.dump(info, f)
    os.utime(b.path, (old, old))  # a crashed run's lock has an old mtime too
    c = TableLock(str(tmp_path), "t1").acquire()  # steals the stale lock
    # atomic takeover leaves no .stale rename-aside litter behind
    assert not [p for p in os.listdir(tmp_path) if ".stale." in p]
    c.release()


def test_table_lock_restores_fresh_lock_grabbed_mid_takeover(tmp_path, monkeypatch):
    """Deepest takeover race (ADVICE r3): contender B completes a FULL
    stale takeover (rename-aside + O_EXCL recreate) between OUR stat
    and OUR rename — our rename then grabs B's FRESH lock. The inode
    check must detect the swap, restore B's lock at the canonical
    path, and report the table as held."""
    import json as _json
    import os as _os
    import time as _time
    from datetime import datetime, timezone

    import data_ingestors_spark.ingest.lock as L

    lock = TableLock(str(tmp_path), "t5").acquire()
    old = _time.time() - (13 * 3600)
    info = _json.loads(open(lock.path).read())
    info["started_at"] = datetime.fromtimestamp(old, timezone.utc).isoformat()
    with open(lock.path, "w") as f:
        _json.dump(info, f)
    _os.utime(lock.path, (old, old))

    real_rename = _os.rename
    fired = {"done": False}

    def racing_rename(src, dst):
        if not fired["done"] and src == lock.path and ".stale." in dst:
            fired["done"] = True
            # contender B wins the takeover first: stale file gone,
            # fresh O_EXCL lock in its place
            real_rename(src, src + ".b-aside")
            _os.remove(src + ".b-aside")
            with open(src, "w") as f:
                _json.dump(
                    {"owner": "b-fresh",
                     "started_at": datetime.now(timezone.utc).isoformat()},
                    f,
                )
        return real_rename(src, dst)

    monkeypatch.setattr(L.os, "rename", racing_rename)
    with pytest.raises(TableLockError, match="already running"):
        TableLock(str(tmp_path), "t5").acquire()
    # B's fresh lock survived at the canonical path, no litter left
    assert _json.load(open(lock.path))["owner"] == "b-fresh"
    assert not [p for p in _os.listdir(tmp_path) if ".stale." in p]


def test_table_lock_fresh_mtime_blocks_takeover(tmp_path):
    """Race guard: metadata claims stale but the lock FILE is fresh —
    exactly what a contender sees when another process replaced the
    stale lock between its read and its takeover. Must treat as held,
    never remove (ADVICE r2: stale-takeover race)."""
    from datetime import datetime, timezone

    lock = TableLock(str(tmp_path), "t4").acquire()
    old = time.time() - (13 * 3600)
    info = json.loads(open(lock.path).read())
    info["started_at"] = datetime.fromtimestamp(old, timezone.utc).isoformat()
    with open(lock.path, "w") as f:
        json.dump(info, f)  # mtime stays NOW — file recently (re)written
    with pytest.raises(TableLockError, match="already running"):
        TableLock(str(tmp_path), "t4").acquire()
    lock.release()


def test_table_lock_corrupt_metadata_uses_mtime(tmp_path):
    lock = TableLock(str(tmp_path), "t3").acquire()
    with open(lock.path, "w") as f:
        f.write("not-json{")
    os.utime(lock.path, (time.time() - 13 * 3600,) * 2)
    TableLock(str(tmp_path), "t3").acquire().release()  # stale via mtime
