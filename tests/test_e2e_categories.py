"""E2E: every category's fixture tree ingests through the declarative
YAML path — the reference's modality-equivalence contract
(/root/reference/e2e/test_ingest_e2e.py:30-160) re-expressed against
the Spark engine: build an ``ingest.yaml`` matched to a synthetic
fixture tree, run the real pipeline into the warehouse, and assert it
succeeds with rows, landed sidecar files, and populated standard
columns.

Unlike the reference (which ships template datasets), fixtures are
synthesized per-test: images use the deterministic FAKEIMG stub format
(validators/files.py FAKE_MAGIC) because the container has no codec.
"""

from __future__ import annotations

import textwrap

import pytest
import yaml

from data_ingestors_spark.cli.frontend import run_from_yaml


def fake_img(w: int = 64, h: int = 64) -> bytes:
    return f"FAKEIMG:{w}x{h}:".encode() + b"payload"


VOC_XML = textwrap.dedent(
    """\
    <annotation>
      <folder>images</folder>
      <filename>{name}</filename>
      <source><database>fixture</database></source>
      <size><width>64</width><height>64</height><depth>3</depth></size>
      <segmented>0</segmented>
      <object>
        <name>car</name>
        <truncated>0</truncated>
        <bndbox><xmin>1</xmin><ymin>2</ymin><xmax>10</xmax><ymax>12</ymax></bndbox>
      </object>
    </annotation>
    """
)

TOKENIZER_JSON = (
    '{"model": {"vocab": {"[MASK]": 0, "[PAD]": 1, "hello": 2}}, "added_tokens": []}'
)


def run_yaml(spark, tmp_path, cfg: dict):
    cfg = {"apiVersion": "spark-ingest/v1", "kind": "IngestConfig", "intent": "train", **cfg}
    cfg.setdefault("warehouse", str(tmp_path / "warehouse"))
    p = tmp_path / "ingest.yaml"
    p.write_text(yaml.safe_dump(cfg))
    summary = run_from_yaml(spark, str(p))
    table = spark.read.parquet(str(tmp_path / "warehouse" / cfg["table"]))
    return summary, table


def file_tree(tmp_path, **files: bytes):
    """files: relative/path → bytes; returns (src_root, dest_dir)."""
    src = tmp_path / "src"
    for rel, content in files.items():
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(content)
    dest = tmp_path / "dest"
    dest.mkdir()
    return src, dest


def assert_clean(summary, table, n_rows: int):
    assert not summary.has_failures, summary.report()
    assert summary.inserted == n_rows
    assert table.count() == n_rows
    for c in ("data_id", "label", "data_intent", "ingestor_id", "status",
              "created_at", "updated_at", "filename", "extension",
              "annotation", "mask_id"):
        assert c in table.columns, f"standard column {c} missing"


# --- tabular family -----------------------------------------------------


def test_tabular_classification(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("f0,f1,label\n0.5,1.25,1\n0.75,2.5,0\n1.5,3.25,1\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_tabclf", "category": "tabular_classification",
        "csv": str(csv),
        "schema": {"f0": "FLOAT", "f1": "FLOAT", "label": "INT"},
        "label": "label",
    })
    assert_clean(s, t, 3)
    assert {r.label for r in t.select("label").collect()} == {"0", "1"}


def test_tabular_regression_bucket_label(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("sqft,age,price\n1500,10,200000\n900,42,90000\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_tabreg", "category": "tabular_regression",
        "csv": str(csv),
        "schema": {"sqft": "FLOAT", "age": "INT", "price": "FLOAT"},
        "label": {"column": "price", "policy": "bucket"},
    })
    assert_clean(s, t, 2)
    assert all(0 <= int(r.label) < 64 for r in t.select("label").collect())


def test_time_series_forecasting(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text(
        "timestamp,dow,value\n"
        "2024-01-01 00:00:00,1,10.5\n"
        "2024-01-02 00:00:00,2,11.25\n"
        "2024-01-03 00:00:00,3,12.75\n"
    )
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_tsf", "category": "time_series_forecasting",
        "csv": str(csv), "time_column": "timestamp",
        "schema": {"timestamp": "TIMESTAMP", "dow": "INT", "value": "FLOAT"},
        "label": {"column": "value", "policy": "bucket"},
    })
    assert_clean(s, t, 3)


def test_time_series_out_of_order_fails_loud(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text(
        "timestamp,value\n2024-01-03 00:00:00,1\n2024-01-01 00:00:00,2\n"
    )
    with pytest.raises(ValueError, match="out-of-order"):
        run_yaml(spark, tmp_path, {
            "table": "e2e_tsf_bad", "category": "time_series_forecasting",
            "csv": str(csv), "time_column": "timestamp",
            "schema": {"timestamp": "TIMESTAMP", "value": "FLOAT"},
        })


def test_time_to_event_prediction(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("age,time,DEATH_EVENT\n63,120,1\n55,30,0\n71,365,0\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_tte", "category": "time_to_event_prediction",
        "csv": str(csv), "time_column": "time",
        "schema": {"age": "INT", "time": "INT", "DEATH_EVENT": "INT"},
        "label": {"column": "DEATH_EVENT", "policy": "bucket"},
    })
    assert_clean(s, t, 3)


# --- image family -------------------------------------------------------


def test_image_classification(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{"images/img0.jpg": fake_img(), "images/img1.jpg": fake_img()},
    )
    csv = tmp_path / "labels.csv"
    csv.write_text("filename,label\nimg0,cat\nimg1,dog\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_img", "category": "image_classification",
        "csv": str(csv), "label": "label",
        "src": str(src), "dest": str(dest), "extension": ".jpg",
        "target_size": [64, 64],
    })
    assert_clean(s, t, 2)
    assert (dest / "img0.jpg").exists() and (dest / "img1.jpg").exists()
    rows = {r.filename: r for r in t.collect()}
    assert rows["img0"].extension == ".jpg" and rows["img0"].label == "cat"


def test_image_wrong_resolution_fails_loud(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{"images/img0.jpg": fake_img(64, 64), "images/img1.jpg": fake_img(32, 32)},
    )
    csv = tmp_path / "labels.csv"
    csv.write_text("filename,label\nimg0,cat\nimg1,dog\n")
    with pytest.raises(ValueError, match="not 64x64"):
        run_yaml(spark, tmp_path, {
            "table": "e2e_img_bad", "category": "image_classification",
            "csv": str(csv), "label": "label",
            "src": str(src), "dest": str(dest), "extension": ".jpg",
            "target_size": [64, 64],
        })


def test_object_detection(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{
            "images/img0.jpg": fake_img(),
            "images/img1.jpg": fake_img(),
            "annotations/img0.xml": VOC_XML.format(name="img0.jpg").encode(),
            "annotations/img1.xml": VOC_XML.format(name="img1.jpg").encode(),
        },
    )
    csv = tmp_path / "labels.csv"
    csv.write_text("filename,image_label\nimg0,street\nimg1,highway\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_od", "category": "object_detection",
        "csv": str(csv), "label": "image_label",
        "src": str(src), "dest": str(dest), "extension": ".jpg",
        "target_size": [64, 64],
    })
    assert_clean(s, t, 2)
    # atomic pair: image AND its VOC annotation both landed
    for stem in ("img0", "img1"):
        assert (dest / f"{stem}.jpg").exists()
        assert (dest / f"{stem}.xml").exists()


def test_object_detection_bad_voc_fails_loud(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{
            "images/img0.jpg": fake_img(),
            "annotations/img0.xml": b"<annotation><object></object></annotation>",
        },
    )
    csv = tmp_path / "labels.csv"
    csv.write_text("filename,image_label\nimg0,street\n")
    with pytest.raises(ValueError, match="missing"):
        run_yaml(spark, tmp_path, {
            "table": "e2e_od_bad", "category": "object_detection",
            "csv": str(csv), "label": "image_label",
            "src": str(src), "dest": str(dest), "extension": ".jpg",
        })


def test_keypoint_detection(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{"images/img0.jpg": fake_img(), "images/img1.jpg": fake_img()},
    )
    csv = tmp_path / "labels.csv"
    ann = r'"{\"nose\": [1.0, 2.0], \"tail\": [3.0, 4.0]}"'
    csv.write_text(
        "filename,annotation,image_label\n"
        f"img0,{ann},dog\n"
        f"img1,{ann},cat\n"
    )
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_kp", "category": "keypoint_detection",
        "csv": str(csv), "label": "image_label",
        "src": str(src), "dest": str(dest), "extension": ".jpg",
        "number_of_keypoints": 2, "target_size": [64, 64],
    })
    assert_clean(s, t, 2)
    # manifest annotation JSON survives into the table
    assert all("nose" in r.annotation for r in t.select("annotation").collect())


def test_keypoint_wrong_count_fails_loud(spark, tmp_path):
    src, dest = file_tree(tmp_path, **{"images/img0.jpg": fake_img()})
    csv = tmp_path / "labels.csv"
    csv.write_text(
        'filename,annotation,image_label\n'
        'img0,"{\\"nose\\": [1.0, 2.0]}",dog\n'
    )
    with pytest.raises(ValueError, match="kp_wrong_count"):
        run_yaml(spark, tmp_path, {
            "table": "e2e_kp_bad", "category": "keypoint_detection",
            "csv": str(csv), "label": "image_label",
            "src": str(src), "dest": str(dest), "extension": ".jpg",
            "number_of_keypoints": 2,
        })


@pytest.mark.parametrize("category", ["semantic_segmentation", "instance_segmentation"])
def test_segmentation(spark, tmp_path, category):
    src, dest = file_tree(
        tmp_path,
        **{
            "images/img0.jpg": fake_img(),
            "images/img1.jpg": fake_img(),
            "masks/img0_mask.png": fake_img(),
            "masks/img1_mask.png": fake_img(),
        },
    )
    csv = tmp_path / "labels.csv"
    csv.write_text(
        "filename,mask_id,image_label\nimg0,img0_mask,road\nimg1,img1_mask,field\n"
    )
    s, t = run_yaml(spark, tmp_path, {
        "table": f"e2e_{category[:8]}", "category": category,
        "csv": str(csv), "label": "image_label",
        "src": str(src), "dest": str(dest), "extension": ".jpg",
        "target_size": [64, 64],
    })
    assert_clean(s, t, 2)
    for stem in ("img0", "img1"):
        assert (dest / f"{stem}.jpg").exists()
        assert (dest / f"{stem}_mask.png").exists()
    assert {r.mask_id for r in t.select("mask_id").collect()} == {
        "img0_mask", "img1_mask"
    }


# --- text family --------------------------------------------------------


def test_text_classification(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{
            "texts/t0.txt": b"great product would buy again",
            "texts/t1.txt": b"terrible broke on day one",
        },
    )
    csv = tmp_path / "labels.csv"
    csv.write_text("filename,label\nt0,pos\nt1,neg\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_text", "category": "text_classification",
        "csv": str(csv), "label": "label",
        "src": str(src), "dest": str(dest), "extension": ".txt",
    })
    assert_clean(s, t, 2)
    assert (dest / "t0.txt").exists() and (dest / "t1.txt").exists()


def test_token_classification_bio(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{
            "texts/t0.txt": b"John lives in Paris",
            "texts/t1.txt": b"Acme hired Jane",
        },
    )
    csv = tmp_path / "labels.csv"
    csv.write_text(
        "filename,label\n"
        't0,"B-PER O O B-LOC"\n'
        't1,"B-ORG O B-PER"\n'
    )
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_tok", "category": "token_classification",
        "csv": str(csv), "label": "label",
        "src": str(src), "dest": str(dest), "extension": ".txt",
    })
    assert_clean(s, t, 2)


def test_token_classification_misaligned_bio_fails_loud(spark, tmp_path):
    src, dest = file_tree(tmp_path, **{"texts/t0.txt": b"only two words no wait five"})
    csv = tmp_path / "labels.csv"
    csv.write_text('filename,label\nt0,"O O"\n')
    with pytest.raises(ValueError, match="tag count"):
        run_yaml(spark, tmp_path, {
            "table": "e2e_tok_bad", "category": "token_classification",
            "csv": str(csv), "label": "label",
            "src": str(src), "dest": str(dest), "extension": ".txt",
        })


def test_masked_language_modeling(spark, tmp_path):
    src, dest = file_tree(
        tmp_path,
        **{
            "sequences/s0.txt": b"the quick brown fox",
            "sequences/s1.txt": b"jumps over the lazy dog",
            "tokenizer.json": TOKENIZER_JSON.encode(),
        },
    )
    csv = tmp_path / "labels.csv"
    csv.write_text("filename\ns0\ns1\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_mlm", "category": "masked_language_modeling",
        "csv": str(csv),
        "src": str(src), "dest": str(dest), "extension": ".txt",
    })
    assert_clean(s, t, 2)
    # the tokenizer ships with the corpus (file_transfer.py:310-323)
    assert (dest / "tokenizer.json").exists()


def test_mlm_without_tokenizer_fails_loud(spark, tmp_path):
    src, dest = file_tree(tmp_path, **{"sequences/s0.txt": b"some text"})
    csv = tmp_path / "labels.csv"
    csv.write_text("filename\ns0\n")
    with pytest.raises(ValueError, match="tokenizer.json missing"):
        run_yaml(spark, tmp_path, {
            "table": "e2e_mlm_bad", "category": "masked_language_modeling",
            "csv": str(csv),
            "src": str(src), "dest": str(dest), "extension": ".txt",
        })

# --- non-CSV sources through the same YAML path -------------------------


def test_tabular_json_ndjson_source(spark, tmp_path):
    src = tmp_path / "data.json"
    src.write_text(
        '{"f0": 0.5, "f1": 1.25, "label": 1}\n'
        '{"f0": 0.75, "f1": 2.5, "label": 0}\n'
    )
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_json_nd", "category": "tabular_classification",
        "json": str(src),
        "schema": {"f0": "FLOAT", "f1": "FLOAT", "label": "INT"},
        "label": "label",
    })
    assert_clean(s, t, 2)


def test_tabular_json_array_source(spark, tmp_path):
    src = tmp_path / "data.json"
    src.write_text(
        '[{"f0": 0.5, "label": 1}, {"f0": 0.75, "label": 0},'
        ' {"f0": 1.5, "label": 1}]'
    )
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_json_arr", "category": "tabular_classification",
        "json": str(src),
        "schema": {"f0": "FLOAT", "label": "INT"},
        "label": "label",
    })
    assert_clean(s, t, 3)


def test_tabular_parquet_source(spark, tmp_path):
    src = str(tmp_path / "data_pq")
    spark.createDataFrame(
        [("2.5", "1"), ("3.5", "0")], "f0 string, label string"
    ).write.parquet(src)
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_pq", "category": "tabular_classification",
        "parquet": src,
        "schema": {"f0": "FLOAT", "label": "INT"},
        "label": "label",
    })
    assert_clean(s, t, 2)


def test_json_bad_record_fails_loud(spark, tmp_path):
    src = tmp_path / "data.json"
    src.write_text('{"f0": 0.5, "label": 1}\n{not json at all}\n')
    with pytest.raises(Exception, match="(?i)malformed|failfast|parse"):
        run_yaml(spark, tmp_path, {
            "table": "e2e_json_bad", "category": "tabular_classification",
            "json": str(src),
            "schema": {"f0": "FLOAT", "label": "INT"},
            "label": "label",
        })


def test_missing_file_quarantined_with_reason(spark, tmp_path):
    # img1 has no file on disk: its record must drop, be counted, land
    # in the __failed quarantine with the missing path, and trip
    # has_failures — while img0 ingests normally (issue #99 contract)
    src, dest = file_tree(tmp_path, **{"images/img0.jpg": fake_img()})
    csv = tmp_path / "labels.csv"
    csv.write_text("filename,label\nimg0,cat\nimg1,dog\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_quar", "category": "image_classification",
        "csv": str(csv), "label": "label",
        "src": str(src), "dest": str(dest), "extension": ".jpg",
        "target_size": [64, 64],
    })
    assert s.inserted == 1 and s.file_transfer_failures == 1
    assert s.has_failures
    failed = spark.read.parquet(str(tmp_path / "warehouse" / "e2e_quar__failed"))
    rows = failed.collect()
    assert len(rows) == 1
    assert "file_missing" in rows[0].error and "img1" in rows[0].error


def test_tabular_orc_source(spark, tmp_path):
    src = str(tmp_path / "data_orc")
    spark.createDataFrame(
        [("2.5", "1"), ("3.5", "0"), ("4.5", "1")], "f0 string, label string"
    ).write.orc(src)
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_orc", "category": "tabular_classification",
        "orc": src,
        "schema": {"f0": "FLOAT", "label": "INT"},
        "label": "label",
    })
    assert_clean(s, t, 3)


def test_tabular_csv_directory_source(spark, tmp_path):
    """A directory of CSV part-files (the standard multi-file export
    shape) ingests as one source: per-file headers are stripped and
    all rows land."""
    src = tmp_path / "csv_dir"
    src.mkdir()
    (src / "part-0.csv").write_text("f0,label\n1.5,1\n2.5,0\n")
    (src / "part-1.csv").write_text("f0,label\n3.5,1\n")
    (src / "part-2.csv").write_text("f0,label\n4.5,0\n5.5,1\n")
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_csvdir", "category": "tabular_classification",
        "csv": str(src),
        "schema": {"f0": "FLOAT", "label": "INT"},
        "label": "label",
    })
    assert_clean(s, t, 5)


def test_tabular_json_directory_source(spark, tmp_path):
    src = tmp_path / "json_dir"
    src.mkdir()
    (src / "a.json").write_text('{"f0": 1.5, "label": 1}\n{"f0": 2.5, "label": 0}\n')
    (src / "b.json").write_text('{"f0": 3.5, "label": 1}\n')
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_jsondir", "category": "tabular_classification",
        "json": str(src),
        "schema": {"f0": "FLOAT", "label": "INT"},
        "label": "label",
    })
    assert_clean(s, t, 3)


def test_custom_processor_yaml(spark, tmp_path):
    """examples/custom_processor.yaml's shape end-to-end: declared
    processors run against the conformed frame in order (reference
    ships the YAML but defers execution; here the clip is visible in
    the landed table)."""
    csv = tmp_path / "data.csv"
    csv.write_text(
        "account_id,monthly_spend,outcome\n"
        "a1,50.0,kept\n"
        "a2,-10.0,churned\n"     # clipped up to 0
        "a3,9999999.0,kept\n"    # clipped down to 1e6
    )
    s, t = run_yaml(spark, tmp_path, {
        "table": "e2e_custom_proc", "category": "tabular_classification",
        "csv": str(csv),
        "schema": {"account_id": "VARCHAR(64)", "monthly_spend": "FLOAT",
                   "outcome": "VARCHAR(64)"},
        "label": "outcome",
        "spec": {"processors": [
            "data_ingestors_spark.ingest.processors:drop_full_null_rows",
            {"function": "data_ingestors_spark.ingest.processors:clip_column",
             "args": {"column": "monthly_spend", "lo": 0.0, "hi": 1.0e6}},
        ]},
    })
    assert_clean(s, t, 3)
    spend = {r.account_id: r.monthly_spend for r in t.collect()}
    assert spend["a2"] == 0.0 and spend["a3"] == 1.0e6 and spend["a1"] == 50.0
