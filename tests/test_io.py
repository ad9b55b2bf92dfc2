from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lours_spark.io.coco import dataset_to_coco, from_coco
from lours_spark.io.common import construct_label_map_df, parse_annotation_name
from lours_spark.io.crowdhuman import from_crowd_human
from lours_spark.io.darknet import dataset_to_darknet, from_darknet
from lours_spark.io.mot import from_mot
from lours_spark.io.pascalvoc import from_pascalvoc


def test_parse_annotation_name():
    assert parse_annotation_name("mydataset_train") == ("mydataset", "train")
    assert parse_annotation_name("plain") == ("plain", None)
    assert parse_annotation_name("a_b_valid") == ("a_b", "valid")


def test_construct_label_map(tiny_dataset):
    lm = construct_label_map_df(tiny_dataset.annotations)
    assert lm == tiny_dataset.label_map


@pytest.fixture()
def coco_file(tmp_path):
    doc = {
        "images": [
            {"id": 1, "width": 640, "height": 480, "file_name": "a/1.jpg"},
            {"id": 2, "width": 320, "height": 240, "file_name": "a/2.png"},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1, "bbox": [5, 6, 20, 30]},
            {"id": 11, "image_id": 1, "category_id": 2, "bbox": [1, 2, 3, 4],
             "iscrowd": 1},
            {"id": 12, "image_id": 2, "category_id": 2, "bbox": [0, 0, 10, 10],
             "score": 0.75},
        ],
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    }
    p = tmp_path / "demo_train.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_from_coco(spark, coco_file):
    ds = from_coco(spark, coco_file)
    assert ds.dataset_name == "demo"
    assert ds.label_map == {1: "cat", 2: "dog"}
    assert ds.images.count() == 2
    anns = {r["id"]: r for r in ds.annotations.collect()}
    assert set(anns) == {10, 12}  # iscrowd dropped
    assert anns[10]["box_width"] == 20.0
    assert anns[10]["category_str"] == "cat"
    assert anns[12]["confidence"] == 0.75
    assert anns[10]["split"] == "train"


def test_coco_roundtrip(spark, coco_file, tmp_path):
    ds = from_coco(spark, coco_file)
    out = dataset_to_coco(ds, str(tmp_path / "out"))
    assert len(out) == 1
    back = from_coco(spark, out[0])
    assert back.label_map == ds.label_map
    assert back.images.count() == ds.images.count()
    assert back.annotations.count() == ds.annotations.count()
    a = {r["id"]: r for r in ds.annotations.collect()}
    b = {r["id"]: r for r in back.annotations.collect()}
    for k in a:
        assert a[k]["box_x_min"] == b[k]["box_x_min"]
        assert a[k]["category_id"] == b[k]["category_id"]


@pytest.fixture()
def darknet_tree(tmp_path, spark):
    labels = tmp_path / "labels"
    labels.mkdir()
    (labels / "img1.txt").write_text("0 0.5 0.5 0.2 0.2\n1 0.25 0.25 0.1 0.1\n")
    (labels / "img2.txt").write_text("")
    images = spark.createDataFrame(
        [(0, 100, 100, "img1.jpg"), (1, 200, 100, "img2.jpg")],
        "id long, width int, height int, relative_path string",
    )
    return str(labels), images


def test_from_darknet(spark, darknet_tree):
    labels_dir, images = darknet_tree
    ds = from_darknet(spark, labels_dir, images, names=["cat", "dog"])
    anns = sorted(ds.annotations.collect(), key=lambda r: r["category_id"])
    assert len(anns) == 2
    # cx=0.5,w=0.2 on a 100px image → x_min = (0.5-0.1)*100 = 40
    assert anns[0]["box_x_min"] == pytest.approx(40.0)
    assert anns[0]["box_width"] == pytest.approx(20.0)
    assert anns[0]["category_str"] == "cat"


def test_darknet_roundtrip(spark, darknet_tree, tmp_path):
    labels_dir, images = darknet_tree
    ds = from_darknet(spark, labels_dir, images, names=["cat", "dog"])
    out_dir = str(tmp_path / "yolo")
    dataset_to_darknet(ds, out_dir)
    assert (tmp_path / "yolo" / "classes.names").read_text() == "cat\ndog\n"
    back = from_darknet(
        spark, os.path.join(out_dir, "labels"), images, names=["cat", "dog"]
    )
    a = sorted(
        ds.annotations.select("image_id", "category_id", "box_x_min").collect()
    )
    b = sorted(
        back.annotations.select("image_id", "category_id", "box_x_min").collect()
    )
    for ra, rb in zip(a, b):
        assert ra["box_x_min"] == pytest.approx(rb["box_x_min"], abs=0.01)


def test_from_mot(spark, tmp_path):
    gt = tmp_path / "gt.txt"
    gt.write_text(
        "1,1,10,20,30,40,1,1,1.0\n"
        "1,2,50,60,70,80,0,1,1.0\n"  # conf 0 → dropped
        "2,1,15,25,35,45,0.9,1,0.5\n"
    )
    images = spark.createDataFrame(
        [(1, 1920, 1080, "000001.jpg"), (2, 1920, 1080, "000002.jpg")],
        "id long, width int, height int, relative_path string",
    )
    ds = from_mot(spark, str(gt), images)
    rows = ds.annotations.collect()
    assert len(rows) == 2
    by_img = {r["image_id"]: r for r in rows}
    assert by_img[1]["confidence"] is None  # conf==1 → null
    assert by_img[2]["confidence"] == pytest.approx(0.9)
    assert by_img[1]["category_str"] == "pedestrian"


def test_from_crowd_human(spark, tmp_path):
    lines = [
        json.dumps(
            {
                "ID": "img1",
                "gtboxes": [
                    {
                        "tag": "person",
                        "fbox": [10, 10, 100, 200],
                        "vbox": [10, 10, 100, 100],
                        "hbox": [40, 10, 30, 30],
                    }
                ],
            }
        )
    ]
    odgt = tmp_path / "ann.odgt"
    odgt.write_text("\n".join(lines) + "\n")
    images = spark.createDataFrame(
        [(0, 500, 500, "img1.jpg")],
        "id long, width int, height int, relative_path string",
    )
    ds = from_crowd_human(spark, str(odgt), images)
    rows = sorted(ds.annotations.collect(), key=lambda r: r["category_id"])
    assert len(rows) == 2
    person, head = rows
    assert person["category_str"] == "person"
    assert person["visible_share"] == pytest.approx(0.5)
    assert head["category_str"] == "head"
    assert head["box_width"] == 30.0


def test_from_pascalvoc(spark, tmp_path):
    ann_dir = tmp_path / "Annotations"
    ann_dir.mkdir()
    (ann_dir / "img1.xml").write_text(
        """<annotation>
  <filename>img1.jpg</filename>
  <size><width>640</width><height>480</height><depth>3</depth></size>
  <object><name>cat</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>220</ymax></bndbox>
  </object>
  <object><name>dog</name><difficult>1</difficult>
    <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>50</xmax><ymax>50</ymax></bndbox>
  </object>
</annotation>"""
    )
    sets = tmp_path / "ImageSets"
    sets.mkdir()
    (sets / "train.txt").write_text("img1\n")
    ds = from_pascalvoc(spark, str(ann_dir), str(sets))
    assert set(ds.label_map.values()) == {"cat", "dog"}
    rows = sorted(ds.annotations.collect(), key=lambda r: r["id"])
    assert rows[0]["box_width"] == 100.0  # xmax - xmin
    assert rows[1]["difficult"] is True
    assert ds.images.first()["split"] == "train"


def test_caipy_roundtrip(spark, tmp_path, tiny_dataset):
    from lours_spark.io.caipy import dataset_to_caipy, from_caipy

    # caipy needs non-null splits
    ds = tiny_dataset.filter_images(F.col("split").isNotNull())
    root = str(tmp_path / "caipy")
    dataset_to_caipy(ds, root)
    back = from_caipy(spark, root)
    assert back.images.count() == ds.images.count()
    assert back.annotations.count() == ds.annotations.count()
    a = {r["id"]: r for r in ds.annotations.collect()}
    b = {r["id"]: r for r in back.annotations.collect()}
    for k in a:
        assert a[k]["box_x_min"] == pytest.approx(b[k]["box_x_min"])
        assert a[k]["category_id"] == b[k]["category_id"]


def test_from_coco_keypoints(spark, tmp_path):
    from lours_spark.io.coco import from_coco_keypoints

    doc = {
        "images": [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "keypoints": [10, 20, 2, 30, 40, 0, 50, 60, 1]}
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    p = tmp_path / "kp.json"
    p.write_text(json.dumps(doc))
    ds = from_coco_keypoints(spark, str(p))
    rows = ds.annotations.collect()
    assert len(rows) == 2  # visibility-0 keypoint dropped
    assert all(r["box_width"] == 0.0 for r in rows)
    assert {(r["box_x_min"], r["box_y_min"]) for r in rows} == {(10.0, 20.0), (50.0, 60.0)}


def test_from_darknet_json(spark, tmp_path):
    from lours_spark.io.darknet import from_darknet_json

    doc = [
        {
            "filename": "data/img1.jpg",
            "objects": [
                {
                    "class_id": 0,
                    "name": "cat",
                    "relative_coordinates": {
                        "center_x": 0.5, "center_y": 0.5,
                        "width": 0.2, "height": 0.2,
                    },
                    "confidence": 0.9,
                }
            ],
        }
    ]
    p = tmp_path / "preds.json"
    p.write_text(json.dumps(doc))
    images = spark.createDataFrame(
        [(0, 100, 100, "img1.jpg")],
        "id long, width int, height int, relative_path string",
    )
    ds = from_darknet_json(spark, str(p), images, names=["cat"])
    r = ds.annotations.first()
    assert r["confidence"] == pytest.approx(0.9)
    assert r["box_x_min"] == pytest.approx(40.0)
    assert r["category_str"] == "cat"


def test_caipy_booleanize_roundtrip(spark, tmp_path, tiny_dataset):
    from lours_spark.io.caipy import dataset_to_caipy, from_caipy

    # give annotations a list column + booleanize tracking
    from lours_spark.operators.booleanize import booleanize

    ds = tiny_dataset.filter_images(F.col("split").isNotNull())
    ann = ds.annotations.withColumn(
        "colors",
        F.when(F.col("id") % 2 == 0, F.array(F.lit("red"), F.lit("blue")))
        .otherwise(F.array(F.lit("blue"))),
    )
    wide, domain = booleanize(ann, "colors", domain=["blue", "red"])
    ds = ds.from_template(
        annotations=wide, booleanized_columns={"colors": set(domain)}
    )
    root = str(tmp_path / "caipy_bool")
    dataset_to_caipy(ds, root)  # debooleanizes on write
    back = from_caipy(
        spark, root, booleanize_enums={"colors": ["blue", "red"]}
    )
    assert back.booleanized_columns == {"colors": {"blue", "red"}}
    assert "colors.red" in back.annotations.columns
    # even ids have red=True
    reds = back.annotations.filter(F.col("`colors.red`")).select("id").collect()
    assert all(r["id"] % 2 == 0 for r in reds)
