from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.functions.bbox import (
    convert_bbox,
    export_bbox,
    import_bbox,
    parse_bbox_format,
)
from lours_spark.functions.geometry import (
    cap_bounding_box_coordinates,
    malformed_bounding_boxes,
    pairwise_iou,
)

ALL_FORMATS = ["xywh", "xyxy", "xxyy", "cxcywh", "cxwcyh", "xwyh"]


def test_parse_formats():
    f = parse_bbox_format("cxcywh")
    assert f.tokens == ("x_center", "y_center", "width", "height")
    assert f.relative
    f2 = parse_bbox_format("XXYY")
    assert f2.tokens == ("x_min", "x_max", "y_min", "y_max")
    assert not f2.relative
    with pytest.raises(ValueError):
        parse_bbox_format("zzz")


@pytest.mark.parametrize("fmt", [f.upper() for f in ALL_FORMATS])
def test_absolute_roundtrip(spark, fmt):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0, 30.0, 40.0)],
        "id long, box_x_min double, box_y_min double, box_width double, box_height double",
    )
    out = export_bbox(df, fmt)
    back = import_bbox(out, fmt, drop_input=True)
    row = back.select(
        "box_x_min", "box_y_min", "box_width", "box_height"
    ).first()
    assert row["box_x_min"] == pytest.approx(10.0)
    assert row["box_y_min"] == pytest.approx(20.0)
    assert row["box_width"] == pytest.approx(30.0)
    assert row["box_height"] == pytest.approx(40.0)


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_relative_roundtrip(spark, fmt):
    images = spark.createDataFrame([(7, 640, 480)], "id long, width int, height int")
    df = spark.createDataFrame(
        [(1, 7, 10.0, 20.0, 30.0, 40.0)],
        "id long, image_id long, box_x_min double, box_y_min double, "
        "box_width double, box_height double",
    )
    out = export_bbox(df, fmt, images=images, drop_canonical=True)
    back = import_bbox(out, fmt, images=images)
    row = back.select(
        "box_x_min", "box_y_min", "box_width", "box_height"
    ).first()
    assert row["box_x_min"] == pytest.approx(10.0)
    assert row["box_width"] == pytest.approx(30.0)


def test_convert_bbox_composition(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 15.0, 10.0, 20.0)], "id long, a double, b double, c double, d double"
    )
    out = convert_bbox(df, "XYXY", "XYWH", input_columns=["a", "b", "c", "d"])
    row = out.first()
    assert row["box_x_min"] == 5.0
    assert row["box_width"] == 5.0  # 10 - 5
    assert row["box_height"] == 5.0  # 20 - 15


def test_cap_bbox(spark):
    images = spark.createDataFrame([(1, 100, 100)], "id long, width int, height int")
    df = spark.createDataFrame(
        [
            (1, 1, -10.0, -5.0, 50.0, 50.0),  # clips x,y to 0, shrinks w,h
            (2, 1, 80.0, 90.0, 50.0, 50.0),  # clips w,h to border
            (3, 1, 10.0, 10.0, 20.0, 20.0),  # untouched
        ],
        "id long, image_id long, box_x_min double, box_y_min double, "
        "box_width double, box_height double",
    )
    rows = {
        r["id"]: r
        for r in cap_bounding_box_coordinates(df, images=images).collect()
    }
    assert rows[1]["box_x_min"] == 0.0 and rows[1]["box_width"] == 40.0
    assert rows[2]["box_width"] == 20.0 and rows[2]["box_height"] == 10.0
    assert rows[3]["box_x_min"] == 10.0 and rows[3]["box_width"] == 20.0


def test_malformed_report(spark):
    images = spark.createDataFrame([(1, 100, 100)], "id long, width int, height int")
    df = spark.createDataFrame(
        [
            (1, 1, -1.0, 0.0, 10.0, 10.0),
            (2, 1, 0.0, 0.0, 0.0, 10.0),
            (3, 1, 95.0, 0.0, 10.0, 10.0),
            (4, 1, 5.0, 5.0, 10.0, 10.0),
        ],
        "id long, image_id long, box_x_min double, box_y_min double, "
        "box_width double, box_height double",
    )
    bad = malformed_bounding_boxes(df, images=images)
    ids = {r["id"] for r in bad.collect()}
    assert ids == {1, 2, 3}
    flags = {r["id"]: r for r in bad.collect()}
    assert flags[1]["negative_coordinates"]
    assert flags[2]["non_positive_size"]
    assert flags[3]["exceeds_image"]


def test_pairwise_iou_values(spark):
    df = spark.createDataFrame(
        [
            (1, 1, 0.0, 0.0, 10.0, 10.0),
            (2, 1, 5.0, 0.0, 10.0, 10.0),  # overlap 50 → IoU 50/150
            (3, 1, 100.0, 100.0, 5.0, 5.0),  # disjoint
        ],
        "id long, image_id long, box_x_min double, box_y_min double, "
        "box_width double, box_height double",
    )
    pairs = pairwise_iou(df, df, ["image_id"]).filter(
        F.col("l_id") < F.col("r_id")
    )
    vals = {(r["l_id"], r["r_id"]): r["iou"] for r in pairs.collect()}
    assert vals[(1, 2)] == pytest.approx(50.0 / 150.0)
    assert vals[(1, 3)] == 0.0
    assert vals[(2, 3)] == 0.0
