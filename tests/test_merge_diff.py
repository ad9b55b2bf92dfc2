from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.dataset.merge import LabelMapConflictError, merge_label_maps


def test_merge_label_maps_conflict():
    assert merge_label_maps({1: "a"}, {2: "b"}) == {1: "a", 2: "b"}
    with pytest.raises(LabelMapConflictError):
        merge_label_maps({1: "a"}, {1: "b"})


def test_merge_disjoint(tiny_dataset):
    a = tiny_dataset.filter_images(F.col("id") < 20)
    b = tiny_dataset.filter_images(F.col("id") >= 20)
    merged = a.merge(b)
    assert merged.images.count() == tiny_dataset.images.count()
    assert merged.annotations.count() == tiny_dataset.annotations.count()
    assert merged.label_map == tiny_dataset.label_map


def test_merge_mark_origin(tiny_dataset):
    a = tiny_dataset.filter_images(F.col("id") < 20).from_template(
        dataset_name="left_ds"
    )
    b = tiny_dataset.filter_images(F.col("id") >= 20).from_template(
        dataset_name="right_ds"
    )
    merged = a.merge(b, mark_origin=True)
    origins = {
        r["origin"] for r in merged.images.select("origin").distinct().collect()
    }
    assert origins == {"left_ds", "right_ds"}


def test_merge_overlapping_images_dedup(tiny_dataset):
    a = tiny_dataset.filter_images(F.col("id") < 30)
    b = tiny_dataset.filter_images(F.col("id") >= 15)
    merged = a.merge(b)
    # overlap ids 15..29 kept once
    assert merged.images.count() == tiny_dataset.images.count()
    assert (
        merged.images.groupBy("id").count().filter(F.col("count") > 1).count() == 0
    )


def test_merge_annotation_id_shift(tiny_dataset):
    a = tiny_dataset
    # same annotation ids on both sides → right side must be shifted
    b = tiny_dataset.from_template(
        images=tiny_dataset.images.withColumn("id", F.col("id") + 500),
        annotations=tiny_dataset.annotations.withColumn(
            "image_id", F.col("image_id") + 500
        ),
    )
    merged = a.merge(b)
    assert (
        merged.annotations.groupBy("id").count().filter(F.col("count") > 1).count()
        == 0
    )
    assert merged.annotations.count() == 2 * tiny_dataset.annotations.count()


def test_merge_missing_columns(tiny_dataset):
    b = tiny_dataset.from_template(
        images=tiny_dataset.images.withColumn("weather", F.lit("sunny")).withColumn(
            "id", F.col("id") + 500
        ),
        annotations=tiny_dataset.annotations.withColumn(
            "image_id", F.col("image_id") + 500
        ),
    )
    merged = tiny_dataset.merge(b)
    assert "weather" in merged.images.columns
    # left rows got nulls
    assert merged.images.filter(
        (F.col("id") < 500) & F.col("weather").isNotNull()
    ).count() == 0


def test_diff_three_way(tiny_dataset):
    a = tiny_dataset.filter_images(F.col("id") < 30)
    b = tiny_dataset.filter_images(F.col("id") >= 15)
    d = a.diff(b)
    status = {r["id"]: r["diff_status"] for r in d["status"].collect()}
    n = tiny_dataset.images.count()
    for i in range(n):
        expected = (
            "left_only" if i < 15 else "common" if i < 30 else "right_only"
        )
        assert status[i] == expected, (i, status[i])


def test_diff_detects_changed_rows(tiny_dataset):
    b = tiny_dataset.from_template(
        images=tiny_dataset.images.withColumn(
            "width",
            F.when(F.col("id") == 3, F.col("width") + 1).otherwise(F.col("width")),
        )
    )
    d = tiny_dataset.diff(b)
    status = {r["id"]: r["diff_status"] for r in d["status"].collect()}
    assert status[3] == "changed"
    assert status[4] == "common"


def test_diff_annotation_change_marks_image_changed(tiny_dataset):
    some_img = tiny_dataset.annotations.select("image_id").first()["image_id"]
    b = tiny_dataset.from_template(
        annotations=tiny_dataset.annotations.withColumn(
            "box_width",
            F.when(
                F.col("image_id") == some_img, F.col("box_width") + 1
            ).otherwise(F.col("box_width")),
        )
    )
    d = tiny_dataset.diff(b)
    status = {r["id"]: r["diff_status"] for r in d["status"].collect()}
    assert status[some_img] == "changed"


def test_diff_booleanized_dotted_columns(tiny_dataset):
    """Booleanized (dot-named) annotation columns are FLAT columns —
    diff must backtick-quote them, not parse struct-field paths."""
    a = tiny_dataset.from_template(
        annotations=tiny_dataset.annotations.withColumn(
            "tags.a", F.col("id") % 2 == 0
        ).withColumn("tags.b", F.lit(False))
    )
    b = a.from_template(
        annotations=a.annotations.withColumn(
            "tags.a", F.lit(True)
        )
    )
    d = a.diff(b)
    status = {r["diff_status"] for r in d["status"].collect()}
    assert "changed" in status  # flipped tags.a rolled up to images
    same = a.diff(a)
    assert {r["diff_status"] for r in same["status"].collect()} == {"common"}
