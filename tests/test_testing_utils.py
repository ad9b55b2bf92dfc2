from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.testing import (
    assert_dataset_equal,
    assert_frame_intersections_equal,
    assert_frames_equal,
    dummy_dataset,
)


def test_assert_frames_equal_order_insensitive(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id long, v string")
    assert_frames_equal(a, b)
    c = spark.createDataFrame([(1, "x"), (3, "z")], "id long, v string")
    with pytest.raises(AssertionError):
        assert_frames_equal(a, c)


def test_assert_dataset_equal_self(tiny_dataset):
    assert_dataset_equal(tiny_dataset, tiny_dataset)
    other = tiny_dataset.filter_images(F.col("id") < 10)
    with pytest.raises(AssertionError):
        assert_dataset_equal(tiny_dataset, other)


def test_assert_frame_intersections(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(2, "y"), (3, "z")], "id long, v string")
    assert_frame_intersections_equal(a, b)
    c = spark.createDataFrame([(2, "DIFFERENT")], "id long, v string")
    with pytest.raises(AssertionError):
        assert_frame_intersections_equal(a, c)


def test_dummy_dataset_deterministic(spark):
    a = dummy_dataset(spark, n_imgs=10, n_annot=30, seed=5)
    b = dummy_dataset(spark, n_imgs=10, n_annot=30, seed=5)
    assert_dataset_equal(a, b)
    assert a.check() == {
        "duplicate_image_ids": 0,
        "duplicate_annotation_ids": 0,
        "orphan_annotations": 0,
        "unknown_categories": 0,
    }
    # boxes valid by construction
    from lours_spark.functions.geometry import malformed_bounding_boxes

    assert malformed_bounding_boxes(a.annotations, images=a.images).count() == 0


def test_dummy_dataset_keypoints_and_confidence(spark):
    ds = dummy_dataset(
        spark, n_imgs=5, n_annot=40, keypoints_share=0.5, add_confidence=True, seed=2
    )
    n_kp = ds.annotations.filter(F.col("box_width") == 0).count()
    assert 5 < n_kp < 35
    assert "confidence" in ds.annotations.columns
