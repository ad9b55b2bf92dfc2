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


def test_dummy_dataset_spec_breadth(spark):
    """Reference doc_utils.py:230-748 spec surface: split_names forms,
    attribute/list columns (int / names / dict specs), booleanize
    modes, real image generation feeding the validation path."""
    from lours_spark.testing import dummy_dataset

    ds = dummy_dataset(
        spark,
        n_imgs=6,
        n_annot=12,
        split_names=None,
        n_list_columns_annotations={"tags": ["a", "b", "c"]},
        n_attribute_columns_images=["camera"],
        n_attributes_columns_annotations=1,
        booleanize_mode="all",
        seed=3,
    )
    assert "split" not in ds.images.columns
    assert "camera" in ds.images.columns
    # list column booleanized into tags.a / tags.b / tags.c (tracked
    # by domain values, the same convention io/caipy uses)
    assert ds.booleanized_columns == {"tags": {"a", "b", "c"}}
    assert {"tags.a", "tags.b", "tags.c"} <= set(ds.annotations.columns)
    assert "tags" not in ds.annotations.columns
    assert any(c.startswith("ann_attr") for c in ds.annotations.columns)

    # determinism: same seed+spec → identical datasets
    ds2 = dummy_dataset(
        spark,
        n_imgs=6,
        n_annot=12,
        split_names=None,
        n_list_columns_annotations={"tags": ["a", "b", "c"]},
        n_attribute_columns_images=["camera"],
        n_attributes_columns_annotations=1,
        booleanize_mode="all",
        seed=3,
    )
    from lours_spark.testing import assert_dataset_equal

    assert_dataset_equal(ds, ds2)

    # real images: generated files pass the validation operator
    real = dummy_dataset(spark, n_imgs=3, n_annot=3, generate_real_images=True, seed=4)
    assert real.get_invalid_images().count() == 0
    assert real.remove_invalid_images().images.count() == 3


def test_dataset_regression_cycle(tiny_dataset, tmp_path):
    import pytest as _pytest

    from lours_spark.testing import DatasetRegression

    reg = DatasetRegression(str(tmp_path), "cycle")
    # first run records the dump and fails (pytest-regressions protocol)
    with _pytest.raises(AssertionError, match="generated"):
        reg.check(tiny_dataset)
    # second run compares clean
    reg.check(tiny_dataset)
    # a mutated dataset must be caught
    mutated = tiny_dataset.from_template(
        annotations=tiny_dataset.annotations.withColumn(
            "category_id", F.col("category_id") + 1
        )
    )
    with _pytest.raises(AssertionError):
        reg.check(mutated)


def test_dataset_regression_fixture_smoke(dataset_regression, tiny_dataset):
    import shutil

    import pytest as _pytest

    # start from a clean slate so the record→compare protocol is
    # exercised deterministically on every run
    shutil.rmtree(
        f"{dataset_regression.datadir}/fixture_smoke.d", ignore_errors=True
    )
    with _pytest.raises(AssertionError, match="generated"):
        dataset_regression.check(tiny_dataset, basename="fixture_smoke")
    dataset_regression.check(tiny_dataset, basename="fixture_smoke")


def test_pytest_plugin_module_exposes_fixture():
    """The shippable plugin (entry point lours_spark.pytest_plugin,
    reference parity with its regression_testing pytest11 entry) must
    define the dataset_regression fixture and the --force-regen hook."""
    import lours_spark.pytest_plugin as plug

    assert hasattr(plug, "dataset_regression")
    assert callable(plug.pytest_addoption)
    # the fixture is a real pytest fixture object
    assert hasattr(plug.dataset_regression, "_pytestfixturefunction")


def test_dummy_dataset_single_split_no_null(spark):
    """A single-string split_names must put EVERY image in that split
    (the default 3-way shares used to leave a silent ~20% null tail)."""
    from lours_spark.testing import dummy_dataset

    ds = dummy_dataset(spark, n_imgs=40, n_annot=10, split_names="train", seed=5)
    rows = ds.images.select("split").collect()
    assert all(r["split"] == "train" for r in rows)


def test_frame_intersections_equal_dotted_columns(spark):
    """Booleanized (dotted) column names must compare, not parse as
    struct access."""
    from lours_spark.testing import assert_frame_intersections_equal

    a = spark.createDataFrame([(1, True), (2, False)], "id long, `t.x` boolean")
    b = spark.createDataFrame([(1, True), (3, True)], "id long, `t.x` boolean")
    assert_frame_intersections_equal(a, b)  # intersection: id=1, equal
    c = spark.createDataFrame([(1, False)], "id long, `t.x` boolean")
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="intersecting"):
        assert_frame_intersections_equal(a, c)


def test_dataset_regression_check_images_nested_and_dup_basenames(
    spark, tmp_path
):
    """check_images must checksum files in nested split subdirs and
    must NOT fan out when two splits share a basename."""
    import os

    from lours_spark.dataset.core import SparkDataset
    from lours_spark.testing import DatasetRegression

    root = tmp_path / "imgs"
    for rel, payload in (
        ("train/x.png", b"AAA"),
        ("valid/x.png", b"BBB"),
    ):
        p = root / rel
        os.makedirs(p.parent, exist_ok=True)
        p.write_bytes(payload)
    images = spark.createDataFrame(
        [(1, 4, 4, "train/x.png", "train"), (2, 4, 4, "valid/x.png", "valid")],
        "id long, width int, height int, relative_path string, split string",
    )
    annotations = spark.createDataFrame(
        [], "id long, image_id long, category_id long"
    )
    ds = SparkDataset(
        images=images,
        annotations=annotations,
        label_map={0: "thing"},
        dataset_name="nested",
        images_root=str(root),
    )
    reg = DatasetRegression(str(tmp_path / "reg"), "nested")
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="generated"):
        reg.check(ds, check_images=True)
    reg.check(ds, check_images=True)  # clean compare, no fan-out
    # content change under a nested dir must be caught
    (root / "train" / "x.png").write_bytes(b"CHANGED")
    with _pytest.raises(AssertionError):
        reg.check(ds, check_images=True)
