from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.dataset.core import SparkDataset
from lours_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lours-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_dataset(spark) -> SparkDataset:
    """A small deterministic images+annotations dataset matching the
    reference's dummy_dataset shape (FIXTURES.md schemas)."""
    import random

    rng = random.Random(42)
    images = []
    for i in range(40):
        images.append(
            (
                i,
                rng.randint(64, 1024),
                rng.randint(64, 1024),
                f"dir{i % 3}/img{i}.jpg",
                ".jpg",
                rng.choice(["train", "valid", "eval", None]),
                rng.randint(0, 4),
            )
        )
    annotations = []
    aid = 0
    label_map = {1: "car", 2: "person", 7: "truck", 15: "bike"}
    for i in range(40):
        w, h = images[i][1], images[i][2]
        for _ in range(rng.randint(0, 6)):
            bw = rng.uniform(4, w / 2)
            bh = rng.uniform(4, h / 2)
            annotations.append(
                (
                    aid,
                    i,
                    rng.choice(list(label_map)),
                    rng.uniform(0, w - bw),
                    rng.uniform(0, h - bh),
                    bw,
                    bh,
                    rng.uniform(0, 1),
                )
            )
            aid += 1
    images_df = spark.createDataFrame(
        images,
        "id long, width int, height int, relative_path string, type string, "
        "split string, camera_id int",
    )
    ann_df = spark.createDataFrame(
        annotations,
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double, confidence double",
    )
    return SparkDataset(
        images=images_df, annotations=ann_df, label_map=label_map
    ).denormalize()


def pytest_addoption(parser):
    # the same option is registered by the shipped plugin
    # (lours_spark.pytest_plugin) when the package is installed
    try:
        parser.addoption(
            "--force-regen",
            action="store_true",
            default=False,
            help="regenerate dataset_regression recordings",
        )
    except ValueError:
        pass


@pytest.fixture
def dataset_regression(request):
    """Reference-style dataset regression fixture
    (lours/utils/regression_testing.py:157-187): recordings live under
    tests/regression_data/<test_name>.d."""
    import os

    from lours_spark.testing import DatasetRegression

    datadir = os.path.join(os.path.dirname(__file__), "regression_data")
    os.makedirs(datadir, exist_ok=True)
    return DatasetRegression(
        datadir,
        request.node.name,
        force_regen=request.config.getoption("--force-regen"),
    )
