"""User-facing testing utilities.

Re-expresses reference ``lours/utils/testing.py`` (order-insensitive
dataset equality ``:91-172``, frame-intersection equality ``:174-211``)
and the seeded ``dummy_dataset`` generator
(``lours/utils/doc_utils.py:230-748``).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assert_frames_equal(
    a: DataFrame,
    b: DataFrame,
    ignore_columns: list[str] | None = None,
) -> None:
    """Order-insensitive frame equality: same columns (as sets), same
    row multiset (``exceptAll`` both ways empty)."""
    drop = set(ignore_columns or [])
    ca = sorted(set(a.columns) - drop)
    cb = sorted(set(b.columns) - drop)
    assert ca == cb, f"column mismatch: {ca} != {cb}"
    a2, b2 = a.select(*ca), b.select(*ca)
    extra = a2.exceptAll(b2).count()
    missing = b2.exceptAll(a2).count()
    assert extra == 0 and missing == 0, (
        f"{extra} rows only in left, {missing} rows only in right"
    )


def assert_dataset_equal(a, b, ignore_columns: list[str] | None = None) -> None:
    """Order-insensitive SparkDataset equality (reference
    ``assert_dataset_equal`` ``testing.py:91-172``)."""
    assert a.label_map == b.label_map, (
        f"label maps differ: {a.label_map} != {b.label_map}"
    )
    assert_frames_equal(a.images, b.images, ignore_columns)
    assert_frames_equal(a.annotations, b.annotations, ignore_columns)


def assert_frame_intersections_equal(
    a: DataFrame, b: DataFrame, key: str = "id"
) -> None:
    """Rows present in both (by key) must be identical on shared
    columns (reference ``testing.py:174-211``)."""
    shared = sorted((set(a.columns) & set(b.columns)) - {key})
    joined = a.select(key, *shared).alias("l").join(
        b.select(key, *shared).alias("r"), key
    )
    diff = None
    for c in shared:
        p = ~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        diff = p if diff is None else (diff | p)
    n = joined.filter(diff).count() if diff is not None else 0
    assert n == 0, f"{n} intersecting rows differ"


def dummy_dataset(
    spark: SparkSession,
    n_imgs: int = 20,
    n_annot: int = 50,
    n_labels: int = 4,
    split_shares: tuple[float, ...] = (0.8, 0.1, 0.1),
    keypoints_share: float = 0.0,
    add_confidence: bool = False,
    seed: int = 0,
):
    """Seeded synthetic dataset (reference ``doc_utils.py:230-748``):
    deterministic image sizes/paths, skewed annotations with valid
    boxes, optional zero-size keypoint boxes and confidences."""
    from lours_spark.dataset.core import SparkDataset

    rng = random.Random(seed)
    splits = ["train", "valid", "eval"][: len(split_shares)]
    images = []
    for i in range(n_imgs):
        r = rng.random()
        cum, chosen = 0.0, None
        for s, share in zip(splits, split_shares):
            cum += share
            if r < cum:
                chosen = s
                break
        images.append(
            (
                i,
                rng.randint(64, 2048),
                rng.randint(64, 2048),
                f"images/{seed}_{i}.jpg",
                ".jpg",
                chosen,
            )
        )
    label_map = {i * 3 + 1: f"class_{i}" for i in range(n_labels)}
    cats = list(label_map)
    annotations = []
    for aid in range(n_annot):
        img = rng.randrange(n_imgs)
        w_img, h_img = images[img][1], images[img][2]
        if rng.random() < keypoints_share:
            bw = bh = 0.0
            x = rng.uniform(0, w_img)
            y = rng.uniform(0, h_img)
        else:
            bw = rng.uniform(1, w_img / 2)
            bh = rng.uniform(1, h_img / 2)
            x = rng.uniform(0, w_img - bw)
            y = rng.uniform(0, h_img - bh)
        row = [aid, img, rng.choice(cats), x, y, bw, bh]
        if add_confidence:
            row.append(rng.random())
        annotations.append(tuple(row))
    ann_schema = (
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double"
        + (", confidence double" if add_confidence else "")
    )
    return SparkDataset(
        images=spark.createDataFrame(
            images,
            "id long, width int, height int, relative_path string, "
            "type string, split string",
        ),
        annotations=spark.createDataFrame(annotations, ann_schema),
        label_map=label_map,
        dataset_name=f"dummy_{seed}",
    ).denormalize()
