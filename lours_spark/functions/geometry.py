"""Box geometry: IoU, clipping, validity predicates.

Pure Catalyst expressions (whole-stage codegen, no Python):

- IoU between two boxes (reference vectorized numpy kernel
  ``lours/evaluation/detection/util.py:54-95``) as ``greatest``/
  ``least`` overlap arithmetic — used both standalone on joined box
  pairs and inside the grouped matcher;
- ``cap_bounding_box_coordinates`` clips boxes to image bounds
  (reference ``dataset.py:2919-3008``);
- malformed-bbox predicates (reference ``utils/testing.py:477-577``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def iou_columns(
    x1: Column, y1: Column, w1: Column, h1: Column,
    x2: Column, y2: Column, w2: Column, h2: Column,
) -> Column:
    """IoU of two XYWH boxes as a single expression (reference
    ``util.py:75-95``). Degenerate/disjoint pairs → 0.

    >>> df = spark.createDataFrame(
    ...     [(0.0, 0.0, 2.0, 2.0, 1.0, 0.0, 2.0, 2.0)],
    ...     "x1 double, y1 double, w1 double, h1 double,"
    ...     " x2 double, y2 double, w2 double, h2 double")
    >>> df.select(iou_columns(*[F.col(c) for c in
    ...     ["x1","y1","w1","h1","x2","y2","w2","h2"]]).alias("iou")).first()["iou"]
    0.3333333333333333
    """
    ix = F.greatest(
        F.lit(0.0), F.least(x1 + w1, x2 + w2) - F.greatest(x1, x2)
    )
    iy = F.greatest(
        F.lit(0.0), F.least(y1 + h1, y2 + h2) - F.greatest(y1, y2)
    )
    inter = ix * iy
    union = w1 * h1 + w2 * h2 - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def pairwise_iou(
    left: DataFrame,
    right: DataFrame,
    group_keys: list[str],
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Theta-join: all box pairs within a group with their IoU — an
    equi-join on the group keys with the IoU as a post-condition column
    (reference ``get_ious`` ``util.py:54-95``). Groups are per-image so
    the cross product stays tiny; the join shuffles on the group keys
    and parallelizes across images."""
    lcols = ["id", "box_x_min", "box_y_min", "box_width", "box_height"]
    l = left.select(
        *group_keys, *[F.col(c).alias(f"{left_prefix}{c}") for c in lcols]
    )
    r = right.select(
        *group_keys, *[F.col(c).alias(f"{right_prefix}{c}") for c in lcols]
    )
    joined = l.join(r, group_keys, "inner")
    return joined.withColumn(
        "iou",
        iou_columns(
            F.col(f"{left_prefix}box_x_min"),
            F.col(f"{left_prefix}box_y_min"),
            F.col(f"{left_prefix}box_width"),
            F.col(f"{left_prefix}box_height"),
            F.col(f"{right_prefix}box_x_min"),
            F.col(f"{right_prefix}box_y_min"),
            F.col(f"{right_prefix}box_width"),
            F.col(f"{right_prefix}box_height"),
        ),
    )


def cap_bounding_box_coordinates(
    annotations: DataFrame, images: DataFrame | None = None
) -> DataFrame:
    """Clip boxes to image bounds: x,y ≥ 0 and x+w ≤ width, y+h ≤ height
    (reference ``dataset.py:2919-3008``). Joins image sizes when the
    annotation table doesn't carry them."""
    df = annotations
    drop: list[str] = []
    if "width" not in df.columns:
        if images is None:
            raise ValueError("need the image table to know image bounds")
        sizes = images.select(
            F.col("id").alias("image_id"),
            F.col("width").alias("__img_w"),
            F.col("height").alias("__img_h"),
        )
        df = df.join(sizes, "image_id", "left")
        w_img, h_img = F.col("__img_w"), F.col("__img_h")
        drop = ["__img_w", "__img_h"]
    else:
        w_img, h_img = F.col("width"), F.col("height")

    x = F.greatest(F.lit(0.0), F.col("box_x_min"))
    y = F.greatest(F.lit(0.0), F.col("box_y_min"))
    w = F.least(F.col("box_x_min") + F.col("box_width"), w_img.cast("double")) - x
    h = F.least(F.col("box_y_min") + F.col("box_height"), h_img.cast("double")) - y
    df = (
        df.withColumn("__x", x)
        .withColumn("__y", y)
        .withColumn("box_width", F.greatest(F.lit(0.0), w))
        .withColumn("box_height", F.greatest(F.lit(0.0), h))
        .withColumn("box_x_min", F.col("__x"))
        .withColumn("box_y_min", F.col("__y"))
        .drop("__x", "__y", *drop)
    )
    return df


def bbox_validity(
    allow_keypoints: bool = False,
) -> dict[str, Column]:
    """Named malformed-box predicates (True = violation), matching the
    reference's report (``testing.py:477-577``). Image bounds checks
    expect ``width``/``height`` columns present (join first)."""
    x, y = F.col("box_x_min"), F.col("box_y_min")
    w, h = F.col("box_width"), F.col("box_height")
    size_bad = (w < 0) | (h < 0) if allow_keypoints else (w <= 0) | (h <= 0)
    return {
        "negative_coordinates": (x < 0) | (y < 0),
        "non_positive_size": size_bad,
        "exceeds_image": (x + w > F.col("width").cast("double"))
        | (y + h > F.col("height").cast("double")),
    }


def malformed_bounding_boxes(
    annotations: DataFrame,
    images: DataFrame | None = None,
    allow_keypoints: bool = False,
) -> DataFrame:
    """Filter to malformed rows with one bool column per violation
    (reference ``get_malformed_bounding_boxes``)."""
    df = annotations
    drop: list[str] = []
    if "width" not in df.columns:
        if images is None:
            raise ValueError("need the image table for bounds checks")
        sizes = images.select(
            F.col("id").alias("image_id"),
            F.col("width"),
            F.col("height"),
        )
        df = df.join(sizes, "image_id", "left")
        drop = []
    preds = bbox_validity(allow_keypoints=allow_keypoints)
    for name, p in preds.items():
        df = df.withColumn(name, F.coalesce(p, F.lit(False)))
    any_bad = None
    for name in preds:
        any_bad = F.col(name) if any_bad is None else (any_bad | F.col(name))
    return df.filter(any_bad)
