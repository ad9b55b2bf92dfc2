"""Schema conventions for the two-table dataset model.

Mirrors the reference's required/default column system
(reference ``lours/dataset/dataset.py:51-70``): a small required core,
typed defaults, and an open schema beyond that ("attributes").
Canonical bbox format is XYWH in absolute pixels
(reference ``lours/utils/__init__.py:9-12``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical bbox column names (XYWH, absolute pixels).
BBOX_COLUMN_NAMES = ["box_x_min", "box_y_min", "box_width", "box_height"]

IMAGES_REQUIRED = {"id", "width", "height", "relative_path"}
ANNOTATIONS_REQUIRED = {"id", "image_id", "category_id", *BBOX_COLUMN_NAMES}

IMAGES_DEFAULT_TYPES: dict[str, T.DataType] = {
    "id": T.LongType(),
    "width": T.IntegerType(),
    "height": T.IntegerType(),
    "relative_path": T.StringType(),
    "type": T.StringType(),
    "split": T.StringType(),
}

ANNOTATIONS_DEFAULT_TYPES: dict[str, T.DataType] = {
    "id": T.LongType(),
    "image_id": T.LongType(),
    "category_id": T.IntegerType(),
    "category_str": T.StringType(),
    "split": T.StringType(),
    "box_x_min": T.DoubleType(),
    "box_y_min": T.DoubleType(),
    "box_width": T.DoubleType(),
    "box_height": T.DoubleType(),
}


def empty_images_schema(extra: list[tuple[str, T.DataType]] | None = None) -> T.StructType:
    fields = [T.StructField(n, t, True) for n, t in IMAGES_DEFAULT_TYPES.items()]
    for n, t in extra or []:
        fields.append(T.StructField(n, t, True))
    return T.StructType(fields)


def empty_annotations_schema(
    extra: list[tuple[str, T.DataType]] | None = None,
) -> T.StructType:
    fields = [T.StructField(n, t, True) for n, t in ANNOTATIONS_DEFAULT_TYPES.items()]
    for n, t in extra or []:
        fields.append(T.StructField(n, t, True))
    return T.StructType(fields)


def image_attribute_columns(columns: list[str]) -> list[str]:
    """Columns beyond the default image schema (open-schema attributes).

    >>> image_attribute_columns(["id", "width", "camera_id"])
    ['camera_id']
    """
    return [c for c in columns if c not in IMAGES_DEFAULT_TYPES]


def annotation_attribute_columns(columns: list[str]) -> list[str]:
    return [c for c in columns if c not in ANNOTATIONS_DEFAULT_TYPES]
