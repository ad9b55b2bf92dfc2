"""Annotation append operators (insert path).

Re-expresses reference ``lours/utils/annotations_appender.py``:
``add_detection_annotation`` (``:117-230``) appends N annotations from
arrays/scalars with broadcasting, allocates ids after the current max,
imports bboxes from any format, auto-fills ``area``, and outer-merges
the label map; ``AnnotationAppender`` (``:233-375``) buffers multiple
calls and flushes once.

Spark shape: new rows are a driver-side ``createDataFrame`` (appends
are human/model-output-sized) + one ``max(id)`` agg for the offset +
``unionByName`` — no shuffle. For bulk appends (model inference output
at scale) pass a DataFrame directly to ``append_annotations_df``.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lours_spark.dataset.core import SparkDataset
from lours_spark.dataset.merge import merge_label_maps
from lours_spark.functions.bbox import import_bbox


def _broadcast_scalars(kwargs: dict[str, Any]) -> tuple[int, dict[str, list]]:
    """Align scalar/list keyword values to a common length (reference
    ``annotations_appender.py:21-114`` scalar broadcasting)."""
    n = None
    for v in kwargs.values():
        if isinstance(v, (list, tuple)):
            if n is not None and n != len(v):
                raise ValueError(
                    f"inconsistent lengths: {n} vs {len(v)}"
                )
            n = len(v)
    n = n if n is not None else 1
    return n, {
        k: (list(v) if isinstance(v, (list, tuple)) else [v] * n)
        for k, v in kwargs.items()
    }


def append_annotations_df(
    ds: SparkDataset,
    new_annotations: DataFrame,
    label_map: dict[int, str] | None = None,
) -> SparkDataset:
    """Append a DataFrame of annotations: ids shifted past the current
    max, schemas reconciled, label maps outer-merged."""
    mx = ds.annotations.agg(F.max("id")).collect()[0][0]
    offset = (mx + 1) if mx is not None else 0
    from pyspark.sql import Window

    if "id" not in new_annotations.columns:
        new_annotations = new_annotations.withColumn(
            "id",
            F.row_number().over(Window.orderBy(F.lit(1))).cast("long") - 1,
        )
    new_annotations = new_annotations.withColumn(
        "id", F.col("id") + F.lit(offset)
    )
    from lours_spark.dataset.merge import _align_columns

    a, b = _align_columns(ds.annotations, new_annotations)
    merged_lm = merge_label_maps(ds.label_map, label_map or {})
    return ds.from_template(
        annotations=a.unionByName(b), label_map=merged_lm
    ).denormalize()


def add_detection_annotation(
    ds: SparkDataset,
    image_id: int | Sequence[int],
    category_id: int | Sequence[int],
    bbox: Sequence[Sequence[float]] | Sequence[float],
    confidence: float | Sequence[float] | None = None,
    box_format: str = "XYWH",
    label_map: dict[int, str] | None = None,
    auto_area: bool = True,
    **attributes: Any,
) -> SparkDataset:
    """Append detections from arrays with scalar broadcasting
    (reference ``annotations_appender.py:117-230``).

    >>> from lours_spark.dataset.core import SparkDataset
    >>> imgs = spark.createDataFrame(
    ...     [(1, 64, 48, "a.jpg", ".jpg", None)],
    ...     "id long, width int, height int, relative_path string,"
    ...     " type string, split string")
    >>> from lours_spark.dataset.schema import empty_annotations_schema
    >>> ann = spark.createDataFrame([], empty_annotations_schema())
    >>> ds = SparkDataset(images=imgs, annotations=ann, label_map={0: "cat"})
    >>> out = add_detection_annotation(
    ...     ds, image_id=1, category_id=0,
    ...     bbox=[[1.0, 2.0, 10.0, 5.0], [3.0, 3.0, 4.0, 4.0]])
    >>> out.len_annot()
    2
    >>> sorted(r["area"] for r in out.annotations.collect())
    [16.0, 50.0]
    """
    if bbox and not isinstance(bbox[0], (list, tuple)):
        bbox = [bbox]  # single box
    kwargs: dict[str, Any] = {
        "image_id": list(image_id) if isinstance(image_id, (list, tuple)) else image_id,
        "category_id": list(category_id)
        if isinstance(category_id, (list, tuple))
        else category_id,
        "__b0": [b[0] for b in bbox],
        "__b1": [b[1] for b in bbox],
        "__b2": [b[2] for b in bbox],
        "__b3": [b[3] for b in bbox],
    }
    if confidence is not None:
        kwargs["confidence"] = (
            list(confidence) if isinstance(confidence, (list, tuple)) else confidence
        )
    kwargs.update(attributes)
    n, aligned = _broadcast_scalars(kwargs)
    rows = [tuple(aligned[k][i] for k in aligned) for i in range(n)]
    spark = ds.spark
    new_df = spark.createDataFrame(rows, list(aligned.keys()))
    new_df = new_df.withColumn("image_id", F.col("image_id").cast("long"))
    new_df = new_df.withColumn("category_id", F.col("category_id").cast("int"))
    new_df = import_bbox(
        new_df, box_format, ["__b0", "__b1", "__b2", "__b3"], images=ds.images
    )
    if auto_area:
        new_df = new_df.withColumn(
            "area", F.col("box_width") * F.col("box_height")
        )
    return append_annotations_df(ds, new_df, label_map=label_map)


class AnnotationAppender:
    """Buffered multi-call appender, flushed on ``__exit__`` (reference
    ``annotations_appender.py:233-375``)."""

    def __init__(self, ds: SparkDataset, box_format: str = "XYWH"):
        self.ds = ds
        self.box_format = box_format
        self._calls: list[dict] = []
        self.result: SparkDataset | None = None

    def append(self, **kwargs: Any) -> None:
        self._calls.append(kwargs)

    def __enter__(self) -> "AnnotationAppender":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool | None:
        if exc_type is not None:
            return None
        out = self.ds
        for call in self._calls:
            out = add_detection_annotation(
                out, box_format=self.box_format, **call
            )
        self.result = out
        return None
