"""Fiftyone export — reference ``lours/utils/fiftyone_convert.py``
re-expressed Spark-first.

The reference builds one ``fo.Sample`` per image in a tqdm driver loop
over pandas frames (``fiftyone_convert.py:300-321``). Fiftyone itself
is a local MongoDB-backed app, so the final ingestion is inherently
driver-side — but everything before it is not:

- column-name compatibility renames (``fiftyone_convert.py:16-56``),
- bbox conversion to fiftyone's relative xywh,
- the detection/keypoint split (box of size 0 → keypoint,
  ``fiftyone_convert.py:114-128``),
- per-image grouping of detections,

all run distributed here (:func:`fiftyone_samples` — one output row per
image with nested detection arrays). :func:`dataset_to_fiftyone` then
streams that frame through ``toLocalIterator`` so the driver holds ONE
image's sample at a time, never the corpus, and hands each to fiftyone.
The fiftyone import is a guarded seam: absent (as in this container)
the distributed half stays fully testable and the ingestion raises.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from lours_spark.dataset.core import SparkDataset


def try_import_fiftyone():
    """Reference ``lours/utils/__init__.py`` ``try_import_fiftyone``:
    fiftyone is an optional extra; return None when unavailable."""
    try:
        import fiftyone  # type: ignore

        return fiftyone
    except ImportError:
        return None


def make_fiftyone_compatible(
    df: DataFrame,
    column_names: Sequence[str] = (),
    replacement_string: str = "->",
) -> tuple[DataFrame, list[str]]:
    """Rename columns fiftyone can't store (reference
    ``fiftyone_convert.py:16-56``): ``.`` → ``replacement_string`` and
    the ``attributes`` prefix → ``attr`` (the fiftyone web app crashes
    filtering on columns named ``attributes*``).

    >>> df = spark.createDataFrame([(1, 2, 3)],
    ...     "`attributes.color` int, plain int, `a.b` int")
    >>> out, names = make_fiftyone_compatible(
    ...     df, ["attributes.color", "plain", "a.b"])
    >>> names
    ['attr->color', 'plain', 'a->b']
    >>> sorted(out.columns)
    ['a->b', 'attr->color', 'plain']
    """
    if not column_names:
        return df, []
    renamed = df
    new_names = []
    for name in column_names:
        new = name.replace(".", replacement_string).replace(
            "attributes", "attr"
        )
        new_names.append(new)
        if new != name and name in renamed.columns:
            renamed = renamed.withColumnRenamed(name, new)
    return renamed, new_names


def fiftyone_samples(
    dataset: "SparkDataset",
    attribute_columns: Sequence[str] = (),
    image_tag_columns: Sequence[str] = (),
    allow_keypoints: bool = True,
) -> DataFrame:
    """One row per image, shaped like a fiftyone sample: image fields +
    ``detections`` / ``keypoints`` arrays of label structs with
    fiftyone-relative xywh boxes.

    This is the distributed 99% of the export: bbox conversion and the
    keypoint split are Column expressions, the per-image nesting is one
    ``groupBy(image_id)`` — a single shuffle on annotation rows, then a
    broadcast-or-colocated join back to images. Scale-safe at any
    corpus size; only the fiftyone hand-off (:func:`dataset_to_fiftyone`)
    is driver-bound.
    """
    ann = dataset.annotations
    if "category_str" not in ann.columns and dataset.label_map:
        from lours_spark.dataset.core import _map_literal

        ann = ann.withColumn(
            "category_str",
            F.coalesce(
                _map_literal(dataset.label_map)[F.col("category_id")],
                F.col("category_id").cast("string"),
            ),
        )
    ann, attr_cols = make_fiftyone_compatible(ann, list(attribute_columns))
    images, tag_cols = make_fiftyone_compatible(
        dataset.images, list(image_tag_columns)
    )

    # fiftyone bounding boxes are relative [x/W, y/H, w/W, h/H]
    sizes = images.select(
        F.col("id").alias("__img_id"),
        F.col("width").alias("__w"),
        F.col("height").alias("__h"),
    )
    ann = ann.join(sizes, ann.image_id == sizes["__img_id"], "left")
    rel_box = F.array(
        F.col("box_x_min") / F.col("__w"),
        F.col("box_y_min") / F.col("__h"),
        F.col("box_width") / F.col("__w"),
        F.col("box_height") / F.col("__h"),
    )
    is_kp = (
        (F.col("box_width") == 0) & (F.col("box_height") == 0)
        if allow_keypoints
        else F.lit(False)
    )
    label = F.struct(
        F.col("category_str").alias("label"),
        F.col("category_id").alias("label_id"),
        F.col("id").alias("lours_id"),
        rel_box.alias("bounding_box"),
        *[F.col(c).cast("string").alias(c) for c in attr_cols],
    )
    per_image = (
        ann.withColumn("__is_kp", is_kp)
        .groupBy("image_id")
        .agg(
            F.collect_list(F.when(~F.col("__is_kp"), label)).alias(
                "detections"
            ),
            F.collect_list(F.when(F.col("__is_kp"), label)).alias("keypoints"),
        )
    )
    keep = ["id", "relative_path", "width", "height"] + (
        ["split"] if "split" in images.columns else []
    )
    return (
        images.select(*keep, *[c for c in tag_cols if c in images.columns])
        .join(per_image, F.col("id") == per_image.image_id, "left")
        .drop("image_id")
        .withColumn("detections", F.coalesce("detections", F.array()))
        .withColumn("keypoints", F.coalesce("keypoints", F.array()))
    )


def dataset_to_fiftyone(
    dataset: "SparkDataset",
    name: str,
    attribute_columns: Sequence[str] = (),
    image_tag_columns: Sequence[str] = (),
    allow_keypoints: bool = True,
    existing: str = "error",
):
    """Create/refresh the named fiftyone dataset from ``dataset``
    (reference ``create_fo_dataset`` / ``dataset_to_fiftyone``,
    ``fiftyone_convert.py:146-341``). Samples stream one image at a
    time; batching into ``add_samples`` every 1000 keeps mongo round
    trips amortized without holding the corpus.

    Raises ``ImportError`` when fiftyone isn't installed (optional
    dependency; absent in this container — the distributed sample
    construction above is the tested surface).
    """
    fo = try_import_fiftyone()
    if fo is None:
        raise ImportError(
            "fiftyone is not installed; install the 'fiftyone' extra to "
            "export (the sample-construction plan is fiftyone_samples())"
        )
    if fo.dataset_exists(name):
        if existing == "erase":
            fo.delete_dataset(name)
            result = fo.Dataset(name)
        elif existing == "update":
            result = fo.load_dataset(name)
        else:
            raise FileExistsError(f"fiftyone dataset {name!r} already exists")
    else:
        result = fo.Dataset(name)

    import os

    frame = fiftyone_samples(
        dataset, attribute_columns, image_tag_columns, allow_keypoints
    )
    tag_cols = [
        c
        for c in frame.columns
        if c
        not in ("id", "relative_path", "width", "height", "split",
                "detections", "keypoints")
    ]
    batch = []
    for row in frame.toLocalIterator():
        d = row.asDict(recursive=True)
        sample = fo.Sample(
            filepath=os.path.join(dataset.images_root, d["relative_path"]),
            lours_id=d["id"],
            relative_path=d["relative_path"],
            metadata=fo.ImageMetadata(width=d["width"], height=d["height"]),
            split=d.get("split"),
            **{c: d[c] for c in tag_cols if d.get(c) is not None},
        )
        if d["detections"]:
            sample["detection"] = fo.Detections(
                detections=[
                    fo.Detection(
                        **{k: v for k, v in det.items() if v is not None}
                    )
                    for det in d["detections"]
                ]
            )
        if d["keypoints"]:
            sample["keypoint"] = fo.Keypoints(
                keypoints=[
                    fo.Keypoint(
                        label=kp["label"],
                        label_id=kp["label_id"],
                        lours_id=kp["lours_id"],
                        points=[kp["bounding_box"][:2]],
                    )
                    for kp in d["keypoints"]
                ]
            )
        batch.append(sample)
        if len(batch) >= 1000:
            result.add_samples(batch, dynamic=True)
            batch = []
    if batch:
        result.add_samples(batch, dynamic=True)
    result.add_dynamic_sample_fields()
    result.save()
    return result
