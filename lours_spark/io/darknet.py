"""Darknet / YOLO text-format reader/writer.

Re-expresses reference ``lours/dataset/io/darknet.py``: one ``.txt``
per image with lines ``class cx cy w h [confidence]`` in relative
``cxcywh`` coordinates, a names file, and per-split image-list files.

Spark shape: ``spark.read.text`` over the label directory with
``input_file_name()`` — the parse is pure column expressions
(split + cast), fully distributed; the bbox conversion is the §2.6
relative-import expression. Writing groups lines per image with
``collect_list`` and fans out through ``foreachPartition`` so no
single-node bottleneck exists on the label files; only the tiny
manifest files are driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lours_spark.dataset.core import SparkDataset
from lours_spark.functions.bbox import import_bbox


def from_darknet(
    spark: SparkSession,
    labels_dir: str,
    images_df: DataFrame,
    names: list[str],
    split: str | None = None,
) -> SparkDataset:
    """Read YOLO txt labels (reference ``io/darknet.py:120-300``).

    ``images_df`` must carry (id, width, height, relative_path) where
    the label file for an image is ``<stem>.txt`` — sizes come from the
    image table because darknet files store relative coords.
    """
    raw = spark.read.text(f"{labels_dir}/*.txt").withColumn(
        "__file", F.input_file_name()
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    parsed = (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .withColumn(
            "__stem",
            F.regexp_extract(F.col("__file"), r"([^/]+)\.txt$", 1),
        )
        .select(
            "__stem",
            parts[0].cast("int").alias("category_id"),
            parts[1].cast("double").alias("rcx"),
            parts[2].cast("double").alias("rcy"),
            parts[3].cast("double").alias("rw"),
            parts[4].cast("double").alias("rh"),
            F.try_element_at(parts, F.lit(6)).cast("double").alias("confidence"),
        )
    )
    img = images_df.withColumn(
        "__stem",
        F.regexp_extract(F.col("relative_path"), r"([^/]+)\.[^.]+$", 1),
    )
    ann = parsed.join(
        img.select("__stem", F.col("id").alias("image_id")), "__stem"
    ).drop("__stem")
    from pyspark.sql import Window

    ann = ann.withColumn(
        "id",
        F.row_number().over(
            Window.orderBy("image_id", "category_id", "rcx", "rcy", "rw", "rh")
        ).cast("long")
        - 1,
    )
    ann = import_bbox(
        ann, "cxcywh", ["rcx", "rcy", "rw", "rh"], images=images_df
    )
    if split is not None:
        img = img.withColumn("split", F.lit(split))
    label_map = {i: n for i, n in enumerate(names)}
    return SparkDataset(
        images=img.drop("__stem"),
        annotations=ann,
        label_map=label_map,
    ).denormalize()


def dataset_to_darknet(ds: SparkDataset, output_dir: str) -> None:
    """Write the YOLO tree (reference ``io/darknet.py:367-518``):
    sequentially-remapped classes, ``classes.names``, per-split list
    files, and one txt per image written from the executors."""
    from lours_spark.functions.bbox import export_bbox

    remapped, mapping = ds.remap_sequential()
    os.makedirs(os.path.join(output_dir, "labels"), exist_ok=True)

    with open(os.path.join(output_dir, "classes.names"), "w") as f:
        for k in sorted(remapped.label_map):
            f.write(remapped.label_map[k] + "\n")
    import json

    with open(os.path.join(output_dir, "ids_map.json"), "w") as f:
        json.dump({str(k): v for k, v in mapping.items()}, f)

    rel = export_bbox(
        remapped.annotations,
        "cxcywh",
        ["rcx", "rcy", "rw", "rh"],
        images=remapped.images,
        drop_canonical=True,
    )
    lines = rel.select(
        "image_id",
        F.concat_ws(
            " ",
            F.col("category_id").cast("string"),
            F.format_number(F.col("rcx"), 6),
            F.format_number(F.col("rcy"), 6),
            F.format_number(F.col("rw"), 6),
            F.format_number(F.col("rh"), 6),
        ).alias("line"),
    )
    per_image = (
        lines.groupBy("image_id")
        .agg(F.concat_ws("\n", F.collect_list("line")).alias("body"))
        .join(
            remapped.images.select(
                F.col("id").alias("image_id"), "relative_path"
            ),
            "image_id",
            "right",
        )
        .fillna({"body": ""})
    )
    labels_dir = os.path.join(output_dir, "labels")

    def write_partition(rows):
        for r in rows:
            stem = os.path.splitext(os.path.basename(r["relative_path"]))[0]
            with open(os.path.join(labels_dir, stem + ".txt"), "w") as f:
                if r["body"]:
                    f.write(r["body"] + "\n")

    per_image.foreachPartition(write_partition)

    if "split" in remapped.images.columns:
        for split, sub in remapped.iter_splits():
            if split is None:
                continue
            paths = [
                r["relative_path"]
                for r in sub.images.select("relative_path").collect()
            ]
            with open(os.path.join(output_dir, f"{split}.txt"), "w") as f:
                f.write("\n".join(paths) + ("\n" if paths else ""))


def from_darknet_json(
    spark: SparkSession,
    predictions_file: str,
    images_df: DataFrame,
    names: list[str],
) -> SparkDataset:
    """Darknet detector output JSON (reference ``io/darknet.py:303-364``):
    a list of frames, each with ``filename`` and ``objects`` carrying
    ``class_id``, ``relative_coordinates`` (cxcywh) and ``confidence``.
    Distributed parse via spark.read.json + explode."""
    raw = (
        spark.read.option("multiLine", "true")
        .json(predictions_file)
        .select(
            F.regexp_extract(F.col("filename"), r"([^/]+)\.[^.]+$", 1).alias(
                "__stem"
            ),
            F.explode("objects").alias("o"),
        )
    )
    parsed = raw.select(
        "__stem",
        F.col("o.class_id").cast("int").alias("category_id"),
        F.col("o.relative_coordinates.center_x").cast("double").alias("rcx"),
        F.col("o.relative_coordinates.center_y").cast("double").alias("rcy"),
        F.col("o.relative_coordinates.width").cast("double").alias("rw"),
        F.col("o.relative_coordinates.height").cast("double").alias("rh"),
        F.col("o.confidence").cast("double").alias("confidence"),
    )
    img = images_df.withColumn(
        "__stem",
        F.regexp_extract(F.col("relative_path"), r"([^/]+)\.[^.]+$", 1),
    )
    ann = parsed.join(
        img.select("__stem", F.col("id").alias("image_id")), "__stem"
    ).drop("__stem")
    from pyspark.sql import Window

    ann = ann.withColumn(
        "id",
        F.row_number().over(
            Window.orderBy("image_id", "category_id", "rcx", "rcy")
        ).cast("long")
        - 1,
    )
    ann = import_bbox(ann, "cxcywh", ["rcx", "rcy", "rw", "rh"], images=images_df)
    return SparkDataset(
        images=img.drop("__stem"),
        annotations=ann,
        label_map={i: n for i, n in enumerate(names)},
    ).denormalize()
