"""COCO JSON reader/writer.

Re-expresses reference ``lours/dataset/io/coco.py:22-335``: a COCO file
is a single JSON with ``images``, ``annotations`` (bbox = [x,y,w,h]
list), ``categories``; split deduced from the annotation-file name;
``iscrowd=1`` rows dropped; detector outputs carry ``score`` →
``confidence``.

Spark shape: the manifest is one JSON document, so parsing happens on
the driver (a COCO file is metadata, not data — even a 10M-annotation
manifest is ~GBs and pathological; at that point store parquet). The
frames go straight into ``createDataFrame`` with explicit schemas so
empty datasets keep their types. Writing collects per split — COCO is
inherently a single monolithic file per split.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lours_spark.dataset.core import SparkDataset
from lours_spark.io.common import parse_annotation_name

_IMG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("relative_path", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("split", T.StringType()),
    ]
)

_ANN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("image_id", T.LongType()),
        T.StructField("category_id", T.IntegerType()),
        T.StructField("box_x_min", T.DoubleType()),
        T.StructField("box_y_min", T.DoubleType()),
        T.StructField("box_width", T.DoubleType()),
        T.StructField("box_height", T.DoubleType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)


def from_coco(
    spark: SparkSession,
    annotations_file: str,
    images_root: str = ".",
    split: str | None = None,
    drop_crowd: bool = True,
) -> SparkDataset:
    """Parse a COCO JSON into a SparkDataset (reference
    ``io/coco.py:22-133``).

    >>> import json, os, tempfile
    >>> root = tempfile.mkdtemp()
    >>> doc = {"images": [{"id": 1, "width": 64, "height": 48,
    ...                    "file_name": "a.jpg"}],
    ...        "annotations": [{"id": 10, "image_id": 1, "category_id": 0,
    ...                         "bbox": [2.0, 3.0, 10.0, 8.0]}],
    ...        "categories": [{"id": 0, "name": "cat"}]}
    >>> p = os.path.join(root, "demo_train.json")
    >>> _ = open(p, "w").write(json.dumps(doc))
    >>> ds = from_coco(spark, p, images_root=root)
    >>> ds.images.first()["split"], ds.len_annot(), ds.label_map
    ('train', 1, {0: 'cat'})
    """
    with open(annotations_file) as f:
        doc = json.load(f)
    name, deduced_split = parse_annotation_name(Path(annotations_file).stem)
    split = split or deduced_split

    img_rows = []
    for im in doc.get("images", []):
        p = im.get("file_name", "")
        img_rows.append(
            (
                int(im["id"]),
                int(im.get("width", 0)),
                int(im.get("height", 0)),
                p,
                os.path.splitext(p)[1],
                split,
            )
        )
    ann_rows = []
    for a in doc.get("annotations", []):
        if drop_crowd and a.get("iscrowd", 0) == 1:
            continue
        x, y, w, h = (float(v) for v in a["bbox"])
        conf = a.get("score", a.get("confidence"))
        ann_rows.append(
            (
                int(a["id"]),
                int(a["image_id"]),
                int(a["category_id"]),
                x,
                y,
                w,
                h,
                float(conf) if conf is not None else None,
            )
        )
    label_map = {
        int(c["id"]): c["name"] for c in doc.get("categories", [])
    }
    images = spark.createDataFrame(img_rows, _IMG_SCHEMA)
    annotations = spark.createDataFrame(ann_rows, _ANN_SCHEMA)
    if all(r[-1] is None for r in ann_rows):
        annotations = annotations.drop("confidence")
    ds = SparkDataset(
        images=images,
        annotations=annotations,
        label_map=label_map,
        dataset_name=name,
        images_root=images_root,
    )
    return ds.denormalize()


def dataset_to_coco(ds: SparkDataset, output_dir: str) -> list[str]:
    """Write one COCO JSON per split (reference ``io/coco.py:177-335``).
    Collect-based by design: COCO is a single driver-side document.

    Round-trips :func:`from_coco`:

    >>> import json, os, tempfile
    >>> root = tempfile.mkdtemp()
    >>> doc = {"images": [{"id": 1, "width": 64, "height": 48,
    ...                    "file_name": "a.jpg"}],
    ...        "annotations": [{"id": 10, "image_id": 1, "category_id": 0,
    ...                         "bbox": [2.0, 3.0, 10.0, 8.0]}],
    ...        "categories": [{"id": 0, "name": "cat"}]}
    >>> p = os.path.join(root, "demo_train.json")
    >>> _ = open(p, "w").write(json.dumps(doc))
    >>> ds = from_coco(spark, p, images_root=root)
    >>> out = tempfile.mkdtemp()
    >>> [os.path.basename(f) for f in dataset_to_coco(ds, out)]
    ['demo_train.json']
    >>> back = json.load(open(os.path.join(out, "demo_train.json")))
    >>> back["annotations"][0]["bbox"]
    [2.0, 3.0, 10.0, 8.0]
    """
    os.makedirs(output_dir, exist_ok=True)
    written = []
    has_conf = "confidence" in ds.annotations.columns
    for split, sub in ds.iter_splits():
        images = [
            {
                "id": r["id"],
                "width": r["width"],
                "height": r["height"],
                "file_name": r["relative_path"],
            }
            for r in sub.images.collect()
        ]
        annotations = []
        for r in sub.annotations.collect():
            a = {
                "id": r["id"],
                "image_id": r["image_id"],
                "category_id": r["category_id"],
                "bbox": [
                    r["box_x_min"],
                    r["box_y_min"],
                    r["box_width"],
                    r["box_height"],
                ],
                "area": r["box_width"] * r["box_height"],
                "iscrowd": 0,
            }
            if has_conf and r["confidence"] is not None:
                a["score"] = r["confidence"]
            annotations.append(a)
        categories = [
            {"id": k, "name": v} for k, v in sorted(ds.label_map.items())
        ]
        name = ds.dataset_name or "dataset"
        fname = f"{name}_{split}.json" if split else f"{name}.json"
        path = os.path.join(output_dir, fname)
        with open(path, "w") as f:
            json.dump(
                {
                    "images": images,
                    "annotations": annotations,
                    "categories": categories,
                },
                f,
            )
        written.append(path)
    return written


def from_coco_keypoints(
    spark: SparkSession,
    annotations_file: str,
    images_root: str = ".",
    split: str | None = None,
) -> SparkDataset:
    """COCO keypoint variant (reference ``io/coco.py:136-174``): each
    keypoint triple (x, y, visibility>0) becomes a zero-size "XY" box
    annotation in the single keypoint category."""
    with open(annotations_file) as f:
        doc = json.load(f)
    name, deduced_split = parse_annotation_name(Path(annotations_file).stem)
    split = split or deduced_split
    img_rows = [
        (
            int(im["id"]),
            int(im.get("width", 0)),
            int(im.get("height", 0)),
            im.get("file_name", ""),
            os.path.splitext(im.get("file_name", ""))[1],
            split,
        )
        for im in doc.get("images", [])
    ]
    ann_rows = []
    next_id = 0
    for a in doc.get("annotations", []):
        kps = a.get("keypoints", [])
        for i in range(0, len(kps) - 2, 3):
            x, y, v = kps[i], kps[i + 1], kps[i + 2]
            if v > 0:
                ann_rows.append(
                    (
                        next_id,
                        int(a["image_id"]),
                        int(a.get("category_id", 1)),
                        float(x),
                        float(y),
                        0.0,
                        0.0,
                        None,
                    )
                )
                next_id += 1
    cats = doc.get("categories") or [{"id": 1, "name": "keypoint"}]
    label_map = {int(c["id"]): c["name"] for c in cats}
    images = spark.createDataFrame(img_rows, _IMG_SCHEMA)
    annotations = spark.createDataFrame(ann_rows, _ANN_SCHEMA).drop("confidence")
    return SparkDataset(
        images=images,
        annotations=annotations,
        label_map=label_map,
        dataset_name=name,
        images_root=images_root,
    ).denormalize()
