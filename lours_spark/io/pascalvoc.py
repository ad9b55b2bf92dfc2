"""PascalVOC XML reader.

Re-expresses reference ``lours/dataset/io/pascalvoc.py:13-252``: one XML
per image with ``<object>`` entries (bndbox = xmin/ymin/xmax/ymax =
``XXYY`` import), label map from distinct object names, split
membership from ``ImageSets/Main/{split}.txt`` lists with an
overlap assertion (``pascalvoc.py:76-82``).

Spark shape: VOC manifests are small XML files; without the spark-xml
package the parse runs on the driver via ``xml.etree`` (stdlib) and the
frames go to ``createDataFrame`` — the relational work (split joins,
bbox conversion, label mapping) stays distributed. Swap in
``spark.read.format("xml")`` when spark-xml is on the cluster.
"""

from __future__ import annotations

import glob
import os
import xml.etree.ElementTree as ET

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lours_spark.dataset.core import SparkDataset


def _parse_voc_object(obj) -> dict:
    """One ``<object>`` (or ``<part>``) element → flat dict with the
    reference's column breadth (``pascalvoc.py:108-152``): bbox,
    difficult/truncated/occluded booleans, pose, ``actions.*`` flags.

    >>> import xml.etree.ElementTree as ET
    >>> obj = ET.fromstring(
    ...     "<object><name>cat</name><difficult>1</difficult>"
    ...     "<bndbox><xmin>1</xmin><ymin>2</ymin>"
    ...     "<xmax>11</xmax><ymax>22</ymax></bndbox></object>")
    >>> d = _parse_voc_object(obj)
    >>> (d["name"], d["difficult"], d["xmax"] - d["xmin"])
    ('cat', True, 10.0)
    """
    out: dict = {"name": obj.findtext("name") or "unknown"}
    b = obj.find("bndbox")
    if b is not None:
        out["xmin"] = float(b.findtext("xmin"))
        out["ymin"] = float(b.findtext("ymin"))
        out["xmax"] = float(b.findtext("xmax"))
        out["ymax"] = float(b.findtext("ymax"))
    for flag in ("difficult", "truncated", "occluded"):
        v = obj.findtext(flag)
        if v is not None:
            out[flag] = v.strip() == "1"
    pose = obj.findtext("pose")
    if pose is not None:
        out["pose"] = pose.strip()
    actions = obj.find("actions")
    if actions is not None:
        for a in actions:
            out[f"actions.{a.tag}"] = (a.text or "0").strip() == "1"
    return out


def from_pascalvoc(
    spark: SparkSession,
    annotations_dir: str,
    imagesets_dir: str | None = None,
    split_values: "tuple[str, ...] | list[str]" = ("train", "val"),
) -> SparkDataset:
    """``split_values`` mirrors the reference (pascalvoc.py:64-82):
    ONLY ``{split}.txt`` for the requested split names is read from the
    image-sets folder — the official VOC ``ImageSets/Main`` layout also
    holds per-class lists (``aeroplane_train.txt``) and composite ones
    (``trainval.txt``), which must not be treated as splits (every stem
    in trainval also sits in train or val, so a glob would flag the
    whole dataset as overlapping)."""
    img_rows = []
    ann_dicts: list[dict] = []
    names: dict[str, int] = {}
    action_cols: set[str] = set()
    has_flags: set[str] = set()
    has_pose = False
    has_body = False
    next_id = 0
    for i, path in enumerate(sorted(glob.glob(os.path.join(annotations_dir, "*.xml")))):
        root = ET.parse(path).getroot()
        filename = root.findtext("filename") or os.path.basename(path)
        size = root.find("size")
        width = int(size.findtext("width")) if size is not None else 0
        height = int(size.findtext("height")) if size is not None else 0
        stem = os.path.splitext(filename)[0]
        img_rows.append((i, width, height, filename, os.path.splitext(filename)[1], stem))
        # reference id order (pascalvoc.py:95-135): all objects of an
        # image first, then their parts/points with body_id links
        part_dicts: list[dict] = []
        for obj in root.findall("object"):
            d = _parse_voc_object(obj)
            if "xmin" not in d:
                continue
            d["id"], d["image_id"] = next_id, i
            for part in obj.findall("part"):
                p = _parse_voc_object(part)
                if "xmin" in p:
                    p["body_id"] = next_id
                    part_dicts.append(p)
            point = obj.find("point")
            if point is not None:
                x = float(point.findtext("x"))
                y = float(point.findtext("y"))
                part_dicts.append(
                    {
                        "name": "person of interest",
                        "xmin": x, "xmax": x, "ymin": y, "ymax": y,
                        "body_id": next_id,
                    }
                )
            next_id += 1
            ann_dicts.append(d)
        for p in part_dicts:
            p["id"], p["image_id"] = next_id, i
            next_id += 1
            ann_dicts.append(p)
    for d in ann_dicts:
        if d["name"] not in names:
            names[d["name"]] = len(names)
        d["category_id"] = names[d["name"]]
        action_cols.update(k for k in d if k.startswith("actions."))
        has_flags.update(k for k in ("truncated", "occluded") if k in d)
        has_pose = has_pose or "pose" in d
        has_body = has_body or "body_id" in d

    images = spark.createDataFrame(
        img_rows,
        "id long, width int, height int, relative_path string, type string, __stem string",
    )
    extra_fields = []
    if has_body:
        extra_fields.append(T.StructField("body_id", T.LongType()))
    for flag in sorted(has_flags):
        extra_fields.append(T.StructField(flag, T.BooleanType()))
    if has_pose:
        extra_fields.append(T.StructField("pose", T.StringType()))
    for a in sorted(action_cols):
        extra_fields.append(T.StructField(a, T.BooleanType()))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("image_id", T.LongType()),
            T.StructField("category_id", T.IntegerType()),
            T.StructField("box_x_min", T.DoubleType()),
            T.StructField("box_y_min", T.DoubleType()),
            T.StructField("box_width", T.DoubleType()),
            T.StructField("box_height", T.DoubleType()),
            T.StructField("difficult", T.BooleanType()),
            *extra_fields,
        ]
    )
    ann_rows = [
        (
            d["id"],
            d["image_id"],
            d["category_id"],
            d["xmin"],
            d["ymin"],
            d["xmax"] - d["xmin"],
            d["ymax"] - d["ymin"],
            bool(d.get("difficult", False)),
            *(
                [d.get("body_id")] if has_body else []
            ),
            *[bool(d.get(flag, False)) for flag in sorted(has_flags)],
            *([d.get("pose")] if has_pose else []),
            # actions.* default False when absent (reference fillna(False))
            *[bool(d.get(a, False)) for a in sorted(action_cols)],
        )
        for d in ann_dicts
    ]
    annotations = spark.createDataFrame(ann_rows, schema)

    if imagesets_dir and os.path.isdir(imagesets_dir):
        # split membership lists — ONLY the requested split names
        # (reference image_set(): missing files are empty sets); a stem
        # in two requested splits is a dataset bug (reference's overlap
        # assertion, pascalvoc.py:80-82)
        memberships: list[tuple[str, str]] = []
        for split in split_values:
            list_file = os.path.join(imagesets_dir, f"{split}.txt")
            if not os.path.isfile(list_file):
                continue
            with open(list_file) as f:
                for line in f:
                    stem = line.strip().split(" ")[0]
                    if stem:
                        memberships.append((stem, split))
        if memberships:
            m = spark.createDataFrame(memberships, "__stem string, split string")
            dup = m.groupBy("__stem").count().filter(F.col("count") > 1).count()
            if dup:
                raise ValueError(f"{dup} images appear in multiple splits")
            images = images.join(F.broadcast(m), "__stem", "left")
    images = images.drop("__stem")
    label_map = {v: k for k, v in names.items()}
    booleanized = {"actions": {a for a in action_cols}} if action_cols else {}
    return SparkDataset(
        images=images,
        annotations=annotations,
        label_map=label_map,
        booleanized_columns=booleanized,
    ).denormalize()


def from_pascalvoc_detection(
    spark: SparkSession, input_folder: str
) -> SparkDataset:
    """Official-layout loader (reference ``pascalvoc.py:210-252``):
    ``Annotations/`` + ``JPEGImages/`` + ``ImageSets/Main/`` under one
    root, images without a split value removed."""
    ds = from_pascalvoc(
        spark,
        os.path.join(input_folder, "Annotations"),
        os.path.join(input_folder, "ImageSets", "Main"),
    )
    ds = ds.filter_images(F.col("split").isNotNull())
    return SparkDataset(
        images=ds.images,
        annotations=ds.annotations,
        label_map=ds.label_map,
        images_root=os.path.join(input_folder, "JPEGImages"),
        booleanized_columns=ds.booleanized_columns,
    )
