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


def from_pascalvoc(
    spark: SparkSession,
    annotations_dir: str,
    imagesets_dir: str | None = None,
) -> SparkDataset:
    img_rows = []
    ann_rows = []
    names: dict[str, int] = {}
    for i, path in enumerate(sorted(glob.glob(os.path.join(annotations_dir, "*.xml")))):
        root = ET.parse(path).getroot()
        filename = root.findtext("filename") or os.path.basename(path)
        size = root.find("size")
        width = int(size.findtext("width")) if size is not None else 0
        height = int(size.findtext("height")) if size is not None else 0
        stem = os.path.splitext(filename)[0]
        img_rows.append((i, width, height, filename, os.path.splitext(filename)[1], stem))
        for obj in root.findall("object"):
            name = obj.findtext("name") or "unknown"
            if name not in names:
                names[name] = len(names)
            b = obj.find("bndbox")
            if b is None:
                continue
            xmin = float(b.findtext("xmin"))
            ymin = float(b.findtext("ymin"))
            xmax = float(b.findtext("xmax"))
            ymax = float(b.findtext("ymax"))
            ann_rows.append(
                (
                    len(ann_rows),
                    i,
                    names[name],
                    xmin,
                    ymin,
                    xmax - xmin,
                    ymax - ymin,
                    int(obj.findtext("difficult") or 0) == 1,
                )
            )
    images = spark.createDataFrame(
        img_rows,
        "id long, width int, height int, relative_path string, type string, __stem string",
    )
    annotations = spark.createDataFrame(
        ann_rows,
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double, difficult boolean",
    )

    if imagesets_dir and os.path.isdir(imagesets_dir):
        # split membership lists; a stem in two splits is a dataset bug
        # (reference's overlap assertion, pascalvoc.py:80-82)
        memberships: list[tuple[str, str]] = []
        for list_file in sorted(glob.glob(os.path.join(imagesets_dir, "*.txt"))):
            split = os.path.splitext(os.path.basename(list_file))[0]
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
    return SparkDataset(
        images=images, annotations=annotations, label_map=label_map
    ).denormalize()
