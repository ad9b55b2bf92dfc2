"""CrowdHuman ``.odgt`` (JSON-lines) reader.

Re-expresses reference ``lours/dataset/io/crowd_human.py:14-108``: each
line is one image with ``gtboxes``; every gt emits a *person*
annotation (fbox full / vbox visible) and a *head* annotation (hbox),
with ``visible_share`` = vbox area / fbox area; boxes are capped to
image bounds at the end (``crowd_human.py:128``).

Spark shape: JSONL is Spark's native JSON case — ``spark.read.json``
parses distributed, ``explode`` unnests gtboxes, the two projections
union, and the cap is the §2.6 clipping expression. No driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lours_spark.dataset.core import SparkDataset
from lours_spark.functions.geometry import cap_bounding_box_coordinates

LABEL_MAP = {1: "person", 2: "head"}


def from_crowd_human(
    spark: SparkSession,
    odgt_file: str,
    images_df: DataFrame,
    use_full_box: bool = True,
) -> SparkDataset:
    """Parse an .odgt file; ``images_df`` maps image stem ``ID`` to
    (id, width, height, relative_path).

    >>> import json, os, tempfile
    >>> p = os.path.join(tempfile.mkdtemp(), "ann.odgt")
    >>> rec = {"ID": "im1", "gtboxes": [
    ...     {"tag": "person", "fbox": [0, 0, 10, 20], "vbox": [0, 0, 10, 10],
    ...      "hbox": [2, 0, 6, 6]},
    ...     {"tag": "mask", "fbox": [5, 5, 4, 4], "vbox": [5, 5, 4, 4]}]}
    >>> _ = open(p, "w").write(json.dumps(rec))
    >>> imgs = spark.createDataFrame([(1, 640, 480, "im1.jpg")],
    ...     "id long, width int, height int, relative_path string")
    >>> ds = from_crowd_human(spark, p, imgs)
    >>> rows = sorted(ds.annotations.collect(), key=lambda r: r["category_id"])
    >>> [(r["category_str"], r["box_width"], r["visible_share"])
    ...  for r in rows]  # mask tag dropped; head box carries no share
    [('person', 10.0, 0.5), ('head', 6.0, None)]
    """
    raw = spark.read.json(odgt_file)
    boxes = raw.select(
        F.col("ID").alias("__stem"), F.explode("gtboxes").alias("g")
    ).filter(F.col("g.tag") == "person")

    person_src = "g.fbox" if use_full_box else "g.vbox"
    person = boxes.select(
        "__stem",
        F.lit(1).alias("category_id"),
        F.col(f"{person_src}")[0].cast("double").alias("box_x_min"),
        F.col(f"{person_src}")[1].cast("double").alias("box_y_min"),
        F.col(f"{person_src}")[2].cast("double").alias("box_width"),
        F.col(f"{person_src}")[3].cast("double").alias("box_height"),
        (
            (F.col("g.vbox")[2] * F.col("g.vbox")[3]).cast("double")
            / (F.col("g.fbox")[2] * F.col("g.fbox")[3])
        ).alias("visible_share"),
    )
    head = boxes.filter(F.col("g.hbox").isNotNull()).select(
        "__stem",
        F.lit(2).alias("category_id"),
        F.col("g.hbox")[0].cast("double").alias("box_x_min"),
        F.col("g.hbox")[1].cast("double").alias("box_y_min"),
        F.col("g.hbox")[2].cast("double").alias("box_width"),
        F.col("g.hbox")[3].cast("double").alias("box_height"),
        F.lit(None).cast("double").alias("visible_share"),
    )
    both = person.unionByName(head)

    img = images_df.withColumn(
        "__stem",
        F.regexp_extract(F.col("relative_path"), r"([^/]+)\.[^.]+$", 1),
    )
    ann = both.join(
        img.select("__stem", F.col("id").alias("image_id")), "__stem"
    ).drop("__stem")
    from lours_spark.functions.ids import global_row_number

    # two-phase global numbering (single-window fast path under 4
    # partitions): an unpartitioned row_number funnels the whole
    # annotation table through one task at corpus scale
    ann = global_row_number(
        ann, ["image_id", "category_id", "box_x_min", "box_y_min"],
        out_col="id",
    ).withColumn("id", F.col("id").cast("long"))
    ds = SparkDataset(
        images=img.drop("__stem"), annotations=ann, label_map=dict(LABEL_MAP)
    ).denormalize()
    capped = cap_bounding_box_coordinates(ds.annotations, images=ds.images)
    return ds.from_template(annotations=capped)
