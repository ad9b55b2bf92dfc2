"""MOT-challenge CSV reader.

Re-expresses reference ``lours/dataset/io/mot.py:9-124``: fixed 9-column
gt CSV ``frame,track_id,x,y,w,h,conf,class,visibility``; rows with
``conf == 0`` dropped (ignored regions), ``conf == 1`` means
groundtruth (no confidence semantics → null).

Spark shape: a schema'd ``spark.read.csv`` — fully distributed, the
confidence rules are ``when`` expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lours_spark.dataset.core import SparkDataset

MOT_SCHEMA = T.StructType(
    [
        T.StructField("frame", T.LongType()),
        T.StructField("track_id", T.LongType()),
        T.StructField("box_x_min", T.DoubleType()),
        T.StructField("box_y_min", T.DoubleType()),
        T.StructField("box_width", T.DoubleType()),
        T.StructField("box_height", T.DoubleType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("class_id", T.IntegerType()),
        T.StructField("visibility", T.DoubleType()),
    ]
)


def from_mot(
    spark: SparkSession,
    gt_file: str,
    images_df: DataFrame,
    label_map: dict[int, str] | None = None,
) -> SparkDataset:
    """Parse a MOT gt.txt; ``images_df`` carries one row per frame with
    (id == frame number, width, height, relative_path).

    >>> import os, tempfile
    >>> p = os.path.join(tempfile.mkdtemp(), "gt.txt")
    >>> _ = open(p, "w").write(
    ...     "1,7,10,20,30,40,1,1,1\\n"   # conf 1 -> groundtruth (conf NULL)
    ...     "1,8,50,60,30,40,0,1,1\\n")  # conf 0 -> ignore region, dropped
    >>> imgs = spark.createDataFrame(
    ...     [(1, 640, 480, "000001.jpg")],
    ...     "id long, width int, height int, relative_path string")
    >>> ds = from_mot(spark, p, imgs)
    >>> rows = ds.annotations.collect()
    >>> (len(rows), rows[0]["track_id"], rows[0]["box_x_min"],
    ...  rows[0]["category_str"])
    (1, 7, 10.0, 'pedestrian')
    """
    raw = spark.read.csv(gt_file, schema=MOT_SCHEMA)
    ann = (
        raw.filter(F.col("confidence") != 0)  # conf==0 → ignore region
        .withColumn(
            "confidence",
            F.when(F.col("confidence") == 1, F.lit(None).cast("double")).otherwise(
                F.col("confidence")
            ),
        )
        .withColumn("image_id", F.col("frame"))
        .withColumn("category_id", F.col("class_id"))
        .drop("frame", "class_id")
    )
    from lours_spark.functions.ids import global_row_number

    ann = global_row_number(
        ann, ["image_id", "track_id"], out_col="id"
    ).withColumn("id", F.col("id").cast("long"))
    lm = label_map or {1: "pedestrian"}
    return SparkDataset(
        images=images_df, annotations=ann, label_map=lm
    ).denormalize()
