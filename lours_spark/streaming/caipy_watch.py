"""Folder-watching caipy converter — the Structured Streaming twin of
the reference's CLI watcher (``lours/cli/caipy_to_fiftyone.py``: watch
an annotation tree, convert each newly-arrived caipy JSON as it
lands).

The fiftyone visualization push itself is out of scope (SURVEY §2
divergence — fiftyone is a GUI dependency); what the watcher
*pipeline* does — detect new files, parse, convert, deliver downstream
incrementally, exactly once — is re-expressed here as a streaming file
source + ``foreachBatch`` parquet append:

- the file source tracks processed files in the checkpoint (the
  watcher's "seen" set, but fault-tolerant and exactly-once);
- each micro-batch parses ONLY the new JSONs (multiLine, one doc per
  file) and appends normalized images/annotations rows to a parquet
  dataset — at cluster scale thousands of arriving files fan out over
  executors instead of a single watcher process.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _doc_schema(spark: SparkSession, ann_root: str) -> T.StructType:
    """Streaming sources need a fixed schema: infer it from the files
    already present (at least one conformant JSON must exist — pass the
    schema explicitly for a cold start on an empty tree)."""
    return (
        spark.read.option("multiLine", "true")
        .json(os.path.join(ann_root, "*", "*.json"))
        .schema
    )


def watch_caipy(
    spark: SparkSession,
    dataset_root: str,
    output_root: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = False,
    annotations_root: str | None = None,
):
    """Start the watcher; returns the StreamingQuery.

    New ``Annotations/{split}/*.json`` files are parsed and delivered
    to ``{output_root}/images`` and ``{output_root}/annotations``
    parquet directories as ``batch=<id>`` partition dirs, overwritten
    in place — so a crash-recovery replay of a half-delivered batch
    rewrites instead of duplicating (exactly-once by idempotence, like
    the webdataset streaming sink; reads of the parent dir gain a
    ``batch`` partition column). ``available_now=True`` drains the
    current backlog and stops (test/offline mode).

    Output roots written by the pre-round-7 FLAT-APPEND sink are not
    compatible: mixing top-level part files with ``batch=<id>``
    partition dirs breaks Spark partition discovery on the parent
    read, so this watcher FAILS FAST when it finds flat parquet files
    at the top of ``images/``/``annotations/`` — migrate them into a
    ``batch=-1`` style dir (or point the watcher at a fresh
    output_root) first.

    >>> import json, os, tempfile
    >>> root, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    >>> os.makedirs(os.path.join(root, "Annotations", "train"))
    >>> doc = {"image": {"id": 1, "width": 64, "height": 48,
    ...                  "file_name": "a.jpg"},
    ...        "annotations": [{"id": 10, "category_id": 0,
    ...                         "bbox": [1.0, 2.0, 3.0, 4.0]}]}
    >>> _ = open(os.path.join(root, "Annotations", "train", "a.json"),
    ...          "w").write(json.dumps(doc))
    >>> q = watch_caipy(spark, root, os.path.join(out, "o"),
    ...                 os.path.join(out, "ckpt"), available_now=True)
    >>> q.awaitTermination(60)
    True
    >>> spark.read.parquet(os.path.join(out, "o", "annotations")).count()
    1
    """
    # generic trees keep annotations anywhere (reference watcher
    # observes annotations_root itself) — the vanilla default is
    # dataset_root/Annotations
    ann_root = annotations_root or os.path.join(dataset_root, "Annotations")
    ann_base = os.path.basename(ann_root.rstrip("/"))
    # legacy-layout guard through the Hadoop FS API — a driver-local
    # os.listdir would silently no-op for s3a://hdfs:// output roots,
    # exactly where the corruption it prevents would go unnoticed
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for sub in ("images", "annotations"):
        top = os.path.join(output_root, sub)
        tpath = jvm.org.apache.hadoop.fs.Path(top)
        fs = tpath.getFileSystem(hconf)
        if fs.exists(tpath) and any(
            st.isFile() and str(st.getPath().getName()).endswith(".parquet")
            for st in fs.listStatus(tpath)
        ):
            raise ValueError(
                f"{top} holds flat parquet files from the legacy "
                "append-mode watcher; mixing them with batch=<id> "
                "partition dirs breaks partition discovery on the "
                "parent read. Move them into a batch=<n> subdirectory "
                "or use a fresh output_root."
            )
    schema = schema or _doc_schema(spark, ann_root)
    docs = (
        spark.readStream.schema(schema)
        .option("multiLine", "true")
        .option("pathGlobFilter", "*.json")
        .json(os.path.join(ann_root, "*"))
        .withColumn(
            "split",
            F.regexp_extract(
                F.input_file_name(), rf"{re.escape(ann_base)}/([^/]+)/", 1
            ),
        )
    )

    def deliver(batch: DataFrame, batch_id: int) -> None:
        # per-batch partition dirs OVERWRITTEN in place, not a blind
        # append: foreachBatch replays the same batch_id after a crash
        # between the two writes (or before the checkpoint commit), and
        # an append would duplicate every row of the half-delivered
        # batch. Overwriting batch=<id> makes the replay idempotent —
        # the same exactly-once-by-idempotence recipe as the webdataset
        # and near-dup-miner sinks. Readers of {output_root}/images get
        # a bonus `batch` partition column (which drop delivered a row).
        img = batch.select("image.*", "split")
        if "file_name" in img.columns:
            img = img.withColumnRenamed("file_name", "relative_path")
        img.write.mode("overwrite").parquet(
            os.path.join(output_root, "images", f"batch={batch_id}")
        )
        ann = batch.select(
            F.col("image.id").alias("image_id"),
            F.explode_outer("annotations").alias("a"),
            F.col("split"),
        ).select("image_id", "a.*", "split")
        ann.write.mode("overwrite").parquet(
            os.path.join(output_root, "annotations", f"batch={batch_id}")
        )

    writer = (
        docs.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
