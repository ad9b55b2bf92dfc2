"""Images-only dataset from a directory listing.

Re-expresses reference ``lours/dataset/io/images_folder.py:9-66``
(``from_folder`` / ``from_files``). Spark shape: the ``binaryFile``
source lists and (optionally) reads files distributed; image sizes
come from a header-sniffing UDF over the first bytes — the reference's
``imagesize`` probe without a Python loop on the driver.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lours_spark.dataset import schema as S
from lours_spark.dataset.core import SparkDataset


def _sniff_size(payload: bytes) -> tuple[int, int]:
    """Minimal PNG/JPEG/BMP/PPM size sniffing from header bytes (the
    ``imagesize``-style probe; deliberately dependency-free).

    >>> import struct
    >>> _sniff_size(b"P6\\n# c\\n640 480\\n255\\n" + b"\\x00" * 8)
    (640, 480)
    >>> png = (b"\\x89PNG\\r\\n\\x1a\\n" + b"\\x00" * 8
    ...        + struct.pack(">II", 32, 16))
    >>> _sniff_size(png)
    (32, 16)
    >>> _sniff_size(b"not an image")
    (0, 0)
    """
    if payload[:2] in (b"P6", b"P5"):  # binary netpbm: tokens after magic
        import re

        # strip comments, then width/height are the first two ints
        head = re.sub(rb"#[^\n]*", b"", payload[2:256])
        nums = re.findall(rb"\d+", head)
        if len(nums) >= 2:
            return int(nums[0]), int(nums[1])
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h))
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to SOFn
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seg_len
    return 0, 0


_SIZE_SCHEMA = T.StructType(
    [T.StructField("width", T.IntegerType()), T.StructField("height", T.IntegerType())]
)


def _size_udf():
    """Arrow-batched size sniffer (struct<width,height> pandas UDF):
    header parsing is trivial, so per-row pickling would dominate a
    row-at-a-time UDF — Arrow ships each binary batch once and the
    plan stays ``ArrowEvalPython`` (guarded in test_plans.py). Built
    lazily so importing this module never needs a SparkContext."""
    import pandas as pd

    def sizes(contents):
        w, h = [], []
        for c in contents:
            try:
                sw, sh = _sniff_size(bytes(c[:65536]))
            except Exception:
                sw = sh = 0
            w.append(sw)
            h.append(sh)
        return pd.DataFrame({"width": w, "height": h})

    # no inline type hints: ``from __future__ import annotations``
    # stringifies them, which breaks pandas_udf signature inference
    sizes.__annotations__ = {"contents": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(sizes, _SIZE_SCHEMA)


def from_folder(
    spark: SparkSession,
    images_root: str,
    pattern: str = "*.{png,jpg,jpeg,bmp,ppm,pgm}",
    with_sizes: bool = True,
) -> SparkDataset:
    """Dataset with an empty annotation table from an image directory."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(images_root)
    )
    # prefix-strip by LENGTH, not regexp_replace: a regex would treat
    # metacharacters in the root ("/data (v2)/") as syntax, strip a
    # recurring substring anywhere in the path, and mis-handle
    # relative roots (binaryFile paths come back absolute with a
    # file: scheme — resolve the root the same way first). Object
    # stores (s3a://, hdfs://) keep their scheme'd root verbatim. A
    # path outside the resolved prefix stays absolute — visible to
    # get_invalid_images instead of silently mangled.
    if "://" in images_root:
        prefix = images_root.rstrip("/") + "/"
    else:
        prefix = "file:" + os.path.abspath(images_root).rstrip("/") + "/"
    plen = len(prefix)
    images = files.select(
        F.when(
            F.col("path").startswith(F.lit(prefix)),
            F.expr(f"substring(path, {plen + 1})"),
        )
        .otherwise(F.col("path"))
        .alias("relative_path"),
        F.col("content"),
    )
    if with_sizes:
        images = images.withColumn("__size", _size_udf()(F.col("content")))
        images = images.select(
            "relative_path",
            F.col("__size.width").alias("width"),
            F.col("__size.height").alias("height"),
        )
    else:
        images = images.select(
            "relative_path",
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
        )
    from lours_spark.functions.ids import global_row_number

    # two-phase numbering (range-partition + per-partition row_number +
    # offset prefix-sum): a bare row_number().over(orderBy(path)) would
    # funnel a 10^7-file listing through ONE task. Same ids, parallel.
    images = (
        global_row_number(images, ["relative_path"], out_col="id")
        .withColumn("id", F.col("id").cast("long"))
        .withColumn(
            "type", F.regexp_extract(F.col("relative_path"), r"(\.[^.]+)$", 1)
        )
        .select("id", "width", "height", "relative_path", "type")
    )
    annotations = spark.createDataFrame([], S.empty_annotations_schema())
    return SparkDataset(
        images=images, annotations=annotations, images_root=images_root
    )


def from_files(
    spark: SparkSession,
    paths: list[str],
    images_root: str = ".",
) -> SparkDataset:
    """Images-only dataset from an explicit file list (reference
    ``from_files`` ``io/images_folder.py``): driver-supplied paths →
    DataFrame; sizes left to a later probe (join ``from_folder`` output
    or run the size UDF over binaryFile reads of these paths)."""
    rows = [
        (i, 0, 0, p, "." + p.rsplit(".", 1)[-1] if "." in p else "")
        for i, p in enumerate(sorted(paths))
    ]
    images = spark.createDataFrame(
        rows, "id long, width int, height int, relative_path string, type string"
    )
    annotations = spark.createDataFrame([], S.empty_annotations_schema())
    return SparkDataset(
        images=images, annotations=annotations, images_root=images_root
    )
