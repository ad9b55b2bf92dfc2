"""Dataset merge — outer union of two two-table datasets.

Re-expresses reference ``lours/dataset/merge.py:12-222``: outer
label-map merge with conflict detection
(``lours/utils/label_map_merger.py:9-28``), schema reconciliation,
annotation-id collision shift (``merge.py:199-203``), optional
provenance columns (``merge.py:82-104``).

Spark shape: ``unionByName(allowMissingColumns=True)`` — a narrow,
shuffle-free transformation. The id-collision shift needs one small agg
(max id) on each side; at scale prefer ``ignore_index``-style reindex on
export instead of merging huge id spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LabelMapConflictError(ValueError):
    pass


def merge_label_maps(a: dict[int, str], b: dict[int, str]) -> dict[int, str]:
    """Outer merge; same id must carry the same name (reference
    ``label_map_merger.py:9-28``).

    >>> merge_label_maps({0: "cat"}, {1: "dog"})
    {0: 'cat', 1: 'dog'}
    >>> merge_label_maps({0: "cat"}, {0: "dog"})
    Traceback (most recent call last):
        ...
    lours_spark.dataset.merge.LabelMapConflictError: label map conflict for id 0: 'cat' != 'dog'
    """
    out = dict(a)
    for k, v in b.items():
        if k in out and out[k] != v:
            raise LabelMapConflictError(
                f"label map conflict for id {k}: {out[k]!r} != {v!r}"
            )
        out[k] = v
    return out


def _align_columns(x: DataFrame, y: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Add each side's missing columns as typed nulls so unionByName is
    exact (reference merge broadcasts missing booleanized columns as
    False — handled by the booleanizer; generic attributes become null)."""
    x_fields = {f.name: f.dataType for f in x.schema.fields}
    y_fields = {f.name: f.dataType for f in y.schema.fields}
    for name, dtype in y_fields.items():
        if name not in x_fields:
            x = x.withColumn(name, F.lit(None).cast(dtype))
    for name, dtype in x_fields.items():
        if name not in y_fields:
            y = y.withColumn(name, F.lit(None).cast(dtype))
    return x, y.select(*x.columns)


def merge_datasets(a, b, mark_origin: bool = False):
    """Union two SparkDatasets (reference ``merge.py:12``, ``__add__`` at
    ``dataset.py:2336-2855``).

    Overlapping image ids are allowed (the reference requires the
    intersecting rows to be equal, checked lazily via ``diff``);
    annotation ids on the right are shifted past the left max on
    collision (reference ``merge.py:199-203``).
    """
    from lours_spark.dataset.core import SparkDataset

    label_map = merge_label_maps(a.label_map, b.label_map)

    a_img, b_img = _align_columns(a.images, b.images)
    a_ann, b_ann = _align_columns(a.annotations, b.annotations)

    if mark_origin:
        # provenance columns (reference merge.py:82-104)
        a_name = a.dataset_name or "left"
        b_name = b.dataset_name or "right"
        a_img = a_img.withColumn("origin", F.lit(a_name))
        b_img = b_img.withColumn("origin", F.lit(b_name))
        a_ann = a_ann.withColumn("origin", F.lit(a_name))
        b_ann = b_ann.withColumn("origin", F.lit(b_name))

    # image-id overlap: keep one copy of identical rows (union-distinct on id)
    images = a_img.unionByName(
        b_img.join(a_img.select("id"), "id", "left_anti")
    )

    # annotation id collision → shift right side past left max.
    # ONE probe action: the left max/count and the overlap flag ride a
    # single crossJoin'd aggregate instead of two sequential driver
    # round-trips (each a full pass over the left annotations — at
    # 100 TB the fused probe halves the serial probe latency and lets
    # the planner share the left scan between the legs)
    probe = a_ann.agg(
        F.max("id").alias("mx"), F.count(F.lit(1)).alias("n")
    ).crossJoin(
        b_ann.join(a_ann.select("id"), "id", "left_semi")
        .limit(1)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    left_ids = probe.collect()[0]
    shift = 0
    if left_ids["n"] and left_ids["n"] > 0 and left_ids["overlap"]:
        shift = int(left_ids["mx"]) + 1
    if shift:
        b_ann = b_ann.withColumn("id", F.col("id") + F.lit(shift))
    annotations = a_ann.unionByName(b_ann)

    booleanized: dict[str, set[str]] = {}
    for src in (a.booleanized_columns, b.booleanized_columns):
        for k, v in src.items():
            booleanized.setdefault(k, set()).update(v)

    return SparkDataset(
        images=images,
        annotations=annotations,
        label_map=label_map,
        dataset_name=a.dataset_name or b.dataset_name,
        images_root=a.images_root,
        booleanized_columns=booleanized,
    )
