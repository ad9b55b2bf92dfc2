"""The SparkDataset facade: two related DataFrames + a label-map dimension.

Re-expresses the reference's ``Dataset`` (reference
``lours/dataset/dataset.py:34-70``: images table, annotations table with
FK ``image_id``, ``label_map`` category dimension) on Spark:

- every transformation is LAZY and returns a new facade (the reference's
  eager per-constructor validation, ``dataset.py:943-1029``, becomes an
  explicit ``check()`` action so Catalyst can fuse whole chains);
- the label map is a tiny driver-side dict materialized as either a
  ``create_map`` literal or a broadcast join — never a shuffle;
- denormalized columns (``category_str``, annotation ``split``,
  reference ``dataset.py:1012-1018``) are recomputed with broadcast
  lookups in ``denormalize()``;
- the schema is open: anything beyond the default columns is an
  attribute and flows through untouched.

At 100 TB the two tables are expected to be stored partitioned by
``split`` (and optionally bucketed by ``image_id`` on the annotation
side) so the pervasive images⟕annotations semi-joins co-locate.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import reduce
from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lours_spark.dataset import schema as S


def _map_literal(d: dict) -> Column:
    """A dict as a Catalyst map literal (no join, no shuffle)."""
    pairs = []
    for k, v in d.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


@dataclass(frozen=True)
class SparkDataset:
    """Two related row tables + a category dimension.

    Parameters mirror the reference members (``dataset.py:46-50``);
    ``booleanized_columns`` tracks one-hot-expanded list columns
    (``dataset.py:71``).
    """

    images: DataFrame
    annotations: DataFrame
    label_map: dict[int, str] = field(default_factory=dict)
    dataset_name: str | None = None
    images_root: str = "."
    booleanized_columns: dict[str, set[str]] = field(default_factory=dict)

    # ---------------------------------------------------------------- misc
    @property
    def spark(self) -> SparkSession:
        return self.images.sparkSession

    @staticmethod
    def empty(spark: SparkSession) -> "SparkDataset":
        """A fully-empty dataset with typed frames (reference supports
        empty datasets with typed empty pandas frames,
        ``dataset.py:168-180`` — Spark needs explicit schemas)."""
        return SparkDataset(
            images=spark.createDataFrame([], S.empty_images_schema()),
            annotations=spark.createDataFrame([], S.empty_annotations_schema()),
        )

    @staticmethod
    def create(
        images: DataFrame,
        annotations: DataFrame,
        label_map: dict[int, str] | None = None,
        dataset_name: str | None = None,
        images_root: str = ".",
        strict: bool = False,
    ) -> "SparkDataset":
        """Construct a dataset, optionally validating EAGERLY.

        The reference constructor asserts unique ids and FK integrity
        at build time (``dataset.py:943-948``, ``:990-998``); the lazy
        facade defers those to the explicit :meth:`check` action.
        ``strict=True`` restores reference behavior: run the (single
        job) validation pass now and raise ``ValueError`` on any
        violation — the eager-UX mode for interactive use; leave False
        in pipelines so plans stay action-free until the sink.

        >>> from lours_spark.testing import dummy_dataset
        >>> d = dummy_dataset(spark, n_imgs=3, n_annot=5, n_labels=2, seed=3)
        >>> ds = SparkDataset.create(d.images, d.annotations,
        ...                          label_map=d.label_map, strict=True)
        >>> ds.images.count()
        3
        >>> bad = d.annotations.withColumn("image_id", F.lit(999))
        >>> SparkDataset.create(d.images, bad, label_map=d.label_map,
        ...                     strict=True)  # doctest: +IGNORE_EXCEPTION_DETAIL
        Traceback (most recent call last):
        ValueError: ...
        """
        ds = SparkDataset(
            images=images,
            annotations=annotations,
            label_map=dict(label_map or {}),
            dataset_name=dataset_name,
            images_root=images_root,
        )
        if strict:
            counts = ds.check()
            bad = {k: v for k, v in counts.items() if v}
            if bad:
                raise ValueError(f"dataset failed strict validation: {bad}")
        return ds

    def from_template(self, **kwargs) -> "SparkDataset":
        """Cheap structural copy with overrides (reference
        ``dataset.py:192-313``). Lazy frames make this nearly free."""
        new = replace(self, **kwargs)
        # prune stale booleanized prefixes (reference dataset.py:295-312)
        cols = set(new.images.columns) | set(new.annotations.columns)
        pruned = {
            prefix: vals
            for prefix, vals in new.booleanized_columns.items()
            if any(c.startswith(prefix + ".") for c in cols)
        }
        if pruned != new.booleanized_columns:
            new = replace(new, booleanized_columns=pruned)
        return new

    def __len__(self) -> int:
        return self.images.count()

    def __repr__(self) -> str:
        """Formatted summary (reference ``dataset.py:1656-1693``).
        Triggers two counts — keep out of hot loops."""
        return (
            f"SparkDataset(name={self.dataset_name!r}, "
            f"images={self.images.count()}, "
            f"annotations={self.annotations.count()}, "
            f"labels={len(self.label_map)})"
        )

    def len_annot(self) -> int:
        return self.annotations.count()

    def image_attributes(self) -> list[str]:
        return S.image_attribute_columns(self.images.columns)

    def annotation_attributes(self) -> list[str]:
        return S.annotation_attribute_columns(self.annotations.columns)

    # ------------------------------------------------------- normalization
    def denormalize(self) -> "SparkDataset":
        """Recompute ``category_str`` from the label map and annotation
        ``split`` from the parent image (reference ``dataset.py:1012-1018``).

        Both are broadcast-shaped: the label map is a literal map lookup
        (zero shuffle); the split propagation is an equi-join on
        ``image_id`` that Catalyst broadcasts when the image side is
        small, and co-locates under bucketing at scale.
        """
        ann = self.annotations
        if self.label_map:
            ann = ann.withColumn(
                "category_str",
                F.coalesce(
                    _map_literal(self.label_map)[F.col("category_id")],
                    F.col("category_id").cast("string"),
                ),
            )
        if "split" in self.images.columns:
            img_split = self.images.select(
                F.col("id").alias("__img_id"), F.col("split").alias("__img_split")
            )
            ann = (
                ann.drop("split")
                .join(img_split, ann.image_id == img_split["__img_id"], "left")
                .withColumn("split", F.col("__img_split"))
                .drop("__img_id", "__img_split")
            )
        return self.from_template(annotations=ann)

    # ------------------------------------------------------------ validate
    def check(self) -> dict[str, int]:
        """Validation queries (the reference's eager constructor asserts,
        ``dataset.py:943-948`` unique ids, ``dataset.py:990-998`` FK
        integrity — run here as explicit actions).

        ONE action total: the duplicate/unknown leg (groupBy(id) +
        global fold) and the FK leg (per-image_id pre-aggregate +
        left-anti probe against image ids) are cross-joined with the
        tiny duplicate-image-id aggregate and collected together —
        not one action per metric, which would rescan the annotation
        table four times at 100 TB. The FK leg never shuffles
        annotation rows: counts pre-aggregate map-side so the
        exchange carries one row per distinct image_id.

        Example (executable spec, reference ``dataset.py:100-163``
        style):

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> ds.check() == {'duplicate_image_ids': 0,
        ...     'duplicate_annotation_ids': 0, 'orphan_annotations': 0,
        ...     'unknown_categories': 0}
        True
        """
        dup_images = (
            self.images.groupBy("id")
            .count()
            .agg(F.count(F.when(F.col("count") > 1, 1)).alias("dup_img"))
        )
        known = (
            F.col("category_id").isin(list(self.label_map.keys()))
            if self.label_map
            else F.lit(True)
        )
        # duplicate-id + unknown-category counts: one groupBy(id) pass
        per_id = (
            self.annotations.select("id", "category_id")
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.count(F.when(~known, 1)).alias("__unknown"),
            )
        )
        ann_agg = per_id.agg(
            F.count(F.when(F.col("__n") > 1, 1)).alias("dup_ann"),
            F.sum("__unknown").alias("unknown"),
        )
        # FK integrity WITHOUT joining the full annotation table: the
        # per-image row counts pre-aggregate map-side, so the exchange
        # (and the anti-join probe) carries one row per DISTINCT
        # image_id instead of one per annotation — at 100 TB that is
        # |images referenced| rows on the wire, not |annotations|. The
        # previous shape joined every annotation row to the image-id
        # side and re-grouped it (two annotation-sized exchanges).
        orphan_agg = (
            self.annotations.groupBy("image_id")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .join(
                self.images.select(F.col("id").alias("image_id")).distinct(),
                "image_id",
                "left_anti",
            )
            .agg(F.coalesce(F.sum("__cnt"), F.lit(0)).alias("orphans"))
        )
        row = ann_agg.crossJoin(orphan_agg).crossJoin(dup_images).collect()[0]
        return {
            "duplicate_image_ids": int(row["dup_img"] or 0),
            "duplicate_annotation_ids": int(row["dup_ann"] or 0),
            "orphan_annotations": int(row["orphans"] or 0),
            "unknown_categories": int(row["unknown"] or 0),
        }

    # ----------------------------------------------------------- filtering
    def filter_images(self, predicate: Column | str) -> "SparkDataset":
        """Filter the image table; annotations follow via left-semi join
        (reference ``lours/dataset/indexing.py:49-51``).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> sub = ds.filter_images("width > 1000")
        >>> sub.images.count(), sub.annotations.count()
        (2, 7)
        """
        images = self.images.filter(predicate)
        annotations = self.annotations.join(
            images.select(F.col("id").alias("image_id")), "image_id", "left_semi"
        )
        return self.from_template(images=images, annotations=annotations)

    loc = filter_images  # reference Dataset.loc spelling (dataset.py:393)

    def filter_annotations(
        self, predicate: Column | str, remove_emptied_images: bool = False
    ) -> "SparkDataset":
        """Filter the annotation table. With ``remove_emptied_images``,
        drop images that HAD annotations but lost them all, keeping
        originally-empty images (reference ``indexing.py:106-119``).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> sub = ds.filter_annotations("category_id = 7",
        ...                             remove_emptied_images=True)
        >>> sub.annotations.count()  # the five class_2 boxes survive
        5
        >>> sub.images.count()  # image 3 lost all its boxes; 2 never had any
        3
        """
        new_ann = self.annotations.filter(predicate)
        images = self.images
        if remove_emptied_images:
            still = images.join(
                new_ann.select(F.col("image_id").alias("id")).distinct(),
                "id",
                "left_semi",
            )
            originally_empty = images.join(
                self.annotations.select(F.col("image_id").alias("id")).distinct(),
                "id",
                "left_anti",
            )
            images = still.unionByName(originally_empty)
        return self.from_template(images=images, annotations=new_ann)

    loc_annot = filter_annotations  # reference dataset.py:529

    def empty_annotations(self) -> "SparkDataset":
        """Keep images, drop all annotations (reference ``dataset.py:936``)."""
        return self.from_template(annotations=self.annotations.limit(0))

    def remove_empty_images(self) -> "SparkDataset":
        """Keep only images referenced by ≥1 annotation (reference
        ``dataset.py:2863-2917``) — a left-semi join.

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> ds.remove_empty_images().images.count()
        3
        """
        images = self.images.join(
            self.annotations.select(F.col("image_id").alias("id")).distinct(),
            "id",
            "left_semi",
        )
        return self.from_template(images=images)

    def get_invalid_images(
        self, check_symlink: bool = False, load_images: bool = True
    ) -> DataFrame:
        """Distributed error report for missing/unreadable/mismatched
        image files (reference ``utils/testing.py:252-380``); columns
        (id, reason, additional_info)."""
        from lours_spark.dataset.validation import get_invalid_images

        return get_invalid_images(
            self.images,
            str(self.images_root),
            check_symlink=check_symlink,
            load_images=load_images,
        )

    def remove_invalid_images(self, load_images: bool = True) -> "SparkDataset":
        """Drop images whose file is missing/corrupt/inconsistent, and
        their annotations (reference ``dataset.py:1154-1231``). The
        file checks run executor-side (``mapInPandas``); the removal is
        a left-anti join on the report — no driver materialization."""
        invalid = self.get_invalid_images(load_images=load_images).select("id")
        images = self.images.join(invalid, "id", "left_anti")
        annotations = self.annotations.join(
            images.select(F.col("id").alias("image_id")), "image_id", "left_semi"
        )
        return self.from_template(images=images, annotations=annotations)

    def get_split(self, split: str | None) -> "SparkDataset":
        """Subset to one split value (reference ``dataset.py:1745``)."""
        pred = F.col("split").isNull() if split is None else F.col("split") == split
        return self.filter_images(pred)

    def iter_splits(self) -> Iterator[tuple[str | None, "SparkDataset"]]:
        if "split" not in self.images.columns:
            # split-less dataset (e.g. from_folder): one anonymous
            # split covering everything — exporters write a single
            # file instead of crashing on the missing column
            yield None, self
            return
        values = [
            r[0]
            for r in self.images.select("split").distinct().collect()
        ]
        for v in sorted(values, key=lambda x: (x is None, x)):
            yield v, self.get_split(v)

    def keep_classes(self, keep: list[int]) -> "SparkDataset":
        """Category whitelist (reference ``dataset.py:4137``).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> sub = ds.keep_classes([1, 4])
        >>> sorted(sub.label_map.items())
        [(1, 'class_0'), (4, 'class_1')]
        >>> sub.annotations.count()
        3
        """
        ann = self.annotations.filter(F.col("category_id").isin(keep))
        lm = {k: v for k, v in self.label_map.items() if k in set(keep)}
        return self.from_template(annotations=ann, label_map=lm)

    def remove_classes(self, remove: list[int]) -> "SparkDataset":
        """Category blacklist (reference ``dataset.py:4017``)."""
        ann = self.annotations.filter(~F.col("category_id").isin(remove))
        lm = {k: v for k, v in self.label_map.items() if k not in set(remove)}
        return self.from_template(annotations=ann, label_map=lm)

    def get_one_frame(self, image_id: int) -> tuple[DataFrame, DataFrame]:
        """Point lookup (reference ``dataset.py:1407``)."""
        return (
            self.images.filter(F.col("id") == image_id),
            self.annotations.filter(F.col("image_id") == image_id),
        )

    def iter_images(self):
        """Stream (image_row, annotation_rows) pairs to the driver
        (reference ``iter_images`` ``dataset.py:1475-1541``): one
        ordered pass via ``toLocalIterator`` over a pre-grouped frame —
        never a full collect."""
        ann_struct = F.struct(*[F.col(c) for c in self.annotations.columns])
        grouped = (
            self.annotations.groupBy("image_id")
            .agg(F.collect_list(ann_struct).alias("__anns"))
        )
        joined = (
            self.images.join(
                grouped, self.images.id == grouped.image_id, "left"
            )
            .drop("image_id")
            .orderBy("id")
        )
        for row in joined.toLocalIterator():
            d = row.asDict()
            anns = d.pop("__anns", None) or []
            yield d, anns

    def take_images(self, n: int) -> "SparkDataset":
        """First-n images in id order (the closest stable analog of the
        reference's positional ``iloc`` slicing — Spark has no stable
        row positions, so positional access is defined only under an
        explicit ordering).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> two = ds.take_images(2)
        >>> [r['id'] for r in two.images.orderBy('id').collect()]
        [0, 1]
        >>> two.annotations.count()  # image 0 has 4 boxes, image 1 has 1
        5
        """
        head = self.images.orderBy("id").limit(n)
        annotations = self.annotations.join(
            head.select(F.col("id").alias("image_id")), "image_id", "left_semi"
        )
        return self.from_template(images=head, annotations=annotations)

    @property
    def iloc(self) -> "_ILocIndexer":
        """Positional image indexing (reference ``Dataset.iloc``,
        ``lours/dataset/indexing.py:14-57``): ``ds.iloc[3]``,
        ``ds.iloc[10:20]``, ``ds.iloc[[0, 5, -1]]`` select images by
        POSITION; annotations follow by semi-join.

        Divergence, documented: pandas positions are insertion order;
        Spark rows have none, so positions here are defined by ``id``
        ascending (the one total order every dataset carries). Row
        numbers come from the two-phase global numbering
        (``functions/ids.py``) — no single-task global sort. Negative
        positions and open-ended slices cost one extra ``count()``."""
        return _ILocIndexer(self, annot=False)

    @property
    def iloc_annot(self) -> "_ILocIndexer":
        """Positional annotation indexing (reference
        ``DatasetAnnotLocator``, ``indexing.py:60-110``): selects
        annotations by position in ``id`` order, images kept."""
        return _ILocIndexer(self, annot=True)

    def take_annotations(self, n: int) -> "SparkDataset":
        """First-n annotations in id order, images kept (the stable
        analog of the reference's ``iloc_annot`` slicing)."""
        return self.from_template(
            annotations=self.annotations.orderBy("id").limit(n)
        )

    def remove_invalid_annotations(
        self, remove_emptied_images: bool = False, allow_keypoints: bool = True
    ) -> "SparkDataset":
        """Drop malformed-bbox annotations (reference
        ``dataset.py:1233-1405``): negative coords, non-positive sizes
        (zero allowed for keypoints when ``allow_keypoints``), boxes
        exceeding image bounds."""
        from lours_spark.functions.geometry import bbox_validity

        sizes = self.images.select(
            F.col("id").alias("image_id"), "width", "height"
        )
        ann = self.annotations.join(sizes, "image_id", "left")
        preds = bbox_validity(allow_keypoints=allow_keypoints)
        bad = None
        for p in preds.values():
            q = F.coalesce(p, F.lit(False))
            bad = q if bad is None else (bad | q)
        kept = ann.filter(~bad).drop(
            *[c for c in ("width", "height") if c not in self.annotations.columns]
        )
        out = self.from_template(annotations=kept)
        if remove_emptied_images:
            originally_empty = self.images.join(
                self.annotations.select(F.col("image_id").alias("id")).distinct(),
                "id",
                "left_anti",
            )
            still = self.images.join(
                kept.select(F.col("image_id").alias("id")).distinct(),
                "id",
                "left_semi",
            )
            out = out.from_template(images=still.unionByName(originally_empty))
        return out

    def rebase_images_root(self, new_root: str) -> "SparkDataset":
        """Re-root image paths (reference root-rebase
        ``dataset.py:1039-1123``): relative paths are rewritten so they
        stay valid relative to ``new_root``; driver computes the
        relpath prefix, rows get a concat."""
        import os

        rel = os.path.relpath(str(self.images_root), new_root)
        if rel == ".":
            return self
        images = self.images.withColumn(
            "relative_path",
            F.concat(F.lit(rel + "/"), F.col("relative_path")),
        )
        return self.from_template(images=images, images_root=new_root)

    # ------------------------------------------------------------ remapping
    def remap_classes(
        self,
        mapping: dict[int, int],
        new_names: dict[int, str] | None = None,
        keep_unmapped: bool = False,
        remove_emptied_images: bool = False,
    ) -> "SparkDataset":
        """category_id → new id remap; unmapped classes dropped unless
        ``keep_unmapped`` (reference ``dataset.py:3340-3579``).

        Implemented as a literal-map lookup (label spaces are tiny) —
        no join, no shuffle; the drop is a plain filter.

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> m = ds.remap_classes({1: 0, 4: 0, 7: 1},
        ...                      new_names={0: 'small', 1: 'big'})
        >>> sorted(m.label_map.items())
        [(0, 'small'), (1, 'big')]
        >>> m.annotations.filter("category_str = 'big'").count()
        5
        """
        full = dict(mapping)
        if keep_unmapped:
            for k in self.label_map:
                full.setdefault(k, k)
        ann = self.annotations.filter(F.col("category_id").isin(list(full)))
        ann = ann.withColumn(
            "category_id",
            _map_literal(full)[F.col("category_id")].cast("int"),
        )
        new_label_map: dict[int, str] = {}
        for old, new in full.items():
            name = (new_names or {}).get(new) or self.label_map.get(old, str(new))
            if new in new_label_map and (new_names or {}).get(new) is None:
                # merged classes keep the first name unless overridden
                continue
            new_label_map[new] = name
        out = self.from_template(annotations=ann, label_map=new_label_map).denormalize()
        if remove_emptied_images:
            kept = out.annotations.select(
                F.col("image_id").alias("id")
            ).distinct()
            originally_empty = self.images.join(
                self.annotations.select(F.col("image_id").alias("id")).distinct(),
                "id",
                "left_anti",
            )
            images = self.images.join(kept, "id", "left_semi").unionByName(
                originally_empty
            )
            out = out.from_template(images=images)
        return out

    def remap_from_dataframe(self, mapping_df: DataFrame) -> "SparkDataset":
        """Remap driven by a mapping table with columns
        ``input_category_id, output_category_id, output_category_name``
        (reference ``dataset.py:3633``). Mapping is collected (label
        spaces are tiny by construction) then applied as a literal."""
        rows = mapping_df.select(
            "input_category_id", "output_category_id", "output_category_name"
        ).collect()
        mapping = {r[0]: r[1] for r in rows}
        names = {r[1]: r[2] for r in rows}
        return self.remap_classes(mapping, new_names=names)

    def remap_from_csv(self, path: str) -> "SparkDataset":
        """Remap from a CSV with columns input_category_id,
        output_category_id, output_category_name (reference
        ``dataset.py:3633-3793``)."""
        mapping_df = (
            self.spark.read.option("header", "true").csv(path)
            .select(
                F.col("input_category_id").cast("int"),
                F.col("output_category_id").cast("int"),
                F.col("output_category_name"),
            )
        )
        return self.remap_from_dataframe(mapping_df)

    def remap_from_preset(
        self, name: str, invert: bool = False
    ) -> "SparkDataset":
        """Apply a named preset mapping (reference ``dataset.py:3581``,
        registry ``remap_presets/__init__.py:15-45``)."""
        from lours_spark.dataset.remap_presets import get_preset

        mapping, names = get_preset(name, invert=invert)
        return self.remap_classes(mapping, new_names=names)

    def remap_from_other(self, other: "SparkDataset") -> "SparkDataset":
        """Align this dataset's label space to another's BY NAME
        (reference ``dataset.py:3794-4015``): categories whose name
        exists in ``other`` take its id; clashing leftovers get the
        lowest free ids. Pure driver-side dict algebra — label maps are
        tiny by construction."""
        inverted = {v: k for k, v in other.label_map.items()}
        mapping: dict[int, int] = {}
        names: dict[int, str] = {}
        taken = set(inverted.values())

        def next_free() -> int:
            for i in range(10**9):  # pragma: no branch
                if i not in taken:
                    taken.add(i)
                    return i
            raise RuntimeError("unreachable")

        for old_id, name in sorted(self.label_map.items()):
            if name in inverted:
                mapping[old_id] = inverted[name]
            else:
                mapping[old_id] = next_free()
            names[mapping[old_id]] = name
        return self.remap_classes(mapping, new_names=names, keep_unmapped=False)

    def remap_sequential(self) -> tuple["SparkDataset", dict[int, int]]:
        """Remap category ids to contiguous 0..n-1 ordered by old id —
        the darknet-export remap (reference ``io/darknet.py:613-616``).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> seq, mapping = ds.remap_sequential()
        >>> mapping
        {1: 0, 4: 1, 7: 2}
        >>> sorted(seq.label_map)
        [0, 1, 2]
        """
        mapping = {k: i for i, k in enumerate(sorted(self.label_map))}
        names = {mapping[k]: v for k, v in self.label_map.items()}
        return self.remap_classes(mapping, new_names=names), mapping

    # ------------------------------------------------------------- reindex
    def reset_index(
        self,
        start_image_id: int = 0,
        start_annotation_id: int = 0,
    ) -> "SparkDataset":
        """Renumber image ids (ordered by relative_path) and annotation
        ids (ordered by image_id, category_id, bbox) to contiguous
        ranges; FK rewritten (reference ``dataset.py:1883-2020``).

        Id assignment is the two-phase parallel global row number
        (``functions/ids.py``) — range partition + per-partition offset
        — never a single-partition window, so the export path survives
        a 100 TB table.

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> r = ds.reset_index(start_image_id=100, start_annotation_id=1000)
        >>> [row['id'] for row in r.images.orderBy('id').collect()]
        [100, 101, 102, 103]
        >>> r.annotations.agg({'id': 'min'}).first()[0]
        1000
        """
        from lours_spark.functions.ids import global_row_number

        img_order = [c for c in ("relative_path", "id") if c in self.images.columns]
        images = global_row_number(
            self.images, img_order, out_col="__new_id", start=start_image_id
        )
        id_map = images.select(
            F.col("id").alias("__old_id"), F.col("__new_id")
        )
        new_images = images.drop("id").withColumnRenamed("__new_id", "id").select(
            "id", *[c for c in self.images.columns if c != "id"]
        )
        ann = self.annotations.join(
            id_map, self.annotations.image_id == id_map["__old_id"], "inner"
        ).drop("image_id", "__old_id").withColumnRenamed("__new_id", "image_id")
        ann_order = [
            c
            for c in ("image_id", "category_id", *S.BBOX_COLUMN_NAMES, "id")
            if c in ann.columns
        ]
        ann = global_row_number(
            ann, ann_order, out_col="__new_ann_id", start=start_annotation_id
        )
        ann = ann.drop("id").withColumnRenamed("__new_ann_id", "id").select(
            "id", *[c for c in self.annotations.columns if c != "id"]
        )
        return self.from_template(images=new_images, annotations=ann)

    def reset_index_from_mapping(
        self,
        image_id_map: DataFrame,
        drop_unmapped: bool = True,
    ) -> "SparkDataset":
        """Apply an explicit (old_id → new_id) image mapping, rewriting
        the FK; unmapped rows dropped or appended after the max mapped id
        (reference ``dataset.py:2022-2201``)."""
        m = image_id_map.select(
            F.col("old_id").alias("__old"), F.col("new_id").alias("__new")
        )
        if not drop_unmapped:
            # unmapped images get fresh ids after the max mapped id
            # (reference dataset.py:2177-2181). Two-phase numbering:
            # with a small explicit mapping the unmapped side is nearly
            # the WHOLE image table, and an unpartitioned
            # row_number() window would funnel it through one task
            from lours_spark.functions.ids import global_row_number

            max_new = m.agg(F.max("__new")).collect()[0][0]
            max_new = -1 if max_new is None else max_new
            unmapped = global_row_number(
                self.images.join(m, self.images.id == m["__old"], "left_anti")
                .select(F.col("id").alias("__old")),
                ["__old"],
                out_col="__new",
                start=max_new + 1,
            )
            m = m.unionByName(unmapped)
        images = (
            self.images.join(m, self.images.id == m["__old"], "inner")
            .drop("id", "__old")
            .withColumnRenamed("__new", "id")
            .select("id", *[c for c in self.images.columns if c != "id"])
        )
        ann = (
            self.annotations.join(
                m, self.annotations.image_id == m["__old"], "inner"
            )
            .withColumn("image_id", F.col("__new"))
            .drop("__old", "__new")
        )
        return self.from_template(images=images, annotations=ann)

    def match_index(
        self, other: "SparkDataset", key: str = "relative_path"
    ) -> DataFrame:
        """Align this dataset's image ids to another's via a shared key
        column; returns the (old_id, new_id) mapping (reference
        ``dataset.py:2203-2334``). Duplicate keys on either side are a
        correctness error surfaced by ``check``-style counts upstream.

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> m = ds.match_index(ds.reset_index(start_image_id=10))
        >>> m.orderBy('old_id').first()
        Row(old_id=0, new_id=10)
        """
        left = self.images.select(F.col("id").alias("old_id"), F.col(key))
        right = other.images.select(F.col("id").alias("new_id"), F.col(key))
        return left.join(right, key, "inner").select("old_id", "new_id")

    # ----------------------------------------------------------- set ops
    def merge(
        self,
        other: "SparkDataset",
        mark_origin: bool = False,
    ) -> "SparkDataset":
        """Outer union of two datasets (reference ``merge.py:12-222``):
        label maps merged with conflict detection, schemas reconciled
        column-wise, provenance columns optional.

        ``unionByName(allowMissingColumns=True)`` keeps this a pure
        narrow transformation — no shuffle.

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> both = ds.merge(ds.reset_index(start_image_id=100,
        ...                                start_annotation_id=100))
        >>> both.images.count(), both.annotations.count()
        (8, 16)
        """
        from lours_spark.dataset.merge import merge_datasets

        return merge_datasets(self, other, mark_origin=mark_origin)

    def __add__(self, other: "SparkDataset") -> "SparkDataset":
        return self.merge(other)

    def diff(self, other: "SparkDataset") -> dict[str, DataFrame]:
        """Three-way image diff (left_only / right_only / common) with
        null-safe row equality (reference ``difftools.py:10-186``).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, n_labels=3, seed=1)
        >>> d = ds.diff(ds.filter_images("width > 1000"))
        >>> d['left_only'].count(), d['common'].count()
        (2, 2)
        """
        from lours_spark.dataset.diff import dataset_diff

        return dataset_diff(self, other)

    def __sub__(self, other: "SparkDataset"):
        return self.diff(other)

    # --------------------------------------------------------- persistence
    def to_parquet(self, path: str, mode: str = "overwrite") -> None:
        """Parquet-per-table + JSON sidecar (reference
        ``utils/parquet_saver.py:11-84``). Partitioned by ``split`` when
        present — at 100 TB this is the layout every downstream split
        filter prunes on."""
        import json
        import os

        img_writer = self.images.write.mode(mode)
        ann_writer = self.annotations.write.mode(mode)
        if "split" in self.images.columns:
            img_writer = img_writer.partitionBy("split")
        if "split" in self.annotations.columns:
            ann_writer = ann_writer.partitionBy("split")
        img_writer.parquet(os.path.join(path, "images"))
        ann_writer.parquet(os.path.join(path, "annotations"))
        meta = {
            "dataset_name": self.dataset_name,
            "images_root": str(self.images_root),
            "label_map": {str(k): v for k, v in self.label_map.items()},
            "booleanized_columns": {
                k: sorted(v) for k, v in self.booleanized_columns.items()
            },
        }
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(meta, f)

    def to_versioned(
        self,
        table_root: str,
        extra: "dict | None" = None,
        keep_last: "int | None" = None,
    ) -> dict:
        """Publish this dataset as the next version of a versioned
        table (``io/versioned.py``): the whole ``to_parquet`` layout
        (images/ + annotations/ + metadata.json) lands in a staged
        version directory, then ONE atomic pointer flip makes all
        three visible together — a reader can never see new images
        with old annotations, the torn state a plain overwrite of the
        two-table layout can expose. Crash before the flip leaves an
        invisible orphan. Returns the pointer document;
        ``keep_last`` optionally prunes old versions after publishing.

        >>> import shutil, tempfile
        >>> from lours_spark.testing import dummy_dataset
        >>> root = tempfile.mkdtemp()
        >>> ds = dummy_dataset(spark, n_imgs=4, n_annot=8, seed=7)
        >>> ptr = ds.to_versioned(root)
        >>> back = SparkDataset.from_versioned(spark, root)
        >>> (ptr["version"], back.images.count(), back.annotations.count())
        (0, 4, 8)
        >>> _ = ds.filter_images("width > 0").to_versioned(root)
        >>> SparkDataset.from_versioned(spark, root).label_map == ds.label_map
        True
        >>> _ = shutil.rmtree(root)
        """
        from lours_spark.io.versioned import (
            commit_version,
            prune_versions,
            start_version,
        )

        v, path = start_version(table_root)
        self.to_parquet(path, mode="error")
        ptr = commit_version(table_root, v, extra=extra)
        if keep_last is not None:
            ptr["pruned"] = prune_versions(table_root, keep_last=keep_last)
        return ptr

    @staticmethod
    def from_versioned(
        spark: SparkSession, table_root: str
    ) -> "SparkDataset":
        """Load the published version of a :meth:`to_versioned` table —
        a plain :meth:`from_parquet` on the directory the ``CURRENT``
        pointer names (split-partition pruning and the metadata sidecar
        behave exactly as for a direct path)."""
        from lours_spark.io.versioned import current_version, version_path

        cur = current_version(table_root)
        if cur is None:
            raise FileNotFoundError(
                f"no published version under {table_root!r} "
                "(missing CURRENT)"
            )
        return SparkDataset.from_parquet(
            spark, version_path(table_root, cur)
        )

    def to_bucketed_tables(
        self,
        name_prefix: str,
        num_buckets: int = 32,
        mode: str = "overwrite",
    ) -> tuple[str, str]:
        """Persist both tables BUCKETED on the join key (images by id,
        annotations by image_id) via ``saveAsTable`` — the 100 TB layout
        where the pervasive images⟕annotations joins co-locate with no
        exchange on either side (verified in tests by asserting the
        joined plan contains no shuffle)."""
        img_table = f"{name_prefix}_images"
        ann_table = f"{name_prefix}_annotations"
        (
            self.images.write.mode(mode)
            .bucketBy(num_buckets, "id")
            .sortBy("id")
            .format("parquet")
            .saveAsTable(img_table)
        )
        (
            self.annotations.write.mode(mode)
            .bucketBy(num_buckets, "image_id")
            .sortBy("image_id")
            .format("parquet")
            .saveAsTable(ann_table)
        )
        return img_table, ann_table

    @staticmethod
    def from_bucketed_tables(
        spark: SparkSession,
        name_prefix: str,
        label_map: dict[int, str] | None = None,
    ) -> "SparkDataset":
        return SparkDataset(
            images=spark.table(f"{name_prefix}_images"),
            annotations=spark.table(f"{name_prefix}_annotations"),
            label_map=label_map or {},
        )

    # ------------------------------------------ reference-parity delegates
    # The reference exposes most operators as Dataset METHODS
    # (``dataset.py``); the engine keeps them as composable module
    # functions and mirrors the method surface here so reference call
    # sites port verbatim.
    def rename(self, dataset_name: str) -> "SparkDataset":
        """New facade with a new name, frames shared (reference
        ``dataset.py`` ``rename`` — method-chaining friendly)."""
        return self.from_template(dataset_name=dataset_name)

    reset_images_root = rebase_images_root  # reference spelling

    def get_image_attributes(self) -> list[str]:
        return self.image_attributes()

    def get_annotations_attributes(self) -> list[str]:
        return self.annotation_attributes()

    def booleanize(
        self, column: str, table: str = "annotations",
        domain: list[str] | None = None,
    ) -> "SparkDataset":
        """One-hot-expand a list column in place (reference
        ``dataset.py`` ``booleanize`` → ``column_booleanizer.py``).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=3, n_annot=6,
        ...                    n_list_columns_annotations=1, seed=3)
        >>> bz = ds.booleanize('ann_tags_0')
        >>> sorted(bz.booleanized_columns) == ['ann_tags_0']
        True
        >>> back = bz.debooleanize('ann_tags_0')
        >>> back.booleanized_columns
        {}
        """
        from lours_spark.operators.booleanize import booleanize as _bz

        df = self.annotations if table == "annotations" else self.images
        out, dom = _bz(df, column, domain=domain)
        boolized = {**self.booleanized_columns, column: set(dom)}
        kw = {table: out, "booleanized_columns": boolized}
        return self.from_template(**kw)

    def debooleanize(self, prefix: str, table: str = "annotations") -> "SparkDataset":
        from lours_spark.operators.booleanize import debooleanize as _dbz

        df = self.annotations if table == "annotations" else self.images
        out = _dbz(df, prefix)
        remaining = {
            k: v for k, v in self.booleanized_columns.items() if k != prefix
        }
        kw = {table: out, "booleanized_columns": remaining}
        return self.from_template(**kw)

    def cap_bounding_box_coordinates(self) -> "SparkDataset":
        """Clip boxes to image bounds (reference ``dataset.py``
        ``cap_bounding_box_coordinates``)."""
        from lours_spark.functions.geometry import (
            cap_bounding_box_coordinates as _cap,
        )

        return self.from_template(
            annotations=_cap(self.annotations, self.images)
        )

    def add_detection_annotation(self, *args, **kwargs) -> "SparkDataset":
        from lours_spark.operators.appender import add_detection_annotation

        return add_detection_annotation(self, *args, **kwargs)

    def annotation_append(self, format_string: str = "XYWH"):
        """Context-manager appender (reference ``annotation_append`` —
        NOT in-place here: the result is ``appender.result``, keeping
        the facade immutable like every other operator)."""
        from lours_spark.operators.appender import AnnotationAppender

        return AnnotationAppender(self, box_format=format_string)

    def simple_split(
        self,
        input_seed: int = 0,
        split_names: tuple = ("train", "valid"),
        target_split_shares: tuple = (0.8, 0.2),
    ) -> "SparkDataset":
        """Seeded random image split (reference ``simple_split``,
        ``dataset.py:4257-4382``); prefer :meth:`hash_split_images`
        for retry-stable assignment at scale. Only NULL-split rows are
        (re)assigned — existing assignments are preserved.

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=20, n_annot=20,
        ...                    split_names=None, seed=1)
        >>> s = ds.simple_split(split_names=("train", "valid"),
        ...                     target_split_shares=(0.5, 0.5))
        >>> s.images.filter("split IS NULL").count()
        0
        >>> s.images.select("split").distinct().count()
        2
        """
        from lours_spark.split.splitter import simple_split as _ss

        shares = dict(zip(split_names, target_split_shares))
        return self.from_template(
            images=_ss(self.images, shares, seed=input_seed)
        )

    def hash_split_images(self, shares: dict[str, float]) -> "SparkDataset":
        from lours_spark.split.splitter import hash_split as _hs

        return self.from_template(images=_hs(self.images, shares))

    def split(
        self,
        input_seed: int = 0,
        split_names: tuple = ("train", "valid"),
        target_split_shares: tuple = (0.8, 0.2),
        keep_separate_groups: list[str] | None = None,
        keep_balanced_groups: list[str] | None = None,
    ) -> "SparkDataset":
        """Balanced split honoring keep-separate/keep-balanced groups
        (reference ``Dataset.split``, ``dataset.py:4384-4681``):
        annotation-side atomic chunks + distributed histograms + driver
        greedy assignment, propagated back to images. Images with no
        annotations get no split from that pass, so — like the
        reference's second pass, whose doctest assigns all 200 images
        with only 2 annotations — the remaining NULL-split images are
        then assigned by a seeded random split at the RESIDUAL target
        shares (what each split still needs once the annotation-derived
        assignments are counted).

        >>> from lours_spark.testing import dummy_dataset
        >>> ds = dummy_dataset(spark, n_imgs=20, n_annot=40,
        ...                    split_names=None, seed=1)
        >>> b = ds.split(split_names=("train", "valid"),
        ...              target_split_shares=(0.5, 0.5))
        >>> b.images.filter("split IS NULL").count()
        0
        >>> b.annotations.select("split").distinct().count()  # both used
        2
        """
        from lours_spark.split.balanced import balanced_split
        from lours_spark.split.splitter import simple_split

        shares = dict(zip(split_names, target_split_shares))
        dims = list(keep_balanced_groups or ["category_id"])
        assigned = balanced_split(
            self.annotations,
            shares,
            dims=dims,
            keep_separate=list(keep_separate_groups or ["image_id"]),
            seed=input_seed,
        )
        img_split = (
            assigned.groupBy("image_id")
            .agg(F.min("split").alias("split"))
            .withColumnRenamed("image_id", "__iid")
        )
        images = (
            self.images.drop("split")
            .join(img_split, F.col("id") == F.col("__iid"), "left")
            .drop("__iid")
        )
        # second pass: annotation-less images keep NULL after the join;
        # assign them too so get_split()/iter_splits cover every image
        # (simple_split fills only NULL rows and applies residual
        # target shares internally since round 6)
        images = simple_split(images, shares, seed=input_seed)
        return self.from_template(images=images, annotations=assigned)

    # export delegates (reference to_* methods)
    def to_coco(self, output_dir: str):
        from lours_spark.io.coco import dataset_to_coco

        return dataset_to_coco(self, output_dir)

    def to_caipy(self, output_root: str, **kw) -> None:
        from lours_spark.io.caipy import dataset_to_caipy

        dataset_to_caipy(self, output_root, **kw)

    def to_caipy_generic(
        self,
        output_images_folder: str | None,
        output_annotations_folder: str,
        **kw,
    ) -> None:
        """cAIpy write into caller-chosen image/annotation folders
        (reference ``Dataset.to_caipy_generic``,
        ``dataset.py:4983-5049``). ``output_images_folder=None`` writes
        annotations only (prediction-set export)."""
        from lours_spark.io.caipy import dataset_to_caipy_generic

        dataset_to_caipy_generic(
            self, output_images_folder, output_annotations_folder, **kw
        )

    def to_darknet(self, output_dir: str) -> None:
        from lours_spark.io.darknet import dataset_to_darknet

        dataset_to_darknet(self, output_dir)

    def to_yolov5(self, output_dir: str, **kw) -> None:
        from lours_spark.io.darknet import dataset_to_yolov5

        dataset_to_yolov5(self, output_dir, **kw)

    def to_yolov7(self, output_dir: str, **kw) -> None:
        from lours_spark.io.darknet import dataset_to_yolov7

        dataset_to_yolov7(self, output_dir, **kw)

    def to_fiftyone(self, name: str, **kw):
        from lours_spark.io.fiftyone import dataset_to_fiftyone

        return dataset_to_fiftyone(self, name, **kw)

    @staticmethod
    def from_parquet(spark: SparkSession, path: str) -> "SparkDataset":
        import json
        import os

        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        images = spark.read.parquet(os.path.join(path, "images"))
        annotations = spark.read.parquet(os.path.join(path, "annotations"))
        return SparkDataset(
            images=images,
            annotations=annotations,
            label_map={int(k): v for k, v in meta["label_map"].items()},
            dataset_name=meta.get("dataset_name"),
            images_root=meta.get("images_root", "."),
            booleanized_columns={
                k: set(v) for k, v in meta.get("booleanized_columns", {}).items()
            },
        )


class _ILocIndexer:
    """Positional indexer over a dataset table in ``id`` order (reference
    ``lours/dataset/indexing.py`` — pandas ``iloc`` semantics re-expressed
    against a deterministic total order instead of insertion order).

    Accepts an int, a slice, a list of ints, a boolean mask (a Python
    list of bools, one per position, or a pyspark boolean ``Column``
    evaluated against the table — reference
    ``lours/dataset/indexing.py:32-56`` mask path), or a pyspark
    ``Column``; negatives count from the end. The position column is a
    two-phase global row number, so the plan stays parallel at any
    table size. Slices of every sign/step compile to a range predicate
    over the position (never a materialized list of positions); a
    contiguous head slice (``[:n]``) compiles to ``orderBy().limit(n)``;
    long int lists become a broadcast semi-join instead of an
    ``isin`` literal.
    """

    #: int lists longer than this join against a broadcast positions
    #: frame instead of compiling an isin() literal into the plan
    _ISIN_LITERAL_MAX = 1000

    def __init__(self, dataset: SparkDataset, annot: bool) -> None:
        self._ds = dataset
        self._annot = annot

    def _table(self) -> DataFrame:
        return self._ds.annotations if self._annot else self._ds.images

    def _wrap(self, selected: DataFrame) -> SparkDataset:
        if self._annot:
            # reference DatasetAnnotLocator: images kept untouched
            return self._ds.from_template(annotations=selected)
        annotations = self._ds.annotations.join(
            selected.select(F.col("id").alias("image_id")),
            "image_id",
            "left_semi",
        )
        return self._ds.from_template(images=selected, annotations=annotations)

    def __getitem__(self, index) -> SparkDataset:
        from pyspark.sql import Column

        from lours_spark.functions.ids import global_row_number

        df = self._table()
        if isinstance(index, Column):
            # boolean predicate evaluated against the table itself —
            # the scalable spelling of the reference's boolean mask
            return self._wrap(df.filter(index))
        if isinstance(index, int):
            positions = [index]
        elif isinstance(index, slice):
            start, stop, step = index.start, index.stop, index.step or 1
            if step > 0 and (start or 0) >= 0 and (stop is None or stop >= 0):
                # positive-step, non-negative bounds: range predicate
                # with NO count() — an open stop is simply unbounded
                s0 = start or 0
                if s0 == 0 and step == 1 and stop is not None:
                    # head slice: no numbering pass at all
                    return self._wrap(df.orderBy("id").limit(stop))
                numbered = global_row_number(df, ["id"], "__pos")
                keep = (F.col("__pos") >= s0) & (
                    (F.col("__pos") - s0) % step == 0
                )
                if stop is not None:
                    keep &= F.col("__pos") < stop
                return self._wrap(numbered.filter(keep).drop("__pos"))
            # negative bounds / reversed step: resolve concrete bounds
            # from ONE count, then keep the range predicate — never a
            # materialized list of positions (an O(n) literal would
            # stall the driver on large tables)
            n = df.count()
            s0, s1, st = index.indices(n)
            numbered = global_row_number(df, ["id"], "__pos")
            if st > 0:
                keep = (
                    (F.col("__pos") >= s0)
                    & (F.col("__pos") < s1)
                    & ((F.col("__pos") - s0) % st == 0)
                )
            else:
                keep = (
                    (F.col("__pos") <= s0)
                    & (F.col("__pos") > s1)
                    & ((F.lit(s0) - F.col("__pos")) % (-st) == 0)
                )
            return self._wrap(numbered.filter(keep).drop("__pos"))
        elif isinstance(index, (list, tuple)):
            items = list(index)
            if items and all(isinstance(x, bool) for x in items):
                # boolean mask: positions where True (reference
                # indexing.py:32-56; length-checked like pandas)
                n = df.count()
                if len(items) != n:
                    raise IndexError(
                        f"boolean mask length {len(items)} does not match "
                        f"table length {n}"
                    )
                positions = [i for i, keep in enumerate(items) if keep]
            else:
                positions = items
        else:
            raise TypeError(
                f"iloc index must be int, slice, list of ints, boolean "
                f"mask or Column, got {type(index).__name__}"
            )
        if any(p < 0 for p in positions):
            n = df.count()
            positions = [p + n if p < 0 else p for p in positions]
        numbered = global_row_number(df, ["id"], "__pos")
        if len(positions) <= self._ISIN_LITERAL_MAX:
            return self._wrap(
                numbered.filter(F.col("__pos").isin(positions)).drop("__pos")
            )
        # long explicit position lists: broadcast semi-join beats an
        # isin() literal of thousands of terms (plan size, codegen)
        pos_df = df.sparkSession.createDataFrame(
            [(int(p),) for p in positions], "__pos bigint"
        )
        return self._wrap(
            numbered.join(F.broadcast(pos_df), "__pos", "left_semi").drop("__pos")
        )
