"""Shared I/O helpers (reference ``lours/dataset/io/common.py``)."""

from __future__ import annotations

_KNOWN_SPLITS = {"train", "valid", "val", "eval", "test"}


def parse_annotation_name(stem: str) -> tuple[str | None, str | None]:
    """Infer (dataset_name, split) from a ``<name>_<split>`` filename
    stem (reference ``io/common.py:144-164``).

    >>> parse_annotation_name("coco_train")
    ('coco', 'train')
    >>> parse_annotation_name("plain")
    ('plain', None)
    >>> parse_annotation_name("multi_word_name_eval")
    ('multi_word_name', 'eval')
    """
    if "_" in stem:
        name, _, suffix = stem.rpartition("_")
        if suffix in _KNOWN_SPLITS:
            return (name or None), suffix
    return (stem or None), None


def construct_label_map_df(annotations) -> dict[int, str]:
    """Derive a label map from denormalized annotations, asserting a
    1:1 id↔name relation (reference ``io/common.py:15-48``)."""
    from pyspark.sql import functions as F

    rows = (
        annotations.groupBy("category_id")
        .agg(F.collect_set("category_str").alias("names"))
        .collect()
    )
    label_map: dict[int, str] = {}
    for r in rows:
        if len(r["names"]) != 1:
            raise ValueError(
                f"category_id {r['category_id']} maps to multiple names: "
                f"{sorted(r['names'])}"
            )
        label_map[r["category_id"]] = r["names"][0]
    if len(set(label_map.values())) != len(label_map):
        raise ValueError("category names are not unique across ids")
    return label_map
