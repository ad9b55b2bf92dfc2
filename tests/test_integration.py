"""End-to-end pipeline integration: generator → split → remap → merge →
evaluate → persist → reload. Catches interface friction no unit test
sees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lours_spark.dataset.core import SparkDataset
from lours_spark.testing import assert_dataset_equal, dummy_dataset


def test_full_pipeline(spark, tmp_path):
    ds = dummy_dataset(
        spark, n_imgs=60, n_annot=300, n_labels=3, add_confidence=True, seed=9
    )

    # balanced split over the category dimension, cameras kept together
    from lours_spark.split.balanced import balanced_split

    images_split = balanced_split(
        ds.images.drop("split"),
        {"train": 0.7, "valid": 0.3},
        dims=["width"],
        id_col="id",
        seed=3,
    )
    ds = ds.from_template(images=images_split).denormalize()
    assert ds.images.filter(F.col("split").isNull()).count() == 0

    # remap to a compact label space
    remapped, mapping = ds.remap_sequential()
    assert sorted(remapped.label_map) == [0, 1, 2]

    # split → merge round trip preserves the dataset
    train = remapped.get_split("train")
    valid = remapped.get_split("valid")
    rejoined = train.merge(valid)
    assert rejoined.images.count() == remapped.images.count()
    assert rejoined.annotations.count() == remapped.annotations.count()

    # evaluate the dataset against a jittered copy of itself
    from lours_spark.evaluation.pr import evaluate_detections

    preds = (
        remapped.annotations.withColumn("id", F.col("id") + 100000)
        .withColumn("box_x_min", F.col("box_x_min") + 1.0)
        .withColumn("confidence", F.lit(0.9))
    )
    result = evaluate_detections(remapped.annotations, preds, min_iou=0.3)
    ap = {r["category_id"]: r["average_precision"] for r in result["ap"].collect()}
    assert set(ap) == {0, 1, 2}
    for v in ap.values():
        assert 0.5 <= v <= 1.0  # jitter keeps most matches

    # persist partitioned by split and reload identically
    path = str(tmp_path / "out")
    remapped.to_parquet(path)
    back = SparkDataset.from_parquet(spark, path)
    assert_dataset_equal(remapped, back)


def test_dedup_pipeline_on_dummy_corpus(spark):
    """Text pipeline composition: near-dup detection agrees between the
    exact Jaccard join and the LSH approximation on planted dups."""
    import random

    from lours_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(40)]
        docs.append((i, " ".join(words)))
    # plant 5 near-duplicates of docs 0-4 (one word changed)
    for j in range(5):
        words = docs[j][1].split()
        words[7] = "CHANGED"
        docs.append((100 + j, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
    }
    planted = {(j, 100 + j) for j in range(5)}
    assert planted <= exact
    assert len(planted & approx) >= 4  # LSH may miss at most one
    assert approx <= exact  # LSH verifies with exact jaccard → subset


def test_bucketed_join_has_no_shuffle(spark, tmp_path, tiny_dataset):
    """Bucketed persistence co-locates the images⟕annotations join:
    the joined plan must contain no Exchange (shuffle) on either side."""
    import contextlib
    import io

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        img_t, ann_t = tiny_dataset.to_bucketed_tables("bcktest", num_buckets=4)
        back = SparkDataset.from_bucketed_tables(
            spark, "bcktest", label_map=tiny_dataset.label_map
        )
        joined = back.annotations.join(
            back.images.select(F.col("id").alias("image_id")),
            "image_id",
            "left_semi",
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == tiny_dataset.annotations.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bcktest_images")
        spark.sql("DROP TABLE IF EXISTS bcktest_annotations")
