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


def test_curation_pipeline_end_to_end(spark):
    """The full curation chain over the real documents table: every
    stage runs, output is deterministic across invocations, packed
    windows respect the budget, and dedup/mixture actually shrink the
    corpus."""
    from lours_spark.pipeline import CurationConfig, curate_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = spark.createDataFrame(
        [(1, r["text"]) for r in docs.orderBy("doc_id").limit(3).collect()],
        "qid long, text string",
    )
    cfg = CurationConfig(
        benchmark=bench,
        gopher={"min_words": 20, "min_stop_words": 0,
                "min_mean_word_len": 1.0},
        quality_min_pct=0.2,
        mixture_targets={"en": 0.5, "de": 0.3, "fr": 0.2},
        pack_budget=64,
        seed=7,
    )
    out = curate_documents(docs, cfg)
    assert cfg.stages_run == [
        "decontaminate", "gopher", "dedup_exact", "quality_filter",
        "redact_pii", "mixture", "pack",
    ]
    rows = out.collect()
    assert len(rows) > 0
    # tok_from/tok_to slice the DOCUMENT: each doc-slice fits the
    # window budget and stays inside the doc
    assert all(
        0 <= r["tok_from"] < r["tok_to"] <= r["n_tok"]
        and r["tok_to"] - r["tok_from"] <= 64
        for r in rows
    )
    # every pack except possibly the stream tail is exactly full
    per_pack: dict = {}
    for r in rows:
        key = (r["shard"], r["pack_seq"])
        per_pack[key] = per_pack.get(key, 0) + (r["tok_to"] - r["tok_from"])
    for shard in {s for s, _ in per_pack}:
        seqs = sorted(p for s, p in per_pack if s == shard)
        for p in seqs[:-1]:
            assert per_pack[(shard, p)] == 64, (shard, p)
    # decontaminated: the three benchmark docs are gone
    kept_ids = {r["doc_id"] for r in rows}
    contaminated = {r["doc_id"] for r in docs.orderBy("doc_id").limit(3).collect()}
    assert not (kept_ids & contaminated)
    # deterministic: same config, same output
    cfg2 = CurationConfig(
        benchmark=bench,
        gopher={"min_words": 20, "min_stop_words": 0,
                "min_mean_word_len": 1.0},
        quality_min_pct=0.2,
        mixture_targets={"en": 0.5, "de": 0.3, "fr": 0.2},
        pack_budget=64,
        seed=7,
    )
    again = curate_documents(docs.repartition(9), cfg2).collect()
    key = lambda r: (r["shard"], r["doc_id"], r["pack_seq"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))
    # a different seed changes the mixture subsample
    cfg3 = CurationConfig(
        benchmark=bench, quality_min_pct=0.2,
        mixture_targets={"en": 0.5, "de": 0.3, "fr": 0.2},
        pack_budget=None, seed=8,
    )
    other = {r["doc_id"] for r in curate_documents(docs, cfg3).collect()}
    curated_ids_no_pack = set()
    cfg4 = CurationConfig(
        benchmark=bench, quality_min_pct=0.2,
        mixture_targets={"en": 0.5, "de": 0.3, "fr": 0.2},
        pack_budget=None, seed=7,
    )
    curated_ids_no_pack = {
        r["doc_id"] for r in curate_documents(docs, cfg4).collect()
    }
    assert other != curated_ids_no_pack


def test_curation_config_stage_log_not_clobbered_between_runs(spark):
    """curate_documents must not mutate the caller's stage log in
    place: a prior run's stages_run stays readable until the NEXT call
    completes, and two pipelines sharing one config object see each
    completed run's log, not an interleaved clear+append mess
    (ADVICE r7)."""
    from lours_spark.pipeline import CurationConfig, curate_documents

    docs = spark.createDataFrame(
        [(i, f"unique body {i} " + "tok " * 30, "en", "web")
         for i in range(6)],
        "doc_id long, text string, lang string, source string",
    )
    cfg = CurationConfig(quality_min_pct=None)
    curate_documents(docs, cfg)
    first_log = cfg.stages_run
    assert first_log == ["dedup_exact", "redact_pii"]

    # a second run must not clear the list object the caller held
    cfg2 = CurationConfig(quality_min_pct=None, redact_pii=False)
    curate_documents(docs, cfg2)
    assert first_log == ["dedup_exact", "redact_pii"]
    assert cfg2.stages_run == ["dedup_exact"]


def test_curation_pipeline_boilerplate_and_classifier_stages(spark):
    """The round-8 stages compose into the chain: the shared footer is
    stripped from EVERY doc before the quality stages, and the
    classifier cut drops spam-shaped docs the rule filter can't see;
    stage log records the order."""
    from pyspark.sql import functions as F

    from lours_spark.operators.quality import train_ngram_classifier
    from lours_spark.pipeline import CurationConfig, curate_documents

    footer = "COOKIE BANNER ACCEPT ALL"
    good = "a perfectly reasonable prose paragraph with many words here"
    spam = "buy cheap pills casino click now offer"
    rows = [
        (i, f"{good} variant {i}\n\n{footer}", "en", "web", 1)
        for i in range(8)
    ]
    rows += [(100 + i, f"{spam} deal {i}\n\n{footer}", "en", "web", 0)
             for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, label int"
    )
    w, b = train_ngram_classifier(docs, "label", num_buckets=1024, seed=0)

    cfg = CurationConfig(
        boilerplate_max_doc_share=0.5,
        classifier_weights=w,
        classifier_bias=b,
        classifier_min_score=0.5,
        classifier_num_buckets=1024,
        quality_min_pct=None,
        redact_pii=False,
    )
    out = curate_documents(docs.drop("label"), cfg)
    got = out.collect()
    assert cfg.stages_run == ["boilerplate", "classifier_filter", "dedup_exact"]
    ids = {r["doc_id"] for r in got}
    assert ids == set(range(8))  # spam cut by the classifier
    assert all(footer not in r["text"] for r in got)  # boilerplate gone
    assert all(r["source"] == "web" for r in got)  # non-text cols survive

    # guard: a threshold without the trained model fails loud
    import pytest as _pt

    with _pt.raises(ValueError, match="classifier_weights"):
        curate_documents(
            docs, CurationConfig(classifier_min_score=0.5)
        )
