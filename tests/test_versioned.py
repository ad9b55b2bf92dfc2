"""Versioned plain-parquet tables (io/versioned.py): the pointer-file
publish pattern that makes the maintenance layer's write-new-dir +
reader-swap discipline crash-safe. Properties pinned here:

- visibility rule: a written-but-uncommitted version is invisible to
  readers (crash between write and commit leaves only an orphan);
- atomic publish: CURRENT flips whole-pointer (scratch + os.replace),
  and a reader's resolved snapshot is stable across a later publish;
- numbering never reuses a crashed writer's allocation;
- retention: prune keeps current, everything newer (live retries),
  and the keep_last-1 rollback window below; rollback re-points;
- composition with compact_parquet (dst = staged version path) and
  hive partition layout.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lours_spark.io.compact import compact_parquet
from lours_spark.io.versioned import (
    commit_version,
    current_version,
    list_versions,
    prune_versions,
    publish_dataframe,
    read_current,
    read_pointer,
    rollback,
    start_version,
    version_path,
)


def test_publish_read_roundtrip_and_pointer(spark, tmp_path):
    root = str(tmp_path / "tbl")
    ptr = publish_dataframe(
        spark.range(10).withColumn("x", F.col("id") * 2),
        root,
        extra={"rows": 10},
    )
    assert ptr["version"] == 0 and ptr["previous"] is None
    assert current_version(root) == 0
    got = read_current(spark, root)
    assert got.count() == 10
    assert {r["x"] for r in got.collect()} == {2 * i for i in range(10)}
    # pointer document is tiny, valid JSON, and carries the extra
    on_disk = json.load(open(os.path.join(root, "CURRENT")))
    assert on_disk["extra"] == {"rows": 10}
    ptr2 = publish_dataframe(spark.range(20), root)
    assert (ptr2["version"], ptr2["previous"]) == (1, 0)
    assert read_current(spark, root).count() == 20


def test_uncommitted_version_is_invisible(spark, tmp_path):
    """Crash between data write and commit: readers still see the old
    version; the orphan directory is never exposed."""
    root = str(tmp_path / "tbl")
    publish_dataframe(spark.range(5), root)
    v, path = start_version(root)
    spark.range(999).write.parquet(path)  # writer "crashes" here
    assert current_version(root) == 0
    assert read_current(spark, root).count() == 5
    assert list_versions(root) == [0, v]  # orphan on disk, unreferenced


def test_numbering_skips_crashed_allocation(spark, tmp_path):
    """A retry after a crash must get a FRESH directory, never write
    into the half-written one."""
    root = str(tmp_path / "tbl")
    publish_dataframe(spark.range(5), root)
    v1, path1 = start_version(root)
    spark.range(3).write.parquet(path1)  # crash before commit
    v2, path2 = start_version(root)
    assert v2 == v1 + 1 and path2 != path1
    spark.range(7).write.parquet(path2)
    commit_version(root, v2)
    assert read_current(spark, root).count() == 7


def test_commit_requires_data_dir(tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="no data directory"):
        commit_version(root, 0)


def test_reader_snapshot_stable_across_publish(spark, tmp_path):
    """A DataFrame resolved against version N keeps reading N's files
    after N+1 publishes (the plan holds the resolved path; retention
    keeps it on disk)."""
    root = str(tmp_path / "tbl")
    publish_dataframe(spark.range(10), root)
    snapshot = read_current(spark, root)
    publish_dataframe(spark.range(100), root, keep_last=2)
    assert snapshot.count() == 10  # old reader unaffected
    assert read_current(spark, root).count() == 100


def test_prune_retention_window(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for n in (1, 2, 3, 4):
        publish_dataframe(spark.range(n), root)
    # keep_last=2: current (3) + one rollback target (2)
    assert prune_versions(root, keep_last=2) == [0, 1]
    assert list_versions(root) == [2, 3]
    # current always survives even with keep_last=1
    assert prune_versions(root, keep_last=1) == [2]
    assert list_versions(root) == [3]
    assert read_current(spark, root).count() == 4


def test_prune_protects_newer_than_current_and_rollback(spark, tmp_path):
    """Directories NEWER than CURRENT (in-flight writer, or a bad
    publish rolled back from) survive pruning; rollback re-points and
    the bad version stays inspectable."""
    root = str(tmp_path / "tbl")
    publish_dataframe(spark.range(10), root)   # v0, good
    publish_dataframe(spark.range(1), root)    # v1, "bad"
    rollback(root, 0)
    assert current_version(root) == 0
    assert read_current(spark, root).count() == 10
    assert read_pointer(root)["extra"] == {"rollback": True}
    # prune with the tightest window: v1 > current stays, v0 is current
    assert prune_versions(root, keep_last=1) == []
    assert list_versions(root) == [0, 1]
    # rolling back to a pruned version fails loud
    publish_dataframe(spark.range(2), root)    # v2 becomes current
    prune_versions(root, keep_last=1)
    with pytest.raises(ValueError, match="no data directory"):
        rollback(root, 0)


def test_compose_with_compact_parquet_and_partitioning(spark, tmp_path):
    """The maintenance-loop shape: a messy live dir compacts into a
    staged version path, publish flips the pointer, hive layout and
    pruning survive."""
    live = str(tmp_path / "live")
    root = str(tmp_path / "tbl")
    df = spark.range(200).withColumn(
        "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
    )
    for i in range(4):  # 4 small appends = the small-file mess
        df.filter(F.col("id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).partitionBy("lang").parquet(live)
    v, staged = start_version(root)
    stats = compact_parquet(
        spark, live, staged, target_file_mb=512, partition_by=["lang"]
    )
    commit_version(root, v, extra=stats)
    cur = read_current(spark, root)
    assert cur.count() == 200
    assert read_pointer(root)["extra"]["files_in"] == stats["files_in"]
    # partition pruning works through the pointer indirection
    en = cur.filter(F.col("lang") == "en")
    files = {
        r[0]
        for r in en.select(
            F.input_file_name()
        ).distinct().collect()
    }
    assert files and all("lang=en" in f for f in files)


def test_publish_dataframe_prunes_inline(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for n in (1, 2, 3):
        publish_dataframe(spark.range(n), root)
    ptr = publish_dataframe(spark.range(4), root, keep_last=2)
    assert ptr["pruned"] == [0, 1]
    assert list_versions(root) == [2, 3]


def test_read_current_unpublished_fails_loud(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no published version"):
        read_current(spark, str(tmp_path / "nope"))


def test_dataset_to_versioned_roundtrip(spark, tmp_path):
    """Whole-dataset publish: images + annotations + metadata flip
    atomically; split partitioning and label map survive the pointer
    indirection; rollback restores the previous dataset state."""
    from lours_spark.dataset.core import SparkDataset
    from lours_spark.io.versioned import rollback as _rollback
    from lours_spark.testing import dummy_dataset

    root = str(tmp_path / "ds")
    ds = dummy_dataset(spark, n_imgs=6, n_annot=12, n_labels=3, seed=5)
    ds = ds.simple_split(
        input_seed=1,
        split_names=("train", "eval"),
        target_split_shares=(0.5, 0.5),
    )
    ptr = ds.to_versioned(root, extra={"note": "initial"})
    assert ptr["version"] == 0
    back = SparkDataset.from_versioned(spark, root)
    assert back.images.count() == 6 and back.annotations.count() == 12
    assert back.label_map == ds.label_map
    assert set(back.images.columns) == set(ds.images.columns)
    # second publish: a filtered dataset; reader follows the pointer
    ds2 = ds.filter_annotations("category_id = 1")
    ptr2 = ds2.to_versioned(root)
    assert ptr2["previous"] == 0
    back2 = SparkDataset.from_versioned(spark, root)
    assert back2.annotations.count() == ds2.annotations.count() < 12
    # rollback → the full dataset again
    _rollback(root, 0)
    assert SparkDataset.from_versioned(spark, root).annotations.count() == 12


def test_dataset_from_versioned_unpublished(spark, tmp_path):
    from lours_spark.dataset.core import SparkDataset

    with pytest.raises(FileNotFoundError, match="no published version"):
        SparkDataset.from_versioned(spark, str(tmp_path / "none"))


def test_version_delta_group_summary_and_schema_evolution(spark, tmp_path):
    """Group-level delta: counts + fingerprints per group, groups
    present on one side only, and schema evolution (a column added in
    the new version is excluded — comparison runs on the column
    intersection so the delta stays meaningful)."""
    from lours_spark.io.versioned import publish_dataframe, version_delta

    root = str(tmp_path / "tbl")
    base = spark.range(8).withColumn(
        "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
    )
    publish_dataframe(base, root)
    evolved = (
        base.filter("lang = 'en'")                  # all de rows removed
        .withColumn("id", F.col("id") + F.when(F.col("id") == 0, 100).otherwise(0))
        .withColumn("score", F.lit(0.5))            # new column
    )
    publish_dataframe(evolved, root)
    d = {r["lang"]: r for r in version_delta(
        spark, root, 0, 1, group_by=["lang"]
    ).collect()}
    assert d["de"]["status"] == "removed" and d["de"]["n_new"] == 0
    assert d["en"]["status"] == "changed"           # id 0 -> 100
    assert (d["en"]["n_old"], d["en"]["n_new"]) == (4, 4)
    # whole-table verdict (no group_by): single row, changed
    whole = version_delta(spark, root, 0, 1).collect()
    assert len(whole) == 1 and whole[0]["status"] == "changed"
    # identical versions read unchanged
    same = version_delta(spark, root, 1, 1).collect()
    assert same[0]["status"] == "unchanged"


def test_version_delta_key_level(spark, tmp_path):
    """Key-level diff names added/removed/CHANGED rows (value edit
    under the same key) and filters unchanged keys out."""
    from lours_spark.io.versioned import publish_dataframe, version_delta

    root = str(tmp_path / "tbl")
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "EDITED"), (4, "d")], "k long, v string"
    )
    publish_dataframe(old, root)
    publish_dataframe(new, root)
    got = {r["k"]: r["status"] for r in version_delta(
        spark, root, 0, 1, key="k"
    ).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_version_delta_argument_errors(spark, tmp_path):
    from lours_spark.io.versioned import publish_dataframe, version_delta

    root = str(tmp_path / "tbl")
    publish_dataframe(spark.range(3), root)
    publish_dataframe(spark.range(3), root)
    with pytest.raises(ValueError, match="not both"):
        version_delta(spark, root, 0, 1, group_by=["id"], key="id")
    with pytest.raises(ValueError, match="not in both"):
        version_delta(spark, root, 0, 1, group_by=["nope"])
    with pytest.raises(ValueError, match="not in both"):
        version_delta(spark, root, 0, 1, key="nope")


def test_pointer_reads_never_torn_under_rapid_publish(tmp_path):
    """The atomicity claim, stress-tested: a publisher thread flips
    CURRENT 200 times while readers poll continuously — every read
    must see a complete, valid pointer document (monotonically
    advancing version, matching previous-chain), never a torn write,
    an empty file, or a missing CURRENT between replaces. Pure
    pointer-layer test: the data dirs are stub files, no Spark."""
    import os
    import threading

    from lours_spark.io.versioned import (
        commit_version,
        read_pointer,
        start_version,
    )

    root = str(tmp_path / "tbl")
    n_publishes = 200
    stop = threading.Event()
    bad: list = []
    seen: list = []

    def reader():
        last = -1
        while not stop.is_set():
            try:
                ptr = read_pointer(root)
            except Exception as e:  # torn JSON would raise here
                bad.append(repr(e))
                continue
            if ptr is None:
                continue  # before the first publish only
            v = ptr.get("version")
            if not isinstance(v, int) or "published_at_unix" not in ptr:
                bad.append(f"incomplete pointer: {ptr}")
            elif v < last:
                bad.append(f"version went backwards: {last} -> {v}")
            else:
                last = v
                seen.append(v)

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for _ in range(n_publishes):
            v, path = start_version(root)
            os.makedirs(path)
            open(os.path.join(path, "part-0.parquet"), "w").close()
            commit_version(root, v)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not bad, bad[:5]
    # readers observed real progress (how FAR each got is a race —
    # a reader may check stop right after the final flip and exit);
    # the final state is asserted deterministically from this thread
    assert seen
    assert read_pointer(root)["version"] == n_publishes - 1


def test_read_version_time_travel_and_history_log(spark, tmp_path):
    """read_version loads a retained non-current snapshot; history()
    replays every publish AND rollback oldest-first, tolerates a torn
    tail line, and survives pruning (the log is append-only audit,
    CURRENT is authoritative)."""
    from lours_spark.io.versioned import (
        history,
        publish_dataframe,
        read_version,
        rollback,
    )

    root = str(tmp_path / "tbl")
    for n in (5, 10, 15):
        publish_dataframe(spark.range(n), root)
    assert read_version(spark, root, 1).count() == 10  # non-current
    rollback(root, 1)
    h = history(root)
    assert [e["version"] for e in h] == [0, 1, 2, 1]
    assert h[-1]["extra"] == {"rollback": True}
    assert [e.get("previous") for e in h] == [None, 0, 1, 2]
    # torn tail line is skipped, earlier entries survive
    with open(os.path.join(root, "LOG.jsonl"), "a") as f:
        f.write('{"version": 99, "trunc')
    assert [e["version"] for e in history(root)] == [0, 1, 2, 1]
    # pruned version fails loud on time travel
    from lours_spark.io.versioned import prune_versions

    publish_dataframe(spark.range(1), root)
    prune_versions(root, keep_last=1)
    with pytest.raises(FileNotFoundError, match="not on disk"):
        read_version(spark, root, 0)


def test_version_delta_null_and_multiplicity_review_fixes(spark, tmp_path):
    """Round-11 review findings, pinned:

    1. NULL group/key values line up across versions (null-safe
       matching) — an unchanged table with NULL groups must not read
       added+removed on every audit;
    2. even-multiplicity duplicate rows do NOT cancel out of the group
       fingerprint (sum of hashes, not XOR);
    3. a value moving between columns ACROSS a NULL is detected
       (explicit NULL flag in the hash input — xxhash64 skips null
       children)."""
    from lours_spark.io.versioned import publish_dataframe, version_delta

    root = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, None), (2, "en"), (None, "de")], "id long, lang string"
    )
    publish_dataframe(df, root)
    publish_dataframe(df, root)  # identical content
    # 1a: NULL group unchanged
    got = {r["lang"]: r["status"] for r in version_delta(
        spark, root, 0, 1, group_by=["lang"]
    ).collect()}
    assert got == {None: "unchanged", "en": "unchanged", "de": "unchanged"}
    # 1b: NULL key unchanged -> filtered out entirely
    assert version_delta(spark, root, 0, 1, key="id").count() == 0

    root2 = str(tmp_path / "mult")
    publish_dataframe(
        spark.createDataFrame([(1, "x"), (1, "x")], "k long, v string"), root2
    )
    publish_dataframe(
        spark.createDataFrame([(2, "y"), (2, "y")], "k long, v string"), root2
    )
    # 2: same count, all-different duplicated rows => changed
    assert version_delta(spark, root2, 0, 1).collect()[0]["status"] == "changed"

    root3 = str(tmp_path / "nullshift")
    publish_dataframe(
        spark.createDataFrame([(1, "b", None)], "k long, a string, b string"),
        root3,
    )
    publish_dataframe(
        spark.createDataFrame([(1, None, "b")], "k long, a string, b string"),
        root3,
    )
    # 3: the value moved a -> b across a NULL => changed, both tiers
    assert version_delta(spark, root3, 0, 1).collect()[0]["status"] == "changed"
    assert {r["k"]: r["status"] for r in version_delta(
        spark, root3, 0, 1, key="k"
    ).collect()} == {1: "changed"}


def test_commit_sweeps_stale_tmp_pointers(spark, tmp_path):
    """A publisher that died between the tmp write and the replace
    leaves CURRENT.tmp-<pid>; the next commit sweeps it (single-writer
    discipline — no live publisher owns one)."""
    from lours_spark.io.versioned import publish_dataframe

    root = str(tmp_path / "tbl")
    publish_dataframe(spark.range(3), root)
    stale = os.path.join(root, "CURRENT.tmp-99999")
    open(stale, "w").write('{"version": 9')  # torn crash leftover
    publish_dataframe(spark.range(4), root)
    assert not os.path.exists(stale)
    left = [n for n in os.listdir(root) if n.startswith("CURRENT.tmp-")]
    assert left == []
