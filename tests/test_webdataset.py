"""WebDataset shard sink/source: round-trip fidelity, byte-identical
re-writes, shard balance, and optional-member semantics."""

from __future__ import annotations

import hashlib
import os
import tarfile

from pyspark.sql import functions as F


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 != 0, F.concat(F.lit("label-"),
               (F.col("id") % 5))).alias("label"),
    )


def test_webdataset_roundtrip(spark, tmp_path):
    from lours_spark.io.webdataset import (
        dataset_to_webdataset,
        from_webdataset,
    )

    docs = _docs(spark)
    out = str(tmp_path / "wds")
    dataset_to_webdataset(
        docs, out, {"txt": "text", "cls": "label"}, num_shards=4
    )
    shards = sorted(os.listdir(out))
    assert shards == [f"shard-{i:05d}.tar" for i in range(4)]

    back = from_webdataset(spark, out, ["txt", "cls"])
    rows = {r["key"]: r for r in back.collect()}
    assert len(rows) == 60
    assert rows["7"]["txt"] == b"document body 7"
    assert rows["7"]["cls"] == b"label-2"
    assert rows["9"]["cls"] is None  # NULL column → member skipped


def test_webdataset_rewrite_is_byte_identical(spark, tmp_path):
    """Same data + seed → byte-identical shards (zeroed tar metadata,
    seeded order) — the reproducibility contract resume logic needs."""
    from lours_spark.io.webdataset import dataset_to_webdataset

    docs = _docs(spark)

    def digest(d):
        dataset_to_webdataset(
            docs.repartition(7), d, {"txt": "text"}, num_shards=3
        )
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    a = digest(str(tmp_path / "w1"))
    b = digest(str(tmp_path / "w2"))
    assert a == b
    assert len(a) == 3


def test_webdataset_member_layout(spark, tmp_path):
    """Members are <key>.<ext> with zeroed metadata; every sample's
    members are contiguous within its shard."""
    from lours_spark.io.webdataset import dataset_to_webdataset

    docs = _docs(spark, n=20)
    out = str(tmp_path / "wds")
    dataset_to_webdataset(
        docs, out, {"txt": "text", "cls": "label"}, num_shards=1
    )
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        members = tar.getmembers()
        assert all(m.mtime == 0 and m.uid == 0 for m in members)
        keys = [m.name.rpartition(".")[0] for m in members]
        # contiguity: each key appears in exactly one run
        runs = [k for i, k in enumerate(keys) if i == 0 or keys[i - 1] != k]
        assert len(runs) == len(set(keys))


def test_webdataset_rewrite_removes_stale_shards(spark, tmp_path):
    from lours_spark.io.webdataset import (
        dataset_to_webdataset,
        from_webdataset,
    )

    docs = _docs(spark, n=30)
    out = str(tmp_path / "wds")
    dataset_to_webdataset(docs, out, {"txt": "text"}, num_shards=6)
    assert len(os.listdir(out)) == 6
    dataset_to_webdataset(docs, out, {"txt": "text"}, num_shards=2)
    assert sorted(os.listdir(out)) == ["shard-00000.tar", "shard-00001.tar"]
    assert from_webdataset(spark, out, ["txt"]).count() == 30


def test_webdataset_null_key_rejected(spark, tmp_path):
    import pytest as _pytest

    from lours_spark.io.webdataset import dataset_to_webdataset

    docs = spark.createDataFrame(
        [(None, "body")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="NULL key"):
        dataset_to_webdataset(
            docs, str(tmp_path / "w"), {"txt": "text"}, num_shards=2
        )


def test_webdataset_dotted_extension_roundtrip(spark, tmp_path):
    """Dotted extensions ('json.gz'-style) must survive the write
    (positional row access — itertuples would positionally rename the
    invalid-identifier column) AND the read (FIRST-dot key/ext split,
    the WebDataset convention)."""
    from lours_spark.io.webdataset import (
        dataset_to_webdataset,
        from_webdataset,
    )

    docs = _docs(spark, n=12)
    out = str(tmp_path / "wds")
    dataset_to_webdataset(
        docs, out, {"json.gz": "text", "1txt": "label"}, num_shards=2
    )
    back = from_webdataset(spark, out, ["json.gz", "1txt"])
    rows = {r["key"]: r for r in back.collect()}
    assert len(rows) == 12
    assert rows["7"]["json.gz"] == b"document body 7"
    assert rows["7"]["1txt"] == b"label-2"


def test_webdataset_external_shard_first_dot_keying(spark, tmp_path):
    """Externally produced shards with dotted member extensions
    ('sample.seg.png') key on the FIRST dot of the basename;
    directory components stay part of the key."""
    import io as _io

    from lours_spark.io.webdataset import read_webdataset_members

    d = tmp_path / "ext"
    d.mkdir()
    with tarfile.open(str(d / "shard-00000.tar"), "w") as tar:
        for name, payload in [
            ("sample.seg.png", b"MASK"),
            ("sample.png", b"IMG"),
            ("sub/dir/other.txt", b"TXT"),
        ]:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(payload)
            tar.addfile(ti, _io.BytesIO(payload))
    rows = {
        (r["key"], r["ext"]): r["data"]
        for r in read_webdataset_members(spark, str(d)).collect()
    }
    assert rows[("sample", "seg.png")] == b"MASK"
    assert rows[("sample", "png")] == b"IMG"
    assert rows[("sub/dir/other", "txt")] == b"TXT"


def test_webdataset_dotted_key_rejected(spark, tmp_path):
    import pytest as _pytest

    from lours_spark.io.webdataset import dataset_to_webdataset

    docs = spark.createDataFrame(
        [("a.b", "body")], "doc_id string, text string"
    )
    with _pytest.raises(Exception, match="FIRST"):
        dataset_to_webdataset(
            docs, str(tmp_path / "w"), {"txt": "text"}, num_shards=1
        )


def test_webdataset_streaming_sink(spark, tmp_path):
    """foreachBatch sink: every micro-batch lands as a deterministic
    batch-*/shard-*.tar directory; the recursive reader returns the
    full corpus; re-running the drained stream (same checkpoint) adds
    nothing."""
    from lours_spark.io.webdataset import (
        from_webdataset,
        write_webdataset_stream,
    )
    from lours_spark.streaming.documents import read_document_stream

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(5).cast("long").alias("n_chars"),
    )
    src_dir = str(tmp_path / "drops")
    docs.write.parquet(src_dir)

    out = str(tmp_path / "wds")
    ckpt = str(tmp_path / "ckpt")
    q = write_webdataset_stream(
        read_document_stream(spark, src_dir), out, {"txt": "text"},
        checkpoint_dir=ckpt, shards_per_batch=3,
    )
    q.awaitTermination()
    batches = sorted(os.listdir(out))
    assert batches and all(b.startswith("batch-") for b in batches)

    back = from_webdataset(spark, out, ["txt"])
    rows = {r["key"]: r["txt"] for r in back.collect()}
    assert len(rows) == 40 and rows["7"] == b"body 7"

    # replay with the same checkpoint: nothing new to process,
    # corpus unchanged
    q2 = write_webdataset_stream(
        read_document_stream(spark, src_dir), out, {"txt": "text"},
        checkpoint_dir=ckpt, shards_per_batch=3, query_name="wds2",
    )
    q2.awaitTermination()
    assert from_webdataset(spark, out, ["txt"]).count() == 40


def test_webdataset_staging_path_roundtrip_and_fault(spark, tmp_path):
    """The object-store staging path (VERDICT r7 item 5), exercised via
    a file:// URI: shards build on executor-local tmp disk, upload
    through pyarrow.fs to a remote .tmp name, and publish with one
    move. A fault injected between upload and publish must leave NO
    final-name shard behind; the rerun cleans the orphaned remote tmp
    files and publishes shards byte-identical to the direct-POSIX
    writer's."""
    import glob
    import hashlib

    import pytest as _pt

    from lours_spark.io.webdataset import (
        dataset_to_webdataset,
        from_webdataset,
    )

    docs = _docs(spark)

    # reference: the direct POSIX writer
    ref_dir = str(tmp_path / "ref")
    dataset_to_webdataset(docs, ref_dir, {"txt": "text"}, num_shards=3)
    ref = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(ref_dir, "shard-*.tar"))
    }

    # fault between upload and publish: the job fails and nothing is
    # published under a final shard name
    staged = tmp_path / "staged"
    staged_uri = "file://" + str(staged)
    with _pt.raises(Exception, match="between upload and publish"):
        dataset_to_webdataset(
            docs, staged_uri, {"txt": "text"}, num_shards=3,
            _fault_inject="before_publish",
        )
    assert glob.glob(str(staged / "shard-*.tar")) == []
    leftovers = glob.glob(str(staged / "shard-*.tar.*.tmp"))
    assert leftovers  # the uploaded-but-unpublished remote tmp files

    # clean rerun over the same out_dir: orphaned tmps are removed,
    # shards publish byte-identical to the direct writer's
    dataset_to_webdataset(docs, staged_uri, {"txt": "text"}, num_shards=3)
    got = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(str(staged / "shard-*.tar"))
    }
    assert got == ref
    assert glob.glob(str(staged / "shard-*.tar.*.tmp")) == []

    # and the reader consumes the URI-addressed dataset
    back = from_webdataset(spark, staged_uri, ["txt"])
    assert back.count() == 60

    # auto-detection: a scheme'd out_dir takes the staging path even
    # without staging=True (the call above already did); a plain path
    # with staging=True forces it for shared-FS clusters
    forced = str(tmp_path / "forced")
    dataset_to_webdataset(
        docs, forced, {"txt": "text"}, num_shards=3, staging=True
    )
    got_forced = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(forced, "shard-*.tar"))
    }
    assert got_forced == ref


def test_shard_manifest_plain_and_streaming_layouts(spark, tmp_path):
    """shard_manifest counts samples/members/bytes per shard in both
    the plain layout and the streaming sink's batch-*/ layout (where
    shard names are batch-qualified); write_shard_manifest lands the
    loader-facing shards.json next to the tars."""
    import json
    import os

    from lours_spark.io.webdataset import (
        dataset_to_webdataset,
        shard_manifest,
        write_shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", bytes([i]) * 4) for i in range(30)],
        "doc_id long, text string, payload binary",
    )
    out = str(tmp_path / "wds_plain")
    dataset_to_webdataset(
        docs, out, {"txt": "text", "bin": "payload"}, num_shards=3
    )
    rows = {r["shard"]: r for r in shard_manifest(spark, out).collect()}
    assert len(rows) == 3
    assert sum(r["n_samples"] for r in rows.values()) == 30
    # two members (txt + bin) per sample
    assert all(r["n_members"] == 2 * r["n_samples"] for r in rows.values())
    assert all(r["bytes"] > 0 for r in rows.values())

    p = write_shard_manifest(spark, out)
    m = json.load(open(p))
    assert m["total_samples"] == 30 and len(m["shards"]) == 3
    assert os.path.basename(p) == "shards.json"

    # streaming layout: batch-qualified shard names stay distinct
    from lours_spark.io.webdataset import write_webdataset_stream

    drops = str(tmp_path / "drops")
    docs.write.parquet(drops)
    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string, payload binary")
        .option("maxFilesPerTrigger", 1)
        .load(drops)
    )
    sout = str(tmp_path / "wds_stream")
    q = write_webdataset_stream(
        stream, sout, {"txt": "text"},
        checkpoint_dir=str(tmp_path / "ck"), shards_per_batch=2,
    )
    q.awaitTermination()
    srows = shard_manifest(spark, sout).collect()
    assert all("/" in r["shard"] and r["shard"].startswith("batch-")
               for r in srows)
    assert sum(r["n_samples"] for r in srows) == 30


def test_shard_key_python_and_column_twins_agree(spark):
    """_shard_key (Python, members leg) and _shard_key_col (JVM,
    sizes leg) must derive IDENTICAL keys or the manifest join
    silently drops shards — pinned over scheme variants, nested
    layouts, and the glob-root fallback."""
    from lours_spark.io.webdataset import (
        _norm_root,
        _shard_key,
        _shard_key_col,
    )

    cases = [
        # (file path as binaryFile reports it, scan root)
        ("file:/data/wds/shard-00001.tar", "/data/wds"),
        ("file:///data/wds/shard-00001.tar", "/data/wds"),
        ("file:/data/wds/batch-000002/shard-00000.tar", "/data/wds"),
        # triple-slash URI + NESTED path: the scheme strip leaves a
        # double slash that must collapse or the prefix test fails on
        # the JVM side only (round-11 self-review catch)
        ("file:///data/wds/sub1/shard-00000.tar", "/data/wds"),
        ("file:/data/wds/sub1/shard-00000.tar", "/data/wds"),
        ("file:/data/wds/sub2/shard-00000.tar", "/data/wds"),
        ("file:/data/wds/a/b/shard-00003.tar", "/data/wds"),
        # AUTHORITY-qualified URIs (cluster filesystems): the authority
        # must strip like the scheme or a plain-path root never
        # prefix-matches and nested same-name tars re-collide
        ("hdfs://nn:8020/data/wds/sub1/shard-00000.tar", "/data/wds"),
        ("hdfs://nn:8020/data/wds/sub2/shard-00000.tar", "/data/wds"),
        ("s3a://bucket/data/wds/sub1/shard-00000.tar",
         "s3a://bucket/data/wds"),
        # root not a prefix (glob root) -> basename/batch fallback
        ("file:/elsewhere/batch-000007/shard-00004.tar", "/data/*"),
        ("file:/elsewhere/plain/shard-00005.tar", "/data/*"),
    ]
    df = spark.createDataFrame(cases, "path string, root string")
    for fp, root in cases:
        got_col = (
            df.filter((F.col("path") == fp) & (F.col("root") == root))
            .select(_shard_key_col(F.col("path"), root).alias("k"))
            .first()["k"]
        )
        # _shard_key takes the DRIVER-normalized root (executor code
        # must never abspath a relative root against its own CWD)
        assert got_col == _shard_key(fp, _norm_root(root)), (fp, root, got_col)
    # the relative-path key keeps same-basename tars distinct,
    # including across authority-qualified reporting
    assert _shard_key("file:/d/sub1/s.tar", "/d") == "sub1/s.tar"
    assert _shard_key("file:/d/sub2/s.tar", "/d") == "sub2/s.tar"
    assert _shard_key("hdfs://nn:8020/d/sub1/s.tar", "/d") == "sub1/s.tar"


def test_shard_manifest_zero_member_and_nested_collisions(spark, tmp_path):
    """A zero-member tar still rows in the manifest (n_samples =
    n_members = 0, bytes counted) via the left join from sizes, and
    same-named tars in distinct subdirectories stay distinct rows."""
    import tarfile as _tarfile

    from lours_spark.io.webdataset import (
        dataset_to_webdataset,
        shard_manifest,
    )

    out = tmp_path / "wds"
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    # same shard basenames under two sibling subdirectories
    dataset_to_webdataset(docs, str(out / "part-a"), {"txt": "text"},
                          num_shards=2)
    dataset_to_webdataset(docs, str(out / "part-b"), {"txt": "text"},
                          num_shards=2)
    # plus an empty (zero-member) tar
    with _tarfile.open(out / "empty.tar", "w"):
        pass

    rows = {r["shard"]: r for r in shard_manifest(spark, str(out)).collect()}
    assert len(rows) == 5, sorted(rows)  # 2 + 2 + empty, no merges
    assert rows["empty.tar"]["n_samples"] == 0
    assert rows["empty.tar"]["n_members"] == 0
    assert rows["empty.tar"]["bytes"] > 0  # tar EOF blocks
    for sub in ("part-a", "part-b"):
        got = sum(
            r["n_samples"] for k, r in rows.items() if k.startswith(sub + "/")
        )
        assert got == 10, (sub, got)


def test_shard_sizes_plan_reads_no_content(spark, tmp_path):
    """The manifest's sizes leg must stay a METADATA-only binaryFile
    scan — a refactor that starts reading tar content there doubles
    every manifest's I/O. Pin the plan: the sizes scan's ReadSchema
    carries path+length only, and in the full manifest plan exactly
    one of the two binaryFile scans reads content (the members leg)."""
    from lours_spark.io.webdataset import (
        _shard_sizes,
        dataset_to_webdataset,
        shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    out = str(tmp_path / "wds")
    dataset_to_webdataset(docs, out, {"txt": "text"}, num_shards=2)

    sizes_plan = _shard_sizes(spark, out)._jdf.queryExecution().toString()
    size_schemas = [
        line.split("ReadSchema:")[1]
        for line in sizes_plan.splitlines()
        if "ReadSchema:" in line
    ]
    assert size_schemas, sizes_plan
    assert all("content" not in s for s in size_schemas), size_schemas

    full_plan = (
        shard_manifest(spark, out)._jdf.queryExecution().toString()
    )
    schemas = [
        line.split("ReadSchema:")[1]
        for line in full_plan.splitlines()
        if "ReadSchema:" in line
    ]
    assert sum("content" in s for s in schemas) == 1, schemas
