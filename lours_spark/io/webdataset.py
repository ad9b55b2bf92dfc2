"""WebDataset tar-shard I/O — the de-facto sequential-read format for
large-scale (multimodal) training data: samples live as files inside
numbered ``.tar`` shards (``<key>.<ext>`` members; all members sharing
a key form one sample), trainers stream shards sequentially and
shuffle by shard. The reference library has no sharded-training sink
(its exports are per-format directory trees, e.g.
``lours/dataset/io/caipy.py``); this is part of the beyond-reference
training-data layer.

Spark shape:

- **write**: deterministic seeded shard assignment (md5 of the key —
  reproducible across runs/retries/partitionings, like
  ``operators/ordering.global_shuffle``), ONE hash exchange on the
  shard id (``applyInPandas`` per shard), each task streams its
  samples into ``shard-%05d.tar`` in seeded-hash order with zeroed
  tar metadata — so a re-run produces BYTE-IDENTICAL shards (tested).
  Shard count bounds task memory: nothing holds more than one
  sample's bytes at a time beyond the tar buffer.
- **read**: ``binaryFile`` scan of ``*.tar`` (splittable per shard —
  one task per shard, the format's intended parallelism) +
  ``mapInPandas`` untar → long rows ``(shard, key, ext, data)``;
  ``from_webdataset`` pivots the requested extensions back to one row
  per sample via ``groupBy(key).pivot(ext)`` bounded by the explicit
  extension list.
"""

from __future__ import annotations

import io
import os
import re
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lours_spark.functions.text import md5_long


def dataset_to_webdataset(
    df: DataFrame,
    out_dir: str,
    columns: dict[str, str],
    key_col: str = "doc_id",
    num_shards: int = 8,
    seed: int = 42,
    staging: "bool | None" = None,
    _fault_inject: "str | None" = None,
) -> None:
    """Write one tar shard per seeded hash bucket. ``columns`` maps
    member EXTENSION → source column (string or binary), e.g.
    ``{"txt": "text", "cls": "label"}``: each row becomes the members
    ``<key>.<ext>`` for every mapped column (NULL values are skipped,
    matching WebDataset's optional-member convention).

    Determinism contract: same data + seed + shard count → the same
    key→shard map, the same within-shard order (seeded hash, key
    tie-break) and zeroed tar timestamps/uids — byte-identical shards
    on re-run, so downstream caches and resume logic can trust shard
    content hashes. Pre-existing ``shard-*.tar`` in ``out_dir`` are
    removed first, so a rewrite with fewer shards can't leave stale
    shards for the reader to blend in.

    NULL keys are rejected loudly (a member would be named
    ``None.<ext>`` and the shard map undefined) — filter them upstream.
    Keys containing ``.`` are rejected too: the WebDataset convention
    splits member basenames at the FIRST dot, so a dotted key could
    not round-trip (dotted EXTENSIONS like ``json.gz`` are fine). Both
    checks run as one narrow scan BEFORE the stale-shard cleanup, so a
    bad key never destroys the previous dataset; duplicate keys are
    rejected during the write (equal keys sort adjacent in one shard).

    Two publish modes, same idempotence recipe either way (write the
    whole shard somewhere private, then one rename/move to the final
    name; retries republish byte-identical content):

    - **direct** (``staging=False``, the default for plain paths):
      ``out_dir`` is a filesystem every executor AND the driver see at
      the same path (local disk on local[*], NFS/FUSE on a cluster);
      shards stream straight into ``<out_dir>/shard-NNNNN.tar.<attempt>
      .tmp`` and publish with an atomic ``os.replace``.
    - **staging** (``staging=True``, auto-selected when ``out_dir``
      carries a URI scheme): tar append has no Hadoop-output-committer
      equivalent, so each shard is first written to EXECUTOR-LOCAL tmp
      disk, then uploaded through ``pyarrow.fs`` (scheme-dispatched:
      file://, s3://, hdfs://) to ``shard-NNNNN.tar.<attempt>.tmp`` and
      moved to its final name. A task that dies mid-write or mid-upload
      never publishes a partial shard — only the move creates the final
      name (on object stores the move is a server-side copy: not
      atomic, but retries overwrite with identical bytes, so
      last-publisher-wins holds). The driver's stale cleanup runs
      through the same pyarrow filesystem.

    ``_fault_inject`` is a test-only hook: ``"before_publish"`` raises
    in every task after the upload but before the final move,
    simulating a crash at the worst moment (nothing must be published).
    """
    import fnmatch
    import glob

    import pandas as pd

    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1: {num_shards}")
    if staging is None:
        staging = "://" in out_dir
    # validate keys BEFORE the destructive stale-shard cleanup below: a
    # bad key surfacing mid-job (the per-row executor checks are the
    # backstop) must not leave the caller with the old dataset deleted
    # and the new one half-published. One narrow scan, pushdown-friendly.
    bad = (
        df.filter(
            F.col(key_col).isNull()
            | F.col(key_col).cast("string").contains(".")
        )
        .select(key_col)
        .first()
    )
    if bad is not None:
        raise ValueError(
            "NULL key or dotted key in webdataset input — keys must be "
            "non-NULL and must not contain '.' (the format splits "
            f"member basenames at the FIRST dot): found {bad[0]!r}; "
            "nothing was written or deleted"
        )
    if staging:
        # same cleanup, through the scheme-dispatched filesystem (an
        # os.* call would silently no-op against s3://…)
        from pyarrow import fs as pafs

        fs_o, base = pafs.FileSystem.from_uri(out_dir)
        fs_o.create_dir(base, recursive=True)
        sel = pafs.FileSelector(base, recursive=False)
        for info in fs_o.get_file_info(sel):
            if fnmatch.fnmatch(info.base_name, "shard-*.tar") or fnmatch.fnmatch(
                info.base_name, "shard-*.tar.*.tmp"
            ):
                fs_o.delete_file(info.path)
    else:
        os.makedirs(out_dir, exist_ok=True)
        # include orphaned tmp files from dead task attempts (their
        # retry publishes under a new attempt id, so the old .tmp
        # stays forever)
        for stale in glob.glob(
            os.path.join(out_dir, "shard-*.tar")
        ) + glob.glob(os.path.join(out_dir, "shard-*.tar.*.tmp")):
            os.remove(stale)
    exts = sorted(columns)
    # POSITIONAL member-column aliases (__c_0, __c_1, …): extension
    # strings go straight into tar member names but make unusable Spark
    # column names (dots break column resolution, digits-first breaks
    # itertuples-style attribute access downstream)
    src = df.select(
        F.col(key_col).cast("string").alias("__key"),
        (md5_long(F.col(key_col).cast("string"), seed) % num_shards).alias(
            "__shard"
        ),
        md5_long(F.col(key_col).cast("string"), seed).alias("__pos"),
        *[F.col(columns[e]).alias(f"__c_{i}") for i, e in enumerate(exts)],
    )
    # hash-partition ON the shard id, sort within the partition: each
    # task streams its shards row-group by row-group (mapInPandas is an
    # ITERATOR — memory is one Arrow batch + the tar buffer, never a
    # whole shard), switching tar files when the shard id changes (a
    # partition can own several shard ids; a shard never spans two)
    src = src.repartition(num_shards, "__shard").sortWithinPartitions(
        "__shard", "__pos", "__key"
    )

    def write_partition(batches) -> "pd.DataFrame":
        from pyspark import TaskContext

        attempt = TaskContext.get().taskAttemptId()
        if not staging:
            yield from _write_rows(batches, attempt, None)
            return
        import shutil
        import tempfile

        # executor-local stage dir, removed however the task ends: on
        # success only an empty dir would remain, but a failed task
        # would strand a complete shard's bytes in /tmp — and a
        # long-lived executor runs MANY tasks
        stage_dir = tempfile.mkdtemp(prefix="wds-stage-")
        try:
            yield from _write_rows(batches, attempt, stage_dir)
        finally:
            shutil.rmtree(stage_dir, ignore_errors=True)

    def _write_rows(batches, attempt, stage_dir):
        state = {"shard": None, "tar": None, "tmp": None, "n": 0,
                 "prev_key": None}
        done: list[tuple[int, int]] = []

        def close_current():
            if state["tar"] is None:
                return
            state["tar"].close()
            if staging:
                # upload the complete local shard to a remote tmp name,
                # then one move to publish — a death anywhere before
                # the move leaves no final-name file behind
                import shutil

                from pyarrow import fs as pafs

                fs_o, base = pafs.FileSystem.from_uri(out_dir)
                remote_tmp = (
                    f"{base}/shard-{state['shard']:05d}.tar.{attempt}.tmp"
                )
                final = f"{base}/shard-{state['shard']:05d}.tar"
                with open(state["tmp"], "rb") as src, fs_o.open_output_stream(
                    remote_tmp, compression=None
                ) as dst:
                    shutil.copyfileobj(src, dst, 8 << 20)
                if _fault_inject == "before_publish":
                    raise RuntimeError(
                        "injected fault: died between upload and publish"
                    )
                # HDFS rename does NOT clobber an existing destination
                # (unlike os.replace and S3's copy-overwrite), so a
                # retry republishing an already-published shard would
                # fail forever — clear the final name first. The tiny
                # delete→move window is covered by the determinism
                # contract: any concurrent publisher writes identical
                # bytes, so last-publisher-wins stays correct.
                if (
                    fs_o.get_file_info(final).type
                    != pafs.FileType.NotFound
                ):
                    fs_o.delete_file(final)
                fs_o.move(remote_tmp, final)
                os.remove(state["tmp"])
            else:
                final = os.path.join(
                    out_dir, f"shard-{state['shard']:05d}.tar"
                )
                os.replace(state["tmp"], final)
            done.append((state["shard"], state["n"]))
            state.update(shard=None, tar=None, tmp=None, n=0)

        for pdf in batches:
            if pdf["__key"].isna().any() or pdf["__shard"].isna().any():
                raise ValueError(
                    "NULL key values in webdataset input — filter "
                    "them upstream"
                )
            # positional column lists, NOT itertuples attribute access:
            # pandas positionally renames itertuples fields whose names
            # are not valid identifiers, so an extension like "json.gz"
            # or "1txt" would silently break getattr lookup mid-write
            keys = pdf["__key"].tolist()
            shards = pdf["__shard"].tolist()
            colvals = {
                e: pdf[f"__c_{i}"].tolist() for i, e in enumerate(exts)
            }
            for i in range(len(keys)):
                key = keys[i]
                if "." in key:
                    raise ValueError(
                        "webdataset keys must not contain '.' (the "
                        "format splits member basenames at the FIRST "
                        f"dot, so the key would not round-trip): {key!r}"
                    )
                # duplicate keys collide in member names, break the
                # byte-identical determinism contract (equal sort keys
                # have no order) and make the reader's pivot pick
                # arbitrarily — equal keys hash to one shard and sort
                # adjacent, so one carried comparison catches them all
                if key == state["prev_key"]:
                    raise ValueError(
                        f"duplicate webdataset key {key!r} — keys must "
                        "be unique (dedup upstream)"
                    )
                state["prev_key"] = key
                shard = int(shards[i])
                if shard != state["shard"]:
                    close_current()
                    # per-attempt tmp name: retries/speculative tasks
                    # never interleave into one file; os.replace keeps
                    # last-publisher-wins atomicity
                    state["shard"] = shard
                    state["tmp"] = os.path.join(
                        stage_dir if staging else out_dir,
                        f"shard-{shard:05d}.tar.{attempt}.tmp",
                    )
                    state["tar"] = tarfile.open(state["tmp"], "w")
                for e in exts:
                    v = colvals[e][i]
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    data = (
                        v
                        if isinstance(v, (bytes, bytearray))
                        else str(v).encode("utf-8")
                    )
                    ti = tarfile.TarInfo(name=f"{key}.{e}")
                    ti.size = len(data)
                    ti.mtime = 0  # zeroed metadata → byte-stable shards
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    state["tar"].addfile(ti, io.BytesIO(bytes(data)))
                state["n"] += 1
        close_current()
        yield pd.DataFrame(done, columns=["shard", "n_samples"])

    src.mapInPandas(
        write_partition, "shard long, n_samples long"
    ).collect()


def write_webdataset_stream(
    stream: DataFrame,
    out_dir: str,
    columns: dict[str, str],
    checkpoint_dir: str,
    key_col: str = "doc_id",
    shards_per_batch: int = 2,
    seed: int = 42,
    query_name: str = "webdataset_sink",
    available_now: bool = True,
):
    """Streaming twin of :func:`dataset_to_webdataset`: each
    micro-batch lands as its own ``batch-%06d/`` shard directory via
    ``foreachBatch``. Exactly-once WITHOUT a transaction log: the
    write is deterministic (seeded shard map + order + zeroed tar
    metadata) AND the batch directory is derived from the replay-
    stable ``batch_id``, so a recovery replay rewrites the same dir
    with byte-identical content — idempotence does the work the
    checkpoint alone can't. Readers glob ``<out>/batch-*/shard-*.tar``
    (``read_webdataset_members`` accepts the parent dir).

    ``available_now`` (default True) drains the CURRENT backlog and
    terminates — the batch-job invocation; pass False for a
    continuously-running sink over a live drop directory.

    Returns the started ``StreamingQuery`` (caller awaits/stops)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        dataset_to_webdataset(
            batch_df,
            os.path.join(out_dir, f"batch-{batch_id:06d}"),
            columns,
            key_col=key_col,
            num_shards=shards_per_batch,
            seed=seed,
        )

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: URI scheme + optional authority ("file:", "file://",
#: "hdfs://nn:8020", "s3a://bucket", ...) — stripped so the shard key
#: derivation is scheme- and authority-insensitive (Spark's binaryFile
#: reports fully-qualified URIs while callers pass plain paths; both
#: legs strip the same prefix, which is all the relative-path
#: derivation needs — one scan root always lives on one filesystem)
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:(//[^/]*)?")


def _norm_uri_path(p: str) -> str:
    """'file:/a/b', 'file:///a/b', 'hdfs://nn:8020/a/b' and '/a/b'
    all normalize to '/a/b'. Consistency between the two legs is all
    the prefix strip below needs."""
    m = _SCHEME_RE.match(p)
    if m:
        p = "/" + p[m.end():].lstrip("/")
    return p


def _norm_root(root: str) -> str:
    """The scan root in the same normalized form as the file paths.
    DRIVER-ONLY: scheme-less roots are made absolute against the
    driver's CWD (Spark qualifies them the same way before listing) —
    executor code must receive the already-normalized string, never
    call this (executor CWD is the worker scratch dir)."""
    r = root if _SCHEME_RE.match(root) else os.path.abspath(root)
    return _norm_uri_path(r).rstrip("/")


def _shard_key(file_path: str, norm_root: str) -> str:
    """Shard key = the tar's path RELATIVE to the scan root. A bare
    basename collides for same-named tars in distinct subdirectories
    (two ``sub*/shard-00000.tar`` would merge in any groupBy on the
    shard column); the relative path is unique by construction.
    Fallback when the root isn't a path prefix (glob roots, a direct
    file path): basename, qualified by a ``batch-*`` parent — the
    streaming sink's layout. ``norm_root`` must come from
    :func:`_norm_root` ON THE DRIVER (this function runs inside
    executor tasks, where a relative root would resolve against the
    wrong CWD). Keep in sync with :func:`_shard_key_col` (equivalence
    is pinned by tests/test_webdataset.py)."""
    f = _norm_uri_path(file_path.rstrip("/"))
    if f.startswith(norm_root + "/"):
        return f[len(norm_root) + 1 :]
    base = os.path.basename(f)
    parent = os.path.basename(os.path.dirname(f))
    if re.fullmatch(r"batch-\d+", parent):
        return f"{parent}/{base}"
    return base


def _shard_key_col(path_col, root: str):
    """JVM Column twin of :func:`_shard_key` (same derivation, no
    Python worker) for metadata-only legs like the manifest's size
    scan."""
    r = _norm_root(root)
    # two steps mirror _norm_uri_path exactly: strip the scheme, then
    # collapse the leading slash run ('file:///a' leaves '//a' after
    # the scheme replace; Python's lstrip('/') removes them all)
    norm = F.regexp_replace(
        F.regexp_replace(path_col, _SCHEME_RE.pattern, "/"), "^/+", "/"
    )
    base = F.element_at(F.split(norm, "/"), -1)
    parent = F.element_at(F.split(norm, "/"), -2)
    fallback = F.when(
        parent.rlike(r"^batch-\d+$"), F.concat_ws("/", parent, base)
    ).otherwise(base)
    return F.when(
        norm.startswith(r + "/"),
        F.substring(norm, len(r) + 2, 2**24),
    ).otherwise(fallback)


def read_webdataset_members(spark: SparkSession, path: str) -> DataFrame:
    """Long form: one row per tar member — ``(shard, key, ext, data)``.
    One task per shard via ``binaryFile`` (shards are the unit of
    parallelism, per the format's design). Recursive: finds shards in
    ``path`` itself AND in the streaming sink's ``batch-*/``
    subdirectories."""
    import pandas as pd

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )
    # resolved ON THE DRIVER: a relative scan root must anchor to the
    # driver's CWD (matching what Spark listed), not each executor's
    # worker scratch dir
    root_norm = _norm_root(path)

    def untar(batches) -> Iterator:
        for pdf in batches:
            for _, row in pdf.iterrows():
                out = {"shard": [], "key": [], "ext": [], "data": []}
                # one derivation per SHARD, not per member
                shard = _shard_key(row["path"], root_norm)
                with tarfile.open(
                    fileobj=io.BytesIO(row["content"])
                ) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        # WebDataset convention: key/extension split at
                        # the FIRST dot of the BASENAME (directories
                        # stay part of the key), so externally produced
                        # shards with dotted extensions ("x.seg.png")
                        # key as ("x", "seg.png") — not ("x.seg", "png")
                        d, _, base = m.name.rpartition("/")
                        kp, _, ext = base.partition(".")
                        key = f"{d}/{kp}" if d else kp
                        # shard key = path relative to the scan root:
                        # batch-000000/shard-00000.tar and
                        # batch-000001/shard-00000.tar are DISTINCT
                        # shards, as are same-named tars in any other
                        # subdirectory pair — a bare basename would
                        # merge them for any consumer grouping on this
                        # column. Plain layouts keep the bare name
                        # (their relative path IS the basename).
                        out["shard"].append(shard)
                        out["key"].append(key)
                        out["ext"].append(ext)
                        out["data"].append(tar.extractfile(m).read())
                yield pd.DataFrame(out)

    return raw.mapInPandas(
        untar, "shard string, key string, ext string, data binary"
    )


def from_webdataset(
    spark: SparkSession, path: str, exts: list[str]
) -> DataFrame:
    """Wide form: one row per SAMPLE with one binary column per
    requested extension (``key string, <ext> binary, ...``). The pivot
    is bounded by the explicit ``exts`` list — never a discovery scan."""
    long = read_webdataset_members(spark, path).filter(
        F.col("ext").isin(exts)
    )
    return (
        long.groupBy("key")
        .pivot("ext", exts)
        .agg(F.first("data"))
    )


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """One row per shard: ``(shard, n_samples, n_members, bytes)`` —
    the inventory a training loader's shard list is built from.

    Sample counts come from ONE distributed pass over the tar headers
    (the same per-shard ``binaryFile`` tasks as the reader); shard
    byte sizes ride the file-metadata column (the sizes scan never
    reads tar CONTENT — plan-pinned in tests/test_webdataset.py), so
    the join is shard-count sized. The join is a LEFT join FROM the
    sizes leg: a tar with zero members still inventories (n_samples =
    n_members = 0) instead of vanishing from the manifest and its
    byte total. Shard keys on both legs are the path relative to the
    scan root (:func:`_shard_key`), so same-named tars in distinct
    subdirectories stay distinct rows."""
    members = read_webdataset_members(spark, path).groupBy("shard").agg(
        F.countDistinct("key").alias("n_samples"),
        F.count(F.lit(1)).alias("n_members"),
    )
    sizes = _shard_sizes(spark, path)
    return (
        sizes.join(members, "shard", "left")
        .select(
            "shard",
            F.coalesce("n_samples", F.lit(0)).alias("n_samples"),
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
            "bytes",
        )
        .orderBy("shard")
    )


def _shard_sizes(spark: SparkSession, path: str) -> DataFrame:
    """``(shard, bytes)`` per tar under ``path`` from binaryFile
    METADATA only — the scan must stay pruned to (path, length); a
    content read here would double every manifest's I/O."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select(
            _shard_key_col(F.col("path"), path).alias("shard"),
            F.col("length").alias("bytes"),
        )
    )


def write_shard_manifest(
    spark: SparkSession, path: str, manifest_name: str = "shards.json"
) -> str:
    """Materialize :func:`shard_manifest` as ONE JSON file next to the
    shards (the WebDataset-loader convention: a small shard list the
    training job reads up front instead of listing the store). The
    manifest is shard-count sized — thousands of rows at most — so a
    driver-side write is the honest shape; returns the written path.
    (Local-FS ``path`` assumed for the write itself; on an object
    store, write the returned :func:`shard_manifest` frame through
    ``pyarrow.fs`` like the staging writer does.)

    >>> import json, os, tempfile
    >>> out = os.path.join(tempfile.mkdtemp(), "wds")
    >>> docs = spark.createDataFrame(
    ...     [(i, f"t{i}") for i in range(20)], "doc_id long, text string")
    >>> dataset_to_webdataset(docs, out, {"txt": "text"}, num_shards=2)
    >>> p = write_shard_manifest(spark, out)
    >>> m = json.load(open(p))
    >>> (len(m["shards"]), sum(s["n_samples"] for s in m["shards"]))
    (2, 20)
    """
    import json as _json

    rows = shard_manifest(spark, path).collect()
    doc = {
        "shards": [
            {
                "shard": r["shard"],
                "n_samples": int(r["n_samples"]),
                "n_members": int(r["n_members"]),
                "bytes": int(r["bytes"]),
            }
            for r in rows
        ],
        "total_samples": int(sum(r["n_samples"] for r in rows)),
        "total_bytes": int(sum(r["bytes"] for r in rows)),
    }
    dst = os.path.join(path, manifest_name)
    with open(dst, "w") as f:
        _json.dump(doc, f, indent=1)
        f.write("\n")
    return dst
