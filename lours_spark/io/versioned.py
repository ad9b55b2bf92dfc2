"""Versioned plain-parquet tables — the pointer-file publish pattern.

Plain parquet has no manifest, so every maintenance rewrite in this
engine (``compact_parquet``, curated-corpus refreshes, the streaming
table-maintenance loop) must write to a NEW directory and swap
readers when ready — compacting in place races live scans
(``io/compact.py`` refuses it by construction). This module makes the
swap a first-class, crash-safe primitive instead of caller folklore:

    table_root/
      CURRENT              <- tiny JSON pointer {"version": 7, ...}
      versions/v000006/    <- parquet data (old, prunable)
      versions/v000007/    <- parquet data (live)

The visibility rule that makes this safe WITHOUT a transaction log:
**a version directory is invisible until CURRENT names it**. Readers
never list ``versions/`` — they read CURRENT (one tiny file) and load
exactly that directory. Hence:

- a writer crash mid-write leaves an orphan directory no reader will
  ever touch (collected by :func:`prune_versions`);
- the publish step is ONE atomic pointer replace (`os.replace` on
  POSIX/NFS; on object stores a single small PUT, which is atomic
  per-object on S3/GCS — the pattern needs no directory rename, the
  operation object stores cannot do atomically);
- rollback is re-pointing CURRENT at an older retained version;
- concurrent readers mid-scan on version N keep working after CURRENT
  moves to N+1, because pruning retains a window (``keep_last``) —
  the same reader/retention contract Iceberg/Delta expose, scaled
  down to the no-dependency case.

Single-writer discipline is assumed (one maintenance job per table),
matching the rest of the maintenance layer; CURRENT carries the
writer's claimed previous version so a lost-update between two
concurrent publishers is at least detectable post-hoc in the history.

Spark-first: data moves only through ordinary ``df.write.parquet`` /
``spark.read.parquet`` on the version directory — partition layout,
predicate pushdown, and footer-stats skipping all behave exactly as
for any parquet path; the pointer layer is driver-side metadata only
(a few hundred bytes per publish). The pointer I/O here uses the
driver's local filesystem API (``open``/``os.replace``) — correct
for local disk, NFS, and fuse/NFS-mounted DFS; an object-store
deployment swaps those two calls for a ``pyarrow.fs`` single-object
PUT (atomic per-object on S3/GCS), with the directory layout and
visibility rule unchanged.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession

_VDIR_RE = re.compile(r"^v(\d{6,})$")


def _versions_dir(table_root: str) -> str:
    return os.path.join(table_root, "versions")


def _pointer_path(table_root: str) -> str:
    return os.path.join(table_root, "CURRENT")


def version_path(table_root: str, version: int) -> str:
    """The data directory for ``version`` (exists only once written)."""
    return os.path.join(_versions_dir(table_root), f"v{version:06d}")


def list_versions(table_root: str) -> "list[int]":
    """All version numbers with a directory on disk, ascending —
    including orphans never published (crashed writers) and old
    versions not yet pruned."""
    vdir = _versions_dir(table_root)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in os.listdir(vdir):
        m = _VDIR_RE.match(name)
        if m and os.path.isdir(os.path.join(vdir, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def read_pointer(table_root: str) -> "dict | None":
    """The CURRENT pointer document, or None for a never-published
    table. Keys: ``version`` (int), ``previous`` (int | None),
    ``published_at_unix`` (float), plus any ``extra`` the publisher
    attached (row counts, compaction stats, lineage)."""
    try:
        with open(_pointer_path(table_root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def current_version(table_root: str) -> "int | None":
    """The published version number, or None if never published."""
    ptr = read_pointer(table_root)
    return None if ptr is None else int(ptr["version"])


def start_version(table_root: str) -> "tuple[int, str]":
    """Allocate the next version number and return ``(version, path)``
    for the writer to fill (e.g. as ``compact_parquet``'s ``dst`` or
    any ``df.write.parquet`` target). The directory is NOT created
    here — Spark's writer creates it — and it stays invisible to
    readers until :func:`commit_version` points CURRENT at it, so a
    crash between start and commit leaves only an orphan directory
    (reclaimed by :func:`prune_versions`).

    Numbering is max(existing dirs, CURRENT) + 1: orphans from crashed
    writers still consume their number, so a retry never writes into a
    half-written directory.
    """
    on_disk = list_versions(table_root)
    cur = current_version(table_root)
    last = max(
        on_disk[-1] if on_disk else -1,
        cur if cur is not None else -1,
    )
    v = last + 1
    return v, version_path(table_root, v)


def commit_version(
    table_root: str, version: int, extra: "dict | None" = None
) -> dict:
    """Atomically publish ``version``: write the new pointer document
    to a scratch name and ``os.replace`` it over CURRENT (atomic on
    POSIX — a reader sees the whole old pointer or the whole new one,
    never a torn write). The version directory must already contain
    the finished data. Returns the pointer document written.

    ``extra`` rides along in the pointer (row counts, source lineage,
    compaction stats) so operational tooling can alarm on a publish
    without opening the data.

    Data completeness is the CALLER's contract: commit only after the
    write returned successfully (an orchestrator that crashed mid-write
    and blindly re-commits its old allocation would publish a partial
    directory — on retry, go through :func:`start_version` again; for
    Spark writers the ``_SUCCESS`` marker in the version directory is
    the audit trail).
    """
    vpath = version_path(table_root, version)
    if not os.path.isdir(vpath):
        raise ValueError(
            f"version {version} has no data directory at {vpath!r} — "
            "write it first (start_version gives the path)"
        )
    ptr = {
        "version": int(version),
        "previous": current_version(table_root),
        "published_at_unix": time.time(),
    }
    if extra:
        ptr["extra"] = extra
    os.makedirs(table_root, exist_ok=True)
    tmp = _pointer_path(table_root) + f".tmp-{os.getpid()}"
    # sweep scratch pointers left by CRASHED publishers (died between
    # the tmp write and the replace) — single-writer discipline means
    # no other live publisher owns one, and without the sweep they
    # accumulate forever
    for name in os.listdir(table_root):
        p = os.path.join(table_root, name)
        if name.startswith("CURRENT.tmp-") and p != tmp:
            try:
                os.remove(p)
            except OSError:
                pass
    try:
        with open(tmp, "w") as f:
            json.dump(ptr, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _pointer_path(table_root))
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    # make the RENAME itself durable (fsync the directory entry)
    # before returning: publish_dataframe may prune the previous
    # version right after this call, and a power loss that rolled the
    # un-fsynced rename back would leave CURRENT naming a deleted
    # directory with no rollback target
    _fsync_dir(table_root)
    # append-only audit log AFTER the flip: CURRENT is authoritative,
    # the log is observability — a crash between replace and append
    # costs one history entry, never correctness (history() tolerates
    # a torn tail line too)
    with open(os.path.join(table_root, "LOG.jsonl"), "a") as f:
        f.write(json.dumps(ptr) + "\n")
    return ptr


def _fsync_dir(path: str) -> None:
    """fsync a DIRECTORY so a just-completed rename in it survives
    power loss (file-level fsync makes the content durable, not the
    directory entry). Best-effort: platforms/filesystems that refuse
    directory fds just skip."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def rollback(table_root: str, to_version: int) -> dict:
    """Re-point CURRENT at a RETAINED older version (bad publish
    escape hatch). Same atomic pointer replace as a publish; fails
    loud if the target was already pruned."""
    return commit_version(
        table_root, to_version, extra={"rollback": True}
    )


def read_current(spark: SparkSession, table_root: str) -> DataFrame:
    """Load the published version as a plain parquet read — partition
    pruning / pushdown / schema behave exactly as for a direct path.
    The pointer read is one tiny driver-side file; the snapshot is
    stable for the whole query even if a new version publishes
    mid-scan (the plan holds the resolved ``versions/v*`` path, and
    retention keeps it on disk)."""
    cur = current_version(table_root)
    if cur is None:
        raise FileNotFoundError(
            f"no published version under {table_root!r} (missing CURRENT)"
        )
    return spark.read.parquet(version_path(table_root, cur))


def prune_versions(table_root: str, keep_last: int = 2) -> "list[int]":
    """Delete version directories outside the retention window and
    return the pruned version numbers. Retained: the CURRENT version,
    every directory NEWER than it (a crashed/in-flight writer's
    allocation is never yanked out from under a live retry), and the
    newest ``keep_last - 1`` directories BELOW it (the rollback
    window — ``keep_last`` counts current plus rollback targets, so
    ``keep_last >= 2`` always leaves somewhere to roll back to, and
    in-flight readers on the previous version keep their files).
    Orphans older than CURRENT are dead by the visibility rule and
    prune like any other old version.

    >>> # doctest setup: 3 published versions, keep_last=2
    >>> import shutil, tempfile
    >>> root = tempfile.mkdtemp()
    >>> for _ in range(3):
    ...     v, p = start_version(root)
    ...     spark.range(5).write.parquet(p)
    ...     _ = commit_version(root, v)
    >>> prune_versions(root, keep_last=2)
    [0]
    >>> (list_versions(root), current_version(root))
    ([1, 2], 2)
    >>> _ = shutil.rmtree(root)
    """
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    cur = current_version(table_root)
    on_disk = list_versions(table_root)
    if cur is None:
        # never published: every directory is an in-flight or crashed
        # writer's — keep the newest allocations only
        keep = set(on_disk[-keep_last:])
    else:
        keep = {v for v in on_disk if v >= cur}
        below = [v for v in on_disk if v < cur]
        if keep_last > 1:
            keep.update(below[-(keep_last - 1):])
    pruned = []
    for v in on_disk:
        if v not in keep:
            shutil.rmtree(version_path(table_root, v))
            pruned.append(v)
    return pruned


def publish_dataframe(
    df: DataFrame,
    table_root: str,
    partition_by: "list[str] | None" = None,
    extra: "dict | None" = None,
    keep_last: "int | None" = None,
) -> dict:
    """One-call convenience: write ``df`` as the next version, commit
    the pointer, optionally prune. Equivalent to
    ``start_version`` → ``df.write.parquet(path)`` →
    ``commit_version`` (→ ``prune_versions``), which remains the
    composable form for writers that aren't a single DataFrame (e.g.
    ``compact_parquet`` with ``dst=path``).

    >>> import shutil, tempfile
    >>> root = tempfile.mkdtemp()
    >>> ptr = publish_dataframe(spark.range(10), root)
    >>> (ptr["version"], read_current(spark, root).count())
    (0, 10)
    >>> ptr = publish_dataframe(spark.range(20), root)
    >>> (ptr["version"], ptr["previous"], read_current(spark, root).count())
    (1, 0, 20)
    >>> _ = shutil.rmtree(root)
    """
    v, path = start_version(table_root)
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    ptr = commit_version(table_root, v, extra=extra)
    if keep_last is not None:
        ptr["pruned"] = prune_versions(table_root, keep_last=keep_last)
    return ptr


def version_delta(
    spark: SparkSession,
    table_root: str,
    v_old: int,
    v_new: int,
    group_by: "list[str] | None" = None,
    key: "str | None" = None,
) -> DataFrame:
    """What changed between two retained versions — the audit query a
    maintenance loop runs after every publish (and the evidence for a
    rollback decision). Two cost tiers, chosen by the arguments:

    - **group summary** (default, ``group_by`` optional): ONE
      aggregation per side — per-group row count and an
      order-insensitive value fingerprint (bit-XOR of ``xxhash64``
      over all common columns) — then an outer join of the two
      GROUP-sized results. Cost is two scans + two group-sized
      exchanges, never a row-level join: at 100 TB with
      ``group_by=["lang"]`` the join input is a few hundred rows.
      Output: one row per group with ``n_old``/``n_new``/``status``
      (``added``/``removed``/``changed``/``unchanged``). With no
      ``group_by`` the whole table is one group (a single-row
      changed/unchanged verdict).
    - **key-level diff** (``key=``): full outer join of the two
      snapshots on the key column comparing row fingerprints — one
      row-level shuffle per side, the honest cost of naming WHICH
      rows changed. Output: one row per differing key with ``status``
      ``added``/``removed``/``changed`` (unchanged keys are filtered
      out before the result leaves the join).

    Only columns PRESENT IN BOTH versions are fingerprinted (schema
    evolution adds columns; comparing on the intersection keeps the
    delta meaningful across it), and the fingerprint folds column
    NAMES and an explicit NULL flag in, so a value moving between
    columns — even across a NULL — still reads as a change. Group and
    key matching is NULL-SAFE (a NULL group/key is a real value that
    lines up across versions, like GROUP BY semantics — in the key
    tier all NULL keys therefore count as ONE key). The group
    fingerprint is a SUM of row hashes — multiplicity-sensitive where
    a XOR would cancel even-count duplicate rows.

    >>> import shutil, tempfile
    >>> from pyspark.sql import functions as F
    >>> root = tempfile.mkdtemp()
    >>> base = spark.range(6).withColumn(
    ...     "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de"))
    >>> _ = publish_dataframe(base, root)
    >>> _ = publish_dataframe(base.filter("id != 4").unionByName(
    ...     spark.range(10, 12).withColumn("lang", F.lit("fr"))), root)
    >>> d = version_delta(spark, root, 0, 1, group_by=["lang"])
    >>> sorted((r["lang"], r["status"]) for r in d.collect())
    [('de', 'unchanged'), ('en', 'changed'), ('fr', 'added')]
    >>> k = version_delta(spark, root, 0, 1, key="id")
    >>> sorted((r["id"], r["status"]) for r in k.collect())
    [(4, 'removed'), (10, 'added'), (11, 'added')]
    >>> _ = shutil.rmtree(root)
    """
    from pyspark.sql import functions as F

    if key is not None and group_by:
        raise ValueError("pass group_by OR key, not both")
    old = spark.read.parquet(version_path(table_root, v_old))
    new = spark.read.parquet(version_path(table_root, v_new))
    common = [c for c in old.columns if c in set(new.columns)]
    if not common:
        raise ValueError(
            f"versions {v_old} and {v_new} share no columns"
        )

    def fingerprint(cols: "list[str]"):
        # fold the column NAME and an explicit NULL flag with every
        # value: xxhash64 SKIPS null children entirely, so without
        # the flag {a:'b', b:NULL} and {a:NULL, b:'b'} hash the same
        # byte sequence (the name literals line up identically); the
        # flag pins each value to its slot
        parts = []
        for c in sorted(cols):
            col = F.col(f"`{c}`")
            parts += [F.lit(c), F.isnull(col).cast("int"), col]
        return F.xxhash64(*parts)

    if key is not None:
        if key not in common:
            raise ValueError(f"key column {key!r} not in both versions")
        val_cols = [c for c in common if c != key]
        sides = []
        for side, df in (("old", old), ("new", new)):
            sides.append(
                df.select(
                    F.col(f"`{key}`").alias(key),
                    fingerprint(val_cols or [key]).alias(f"__h_{side}"),
                ).alias(side)
            )
        # NULL-SAFE key equality: plain USING-join equality never
        # matches NULL keys, which would report an unchanged NULL-key
        # row as added AND removed on every audit (all NULL keys
        # compare equal here, like eqNullSafe/GROUP BY semantics)
        joined = sides[0].join(
            sides[1],
            F.col(f"old.`{key}`").eqNullSafe(F.col(f"new.`{key}`")),
            "full_outer",
        )
        return joined.select(
            F.coalesce(
                F.col(f"old.`{key}`"), F.col(f"new.`{key}`")
            ).alias(key),
            F.when(F.col("__h_old").isNull(), F.lit("added"))
            .when(F.col("__h_new").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        ).where(
            F.col("__h_old").isNull()
            | F.col("__h_new").isNull()
            | (F.col("__h_old") != F.col("__h_new"))
        )

    gcols = [c for c in (group_by or []) if c in common]
    if group_by and gcols != list(group_by):
        missing = [c for c in group_by if c not in common]
        raise ValueError(f"group_by columns not in both versions: {missing}")

    def summarize(df, side: str):
        aggs = [
            F.count(F.lit(1)).alias(f"n_{side}"),
            # SUM of row hashes (exact decimal — a long sum could
            # overflow), NOT bit_xor: XOR cancels rows with even
            # multiplicity, so a duplicate-heavy table could change
            # completely while the audit reads unchanged
            F.sum(
                fingerprint(common).cast("decimal(38,0)")
            ).alias(f"__h_{side}"),
        ]
        return df.groupBy(*gcols).agg(*aggs) if gcols else df.agg(*aggs)

    o = summarize(old, "old").alias("old")
    n = summarize(new, "new").alias("new")
    if gcols:
        # NULL-SAFE group equality (see the key tier note): a NULL
        # group is a real group and must line up across versions
        cond = None
        for c in gcols:
            e = F.col(f"old.`{c}`").eqNullSafe(F.col(f"new.`{c}`"))
            cond = e if cond is None else (cond & e)
        joined = o.join(n, cond, "full_outer")
        gout = [
            F.coalesce(F.col(f"old.`{c}`"), F.col(f"new.`{c}`")).alias(c)
            for c in gcols
        ]
    else:
        # the crossJoin is two SINGLE-ROW global aggregates —
        # literal-sized, never a row-level product
        joined = o.crossJoin(n)
        gout = []
    return joined.select(
        *gout,
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .when(
            (F.col("n_old") == F.col("n_new"))
            & (
                F.col("__h_old").eqNullSafe(F.col("__h_new"))
            ),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def read_version(
    spark: SparkSession, table_root: str, version: int
) -> DataFrame:
    """Time-travel read of a RETAINED version (debugging a delta,
    reproducing a run pinned to an old snapshot). Fails loud if the
    version was pruned or never written — retention (`keep_last`) is
    what makes a pinned version stable; pin + prune aggressively is a
    caller contradiction."""
    p = version_path(table_root, version)
    if not os.path.isdir(p):
        raise FileNotFoundError(
            f"version {version} not on disk under {table_root!r} "
            "(pruned, or never written)"
        )
    return spark.read.parquet(p)


def history(table_root: str) -> "list[dict]":
    """The publish log, oldest first: every pointer document ever
    committed (publishes AND rollbacks), read from the append-only
    ``LOG.jsonl`` that :func:`commit_version` maintains beside
    CURRENT. Tolerant of a torn final line (a crash mid-append loses
    at most that line — CURRENT, written first, stays authoritative).
    Tables published before the log existed return just the entries
    since."""
    out = []
    try:
        with open(os.path.join(table_root, "LOG.jsonl")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except ValueError:
                    continue  # torn tail from a crashed append
    except FileNotFoundError:
        pass
    return out
