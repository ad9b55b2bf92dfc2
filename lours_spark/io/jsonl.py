"""JSONL corpus I/O — the interchange format of LLM text pipelines
(Dolma, RedPajama, C4 and most crawl-derived corpora ship
``.jsonl``/``.jsonl.gz``: one JSON document per line).

This is an EXTENSION surface (no reference counterpart — the reference
is a vision-dataset library); it exists so the curation operators
(`operators/quality.py`, `operators/dedup.py`, ...) can read and write
the corpora they are built for without ad-hoc `spark.read.json` calls
that get the scale details wrong. The details this module pins down:

- **Schema inference is a full extra read.** `spark.read.json` without
  a schema scans EVERY byte once just to infer types — on a 100 TB
  corpus that doubles the job. :func:`read_jsonl` therefore defaults
  to the standard document-corpus schema and accepts any DDL string /
  StructType; inference is an explicit opt-in (``schema=None``).
- **Corrupt lines are a policy, not a surprise.** Real crawl corpora
  contain truncated lines and encoding damage. ``on_corrupt``:
  ``"fail"`` (default — fail fast, matching the engine's fail-loud
  bias), ``"drop"`` (Spark DROPMALFORMED), or ``"keep"`` (PERMISSIVE:
  damaged lines surface as rows with NULL fields and the raw line in
  ``_corrupt_record`` for quarantine-and-continue pipelines).
- **gzip is not splittable.** One ``.jsonl.gz`` file = one task, no
  matter how large; parallelism at read time is the FILE count. The
  writer therefore bounds rows per output file
  (``max_records_per_file``, spill-free — plain
  ``spark.sql.files.maxRecordsPerFile`` under the hood) instead of
  emitting one giant shard per partition, so a re-read of the written
  corpus parallelizes even when compressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents-table shape every curation operator in this engine
#: consumes; matches /root/testdata's documents.parquet columns. THE
#: canonical definition — ``streaming.documents.DOCUMENTS_SCHEMA`` is
#: this same object, so batch and streaming reads cannot drift.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: "str | object | None" = DOCUMENT_SCHEMA,
    on_corrupt: str = "fail",
    recursive: bool = True,
) -> DataFrame:
    """One row per JSON line under ``path`` (a file, a directory, or a
    glob; ``.gz``-compressed files decompress transparently).

    ``schema``: DDL string or StructType (default: the engine's
    document-corpus shape). Pass ``None`` to let Spark infer — an
    extra full scan, acceptable only on small corpora.

    ``on_corrupt``: ``"fail"`` | ``"drop"`` | ``"keep"`` (see module
    docstring). With ``"keep"``, damaged lines have the raw text in
    ``_corrupt_record`` and NULLs elsewhere; intact lines have a NULL
    ``_corrupt_record`` — filter on it to quarantine. (Spark caveat,
    SPARK-21610: a query whose referenced columns are ONLY the corrupt
    column is disallowed straight off the scan — select a data column
    alongside it, or persist the parsed frame first.)

    ``"drop"`` caveat: DROPMALFORMED is applied during parsing, and a
    column-pruned query (``count()``, or a subset projection whose
    referenced fields all parse fine on a line that is malformed
    elsewhere) may not drop the same rows as a full-row read — on
    dirty corpora ``count()`` and ``collect()`` can disagree. For a
    reliable quarantine, prefer ``"keep"`` and filter on
    ``_corrupt_record IS NULL`` (a filter, so it survives pruning).

    >>> import os, tempfile
    >>> p = os.path.join(tempfile.mkdtemp(), "corpus.jsonl")
    >>> _ = open(p, "w").write(
    ...     '{"doc_id": 1, "text": "hello world", "lang": "en"}\\n'
    ...     '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\\n')
    >>> df = read_jsonl(spark, p)
    >>> [(r["doc_id"], r["lang"]) for r in df.orderBy("doc_id").collect()]
    [(1, 'en'), (2, 'fr')]
    >>> df.schema.simpleString()  # declared, not inferred
    'struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>'
    """
    modes = {"fail": "FAILFAST", "drop": "DROPMALFORMED", "keep": "PERMISSIVE"}
    if on_corrupt not in modes:
        raise ValueError(
            f"on_corrupt must be one of {sorted(modes)}, got {on_corrupt!r}"
        )
    reader = (
        spark.read.option("mode", modes[on_corrupt])
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if on_corrupt == "keep":
        # pin the corrupt-column name on the READER so the quarantine
        # contract holds regardless of the session's
        # spark.sql.columnNameOfCorruptRecord setting
        reader = reader.option("columnNameOfCorruptRecord", _CORRUPT_COL)
    if schema is None:
        return reader.json(path)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if on_corrupt == "keep" and _CORRUPT_COL not in schema.fieldNames():
        # PERMISSIVE only exposes the raw line if the schema has a
        # string column with the corrupt-record name. Build a NEW
        # StructType — StructType.add mutates in place, which would
        # plant a phantom column in the caller's schema object
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(_CORRUPT_COL, T.StringType())]
        )
    return reader.schema(schema).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: "str | None" = "gzip",
    max_records_per_file: int = 250_000,
    num_shards: "int | None" = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``part-*.json[.gz]`` files under ``path``.

    ``compression``: ``"gzip"`` (default — the corpus-interchange
    norm), ``None``/``"none"`` for plain text, or any Spark text codec
    (``"bzip2"`` is the splittable choice when single giant shards are
    unavoidable).

    ``max_records_per_file`` bounds rows per output file WITHOUT a
    shuffle (Spark splits a partition's write when the cap is hit), so
    compressed output stays re-readable in parallel; ``num_shards``
    additionally repartitions to an exact file count (one round-robin
    exchange) for layout-controlled exports.

    >>> import glob, os, tempfile
    >>> out = os.path.join(tempfile.mkdtemp(), "out")
    >>> df = spark.createDataFrame(
    ...     [(1, "a"), (2, "b")], "doc_id long, text string")
    >>> write_jsonl(df, out, compression=None, num_shards=1)
    >>> [sorted(__import__("json").loads(l)["doc_id"]
    ...         for l in open(f)) for f in glob.glob(out + "/part-*")]
    [[1, 2]]
    """
    if num_shards is not None:
        df = df.repartition(num_shards)
    writer = df.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if compression and compression != "none":
        writer = writer.option("compression", compression)
    writer.json(path)
