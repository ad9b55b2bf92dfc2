"""cAIpy layout reader/writer (JSON-per-image with nested tags).

Re-expresses reference ``lours/dataset/io/caipy.py:30-695``: a dataset
is ``Annotations/{split}/*.json``, one document per image holding an
``image`` object (with nested ``tags``) and an ``annotations`` array;
the reference flattens nesting to dot-columns via ``json_normalize``
(``caipy.py:78-91``) and merges per-split datasets.

Spark shape: ``spark.read.json(multiLine=true)`` over each split dir
parses one row per file, fully distributed. Nested objects stay NATIVE
``StructType`` (the Spark-idiomatic choice — SURVEY §1.4); flattening
to dot-columns happens only through ``flatten_structs`` for
pandas-compat consumers. Writing groups annotations per image with
``collect_list(struct(...))`` and emits one JSON per image from the
executors via ``foreachPartition`` — no driver bottleneck.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lours_spark.dataset.core import SparkDataset


def flatten_structs(df: DataFrame, prefix: str = "") -> DataFrame:
    """Flatten nested structs to dot-named columns (the reference's
    ``json_normalize`` semantics, for pandas-compat edges only)."""
    flat_cols = []

    def walk(schema: T.StructType, path: str):
        for field in schema.fields:
            p = f"{path}.{field.name}" if path else field.name
            if isinstance(field.dataType, T.StructType):
                walk(field.dataType, p)
            else:
                flat_cols.append(F.col(p).alias(p))

    walk(df.schema, "")
    return df.select(*flat_cols)


def _split_dirs(
    dataset_root: str,
    splits: list[str] | None,
    annotations_root: str | None = None,
) -> list[str]:
    ann_root = annotations_root or os.path.join(dataset_root, "Annotations")
    return splits or sorted(
        d for d in os.listdir(ann_root) if os.path.isdir(os.path.join(ann_root, d))
    )


def validate_caipy(
    spark: SparkSession,
    dataset_root: str,
    schema: dict | None = None,
    splits: list[str] | None = None,
    annotations_root: str | None = None,
) -> DataFrame:
    """Per-file conformity report for a cAIpy tree (reference
    ``io/caipy.py:37-48`` validates each JSON against the dataset's
    JSON schema on read; ``:63-67`` asserts the annotation file stem
    matches the embedded ``image.file_name`` stem).

    Runs distributed: ``binaryFile`` lists/reads the JSON files,
    ``mapInPandas`` parses + jsonschema-validates each on the
    executors. Returns (split, path, error) — empty when conformant.
    """
    import pandas as pd

    ann_root = annotations_root or os.path.join(dataset_root, "Annotations")
    parts = []
    for split in _split_dirs(dataset_root, splits, annotations_root):
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.json")
            .load(os.path.join(ann_root, split))
            .select("path", "content")
        )

        def check(batches, split=split):
            try:
                from jsonschema.validators import validator_for
            except ImportError:  # pragma: no cover
                validator_for = None
            validator = None
            if schema is not None and validator_for is not None:
                validator = validator_for(schema)(schema)
            for pdf in batches:
                out_path, out_err = [], []
                for path, content in zip(pdf["path"], pdf["content"]):
                    try:
                        doc = json.loads(bytes(content))
                    except ValueError as e:
                        out_path.append(path)
                        out_err.append(f"invalid JSON: {e}")
                        continue
                    if validator is not None:
                        err = next(iter(validator.iter_errors(doc)), None)
                        if err is not None:
                            out_path.append(path)
                            out_err.append(
                                f"schema violation at "
                                f"{'/'.join(str(p) for p in err.absolute_path) or '<root>'}: "
                                f"{err.message}"
                            )
                            continue
                    file_name = (doc.get("image") or {}).get("file_name")
                    if file_name is not None:
                        stem = os.path.splitext(os.path.basename(path))[0]
                        img_stem = os.path.splitext(os.path.basename(file_name))[0]
                        if stem != img_stem:
                            out_path.append(path)
                            out_err.append(
                                f"file stem {stem!r} != image.file_name stem"
                                f" {img_stem!r}"
                            )
                yield pd.DataFrame(
                    {
                        "split": [split] * len(out_path),
                        "path": out_path,
                        "error": out_err,
                    }
                )

        parts.append(
            files.mapInPandas(check, "split string, path string, error string")
        )
    if not parts:  # no split directories: vacuously conformant
        return spark.createDataFrame(
            [], "split string, path string, error string"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def from_caipy(
    spark: SparkSession,
    dataset_root: str,
    splits: list[str] | None = None,
    booleanize_enums: dict[str, list[str]] | None = None,
    schema: dict | None = None,
    on_invalid: str = "raise",
    annotations_root: str | None = None,
    images_root: str | None = None,
    ignore_pattern: str = "a^",
) -> SparkDataset:
    """Read a cAIpy tree (reference ``io/caipy.py:30-349``).

    ``booleanize_enums`` maps list-column names (flattened dot-names
    for nested ones, e.g. ``attributes.colors``) to their enum
    domains; listed columns are one-hot expanded on read
    (``caipy.py:334-348``) and tracked in ``booleanized_columns`` so
    merge/write round-trip them.

    ``schema``: optional JSON schema dict — every annotation file is
    validated executor-side before the read (reference
    ``caipy.py:37-48``), AND, like the reference (``caipy.py:334-348``
    + ``schema_util_functions.py:47-82,116-163``), the schema drives
    the read itself: enum domains for both the image and annotation
    tables are derived from ``array``+``items.enum``+``uniqueItems``
    properties and booleanized automatically, and schema
    dtypes/defaults are applied (optional-field ``default`` fills,
    ``[]`` for optional arrays, integer/boolean casts). An explicit
    ``booleanize_enums`` (even ``{}``) suppresses schema enum
    derivation for BOTH tables and is applied to BOTH by column
    presence (like the reference's merged
    ``booleanize(missing_ok=True, **enums)``, ``caipy.py:338-341``).
    ``ignore_pattern``: regex of schema property names to skip during
    enum derivation (reference ``get_enums`` ``ignore_pattern``,
    ``schema_util_functions.py:48``; default matches nothing).
    ``on_invalid="raise"`` raises with the
    first few violations; ``"skip"`` proceeds with the read regardless
    (the report is still computed; fetch it via
    :func:`validate_caipy`).

    One JSON document per image under ``Annotations/<split>/``:

    >>> import json, os, tempfile
    >>> root = tempfile.mkdtemp()
    >>> os.makedirs(os.path.join(root, "Annotations", "train"))
    >>> doc = {"image": {"id": 1, "width": 64, "height": 48,
    ...                  "file_name": "a.jpg"},
    ...        "annotations": [{"id": 10, "category_id": 0,
    ...                         "category_str": "cat",
    ...                         "bbox": [2.0, 3.0, 10.0, 8.0]}]}
    >>> _ = open(os.path.join(root, "Annotations", "train", "a.json"),
    ...          "w").write(json.dumps(doc))
    >>> ds = from_caipy(spark, root)
    >>> r = ds.annotations.first()
    >>> (r["split"], r["box_width"], r["category_str"])
    ('train', 10.0, 'cat')
    """
    if schema is not None and on_invalid == "raise":
        # validate the SAME tree the read targets — a generic read with
        # annotations_root must not validate dataset_root/Annotations
        bad = validate_caipy(
            spark, dataset_root, schema, splits, annotations_root
        ).take(5)
        if bad:
            msgs = "\n".join(f"  {r.path}: {r.error}" for r in bad)
            raise ValueError(
                f"caipy tree at {dataset_root} fails schema validation"
                f" (first {len(bad)}):\n{msgs}"
            )
    ann_root = annotations_root or os.path.join(dataset_root, "Annotations")
    splits = splits or sorted(
        d for d in os.listdir(ann_root)
        if os.path.isdir(os.path.join(ann_root, d))
    )
    if not splits:
        raise ValueError(
            f"no split directories found under {ann_root!r} — a caipy "
            "tree holds one subdirectory per split (Annotations/train, "
            "...); pass splits=[...] to read explicit ones"
        )
    images_parts = []
    ann_parts = []
    for split in splits:
        # recursive lookup: unflattened exports keep subdirectories
        # under the split folder; the subdir is rejoined into
        # relative_path below (reference reader, caipy.py:61-68)
        docs = (
            spark.read.option("multiLine", "true")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.json")
            .json(os.path.join(ann_root, split))
        )
        abs_base = os.path.abspath(os.path.join(ann_root, split)).replace(
            "\\", "/"
        )
        src = F.regexp_replace(F.input_file_name(), "^file:/+", "/")
        rel_json = F.substring(src, len(abs_base) + 2, 65536)
        rel_dir = F.when(
            rel_json.contains("/"),
            F.regexp_extract(rel_json, r"^(.*)/[^/]*$", 1),
        ).otherwise(F.lit(""))
        img = (
            docs.select("image.*")
            .withColumn("split", F.lit(split))
            .withColumn("__reldir", rel_dir)
        )
        images_parts.append(img)
        ann = docs.select(
            F.col("image.id").alias("image_id"),
            F.explode_outer("annotations").alias("a"),
        ).select("image_id", "a.*").withColumn("split", F.lit(split))
        ann_parts.append(ann)

    def union_all(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    images = union_all(images_parts)
    if "file_name" in images.columns:
        images = images.withColumnRenamed("file_name", "relative_path")
        images = images.withColumn(
            "relative_path",
            F.when(
                F.col("__reldir") != "",
                F.concat_ws("/", F.col("__reldir"), F.col("relative_path")),
            ).otherwise(F.col("relative_path")),
        )
    images = images.drop("__reldir")
    annotations = union_all(ann_parts)
    if "bbox" in annotations.columns:
        annotations = (
            annotations.withColumn("box_x_min", F.col("bbox")[0].cast("double"))
            .withColumn("box_y_min", F.col("bbox")[1].cast("double"))
            .withColumn("box_width", F.col("bbox")[2].cast("double"))
            .withColumn("box_height", F.col("bbox")[3].cast("double"))
            .drop("bbox")
        )
    from lours_spark.io.common import construct_label_map_df

    label_map: dict[int, str] = {}
    if "category_str" in annotations.columns:
        label_map = construct_label_map_df(
            annotations.filter(F.col("category_id").isNotNull())
        )
    annotations = annotations.filter(F.col("id").isNotNull())

    # schema-driven derivation (reference caipy.py:334-348): enum
    # domains and dtype/default fills come from the schema dict —
    # driver-side dict walking, applied as narrow projections
    image_enums: dict[str, list[str]] = {}
    explicit = booleanize_enums is not None
    if schema is not None:
        from lours_spark.io.schema_tools import (
            apply_schema_columns,
            schema_enums,
        )

        props = schema.get("properties") or {}
        image_schema = props.get("image")
        ann_schema = (props.get("annotations") or {}).get("items")
        if ann_schema:
            if not explicit:
                booleanize_enums = schema_enums(
                    ann_schema, ignore_pattern=ignore_pattern
                )
            annotations = apply_schema_columns(annotations, ann_schema)
        if image_schema:
            if not explicit:  # an explicit mapping suppresses BOTH sides
                image_enums = schema_enums(
                    image_schema, ignore_pattern=ignore_pattern
                )
            images = apply_schema_columns(images, image_schema)

    booleanized: dict[str, set[str]] = {}

    def _booleanize_table(df, enums):
        from lours_spark.io.schema_tools import promote_nested_column
        from lours_spark.operators.booleanize import booleanize

        for col, domain in (enums or {}).items():
            df = promote_nested_column(df, col)  # no-op when flat/absent
            if col in df.columns:
                df, dom = booleanize(df, col, domain=domain)
                if col in booleanized and booleanized[col] != set(dom):
                    # same enum name on both tables with different
                    # domains would store only one domain, which
                    # broadcast_booleanization/merge would then apply
                    # to the wrong table — refuse instead of guessing
                    raise ValueError(
                        f"enum column {col!r} booleanized on both the "
                        f"image and annotation tables with different "
                        f"domains ({sorted(booleanized[col])} vs "
                        f"{sorted(dom)}); pass explicit "
                        "booleanize_enums or rename one column"
                    )
                booleanized[col] = set(dom)
        return df

    annotations = _booleanize_table(annotations, booleanize_enums)
    # an explicit mapping is applied to BOTH tables by column presence
    # (the reference merges image+annotation enums into one
    # booleanize(missing_ok=True, **enums) call, caipy.py:338-341) —
    # that is also what the conflict ValueError above tells users to do
    images = _booleanize_table(
        images, booleanize_enums if explicit else image_enums
    )
    ds = SparkDataset(
        images=images,
        annotations=annotations,
        label_map=label_map,
        images_root=images_root or os.path.join(dataset_root, "Images"),
        booleanized_columns=booleanized,
    )
    return ds.denormalize() if label_map else ds


def from_caipy_generic(
    spark: SparkSession,
    images_folder: str | None,
    annotations_folder: str,
    splits_to_read: list[str] | None = None,
    booleanize_enums: dict[str, list[str]] | None = None,
    schema: dict | None = None,
    ignore_pattern: str = "a^",
) -> SparkDataset:
    """cAIpy read with EXPLICIT image/annotation folders (reference
    ``io/caipy.py:228-320`` — the shape used for prediction sets and
    annotation variants that don't live under a single root)."""
    import os as _os

    return from_caipy(
        spark,
        dataset_root=_os.path.dirname(annotations_folder.rstrip("/")) or ".",
        splits=splits_to_read,
        booleanize_enums=booleanize_enums,
        schema=schema,
        annotations_root=annotations_folder,
        images_root=images_folder or "",
        ignore_pattern=ignore_pattern,
    )


def _output_relative_path(rel: str, flatten_paths: bool) -> str:
    """Reference output-path semantics (``io/caipy.py:458-467``): strip
    a leading split directory unconditionally (it is re-added by the
    per-split output folder), then either join the remaining parts with
    underscores (``flatten_paths=True`` — every file lands in the split
    root) or keep the subdirectory structure as-is."""
    from lours_spark.io.common import _KNOWN_SPLITS

    parts = [p for p in rel.replace("\\", "/").split("/") if p]
    if parts and parts[0] in _KNOWN_SPLITS:
        parts = parts[1:]
    if not parts:
        return rel
    return "_".join(parts) if flatten_paths else "/".join(parts)


#: columns the writers always keep regardless of schema pruning — the
#: reference's remap sets include these unconditionally
#: (``caipy.py:418-431``: file_name/id/width/height on images;
#: id/bbox/category_id/category_str on annotations); split/image_id
#: are structural, box_* serialize as ``bbox``
_CORE_IMAGE_COLS = {"id", "width", "height", "relative_path", "type", "split"}
_CORE_ANN_COLS = {
    "id", "image_id", "category_id", "category_str", "split",
    "box_x_min", "box_y_min", "box_width", "box_height",
}


def _prune_to_schema(
    df: DataFrame, saved_keys: "list[str]", core: "set[str]", table: str
) -> DataFrame:
    """Drop attribute columns the output schema does not describe,
    with the reference's RuntimeWarning (``caipy.py:437-453``): a user
    exporting against a schema must not silently ship columns the
    schema's consumers will reject. Column-level granularity — a
    struct column survives when ANY of its flattened keys is in the
    schema (the reference's frames are flat, so it prunes per leaf;
    here extra struct FIELDS of a partially-covered struct pass
    through, which a schema without ``additionalProperties: false``
    accepts)."""
    import warnings

    from pyspark.sql import types as T

    saved = set(saved_keys)

    def keeps(col: str) -> bool:
        if col in core or col in saved:
            return True
        return isinstance(
            df.schema[col].dataType, T.StructType
        ) and any(k.startswith(col + ".") for k in saved)

    lost = sorted(c for c in df.columns if not keeps(c))
    if lost:
        warnings.warn(
            f"These columns in {table} will be lost because they don't "
            f"follow the specified json schema: {', '.join(lost)}",
            RuntimeWarning,
        )
        df = df.drop(*lost)
    return df


def _per_image_docs(
    ds: SparkDataset, schema: "dict | None" = None
) -> tuple[DataFrame, bool]:
    """images ⟕ collect_list(annotation struct) — the one-JSON-per-image
    document frame both caipy writers emit from. ``schema`` prunes
    attribute columns it does not describe (post-debooleanize, so the
    gathered dot-names are what the schema keys match)."""
    if ds.booleanized_columns:
        from lours_spark.operators.booleanize import (
            debooleanize,
            get_bool_columns,
        )

        ann, img = ds.annotations, ds.images
        for prefix in sorted(ds.booleanized_columns):
            # a prefix usually lives on one table (annotation enums vs
            # image enums — both derivable from a caipy schema), but a
            # same-named enum on both is legal: gather each side that
            # actually has the bool columns. A prefix on neither is
            # stale (columns pruned downstream) and skipped.
            if get_bool_columns(ann, prefix):
                ann = debooleanize(ann, prefix)
            if get_bool_columns(img, prefix):
                img = debooleanize(img, prefix)
        ds = ds.from_template(
            annotations=ann, images=img, booleanized_columns={}
        )
    if schema is not None:
        from lours_spark.io.schema_tools import schema_flat_keys

        props = schema.get("properties") or {}
        img_keys = schema_flat_keys(props.get("image") or {})
        ann_keys = schema_flat_keys(
            (props.get("annotations") or {}).get("items") or {}
        )
        ds = ds.from_template(
            images=_prune_to_schema(
                ds.images, img_keys, _CORE_IMAGE_COLS, "images"
            ),
            annotations=_prune_to_schema(
                ds.annotations, ann_keys, _CORE_ANN_COLS, "annotations"
            ),
        )
    # image_id is implied by the enclosing document — exclude it from
    # the per-annotation struct (restored on read from image.id)
    ann_cols = [c for c in ds.annotations.columns if c not in ("split", "image_id")]
    has_bbox = all(
        c in ann_cols
        for c in ("box_x_min", "box_y_min", "box_width", "box_height")
    )
    per_image = (
        ds.annotations.withColumn(
            # backticks: a debooleanized dot-NAMED flat column must not
            # be resolved as a struct path
            "__a", F.struct(*[F.col(f"`{c}`") for c in ann_cols])
        )
        .groupBy("image_id")
        .agg(F.collect_list("__a").alias("__anns"))
    )
    joined = ds.images.join(
        per_image, ds.images.id == per_image.image_id, "left"
    ).drop("image_id")
    return joined, has_bbox


def _nest_dot_keys(d: dict) -> dict:
    """Re-nest flat dot-named keys into sub-dicts (the reference's
    ``remap_dict``, ``schema_util_functions.py:286-326``): a
    debooleanized ``attributes.colors`` column serializes as
    ``{"attributes": {"colors": [...]}}`` so the emitted JSON matches
    the schema the tree was read with. Dotless keys pass through;
    nesting merges into an existing sub-dict, and a NULL struct sibling
    (e.g. an all-absent ``attributes`` struct next to a debooleanized
    ``attributes.colors``) is replaced by a fresh dict to nest into. A
    genuine scalar/dict clash raises, like the reference's
    ``get_remapping_dict_from_names`` (``schema_util_functions.py``)."""
    out: dict = {}
    dotted = []
    for k, v in d.items():
        if "." in k:
            dotted.append((k, v))
        else:
            out[k] = v  # structs land first so dotted keys merge in
    for k, v in dotted:
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            nxt = cur.setdefault(p, {})
            if nxt is None:  # NULL struct column: nest into a fresh dict
                nxt = cur[p] = {}
            elif not isinstance(nxt, dict):
                raise ValueError(
                    f"cannot nest dotted key {k!r}: prefix {p!r} already "
                    f"holds a non-dict value {nxt!r}"
                )
            cur = nxt
        # symmetric leaf rule: a None/absent slot is filled (the
        # promoted field's null residue), but silently clobbering a
        # populated value would drop data from the emitted JSON —
        # promote_nested_column removes the struct field it promotes,
        # so a populated leaf here is a genuine clash, like the prefix
        # direction above
        if cur.get(parts[-1]) is not None:
            raise ValueError(
                f"cannot place dotted key {k!r}: leaf {parts[-1]!r} "
                f"already holds {cur[parts[-1]]!r}"
            )
        cur[parts[-1]] = v
    return out


def _drop_absent_values(d: dict) -> dict:
    """Drop None values recursively (the reference's ``remap_dict``
    output rule, ``schema_util_functions.py:307-325``): an absent
    optional field must be ABSENT from the emitted JSON, not ``null``
    — a schema typing the field would reject ``null``, and the reader
    treats missing and null identically anyway. Deliberate divergence:
    the reference also drops EMPTY LISTS, but a schema may mark an
    array property *required* — dropping ``[]`` would make this
    writer's own output fail the schema validation ``from_caipy`` runs
    by default, so empty lists are kept (schema-valid either way)."""
    out: dict = {}
    for k, v in d.items():
        if v is None:
            continue
        out[k] = _drop_absent_values(v) if isinstance(v, dict) else v
    return out


def _write_caipy_split(
    sub: DataFrame,
    ann_dir: str,
    img_dir: str | None,
    images_root: str,
    has_bbox: bool,
    flatten_paths: bool = True,
    copy_images: bool = True,
    overwrite_images: bool = True,
    overwrite_labels: bool = True,
    schema: "dict | None" = None,
) -> None:
    """Write one split's JSON (and optionally image) files from the
    executors (reference ``split_to_caipy``, ``io/caipy.py:352-466``).
    The image object serializes ``relative_path`` as ``file_name``
    (the caipy key — ``from_caipy`` renames it back on read), and the
    JSON file is named after the image file stem so the reference's
    stem-match validation (``caipy.py:63-67``) holds on our output.
    ``schema`` validates every emitted document executor-side before
    it lands (reference ``caipy.py:512-513``) — a non-conformant doc
    fails the write job loudly instead of shipping bad JSON."""
    os.makedirs(ann_dir, exist_ok=True)
    if img_dir is not None:
        os.makedirs(img_dir, exist_ok=True)

    def write_partition(rows):
        import shutil

        validator = None
        if schema is not None:
            try:
                from jsonschema.validators import validator_for
            except ImportError:  # pragma: no cover
                validator_for = None
            if validator_for is not None:
                validator = validator_for(schema)(schema)

        for r in rows:
            d = r.asDict(recursive=True)
            anns = [
                _drop_absent_values(_nest_dot_keys(a))
                for a in d.pop("__anns", None) or []
            ]
            image = _drop_absent_values(
                _nest_dot_keys({k: v for k, v in d.items() if k != "split"})
            )
            rel = image.pop("relative_path", None)
            if rel is not None:
                out_rel = _output_relative_path(rel, flatten_paths)
                # file_name is the basename only, like the reference
                # (caipy.py:468,496) — the subdir lives in the JSON's
                # own path and is rejoined on read.
                image["file_name"] = os.path.basename(out_rel)
                out_stem = os.path.splitext(out_rel)[0]
            else:
                out_rel = None
                out_stem = str(image["id"])
            if has_bbox:
                for a in anns:
                    # a null coordinate was dropped by
                    # _drop_absent_values above; a partial box is no
                    # box — omit the key entirely (absent-not-null,
                    # same rule as every other optional field) so the
                    # written JSON stays schema-valid
                    coords = [
                        a.pop("box_x_min", None),
                        a.pop("box_y_min", None),
                        a.pop("box_width", None),
                        a.pop("box_height", None),
                    ]
                    if all(c is not None for c in coords):
                        a["bbox"] = coords
            doc = {"image": image, "annotations": anns}
            if validator is not None:
                err = next(iter(validator.iter_errors(doc)), None)
                if err is not None:
                    where = "/".join(
                        str(p) for p in err.absolute_path
                    ) or "<root>"
                    raise ValueError(
                        f"output document for image id "
                        f"{image.get('id')} violates the export schema "
                        f"at {where}: {err.message}"
                    )
            # JSON path mirrors the (split-stripped) relative path, so
            # unflattened exports keep subdirs and a/x.jpg vs b/x.jpg
            # never collide (reference caipy.py:489-491).
            out_json = os.path.join(ann_dir, f"{out_stem}.json")
            os.makedirs(os.path.dirname(out_json), exist_ok=True)
            if overwrite_labels or not os.path.exists(out_json):
                with open(out_json, "w") as f:
                    json.dump(doc, f, default=str)
            if img_dir is not None and rel is not None:
                src = os.path.join(images_root, rel)
                dst = os.path.join(img_dir, out_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                if os.path.exists(dst) and not overwrite_images:
                    continue
                if copy_images:
                    shutil.copyfile(src, dst)
                else:
                    if os.path.lexists(dst):
                        os.remove(dst)
                    os.symlink(os.path.abspath(src), dst)

    sub.foreachPartition(write_partition)


def _iter_split_frames(joined: DataFrame, ds: SparkDataset):
    splits = (
        [s for s, _ in ds.iter_splits()]
        if "split" in ds.images.columns
        else [None]
    )
    for split in splits:
        sub = (
            joined.filter(
                F.col("split").isNull()
                if split is None
                else F.col("split") == split
            )
            if "split" in joined.columns
            else joined
        )
        yield split, sub


def dataset_to_caipy(
    ds: SparkDataset,
    output_root: str,
    copy_images: bool = True,
    flatten_paths: bool = True,
    overwrite_images: bool = True,
    overwrite_labels: bool = True,
    schema: "dict | None" = None,
) -> None:
    """Write the standard cAIpy tree ``{root}/Annotations/{split}`` (+
    ``{root}/Images/{split}`` when ``copy_images``) — reference
    ``io/caipy.py:352-695``: one JSON per image, grouped and serialized
    on the executors. Tracked booleanized columns are gathered back
    into list columns first (the reference debooleanizes before export,
    ``caipy.py:584``). ``copy_images`` defaults True like the
    reference ``Dataset.to_caipy`` (``dataset.py`` export surface);
    pass False to export annotations only.

    ``schema``: like the reference's export schema (``caipy.py:385,
    437-453,512-513``) — attribute columns the schema does not
    describe are DROPPED with a RuntimeWarning, and every emitted
    document is validated executor-side (non-conformant output fails
    the job loudly)."""
    joined, has_bbox = _per_image_docs(ds, schema=schema)
    for split, sub in _iter_split_frames(joined, ds):
        name = split or "default"
        _write_caipy_split(
            sub,
            ann_dir=os.path.join(output_root, "Annotations", name),
            img_dir=(
                os.path.join(output_root, "Images", name) if copy_images else None
            ),
            images_root=ds.images_root,
            has_bbox=has_bbox,
            flatten_paths=flatten_paths,
            copy_images=copy_images,
            overwrite_images=overwrite_images,
            overwrite_labels=overwrite_labels,
            schema=schema,
        )


def dataset_to_caipy_generic(
    ds: SparkDataset,
    output_images_folder: str | None,
    output_annotations_folder: str,
    copy_images: bool = True,
    flatten_paths: bool = True,
    overwrite_images: bool = True,
    overwrite_labels: bool = True,
    schema: "dict | None" = None,
) -> None:
    """cAIpy write with EXPLICIT image/annotation folders (reference
    ``dataset_to_caipy_generic``, ``io/caipy.py:352-466`` /
    ``dataset.py:4983-5049``) — the shape used for prediction sets and
    annotation variants that don't live under one root.

    ``output_images_folder=None`` skips images entirely (reference
    semantics: useful when saving only predictions). Datasets with a
    ``split`` column write per-split subfolders under both roots, like
    the reference's ``Images/{split}`` convention; splitless datasets
    write directly into the given folders. ``schema``: export-schema
    pruning + per-document validation, see :func:`dataset_to_caipy`."""
    joined, has_bbox = _per_image_docs(ds, schema=schema)
    has_splits = "split" in ds.images.columns
    for split, sub in _iter_split_frames(joined, ds):
        if has_splits:
            name = split or "default"
            ann_dir = os.path.join(output_annotations_folder, name)
            img_dir = (
                os.path.join(output_images_folder, name)
                if output_images_folder is not None
                else None
            )
        else:
            ann_dir = output_annotations_folder
            img_dir = output_images_folder
        _write_caipy_split(
            sub,
            ann_dir=ann_dir,
            img_dir=img_dir,
            images_root=ds.images_root,
            has_bbox=has_bbox,
            flatten_paths=flatten_paths,
            copy_images=copy_images,
            overwrite_images=overwrite_images,
            overwrite_labels=overwrite_labels,
            schema=schema,
        )
