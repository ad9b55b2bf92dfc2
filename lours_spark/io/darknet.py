"""Darknet / YOLO text-format reader/writer.

Re-expresses reference ``lours/dataset/io/darknet.py``: one ``.txt``
per image with lines ``class cx cy w h [confidence]`` in relative
``cxcywh`` coordinates, a names file, and per-split image-list files.

Spark shape: ``spark.read.text`` over the label directory with
``input_file_name()`` — the parse is pure column expressions
(split + cast), fully distributed; the bbox conversion is the §2.6
relative-import expression. Writing groups lines per image with
``collect_list`` and fans out through ``foreachPartition`` so no
single-node bottleneck exists on the label files; only the tiny
manifest files are driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lours_spark.dataset.core import SparkDataset
from lours_spark.functions.bbox import import_bbox


def from_darknet(
    spark: SparkSession,
    labels_dir: str,
    images_df: DataFrame,
    names: list[str],
    split: str | None = None,
) -> SparkDataset:
    """Read YOLO txt labels (reference ``io/darknet.py:120-300``).

    ``images_df`` must carry (id, width, height, relative_path) where
    the label file for an image is ``<stem>.txt`` — sizes come from the
    image table because darknet files store relative coords.

    >>> import os, tempfile
    >>> labels = tempfile.mkdtemp()
    >>> _ = open(os.path.join(labels, "im1.txt"), "w").write(
    ...     "0 0.5 0.5 0.25 0.5\\n")
    >>> imgs = spark.createDataFrame(
    ...     [(1, 100, 100, "im1.jpg")],
    ...     "id long, width int, height int, relative_path string")
    >>> ds = from_darknet(spark, labels, imgs, names=["person"], split="train")
    >>> r = ds.annotations.first()
    >>> (r["box_x_min"], r["box_y_min"], r["box_width"], r["box_height"],
    ...  r["category_str"])
    (37.5, 25.0, 25.0, 50.0, 'person')
    """
    raw = spark.read.text(f"{labels_dir}/*.txt").withColumn(
        "__file", F.input_file_name()
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    parsed = (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .withColumn(
            "__stem",
            F.regexp_extract(F.col("__file"), r"([^/]+)\.txt$", 1),
        )
        .select(
            "__stem",
            parts[0].cast("int").alias("category_id"),
            parts[1].cast("double").alias("rcx"),
            parts[2].cast("double").alias("rcy"),
            parts[3].cast("double").alias("rw"),
            parts[4].cast("double").alias("rh"),
            F.try_element_at(parts, F.lit(6)).cast("double").alias("confidence"),
        )
    )
    img = images_df.withColumn(
        "__stem",
        F.regexp_extract(F.col("relative_path"), r"([^/]+)\.[^.]+$", 1),
    )
    ann = parsed.join(
        img.select("__stem", F.col("id").alias("image_id")), "__stem"
    ).drop("__stem")
    from lours_spark.functions.ids import global_row_number

    ann = global_row_number(
        ann, ["image_id", "category_id", "rcx", "rcy", "rw", "rh"],
        out_col="id",
    ).withColumn("id", F.col("id").cast("long"))
    ann = import_bbox(
        ann, "cxcywh", ["rcx", "rcy", "rw", "rh"], images=images_df
    )
    if split is not None:
        img = img.withColumn("split", F.lit(split))
    label_map = {i: n for i, n in enumerate(names)}
    return SparkDataset(
        images=img.drop("__stem"),
        annotations=ann,
        label_map=label_map,
    ).denormalize()


def dataset_to_darknet(ds: SparkDataset, output_dir: str) -> None:
    """Write the YOLO tree (reference ``io/darknet.py:367-518``):
    sequentially-remapped classes, ``classes.names``, per-split list
    files, and one txt per image written from the executors."""
    from lours_spark.functions.bbox import export_bbox

    remapped, mapping = ds.remap_sequential()
    os.makedirs(os.path.join(output_dir, "labels"), exist_ok=True)

    with open(os.path.join(output_dir, "classes.names"), "w") as f:
        for k in sorted(remapped.label_map):
            f.write(remapped.label_map[k] + "\n")
    import json

    with open(os.path.join(output_dir, "ids_map.json"), "w") as f:
        json.dump({str(k): v for k, v in mapping.items()}, f)

    rel = export_bbox(
        remapped.annotations,
        "cxcywh",
        ["rcx", "rcy", "rw", "rh"],
        images=remapped.images,
        drop_canonical=True,
    )
    lines = rel.select(
        "image_id",
        F.concat_ws(
            " ",
            F.col("category_id").cast("string"),
            F.format_number(F.col("rcx"), 6),
            F.format_number(F.col("rcy"), 6),
            F.format_number(F.col("rw"), 6),
            F.format_number(F.col("rh"), 6),
        ).alias("line"),
    )
    per_image = (
        lines.groupBy("image_id")
        .agg(F.concat_ws("\n", F.collect_list("line")).alias("body"))
        .join(
            remapped.images.select(
                F.col("id").alias("image_id"), "relative_path"
            ),
            "image_id",
            "right",
        )
        .fillna({"body": ""})
    )
    labels_dir = os.path.join(output_dir, "labels")

    def write_partition(rows):
        for r in rows:
            stem = os.path.splitext(os.path.basename(r["relative_path"]))[0]
            with open(os.path.join(labels_dir, stem + ".txt"), "w") as f:
                if r["body"]:
                    f.write(r["body"] + "\n")

    per_image.foreachPartition(write_partition)

    if "split" in remapped.images.columns:
        for split, sub in remapped.iter_splits():
            if split is None:
                continue
            paths = [
                r["relative_path"]
                for r in sub.images.select("relative_path").collect()
            ]
            with open(os.path.join(output_dir, f"{split}.txt"), "w") as f:
                f.write("\n".join(paths) + ("\n" if paths else ""))


def from_darknet_json(
    spark: SparkSession,
    predictions_file: str,
    images_df: DataFrame,
    names: list[str],
) -> SparkDataset:
    """Darknet detector output JSON (reference ``io/darknet.py:303-364``):
    a list of frames, each with ``filename`` and ``objects`` carrying
    ``class_id``, ``relative_coordinates`` (cxcywh) and ``confidence``.
    Distributed parse via spark.read.json + explode."""
    raw = (
        spark.read.option("multiLine", "true")
        .json(predictions_file)
        .select(
            F.regexp_extract(F.col("filename"), r"([^/]+)\.[^.]+$", 1).alias(
                "__stem"
            ),
            F.explode("objects").alias("o"),
        )
    )
    parsed = raw.select(
        "__stem",
        F.col("o.class_id").cast("int").alias("category_id"),
        F.col("o.relative_coordinates.center_x").cast("double").alias("rcx"),
        F.col("o.relative_coordinates.center_y").cast("double").alias("rcy"),
        F.col("o.relative_coordinates.width").cast("double").alias("rw"),
        F.col("o.relative_coordinates.height").cast("double").alias("rh"),
        F.col("o.confidence").cast("double").alias("confidence"),
    )
    img = images_df.withColumn(
        "__stem",
        F.regexp_extract(F.col("relative_path"), r"([^/]+)\.[^.]+$", 1),
    )
    ann = parsed.join(
        img.select("__stem", F.col("id").alias("image_id")), "__stem"
    ).drop("__stem")
    from lours_spark.functions.ids import global_row_number

    ann = global_row_number(
        ann, ["image_id", "category_id", "rcx", "rcy"], out_col="id"
    ).withColumn("id", F.col("id").cast("long"))
    ann = import_bbox(ann, "cxcywh", ["rcx", "rcy", "rw", "rh"], images=images_df)
    return SparkDataset(
        images=img.drop("__stem"),
        annotations=ann,
        label_map={i: n for i, n in enumerate(names)},
    ).denormalize()

# --------------------------------------------------------------------------
# manifest-driven variants (reference io/darknet.py:81-365 + dataset.py:4708-4872)
# --------------------------------------------------------------------------

_YOLOV5_SPLIT_IN = {"val": "valid", "test": "eval"}
_YOLOV5_SPLIT_OUT = {"valid": "val", "validation": "val", "eval": "test"}


def open_data_file(path: str) -> dict:
    """Parse a darknet ``.data`` key=value manifest (reference
    ``io/darknet.py:81-101``)."""
    out: dict = {}
    with open(path) as f:
        for line in f:
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = v.strip()
    return out


def _read_list(path: str) -> list[str]:
    with open(path) as f:
        return [ln for ln in (x.strip() for x in f) if ln]


def _restrict(images_df: DataFrame, rel_paths: list[str]) -> DataFrame:
    return images_df.filter(F.col("relative_path").isin(rel_paths))


def from_darknet_generic(
    spark: SparkSession,
    images_root: str,
    labels_root: str,
    names: list[str],
    image_files_list: list[str] | None = None,
    split: str | None = None,
    images_df: DataFrame | None = None,
) -> SparkDataset:
    """Folder/list-driven darknet read (reference
    ``io/darknet.py:369-466``): images from an explicit list or a
    directory glob, labels resolved from ``labels_root`` by stem.

    Sizes come from ``images_df`` when given; otherwise the image files
    themselves are header-sniffed distributed via ``from_folder``
    (darknet txt stores relative coords, so sizes are mandatory).
    """
    if images_df is None:
        from lours_spark.io.folder import from_folder

        images_df = from_folder(spark, images_root).images
    if image_files_list is not None:
        images_df = _restrict(images_df, list(image_files_list))
    return from_darknet(spark, labels_root, images_df, names, split=split)


def from_darknet_yolov5(
    spark: SparkSession,
    dataset_path: str,
    data_file: str | None = None,
    splits: list[str] | None = None,
    split_name_mapping: dict[str, str] | None = None,
    images_df: DataFrame | None = None,
) -> SparkDataset:
    """YAML-manifest darknet read (reference ``io/darknet.py:266-366``):
    ``data.yaml`` carries ``path``, ``names`` and one key per split
    whose value is either an image folder or an image-list txt file.
    Split names map through yolov5 conventions (val→valid, test→eval)
    unless overridden. Per-split reads merge with annotation-id shift.
    """
    import yaml

    if split_name_mapping is None:
        split_name_mapping = dict(_YOLOV5_SPLIT_IN)
    data_file = data_file or os.path.join(dataset_path, "data.yaml")
    with open(data_file) as f:
        data = yaml.safe_load(f)
    names = data["names"]
    if isinstance(names, dict):
        names = [names[k] for k in sorted(names)]
    root = data.get("path", "")
    if not os.path.isabs(root):
        root = os.path.join(dataset_path, root) if root else dataset_path
    if splits is None:
        splits = [
            k for k, v in data.items()
            if k not in ("path", "names") and isinstance(v, str)
        ]
    if not splits:
        raise ValueError("no split was found or specified")

    parts = []
    for split in splits:
        target = os.path.join(root, data[split])
        if os.path.isdir(target):
            img_root, file_list = target, None
        elif os.path.isfile(target):
            img_root, file_list = root, _read_list(target)
        else:
            raise ValueError(f"{target} is neither a folder nor a text file")
        labels_root = _resolve_labels_root(img_root)
        parts.append(
            from_darknet_generic(
                spark,
                img_root,
                labels_root,
                names,
                image_files_list=file_list,
                split=split_name_mapping.get(split, split),
                images_df=images_df,
            )
        )
    from lours_spark.dataset.merge import merge_datasets

    out = parts[0]
    for p in parts[1:]:
        out = merge_datasets(out, p)
    return out


def _swap_images_for_labels(path: str) -> str:
    """Replace the LAST path segment named ``images`` with ``labels``
    (reference ``yolov5_img_path_to_label_path``, io/darknet.py:119)."""
    parts = path.split(os.sep)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            break
    return os.sep.join(parts)


def _resolve_labels_root(img_root: str) -> str:
    """Label directory for an image root, trying the yolov5 conventions
    in order (reference ``io/darknet.py:436-449`` tries both the simple
    same-dir layout and the images→labels swap): an ``images`` path
    segment swapped for ``labels``, a ``labels/`` sibling, else the
    image directory itself."""
    swapped = _swap_images_for_labels(img_root)
    if swapped != img_root and os.path.isdir(swapped):
        return swapped
    sibling = os.path.join(img_root, "labels")
    if os.path.isdir(sibling):
        return sibling
    return img_root


def from_darknet_data(
    spark: SparkSession,
    dataset_path: str,
    images_df: DataFrame,
    data_file: str | None = None,
) -> SparkDataset:
    """``.data``-manifest darknet read (reference
    ``io/darknet.py:171-263``): names/train/valid files drive two
    ``from_darknet_generic`` reads merged with id shift; a ``.yml``
    manifest dispatches to :func:`from_darknet_yolov5`."""
    data_file = data_file or os.path.join(dataset_path, "train_job.data")
    if data_file.endswith((".yml", ".yaml")):
        return from_darknet_yolov5(
            spark, dataset_path, data_file, images_df=images_df
        )
    data = open_data_file(data_file)
    names = _read_list(os.path.join(dataset_path, data["names"]))
    parts = []
    for split_key, split_name in (("valid", "valid"), ("train", "train")):
        lst = data.get(split_key)
        if not lst:
            continue
        file_list = _read_list(os.path.join(dataset_path, lst))
        parts.append(
            from_darknet_generic(
                spark,
                dataset_path,
                _resolve_labels_root(dataset_path),
                names,
                image_files_list=file_list,
                split=split_name,
                images_df=images_df,
            )
        )
    if not parts:
        raise ValueError(f"{data_file} lists no train/valid split files")
    from lours_spark.dataset.merge import merge_datasets

    out = parts[0]
    for p in parts[1:]:
        out = merge_datasets(out, p)
    return out


def dataset_to_yolo(
    ds: SparkDataset,
    output_dir: str,
    yolo_version: int = 5,
    split_name_mapping: dict[str, str] | None = None,
    data_yaml_name: str = "data.yaml",
) -> None:
    """YOLOv5/v7 manifest on top of :func:`dataset_to_darknet`
    (reference ``io/darknet.py:554-700`` yolo_version branches +
    ``dataset.py:4752-4872``): split list files renamed through yolov5
    conventions (valid→val, eval→test) and a ``data.yaml`` whose split
    paths are relative (v5) or absolute (v7)."""
    if split_name_mapping is None:
        split_name_mapping = {} if yolo_version <= 4 else dict(_YOLOV5_SPLIT_OUT)
    dataset_to_darknet(ds, output_dir)
    yaml_data: dict = {"path": ".", "names": None}
    names_path = os.path.join(output_dir, "classes.names")
    yaml_data["names"] = _read_list(names_path)
    if "split" in ds.images.columns:
        splits = [
            r[0]
            for r in ds.images.select("split").distinct().collect()
            if r[0] is not None
        ]
    else:
        splits = []
    for split in sorted(splits):
        mapped = split_name_mapping.get(split, split)
        src = os.path.join(output_dir, f"{split}.txt")
        dst = os.path.join(output_dir, f"{mapped}.txt")
        if src != dst and os.path.exists(src):
            os.replace(src, dst)
        yaml_data[mapped] = (
            os.path.abspath(dst) if yolo_version >= 7 else f"{mapped}.txt"
        )
    if yolo_version <= 4:
        # darknet-classic .data manifest (reference io/darknet.py:104-117)
        with open(os.path.join(output_dir, "train_job.data"), "w") as f:
            for key, val in (
                ("classes", len(yaml_data["names"])),
                ("train", yaml_data.get("train", "")),
                ("valid", yaml_data.get("val", yaml_data.get("valid", ""))),
                ("names", "classes.names"),
                ("backup", "backup/"),
            ):
                f.write(f"{key} = {val}\n")
        return
    import yaml

    with open(os.path.join(output_dir, data_yaml_name), "w") as f:
        yaml.safe_dump(yaml_data, f, sort_keys=False)


def dataset_to_yolov5(ds: SparkDataset, output_dir: str, **kw) -> None:
    """Reference ``dataset.py:4752`` wrapper."""
    dataset_to_yolo(ds, output_dir, yolo_version=5, **kw)


def dataset_to_yolov7(ds: SparkDataset, output_dir: str, **kw) -> None:
    """Reference ``dataset.py:4811`` wrapper — split paths absolute."""
    dataset_to_yolo(ds, output_dir, yolo_version=7, **kw)
