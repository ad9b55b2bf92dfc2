"""User-facing testing utilities.

Re-expresses reference ``lours/utils/testing.py`` (order-insensitive
dataset equality ``:91-172``, frame-intersection equality ``:174-211``)
and the seeded ``dummy_dataset`` generator
(``lours/utils/doc_utils.py:230-748``).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assert_frames_equal(
    a: DataFrame,
    b: DataFrame,
    ignore_columns: list[str] | None = None,
) -> None:
    """Order-insensitive frame equality: same columns (as sets), same
    row multiset (``exceptAll`` both ways empty).

    >>> a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    >>> b = spark.createDataFrame([(2, "y"), (1, "x")], "id long, v string")
    >>> assert_frames_equal(a, b)  # order-insensitive: passes
    >>> assert_frames_equal(a, b.limit(1))
    Traceback (most recent call last):
        ...
    AssertionError: 1 rows only in left, 0 rows only in right
    """
    drop = set(ignore_columns or [])
    ca = sorted(set(a.columns) - drop)
    cb = sorted(set(b.columns) - drop)
    assert ca == cb, f"column mismatch: {ca} != {cb}"
    # backtick-quote: booleanized columns carry dots in their names
    cols = [F.col(f"`{c}`") for c in ca]
    a2, b2 = a.select(*cols), b.select(*cols)
    extra = a2.exceptAll(b2).count()
    missing = b2.exceptAll(a2).count()
    assert extra == 0 and missing == 0, (
        f"{extra} rows only in left, {missing} rows only in right"
    )


def assert_dataset_equal(a, b, ignore_columns: list[str] | None = None) -> None:
    """Order-insensitive SparkDataset equality (reference
    ``assert_dataset_equal`` ``testing.py:91-172``)."""
    assert a.label_map == b.label_map, (
        f"label maps differ: {a.label_map} != {b.label_map}"
    )
    assert_frames_equal(a.images, b.images, ignore_columns)
    assert_frames_equal(a.annotations, b.annotations, ignore_columns)


def assert_frame_intersections_equal(
    a: DataFrame, b: DataFrame, key: str = "id"
) -> None:
    """Rows present in both (by key) must be identical on shared
    columns (reference ``testing.py:174-211``)."""
    shared = sorted((set(a.columns) & set(b.columns)) - {key})
    # backtick-quote like assert_frames_equal: booleanized columns
    # carry dots, which would otherwise parse as struct-field access
    sel = [F.col(f"`{c}`") for c in shared]
    joined = a.select(key, *sel).alias("l").join(
        b.select(key, *sel).alias("r"), key
    )
    diff = None
    for c in shared:
        p = ~F.col(f"l.`{c}`").eqNullSafe(F.col(f"r.`{c}`"))
        diff = p if diff is None else (diff | p)
    n = joined.filter(diff).count() if diff is not None else 0
    assert n == 0, f"{n} intersecting rows differ"


_WORD_POOL = (
    "amber basil cedar dahlia ember fennel ginger hazel iris juniper "
    "kelp laurel maple nutmeg olive poppy quince rowan sage thyme "
    "umber violet willow yarrow zinnia"
).split()


def _attribute_columns(spec, rng: random.Random, n_rows: int, is_list: bool, prefix: str):
    """Reference ``random_attribute_column_type`` subset
    (``doc_utils.py:63-118``): ``int N`` → N columns with random label
    pools; ``Sequence[str]`` → one column per given name;
    ``dict[name → int | Sequence[str]]`` → labels per named column.
    (The reference's per-label probability vectors and Faker-generated
    names are simplified to a fixed word pool + uniform draws —
    documented divergence.) Returns [(column_name, [cell, ...])]."""
    cols: list[tuple[str, list]] = []

    def labels_for(sub) -> list[str]:
        if isinstance(sub, int):
            k = sub if sub >= 2 else rng.randint(2, 6)
            return rng.sample(_WORD_POOL, k)
        return [str(x) for x in sub]

    if isinstance(spec, int):
        named = {f"{prefix}_{i}": rng.randint(2, 6) for i in range(spec)}
    elif isinstance(spec, dict):
        named = dict(spec)
    else:  # sequence of names
        named = {str(name): rng.randint(2, 6) for name in spec}
    for name, sub in named.items():
        pool = labels_for(sub)
        if is_list:
            cells = [
                sorted(x for x in pool if rng.random() < 0.4)
                for _ in range(n_rows)
            ]
        else:
            cells = [rng.choice(pool) for _ in range(n_rows)]
        cols.append((name, cells))
    return cols


def dummy_dataset(
    spark: SparkSession,
    n_imgs: int = 20,
    n_annot: int = 50,
    n_labels: int = 4,
    split_names: None | str | tuple[str, ...] = ("train", "valid", "eval"),
    split_shares: tuple[float, ...] = (0.8, 0.1, 0.1),
    n_list_columns_images=0,
    n_list_columns_annotations=0,
    n_attribute_columns_images=0,
    n_attributes_columns_annotations=0,
    booleanize_mode: str = "none",
    keypoints_share: float = 0.0,
    add_confidence: bool = False,
    generate_real_images: bool = False,
    seed: int = 0,
):
    """Seeded synthetic dataset (reference ``doc_utils.py:230-748``):
    deterministic image sizes/paths, skewed annotations with valid
    boxes, optional zero-size keypoint boxes and confidences, optional
    attribute / list-attribute columns (see
    :func:`_attribute_columns` for the supported spec subset),
    ``booleanize_mode`` in {"none", "all", "random"} one-hot-expanding
    the list columns, and ``generate_real_images`` writing header-valid
    PNG files so file-validation paths can run for real."""
    from lours_spark.dataset.core import SparkDataset

    rng = random.Random(seed)
    if split_names is None:
        splits = []
    elif isinstance(split_names, str):
        splits = [split_names]
    else:
        splits = list(split_names)[: len(split_shares)]
    # renormalize the shares actually used so every image gets a split:
    # zip-truncation otherwise leaves a silent null tail (e.g. a single
    # split name against the default (0.8, 0.1, 0.1) shares dropped
    # ~20% of images into split=None)
    used = list(split_shares[: len(splits)])
    total = sum(used)
    shares = (
        [u / total for u in used]
        if total > 0
        else [1.0 / len(splits)] * len(splits)
    ) if splits else []
    images = []
    for i in range(n_imgs):
        r = rng.random()
        cum, chosen = 0.0, None
        for s, share in zip(splits, shares):
            cum += share
            if r < cum:
                chosen = s
                break
        if chosen is None and splits:  # float cum < 1.0 tail
            chosen = splits[-1]
        ext = ".png" if generate_real_images else ".jpg"
        images.append(
            (
                i,
                rng.randint(64, 2048),
                rng.randint(64, 2048),
                f"images/{seed}_{i}{ext}",
                ext,
                chosen,
            )
        )
    label_map = {i * 3 + 1: f"class_{i}" for i in range(n_labels)}
    cats = list(label_map)
    annotations = []
    for aid in range(n_annot):
        img = rng.randrange(n_imgs)
        w_img, h_img = images[img][1], images[img][2]
        if rng.random() < keypoints_share:
            bw = bh = 0.0
            x = rng.uniform(0, w_img)
            y = rng.uniform(0, h_img)
        else:
            bw = rng.uniform(1, w_img / 2)
            bh = rng.uniform(1, h_img / 2)
            x = rng.uniform(0, w_img - bw)
            y = rng.uniform(0, h_img - bh)
        row = [aid, img, rng.choice(cats), x, y, bw, bh]
        if add_confidence:
            row.append(rng.random())
        annotations.append(tuple(row))
    ann_schema = (
        "id long, image_id long, category_id int, box_x_min double, "
        "box_y_min double, box_width double, box_height double"
        + (", confidence double" if add_confidence else "")
    )
    img_schema = (
        "id long, width int, height int, relative_path string, "
        "type string, split string"
    )
    # attribute / list-attribute columns are drawn AFTER the base rows,
    # so the default (0 columns) reproduces pre-existing seeds exactly
    img_attr = _attribute_columns(
        n_attribute_columns_images, rng, n_imgs, False, "img_attr"
    )
    img_lists = _attribute_columns(
        n_list_columns_images, rng, n_imgs, True, "img_tags"
    )
    ann_attr = _attribute_columns(
        n_attributes_columns_annotations, rng, n_annot, False, "ann_attr"
    )
    ann_lists = _attribute_columns(
        n_list_columns_annotations, rng, n_annot, True, "ann_tags"
    )
    for (name, cells), dtype in [
        *((c, "string") for c in img_attr),
        *((c, "array<string>") for c in img_lists),
    ]:
        images = [(*row, cells[k]) for k, row in enumerate(images)]
        img_schema += f", `{name}` {dtype}"
    for (name, cells), dtype in [
        *((c, "string") for c in ann_attr),
        *((c, "array<string>") for c in ann_lists),
    ]:
        annotations = [(*row, cells[k]) for k, row in enumerate(annotations)]
        ann_schema += f", `{name}` {dtype}"
    images_root = "."
    if generate_real_images:
        import struct
        import tempfile

        images_root = tempfile.mkdtemp(prefix=f"lours_dummy_{seed}_")
        os.makedirs(os.path.join(images_root, "images"), exist_ok=True)
        for row in images:
            w, h, rel = row[1], row[2], row[3]
            payload = (
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", 13)
                + b"IHDR"
                + struct.pack(">II", w, h)
                + b"\x08\x02\x00\x00\x00"
            )
            with open(os.path.join(images_root, rel), "wb") as f:
                f.write(payload)
    images_df = spark.createDataFrame(images, img_schema)
    if not splits:
        images_df = images_df.drop("split")
    annotations_df = spark.createDataFrame(annotations, ann_schema)
    booleanized: dict[str, set[str]] = {}
    list_cols = [name for name, _ in ann_lists]
    if booleanize_mode == "random":
        list_cols = [c for c in list_cols if rng.random() < 0.5]
    if booleanize_mode in ("all", "random") and list_cols:
        from lours_spark.operators.booleanize import booleanize as _bool

        for c in list_cols:
            annotations_df, dom = _bool(annotations_df, c)
            booleanized[c] = set(dom)
    return SparkDataset(
        images=images_df,
        annotations=annotations_df,
        label_map=label_map,
        dataset_name=f"dummy_{seed}",
        images_root=images_root,
        booleanized_columns=booleanized,
    ).denormalize()


class DatasetRegression:
    """Dataset regression harness (reference
    ``lours/utils/regression_testing.py:18-187``, itself modeled on
    pytest-regressions): ``check(dataset)`` dumps the dataset to
    parquet under a per-test directory and compares it against the
    previously recorded dump with :func:`assert_dataset_equal`.

    - first run (or ``force_regen``): records the dump and FAILS with a
      "regenerated" message, pytest-regressions style — a green run
      never silently (re)defines its own baseline;
    - later runs: order-insensitive equality against the recording.

    ``check_images=True`` adds a sha256 checksum column computed
    distributed from the image FILE BYTES (``binaryFile`` source — one
    scan, no driver loop). Divergence from the reference, documented:
    it checksums decoded pixels (``regression_testing.py:83-88``);
    pixel decoding needs the image libs this container lacks, and byte
    identity is the stricter check anyway.
    """

    def __init__(self, datadir: str, test_name: str, force_regen: bool = False):
        self.datadir = datadir
        self.test_name = test_name
        self.force_regen = force_regen

    def check(self, dataset, basename: str | None = None,
              check_images: bool = False) -> None:
        import shutil

        name = basename or self.test_name
        expected = os.path.join(self.datadir, name + ".d")
        if check_images:
            spark = dataset.spark
            # recursive listing + join on the FULL relative path: a
            # basename join fans out on duplicate basenames across
            # subdirs (train/x.png, valid/x.png) and a non-recursive
            # glob never checksums nested files at all
            root = os.path.abspath(dataset.images_root).rstrip("/") + "/"
            files = (
                spark.read.format("binaryFile")
                .option("recursiveFileLookup", "true")
                .load(dataset.images_root)
                .select(
                    F.substring_index(F.col("path"), root, -1).alias(
                        "__relpath"
                    ),
                    F.sha2(F.col("content"), 256).alias("checksum"),
                )
            )
            imgs = dataset.images.withColumn(
                "__relpath", F.col("relative_path")
            )
            dataset = dataset.from_template(
                images=imgs.join(files, "__relpath", "left").drop("__relpath")
            )
        if self.force_regen or not os.path.isdir(expected):
            shutil.rmtree(expected, ignore_errors=True)
            dataset.to_parquet(expected)
            raise AssertionError(
                f"regression dump (re)generated at {expected}; run again "
                "to compare against it"
            )
        from lours_spark.dataset.core import SparkDataset

        recorded = SparkDataset.from_parquet(dataset.spark, expected)
        assert_dataset_equal(dataset, recorded)
