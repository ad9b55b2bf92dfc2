"""Bounding-box format system as Catalyst column-expression builders.

Re-expresses the reference's 12-format bbox converter
(reference ``lours/utils/bbox_converter.py:19-138``: format strings over
tokens {corner x/y, center cx/cy, size w/h, max x/y} × {relative
lowercase, absolute UPPERCASE}; canonical internal format = ``XYWH``
absolute pixels, ``lours/utils/__init__.py:9-12``).

Everything here is pure column arithmetic — whole-stage-codegen'd on the
JVM, zero Python in the hot path. Relative formats need the image
width/height, obtained via an equi-join on ``image_id`` (broadcast when
the image table is small — reference ``bbox_converter.py:279-295``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: canonical output column names (XYWH absolute)
CANONICAL = ["box_x_min", "box_y_min", "box_width", "box_height"]

#: token → generated column name for non-canonical formats
TOKEN_COLUMN_NAMES = {
    "x_min": "box_x_min",
    "y_min": "box_y_min",
    "x_max": "box_x_max",
    "y_max": "box_y_max",
    "x_center": "box_x_center",
    "y_center": "box_y_center",
    "width": "box_width",
    "height": "box_height",
}

_KNOWN_FORMATS = {"xywh", "xyxy", "xxyy", "cxcywh", "cxwcyh", "xwyh"}


@dataclass(frozen=True)
class BboxFormat:
    tokens: tuple[str, ...]  # semantic tokens in column order
    relative: bool

    @property
    def column_names(self) -> list[str]:
        return [TOKEN_COLUMN_NAMES[t] for t in self.tokens]


def parse_bbox_format(fmt: str) -> BboxFormat:
    """Parse a format string like ``cxcywh`` / ``XYWH`` / ``xxyy``.

    Lowercase = relative [0,1] coordinates, uppercase = absolute pixels
    (reference ``bbox_converter.py:36-76``). Token meanings:
    first ``x``/``y`` = min corner, second = max corner, ``cx``/``cy`` =
    center, ``w``/``h`` = size.
    """
    relative = fmt == fmt.lower()
    low = fmt.lower()
    if low not in _KNOWN_FORMATS:
        raise ValueError(
            f"unknown bbox format {fmt!r}; expected one of "
            f"{sorted(_KNOWN_FORMATS)} (lower=relative or UPPER=absolute)"
        )
    tokens: list[str] = []
    seen_x = seen_y = False
    i = 0
    while i < len(low):
        ch = low[i]
        if ch == "c":
            axis = low[i + 1]
            tokens.append(f"{axis}_center")
            i += 2
        elif ch == "x":
            tokens.append("x_max" if seen_x else "x_min")
            seen_x = True
            i += 1
        elif ch == "y":
            tokens.append("y_max" if seen_y else "y_min")
            seen_y = True
            i += 1
        elif ch == "w":
            tokens.append("width")
            i += 1
        elif ch == "h":
            tokens.append("height")
            i += 1
        else:  # pragma: no cover - guarded by _KNOWN_FORMATS
            raise ValueError(f"bad token {ch!r} in {fmt!r}")
    return BboxFormat(tokens=tuple(tokens), relative=relative)


def _canonical_exprs(
    fmt: BboxFormat, cols: dict[str, Column], width: Column, height: Column
) -> dict[str, Column]:
    """Map any format's columns to canonical XYWH absolute expressions
    (the arithmetic of reference ``bbox_converter.py:279-305``)."""
    c = dict(cols)
    if fmt.relative:
        for t in list(c):
            scale = width if t.startswith("x") or t == "width" else height
            c[t] = c[t] * scale
    # x dimension
    if "x_min" in c and "width" in c:
        x_min, w = c["x_min"], c["width"]
    elif "x_min" in c and "x_max" in c:
        x_min, w = c["x_min"], c["x_max"] - c["x_min"]
    elif "x_center" in c and "width" in c:
        x_min, w = c["x_center"] - c["width"] / 2, c["width"]
    else:  # pragma: no cover
        raise ValueError(f"cannot derive x from tokens {fmt.tokens}")
    if "y_min" in c and "height" in c:
        y_min, h = c["y_min"], c["height"]
    elif "y_min" in c and "y_max" in c:
        y_min, h = c["y_min"], c["y_max"] - c["y_min"]
    elif "y_center" in c and "height" in c:
        y_min, h = c["y_center"] - c["height"] / 2, c["height"]
    else:  # pragma: no cover
        raise ValueError(f"cannot derive y from tokens {fmt.tokens}")
    return {
        "box_x_min": x_min,
        "box_y_min": y_min,
        "box_width": w,
        "box_height": h,
    }


def _export_exprs(
    fmt: BboxFormat, width: Column, height: Column
) -> dict[str, Column]:
    """Canonical columns → target-format expressions (inverse arithmetic,
    reference ``bbox_converter.py:315-445``)."""
    x, y = F.col("box_x_min"), F.col("box_y_min")
    w, h = F.col("box_width"), F.col("box_height")
    values = {
        "x_min": x,
        "y_min": y,
        "width": w,
        "height": h,
        "x_max": x + w,
        "y_max": y + h,
        "x_center": x + w / 2,
        "y_center": y + h / 2,
    }
    out: dict[str, Column] = {}
    for t in fmt.tokens:
        expr = values[t]
        if fmt.relative:
            scale = width if t.startswith("x") or t == "width" else height
            expr = expr / scale
        out[TOKEN_COLUMN_NAMES[t]] = expr
    return out


def _with_image_size(
    annotations: DataFrame, images: DataFrame | None
) -> tuple[DataFrame, Column, Column, list[str]]:
    """Attach image width/height when needed for relative formats
    (reference's image-size lookup join ``bbox_converter.py:279-295``).
    Broadcast-eligible: the planner picks BHJ when images fit."""
    if "width" in annotations.columns and "height" in annotations.columns:
        return annotations, F.col("width"), F.col("height"), []
    if images is None:
        raise ValueError("relative bbox format needs the image table for sizes")
    sizes = images.select(
        F.col("id").alias("image_id"),
        F.col("width").alias("__img_w"),
        F.col("height").alias("__img_h"),
    )
    joined = annotations.join(sizes, "image_id", "left")
    return joined, F.col("__img_w"), F.col("__img_h"), ["__img_w", "__img_h"]


def import_bbox(
    annotations: DataFrame,
    input_format: str,
    input_columns: list[str] | None = None,
    images: DataFrame | None = None,
    drop_input: bool = True,
) -> DataFrame:
    """Convert bbox columns in ``input_format`` to canonical XYWH
    absolute (reference ``bbox_converter.py:141-312``).

    >>> df = spark.createDataFrame([(10.0, 10.0, 4.0, 2.0)],
    ...                            "cx double, cy double, w double, h double")
    >>> r = import_bbox(df, "CXCYWH", ["cx", "cy", "w", "h"]).first()
    >>> (r["box_x_min"], r["box_y_min"], r["box_width"], r["box_height"])
    (8.0, 9.0, 4.0, 2.0)
    """
    fmt = parse_bbox_format(input_format)
    input_columns = input_columns or fmt.column_names
    if len(input_columns) != 4:
        raise ValueError("bbox needs exactly 4 input columns")
    df = annotations
    tmp: list[str] = []
    if fmt.relative:
        df, w_col, h_col, tmp = _with_image_size(df, images)
    else:
        w_col = h_col = F.lit(None)
    cols = {t: F.col(c).cast("double") for t, c in zip(fmt.tokens, input_columns)}
    exprs = _canonical_exprs(fmt, cols, w_col, h_col)
    # compute into temp names FIRST: an output may shadow an input column
    # (e.g. xyxy's box_x_min) and sequential withColumn would corrupt
    # later expressions that still reference the original
    df = df.select("*", *[exprs[n].alias(f"__tmp_{n}") for n in CANONICAL])
    df = df.drop(*[c for c in CANONICAL if c in df.columns and not c.startswith("__tmp_")])
    for n in CANONICAL:
        df = df.withColumnRenamed(f"__tmp_{n}", n)
    drops = list(tmp)
    if drop_input:
        drops += [c for c in input_columns if c not in CANONICAL]
    return df.drop(*drops) if drops else df


def export_bbox(
    annotations: DataFrame,
    output_format: str,
    output_columns: list[str] | None = None,
    images: DataFrame | None = None,
    drop_canonical: bool = False,
) -> DataFrame:
    """Convert canonical XYWH columns to ``output_format`` (reference
    ``bbox_converter.py:315-445``).

    >>> df = spark.createDataFrame([(8.0, 9.0, 4.0, 2.0)],
    ...     "box_x_min double, box_y_min double,"
    ...     " box_width double, box_height double")
    >>> r = export_bbox(df, "XYXY", ["x1", "y1", "x2", "y2"]).first()
    >>> (r["x1"], r["y1"], r["x2"], r["y2"])
    (8.0, 9.0, 12.0, 11.0)
    """
    fmt = parse_bbox_format(output_format)
    output_columns = output_columns or fmt.column_names
    df = annotations
    tmp: list[str] = []
    if fmt.relative:
        df, w_col, h_col, tmp = _with_image_size(df, images)
    else:
        w_col = h_col = F.lit(None)
    exprs = _export_exprs(fmt, w_col, h_col)
    # temp-name staging for the same shadowing reason as import_bbox
    ordered = [exprs[TOKEN_COLUMN_NAMES[t]] for t in fmt.tokens]
    df = df.select(
        "*",
        *[e.alias(f"__tmp_{i}") for i, e in enumerate(ordered)],
    )
    df = df.drop(*[c for c in output_columns if c in df.columns])
    if drop_canonical:
        df = df.drop(*[c for c in CANONICAL if c not in output_columns and c in df.columns])
    for i, out_name in enumerate(output_columns):
        df = df.withColumnRenamed(f"__tmp_{i}", out_name)
    drops = list(tmp)
    return df.drop(*drops) if drops else df


def convert_bbox(
    annotations: DataFrame,
    input_format: str,
    output_format: str,
    input_columns: list[str] | None = None,
    output_columns: list[str] | None = None,
    images: DataFrame | None = None,
) -> DataFrame:
    """import ∘ export composition (reference ``bbox_converter.py:448``).

    >>> df = spark.createDataFrame([(10.0, 10.0, 4.0, 2.0)],
    ...                            "cx double, cy double, w double, h double")
    >>> r = convert_bbox(df, "CXCYWH", "XYXY",
    ...                  ["cx", "cy", "w", "h"], ["x1", "y1", "x2", "y2"]).first()
    >>> (r["x1"], r["y1"], r["x2"], r["y2"])
    (8.0, 9.0, 12.0, 11.0)
    """
    df = import_bbox(
        annotations, input_format, input_columns, images=images, drop_input=True
    )
    return export_bbox(
        df, output_format, output_columns, images=images, drop_canonical=True
    )
