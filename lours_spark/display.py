"""Notebook/display utilities (reference ``utils/dataframe_formatter.py``
and ``utils/notebook_utils.py``), re-expressed Spark-first.

The reference's display layer does three things: reorder columns so
required fields lead and nested (dot-separated) attributes trail
(``dataframe_formatter.py:7-34``), render nested column names as a
pandas MultiIndex for readable HTML (``notebook_utils.py:25-56``), and
debooleanize one-hot blocks before display
(``notebook_utils.py:58-130``). Here the reorder is a narrow Spark
``select`` (safe at any scale); the pandas/HTML steps apply to a
driver-side HEAD of the table only — display is inherently a driver
concern, so ``n`` rows are collected, never the table. The ipywidgets
interactivity of the reference is out of scope (pure cosmetics); the
formatted frames these helpers return are what those widgets render.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def reorder_columns(
    df: DataFrame, first_columns: Sequence[str], separator: str = "."
) -> DataFrame:
    """Put ``first_columns`` (in given order) first, then the remaining
    columns alphabetically with nested (separator-containing) names
    last — reference ``dataframe_formatter.reorder_columns``
    (``dataframe_formatter.py:7-34``). A pure projection: no shuffle,
    no scan-width change.

    >>> sdf = spark.createDataFrame([(1, 2, 3, 4)], ["b", "tags.x", "id", "a"])
    >>> reorder_columns(sdf, ["id"]).columns
    ['id', 'a', 'b', 'tags.x']
    """
    present_first = [c for c in first_columns if c in df.columns]
    rest = sorted(
        (c for c in df.columns if c not in set(present_first)),
        key=lambda name: (name.count(separator), name),
    )
    return df.select(*[df[f"`{c}`"] for c in [*present_first, *rest]])


def nested_multi_index(
    columns: Sequence[str], separator: str = "."
) -> pd.MultiIndex:
    """Column names with separators → a display MultiIndex (reference
    ``notebook_utils.convert_columns_to_nested_multi_index``,
    ``notebook_utils.py:25-56``); names without a separator pad with
    blanks above level 0."""
    split = [str(name).split(separator) for name in columns]
    depth = max((len(parts) for parts in split), default=1)
    return pd.MultiIndex.from_tuples(
        [tuple(parts + [""] * (depth - len(parts))) for parts in split]
    )


def head_for_display(
    df: DataFrame,
    n: int = 20,
    booleanized_columns: Sequence[str] = (),
    separator: str = ".",
    nest_columns: bool = True,
) -> pd.DataFrame:
    """Driver-side display head: collect ``n`` rows, gather one-hot
    blocks back into list columns, and render nested names as a
    MultiIndex (reference ``display_booleanized_dataframe``,
    ``notebook_utils.py:58-130`` — minus the ipywidgets chrome).
    Collects ``n`` rows ONLY; the table itself is never materialized."""
    shown = df
    for prefix in booleanized_columns:
        from lours_spark.operators.booleanize import debooleanize

        try:
            shown = debooleanize(shown, prefix)
        except (ValueError, TypeError):
            pass  # prefix absent in this projection
    pdf = shown.limit(n).toPandas()
    if nest_columns and any(separator in str(c) for c in pdf.columns):
        pdf.columns = nested_multi_index(pdf.columns, separator)
    return pdf


def display_confusion_matrix(confusion_matrix: pd.DataFrame, title: str = ""):
    """Render a confusion matrix as a matplotlib
    ``ConfusionMatrixDisplay`` — reference
    ``evaluation/detection/util.py:391-441``, including its font-size
    heuristic (cell text shrinks as label count / longest label grows).
    The input is the small (labels × labels) pandas frame that
    ``confusion_matrix``'s normalized pivot collects — display is a
    driver concern, nothing distributed happens here. Raises
    ``ImportError`` when the plotting extras are absent, exactly like
    the reference's ``plot-utils`` extra."""
    try:
        import matplotlib.pyplot as plt
        from sklearn.metrics import ConfusionMatrixDisplay
    except ImportError as e:
        raise ImportError(
            "Plotting libraries could not be loaded, make sure matplotlib"
            " and scikit-learn are installed (the reference's 'plot-utils'"
            " extra)"
        ) from e

    display_labels = [str(c) for c in confusion_matrix.columns]
    text_kw = {}
    n_labels = len(display_labels) + max(map(len, display_labels), default=0) / 3
    if n_labels > 15:
        text_kw["fontsize"] = "xx-small"
    elif n_labels > 11:
        text_kw["fontsize"] = "x-small"
    elif n_labels > 9:
        text_kw["fontsize"] = "small"

    plot = ConfusionMatrixDisplay(
        confusion_matrix.values.round(2), display_labels=display_labels
    )
    fig, ax = plt.subplots(figsize=(10, 10))
    plot.plot(
        ax=ax, xticks_rotation="vertical", colorbar=False, text_kw=text_kw
    )
    ax.set_title(title)
    return plot


def show_dataset(ds, n: int = 20, separator: str = ".") -> dict[str, pd.DataFrame]:
    """Formatted display heads for a :class:`SparkDataset` — images and
    annotations with required columns first (the constructor-invariant
    order of the reference, ``dataset.py:958-969``), booleanized
    blocks gathered, nested names as MultiIndex. Returns the two
    pandas frames; in a notebook, display them directly."""
    from lours_spark.dataset.schema import BBOX_COLUMN_NAMES

    img = reorder_columns(
        ds.images,
        ["id", "width", "height", "relative_path", "type", "split"],
        separator,
    )
    ann = reorder_columns(
        ds.annotations,
        ["id", "image_id", "category_id", *BBOX_COLUMN_NAMES,
         "category_str", "split"],
        separator,
    )
    # both tables get the gather pass: a prefix only debooleanizes on
    # the table that actually carries its bool columns (image-side
    # enums exist since schema-driven caipy reads), and
    # head_for_display skips absent prefixes
    return {
        "images": head_for_display(
            img, n, sorted(ds.booleanized_columns), separator
        ),
        "annotations": head_for_display(
            ann, n, sorted(ds.booleanized_columns), separator
        ),
    }
