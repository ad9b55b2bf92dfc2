"""Interactive notebook display twin (reference
``utils/notebook_utils.py:1-186``): the Dropdown/ToggleButtons/Stack
widget UI over the four display variants of a dataframe (raw vs
nested-MultiIndex columns × booleanized vs gathered one-hot blocks).

Spark-first split of concerns: everything that decides WHAT to show —
head/tail truncation, the four pandas variants, the default selection —
is pure pandas logic in :func:`display_variants` (testable without a
notebook); the ipywidgets layer is a thin wiring function behind an
import guard (ipywidgets is not a dependency of the engine — absent,
:func:`display_booleanized_dataframe` degrades to displaying the
default variant, so scripts and plain terminals still work).

Two deliberate deviations from the reference, both display-only:

- the reference truncates long frames with ``iloc[:50]`` +
  ``iloc[:-50]`` (``notebook_utils.py:93-96``) — the second slice is
  *all but the last 50 rows*, so "truncation" keeps nearly the whole
  frame and the head twice; this twin implements the evident intent,
  head 50 + tail 50.
- a Spark DataFrame is accepted directly and ONLY a bounded head is
  collected (display is a driver concern; the table itself is never
  materialized).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd

from lours_spark.display import nested_multi_index

#: Reference ``utils/__init__.py:9-10``: module-level display defaults
#: (False → the widgets open on the raw / booleanized variants).
DISPLAY_NESTED_COLUMNS = False
DISPLAY_UNBOOLEANIZED = False

#: CSS for the nested-MultiIndex variants (reference
#: ``notebook_utils.py:100-105``): dim vertical header borders to keep
#: track of the tree structure.
_NESTED_TABLE_STYLES = [
    {"selector": "th", "props": "border-right: 1px solid #F0F0F0"}
]


def is_notebook() -> bool:
    """True when running under a Jupyter kernel (reference
    ``notebook_utils.py:22``: ``get_ipython()`` is a
    ``ZMQInteractiveShell``). Guarded: False wherever IPython is not
    importable or no kernel is active."""
    try:
        from IPython.core.getipython import get_ipython
        from ipykernel.zmqshell import ZMQInteractiveShell
    except ImportError:
        return False
    return isinstance(get_ipython(), ZMQInteractiveShell)


def gather_onehot(
    pdf: pd.DataFrame, prefix: str, separator: str = "."
) -> pd.DataFrame:
    """Pandas twin of ``operators.booleanize.debooleanize`` for
    display heads: gather ``prefix<separator>value`` bool columns into
    one ``prefix`` column holding the SORTED list of true values,
    appended like the Spark operator's ``withColumn`` (parity pinned by
    test_display_widgets). Missing prefix → unchanged frame.

    >>> pdf = pd.DataFrame({"id": [1, 2], "tags.a": [True, False],
    ...                     "tags.b": [True, True]})
    >>> gather_onehot(pdf, "tags")
       id    tags
    0   1  [a, b]
    1   2     [b]
    """
    marker = prefix + separator
    block = sorted(
        c
        for c in pdf.columns
        if str(c).startswith(marker) and pdf[c].dtype == bool
    )
    if not block:
        return pdf
    values = [str(c)[len(marker):] for c in block]
    gathered = pdf[block].apply(
        lambda row: sorted(v for v, flag in zip(values, row) if bool(flag)),
        axis=1,
    )
    # like the Spark operator: gathered column lands at the END
    # (withColumn appends), the one-hot block drops
    out = pdf.drop(columns=block)
    out[prefix] = gathered
    return out


DISPLAY_MAX_ROWS = 100
"""Shared display bound: every display entry point truncates past this
many rows (head+tail split), and Spark inputs collect a bounded
``limit(DISPLAY_MAX_ROWS + 1)`` head — never the table. One constant so
the collect bound and the truncation bound cannot drift (ADVICE r7)."""


def truncate_for_display(
    pdf: pd.DataFrame, max_rows: int = DISPLAY_MAX_ROWS
) -> pd.DataFrame:
    """Head 50 + tail 50 for frames past ``max_rows`` (the reference's
    evident intent at ``notebook_utils.py:93-96``; see module
    docstring for its ``iloc[:-50]`` slip).

    >>> list(truncate_for_display(pd.DataFrame({"x": range(7)}),
    ...                           max_rows=4)["x"])
    [0, 1, 5, 6]
    """
    if len(pdf) <= max_rows:
        return pdf.copy()
    head, tail = (max_rows + 1) // 2, max_rows // 2
    # explicit end-relative slice: iloc[-0:] would be the WHOLE frame,
    # so odd/tiny max_rows take the extra row from the head
    return pd.concat(
        [pdf.iloc[:head], pdf.iloc[len(pdf) - tail:] if tail else pdf.iloc[0:0]]
    )


def display_variants(
    input_df,
    booleanized_columns: Iterable[str] = (),
    separator: str = ".",
    max_rows: int = DISPLAY_MAX_ROWS,
) -> dict[str, object]:
    """The four display variants the widget UI stacks (reference
    ``notebook_utils.py:107-136``): ``raw``, ``nested`` (MultiIndex
    columns, styled), and — when ``booleanized_columns`` is non-empty —
    ``debool_raw`` / ``debool_nested``. Accepts a pandas frame or a
    Spark DataFrame (a bounded ``limit(max_rows + 1)`` head is
    collected, never the table).

    Returns an empty dict when there is nothing to format (no dotted
    column names): the caller should display the frame as-is
    (reference ``notebook_utils.py:86-90``).
    """
    if not isinstance(input_df, pd.DataFrame):
        input_df = input_df.limit(max_rows + 1).toPandas()
    booleanized_columns = list(booleanized_columns)
    if not any(separator in str(name) for name in input_df.columns):
        return {}
    short = truncate_for_display(input_df, max_rows)

    def nested(pdf: pd.DataFrame):
        styled = pdf.copy()
        styled.columns = nested_multi_index(styled.columns, separator)
        return styled.style.set_table_styles(list(_NESTED_TABLE_STYLES))

    variants: dict[str, object] = {"raw": short, "nested": nested(short)}
    if booleanized_columns:
        debool = short
        for prefix in booleanized_columns:
            debool = gather_onehot(debool, prefix, separator)
        variants["debool_raw"] = debool
        variants["debool_nested"] = nested(debool)
    return variants


def build_widget_ui(variants: dict[str, object]):
    """Wire the reference's widget tree (``notebook_utils.py:137-186``)
    over prepared variants: a ``Dropdown`` (raw/nested) jslinked to
    per-boolean-state ``Stack``s, plus — when debooleanized variants
    exist — a ``ToggleButtons`` yes/no jslinked to the outer Stack
    (the reference uses ToggleButtons because jslink cannot bind a
    Checkbox bool to a Stack index, ipywidgets#1109). Raises
    ImportError when ipywidgets is absent — callers that want graceful
    degradation go through :func:`display_booleanized_dataframe`."""
    from IPython.display import display
    from ipywidgets import (
        Dropdown,
        HBox,
        Label,
        Layout,
        Output,
        Stack,
        ToggleButtons,
        VBox,
        jslink,
    )

    outputs: dict[str, object] = {}
    for name, frame in variants.items():
        out = Output()
        with out:
            display(frame)
        outputs[name] = out

    column_format_select = Dropdown(
        options=["raw", "nested"],
        value="nested" if DISPLAY_NESTED_COLUMNS else "raw",
    )
    if "debool_raw" in variants:
        bool_stack = Stack([outputs["raw"], outputs["nested"]])
        jslink((column_format_select, "index"), (bool_stack, "selected_index"))
        unbool_stack = Stack([outputs["debool_raw"], outputs["debool_nested"]])
        jslink((column_format_select, "index"), (unbool_stack, "selected_index"))
        bool_toggle = ToggleButtons(
            options=["yes ", "no "],
            icons=["check", "times"],
            layout=Layout(width="auto"),
            style={"button_width": "auto"},
            value="no " if DISPLAY_UNBOOLEANIZED else "yes ",
        )
        selector = HBox(
            [
                VBox([Label("Booleanize"), Label("Column format")]),
                VBox([bool_toggle, column_format_select]),
            ]
        )
        stack = Stack([bool_stack, unbool_stack])
        jslink((bool_toggle, "index"), (stack, "selected_index"))
    else:
        selector = HBox([Label("Column format"), column_format_select])
        stack = Stack([outputs["raw"], outputs["nested"]])
        jslink((column_format_select, "index"), (stack, "selected_index"))
    return VBox([selector, stack])


def _plain_display(frame) -> None:
    """Display without widgets: IPython's display in a notebook/rich
    frontend, plain print otherwise."""
    try:
        from IPython.display import display
    except ImportError:
        print(frame)
        return
    display(frame)


def display_booleanized_dataframe(
    input_df,
    booleanized_columns: Sequence[str] = (),
    separator: str = ".",
    max_rows: int = DISPLAY_MAX_ROWS,
) -> None:
    """Reference ``display_booleanized_dataframe``
    (``notebook_utils.py:58-186``): show a dataframe with an
    interactive raw/nested × booleanized/gathered selector. Accepts a
    pandas frame or a Spark DataFrame (bounded head collect only).
    Degrades without ipywidgets: the default variant (per the
    ``DISPLAY_*`` module flags) is displayed directly.

    For Spark inputs the view past ``max_rows`` is head+tail OF A
    BOUNDED ``limit(max_rows + 1)`` HEAD — the "tail" rows are the tail
    of that head, not of the dataset (collecting a true tail would scan
    the table; sort and ``limit`` upstream if the real extremes
    matter)."""
    if not isinstance(input_df, pd.DataFrame):
        # collect the bounded head ONCE; the nothing-to-format fallback
        # below reuses it instead of running a second Spark job. Same
        # max_rows flows to display_variants/truncate_for_display so
        # the collect bound and the truncation bound cannot drift.
        input_df = input_df.limit(max_rows + 1).toPandas()
    variants = display_variants(
        input_df, booleanized_columns, separator, max_rows=max_rows
    )
    if not variants:
        # nothing to format: show the (possibly truncated) frame as-is
        _plain_display(truncate_for_display(input_df, max_rows))
        return
    try:
        ui = build_widget_ui(variants)
    except ImportError:
        fmt = "nested" if DISPLAY_NESTED_COLUMNS else "raw"
        # DISPLAY_UNBOOLEANIZED=True → open on the gathered (debooleanized)
        # view, mirroring the widget's initial toggle state
        if "debool_raw" in variants and DISPLAY_UNBOOLEANIZED:
            fmt = "debool_" + fmt
        _plain_display(variants[fmt])
        return
    from IPython.display import display

    display(ui)
