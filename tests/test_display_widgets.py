"""lours_spark.display_widgets — the interactive notebook display twin
(reference notebook_utils.py): pure variant construction, pandas↔Spark
debooleanize parity, widget wiring against a stubbed ipywidgets, and
graceful degradation when ipywidgets is absent."""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest

from lours_spark import display_widgets as dw


def _bool_pdf(n: int = 4) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id": range(n),
            "tags.a": [True, False, True, False][:n],
            "tags.b": [False, False, True, True][:n],
            "attrs.color": ["r", "g", "b", "r"][:n],
        }
    )


def test_gather_onehot_matches_spark_debooleanize(spark):
    from lours_spark.operators.booleanize import debooleanize

    pdf = _bool_pdf()
    got = dw.gather_onehot(pdf, "tags")
    sdf = debooleanize(spark.createDataFrame(pdf), "tags").toPandas()
    assert list(got.columns) == list(sdf.columns)
    assert [list(v) for v in got["tags"]] == [list(v) for v in sdf["tags"]]
    # non-bool dotted columns (nested attrs) are NOT gathered
    assert "attrs.color" in got.columns


def test_gather_onehot_missing_prefix_is_noop():
    pdf = _bool_pdf()
    out = dw.gather_onehot(pdf, "nope")
    pd.testing.assert_frame_equal(out, pdf)


def test_truncate_head_plus_tail():
    pdf = pd.DataFrame({"x": range(1000)})
    short = dw.truncate_for_display(pdf, max_rows=100)
    # the reference's iloc[:-50] slip would keep 1000 rows here; the
    # intent (and this twin) keeps head 50 + tail 50
    assert len(short) == 100
    assert list(short["x"][:3]) == [0, 1, 2]
    assert list(short["x"][-3:]) == [997, 998, 999]
    small = dw.truncate_for_display(pdf.head(30), max_rows=100)
    assert len(small) == 30


def test_variants_nothing_to_format():
    pdf = pd.DataFrame({"id": [1], "name": ["x"]})
    assert dw.display_variants(pdf) == {}


def test_variants_shapes_and_styles():
    variants = dw.display_variants(_bool_pdf(), ["tags"])
    assert set(variants) == {"raw", "nested", "debool_raw", "debool_nested"}
    assert isinstance(variants["raw"], pd.DataFrame)
    assert isinstance(variants["nested"].columns, pd.MultiIndex)
    assert "tags" in variants["debool_raw"].columns
    assert "tags.a" not in variants["debool_raw"].columns
    # without booleanized prefixes only the two column-format variants
    assert set(dw.display_variants(_bool_pdf())) == {"raw", "nested"}


def test_variants_from_spark_collect_bounded(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"id": range(500), "tags.a": [True] * 500})
    )
    variants = dw.display_variants(sdf, ["tags"], max_rows=10)
    # a bounded head (max_rows+1 → truncated to max_rows) — never 500
    assert len(variants["raw"]) <= 11


class _FakeWidget:
    """Minimal stand-in recording constructor args; `with` context and
    attribute access mimic the ipywidgets surface build_widget_ui uses."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.children = args[0] if args else []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _install_fake_ipywidgets(monkeypatch):
    links: list[tuple] = []
    fake = types.ModuleType("ipywidgets")
    for name in (
        "Dropdown",
        "HBox",
        "Label",
        "Layout",
        "Output",
        "Stack",
        "ToggleButtons",
        "VBox",
    ):
        setattr(fake, name, type(name, (_FakeWidget,), {}))
    fake.jslink = lambda a, b: links.append((a, b))
    monkeypatch.setitem(sys.modules, "ipywidgets", fake)

    fake_ipd = types.ModuleType("IPython.display")
    shown: list = []
    fake_ipd.display = shown.append
    fake_ipy = types.ModuleType("IPython")
    fake_ipy.display = fake_ipd
    monkeypatch.setitem(sys.modules, "IPython", fake_ipy)
    monkeypatch.setitem(sys.modules, "IPython.display", fake_ipd)
    return fake, links, shown


def test_widget_wiring_with_bool_block(monkeypatch):
    fake, links, shown = _install_fake_ipywidgets(monkeypatch)
    variants = dw.display_variants(_bool_pdf(), ["tags"])
    ui = dw.build_widget_ui(variants)
    # reference wiring: dropdown→bool_stack, dropdown→unbool_stack,
    # toggle→outer stack = 3 jslinks; each link binds an index pair
    assert len(links) == 3
    assert all(a[1] == "index" and b[1] == "selected_index" for a, b in links)
    assert type(ui).__name__ == "VBox"
    selector, stack = ui.children
    assert type(selector).__name__ == "HBox"
    assert type(stack).__name__ == "Stack"
    # outer stack has the two inner stacks (bool, unbool)
    assert [type(c).__name__ for c in stack.children] == ["Stack", "Stack"]
    # defaults follow the module flags (False/False → raw + booleanize yes)
    toggle = links[2][0][0]
    assert toggle.kwargs["value"] == "yes "


def test_widget_wiring_without_bool_block(monkeypatch):
    fake, links, shown = _install_fake_ipywidgets(monkeypatch)
    variants = dw.display_variants(_bool_pdf())
    ui = dw.build_widget_ui(variants)
    # one dropdown→stack link only
    assert len(links) == 1
    selector, stack = ui.children
    assert [type(c).__name__ for c in stack.children] == ["Output", "Output"]


def test_display_degrades_without_ipywidgets(monkeypatch, capsys):
    # make the import guard fire even if ipywidgets were installed
    monkeypatch.setitem(sys.modules, "ipywidgets", None)
    monkeypatch.setitem(sys.modules, "IPython", None)
    monkeypatch.setitem(sys.modules, "IPython.display", None)
    dw.display_booleanized_dataframe(_bool_pdf(), ["tags"])
    out = capsys.readouterr().out
    # default flags: booleanized raw view — one-hot columns printed as-is
    assert "tags.a" in out

    monkeypatch.setattr(dw, "DISPLAY_UNBOOLEANIZED", True)
    dw.display_booleanized_dataframe(_bool_pdf(), ["tags"])
    out2 = capsys.readouterr().out
    assert "tags.a" not in out2  # gathered view


def test_display_nothing_to_format_prints_frame(monkeypatch, capsys):
    monkeypatch.setitem(sys.modules, "IPython", None)
    monkeypatch.setitem(sys.modules, "IPython.display", None)
    dw.display_booleanized_dataframe(pd.DataFrame({"id": [1, 2]}))
    assert "id" in capsys.readouterr().out


def test_is_notebook_false_outside_kernel():
    assert dw.is_notebook() is False
