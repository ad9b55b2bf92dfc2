"""Property-based tests (hypothesis) for the pure-expression operators."""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lours_spark.functions.bbox import export_bbox, import_bbox

FORMATS = ["xywh", "xyxy", "xxyy", "cxcywh", "cxwcyh", "xwyh"]

boxes = st.tuples(
    st.floats(0, 1000, allow_nan=False),
    st.floats(0, 1000, allow_nan=False),
    st.floats(0.1, 500, allow_nan=False),
    st.floats(0.1, 500, allow_nan=False),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(box=boxes, fmt=st.sampled_from(FORMATS))
def test_bbox_roundtrip_property(spark, box, fmt):
    x, y, w, h = box
    df = spark.createDataFrame(
        [(1, 7, float(x), float(y), float(w), float(h))],
        "id long, image_id long, box_x_min double, box_y_min double, "
        "box_width double, box_height double",
    )
    images = spark.createDataFrame(
        [(7, 2000, 2000)], "id long, width int, height int"
    )
    out = export_bbox(df, fmt, images=images, drop_canonical=True)
    back = import_bbox(out, fmt, images=images)
    row = back.first()
    assert row["box_x_min"] == pytest.approx(x, rel=1e-9, abs=1e-9)
    assert row["box_y_min"] == pytest.approx(y, rel=1e-9, abs=1e-9)
    assert row["box_width"] == pytest.approx(w, rel=1e-9, abs=1e-9)
    assert row["box_height"] == pytest.approx(h, rel=1e-9, abs=1e-9)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), unique=True),
        min_size=1,
        max_size=8,
    ).filter(lambda vs: any(vs))
)
def test_booleanize_roundtrip_property(spark, values):
    from lours_spark.operators.booleanize import booleanize, debooleanize

    rows = [(i, sorted(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, tags array<string>")
    wide, domain = booleanize(df, "tags")
    back = debooleanize(wide, "tags")
    got = {r["id"]: list(r["tags"]) for r in back.collect()}
    assert got == {i: sorted(v) for i, v in rows}
