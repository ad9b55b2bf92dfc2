"""Executable docstring examples (reference ``--doctest-modules``
discipline, ``/root/reference/pyproject.toml:95-99`` — e.g.
``dataset.py:100-163`` are executable specs).

The facade's doctests need a live ``spark`` global; this harness runs
them through :func:`doctest.testmod` with the session injected, wired
into the default ``pytest tests/`` run. ``pytest --doctest-modules
lours_spark/dataset/core.py`` also works via the ``doctest_namespace``
fixture in conftest.
"""

from __future__ import annotations

import doctest


def _run_module_doctests(module, spark, min_attempted: int) -> None:
    # passing globs REPLACES the module namespace, so rebuild it with
    # the session added (examples use module names like the reference's)
    results = doctest.testmod(
        module,
        globs=dict(vars(module), spark=spark),
        optionflags=doctest.NORMALIZE_WHITESPACE,
        verbose=False,
    )
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"
    # guard against the examples silently not being collected
    assert results.attempted >= min_attempted, (
        f"only {results.attempted} doctest examples collected from "
        f"{module.__name__}, expected >= {min_attempted}"
    )


def test_core_facade_doctests(spark):
    import lours_spark.dataset.core as core

    _run_module_doctests(core, spark, min_attempted=30)


def test_evaluator_doctests(spark):
    import lours_spark.evaluation.detection_evaluator as de

    _run_module_doctests(de, spark, min_attempted=4)


def test_display_doctests(spark):
    import lours_spark.display as display

    _run_module_doctests(display, spark, min_attempted=2)


def test_operator_doctests(spark):
    import lours_spark.operators.dedup as dedup
    import lours_spark.operators.similarity as similarity
    import lours_spark.split.chunks as chunks

    _run_module_doctests(dedup, spark, min_attempted=5)
    _run_module_doctests(similarity, spark, min_attempted=3)
    _run_module_doctests(chunks, spark, min_attempted=4)


def test_function_module_doctests(spark):
    import lours_spark.functions.bbox as bbox
    import lours_spark.functions.geometry as geometry
    import lours_spark.functions.text as text
    import lours_spark.io.common as io_common
    import lours_spark.split.splitter as splitter

    _run_module_doctests(text, spark, min_attempted=8)
    _run_module_doctests(geometry, spark, min_attempted=2)
    _run_module_doctests(bbox, spark, min_attempted=2)
    _run_module_doctests(splitter, spark, min_attempted=3)
    _run_module_doctests(io_common, spark, min_attempted=3)


def test_window_and_pivot_operator_doctests(spark):
    import lours_spark.operators.booleanize as booleanize
    import lours_spark.operators.windows as windows

    _run_module_doctests(booleanize, spark, min_attempted=6)
    _run_module_doctests(windows, spark, min_attempted=2)


def test_grouper_doctests(spark):
    import lours_spark.operators.grouper as grouper

    _run_module_doctests(grouper, spark, min_attempted=4)
