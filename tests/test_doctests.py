"""Executable docstring examples (reference ``--doctest-modules``
discipline, ``/root/reference/pyproject.toml:95-99`` — e.g.
``dataset.py:100-163`` are executable specs).

The facade's doctests need a live ``spark`` global; this harness walks
EVERY module under ``lours_spark`` and runs its examples through
:func:`doctest.testmod` with the session injected, wired into the
default ``pytest tests/`` run. ``pytest --doctest-modules lours_spark``
also works via the ``doctest_namespace`` fixture in the root conftest.

Per-module minimum example counts guard against examples silently not
being collected (a renamed module or a broken docstring otherwise
passes with 0 attempted).
"""

from __future__ import annotations

import doctest
import importlib
import pkgutil

import pytest

#: modules expected to carry at least this many examples — the
#: collection guard. Modules absent from this map still run (failures
#: count) but may have zero examples.
MIN_EXAMPLES = {
    "lours_spark.dataset.core": 30,
    "lours_spark.dataset.diff": 3,
    "lours_spark.dataset.merge": 2,
    "lours_spark.display": 2,
    "lours_spark.evaluation.confusion": 3,
    "lours_spark.evaluation.crowd": 4,
    "lours_spark.dataset.schema": 1,
    "lours_spark.dataset.validation": 6,
    "lours_spark.evaluation.detection_evaluator": 4,
    "lours_spark.evaluation.evaluator": 5,
    "lours_spark.evaluation.matching": 4,
    "lours_spark.evaluation.pr": 3,
    "lours_spark.functions.bbox": 7,
    "lours_spark.functions.geometry": 2,
    "lours_spark.functions.ids": 3,
    "lours_spark.functions.text": 8,
    "lours_spark.functions.vectors": 6,
    "lours_spark.io.caipy": 8,
    "lours_spark.io.coco": 15,
    "lours_spark.io.common": 3,
    "lours_spark.io.crowdhuman": 8,
    "lours_spark.io.fiftyone": 4,
    "lours_spark.io.folder": 5,
    "lours_spark.io.jsonl": 2,
    "lours_spark.io.compact": 3,
    "lours_spark.io.versioned": 8,
    "lours_spark.io.darknet": 7,
    "lours_spark.io.mot": 7,
    "lours_spark.io.pascalvoc": 4,
    "lours_spark.operators.appender": 8,
    "lours_spark.operators.bloom": 1,
    "lours_spark.operators.booleanize": 6,
    "lours_spark.operators.decontaminate": 3,
    "lours_spark.operators.dedup": 5,
    "lours_spark.operators.grouper": 4,
    "lours_spark.operators.multimodal": 2,
    "lours_spark.operators.ordering": 3,
    "lours_spark.operators.packing": 1,
    "lours_spark.operators.pii": 4,
    "lours_spark.operators.profile": 3,
    "lours_spark.operators.quality": 4,
    "lours_spark.operators.sampling": 4,
    "lours_spark.operators.similarity": 3,
    "lours_spark.operators.skew": 3,
    "lours_spark.operators.temporal": 3,
    "lours_spark.operators.vocab": 2,
    "lours_spark.operators.windows": 12,
    "lours_spark.operators.zorder": 2,
    "lours_spark.dataset.remap_presets": 5,
    "lours_spark.split.balanced": 6,
    "lours_spark.split.chunks": 4,
    "lours_spark.split.splitter": 3,
    "lours_spark.pipeline": 4,
    "lours_spark.session": 3,
    "lours_spark.streaming.caipy_watch": 8,
    "lours_spark.streaming.events": 7,
    "lours_spark.testing": 4,
}

#: total across the package — the discipline guard: deleting examples
#: wholesale fails even if no single module drops below its floor
PACKAGE_MIN = 250


def _walk_modules():
    import lours_spark

    names = ["lours_spark"]
    for mi in pkgutil.walk_packages(lours_spark.__path__, "lours_spark."):
        names.append(mi.name)
    return sorted(names)


def test_package_doctest_sweep(spark):
    total = 0
    failures: list[tuple[str, int]] = []
    thin: list[tuple[str, int, int]] = []
    for name in _walk_modules():
        mod = importlib.import_module(name)
        # passing globs REPLACES the module namespace, so rebuild it
        # with the session added (examples use module-local names)
        r = doctest.testmod(
            mod,
            globs=dict(vars(mod), spark=spark),
            optionflags=doctest.NORMALIZE_WHITESPACE,
            verbose=False,
        )
        total += r.attempted
        if r.failed:
            failures.append((name, r.failed))
        want = MIN_EXAMPLES.get(name, 0)
        if r.attempted < want:
            thin.append((name, r.attempted, want))
    assert not failures, f"doctest failures: {failures}"
    assert not thin, (
        "modules collected fewer examples than their guard "
        f"(name, attempted, expected): {thin}"
    )
    assert total >= PACKAGE_MIN, (
        f"package-wide doctest count dropped to {total} (< {PACKAGE_MIN})"
    )


def test_min_examples_map_covers_real_modules():
    """Every guard entry must name an importable module — a rename
    must move its guard, not silently orphan it."""
    real = set(_walk_modules())
    missing = [m for m in MIN_EXAMPLES if m not in real]
    assert not missing, f"MIN_EXAMPLES names unknown modules: {missing}"


@pytest.mark.parametrize("module", ["lours_spark.operators.grouper"])
def test_doctest_namespace_fixture_path(module, spark):
    """The root-conftest --doctest-modules path must stay alive: run
    one module the way pytest's doctest collector would (namespace
    injection instead of testmod globs)."""
    mod = importlib.import_module(module)
    r = doctest.testmod(
        mod,
        globs=dict(vars(mod), spark=spark),
        optionflags=doctest.NORMALIZE_WHITESPACE,
    )
    assert r.failed == 0
