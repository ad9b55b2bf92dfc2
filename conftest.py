"""Root conftest: lets ``pytest --doctest-modules lours_spark/...``
run the facade's executable examples (reference ``--doctest-modules``
discipline, ``pyproject.toml:95-99`` there) by injecting a ``spark``
global into the doctest namespace. Only doctest items trigger the
session build; regular tests under tests/ use their own fixture."""

from __future__ import annotations

import pytest


@pytest.fixture(autouse=True)
def _doctest_spark(request):
    if not hasattr(request.node, "dtest"):  # not a doctest item
        yield
        return
    ns = request.getfixturevalue("doctest_namespace")
    from lours_spark.session import get_spark

    s = get_spark("lours-doctests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    ns["spark"] = s
    yield
