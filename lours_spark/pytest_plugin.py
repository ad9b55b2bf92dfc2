"""Shippable pytest plugin: the ``dataset_regression`` fixture.

The reference distributes its regression fixture as a pytest entry
point (``pyproject.toml:21-22`` → ``lours.utils.regression_testing``),
so any downstream test suite gets ``dataset_regression`` without
copying conftest code. This module is the Spark twin, registered under
``[project.entry-points.pytest11]`` — an installed ``lours-spark``
exposes the fixture automatically; the in-repo ``tests/conftest.py``
defines the same fixture locally for path-based (non-installed) runs.

Usage in a downstream test::

    def test_my_pipeline(spark, dataset_regression):
        ds = build_dataset(spark)
        dataset_regression.check(ds)   # records on first run /
                                       # --force-regen, diffs after

Recordings are parquet dumps under ``<testdir>/regression_data/``.

>>> callable(pytest_addoption), hasattr(dataset_regression,
...                                     "_pytestfixturefunction")
(True, True)
"""

from __future__ import annotations

import os

import pytest


def pytest_addoption(parser):
    # tolerate double registration: the in-repo conftest adds the same
    # option when the package is ALSO installed in the environment
    try:
        parser.addoption(
            "--force-regen",
            action="store_true",
            default=False,
            help="regenerate dataset_regression recordings",
        )
    except ValueError:
        pass


@pytest.fixture
def dataset_regression(request):
    """Reference-style dataset regression fixture (reference
    ``lours/utils/regression_testing.py:157-187``): recordings live
    under ``<test file's dir>/regression_data/<test_name>.d``."""
    from lours_spark.testing import DatasetRegression

    datadir = os.path.join(
        os.path.dirname(str(request.node.fspath)), "regression_data"
    )
    os.makedirs(datadir, exist_ok=True)
    return DatasetRegression(
        datadir,
        request.node.name,
        force_regen=request.config.getoption("--force-regen"),
    )
