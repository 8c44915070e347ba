import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphula_spark.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slowtail: long-tail coverage (redundant parametrizations, "
        "scale sweeps, exhaustive corpora) skipped by default so the "
        "default `pytest tests/` run fits the driver's verify window "
        "(VERDICT r14 #3). Set SPARK_GRAFT_FULL_TESTS=1 to run "
        "everything; every operator keeps at least one default-run "
        "test.",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slowtail (set SPARK_GRAFT_FULL_TESTS=1 for the full run)"
    )
    for item in items:
        if item.get_closest_marker("slowtail"):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    s = get_spark("graphula-tests")
    yield s
