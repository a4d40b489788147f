from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_field_spark.session import get_spark  # noqa: E402

# Default to sf0.01 — the SAME scale the driver's CORRECTNESS gate
# runs at. sf0.001 hid a real failure once: float-rounding boundary
# cases (e.g. an exact .495 group average at partkey 809) exist in the
# sf0.01 data but not in the sf0.001 subset, so a passing local suite
# said nothing about the driver run. Set SPARK_GRAFT_TEST_SF_DIR to
# sf0.001 for a quick iteration loop.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("deep_field_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
