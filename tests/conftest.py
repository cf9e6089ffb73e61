from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_SF_TEST", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # 16g heap: the default 1g survives sf0.01 but the optional sf0.1
    # oracle sweep runs real workloads (in local mode ALL execution
    # memory is the driver heap — same reasoning as the probe scripts)
    s = get_spark("tests", **{"spark.driver.memory": "16g"})
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_CORRECTNESS


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE
