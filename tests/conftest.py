from __future__ import annotations

import datetime as dt

import pytest

from healthcare_data_lakehouse_using_gcp_spark.config import EngineConfig
from healthcare_data_lakehouse_using_gcp_spark.session import get_spark

# frozen "now" for deterministic lookback predicates (SURVEY.md §7 risk 2)
AS_OF = dt.datetime(2024, 6, 1, 12, 0, 0)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def cfg():
    return EngineConfig(as_of=AS_OF)
