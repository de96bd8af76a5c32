from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from data_lake_construction_and_querying_with_pyspark_spark import get_spark

    s = get_spark(app_name="lake_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def people_dir(tmp_path_factory):
    from tests.fixtures_people import write_people_fixture

    d = tmp_path_factory.mktemp("people")
    write_people_fixture(d)
    return str(d)
