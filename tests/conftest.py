from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from jsonld_spark.session import get_spark
    s = get_spark("jsonld_spark_tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
