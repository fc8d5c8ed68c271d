from __future__ import annotations

import pytest

from bigsdb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bigsdb_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
