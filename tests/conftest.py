from __future__ import annotations

import pytest

from osm_io_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osm-io-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    return duckdb.connect()
