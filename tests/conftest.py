from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from libchunk_spark.session import get_spark

    s = get_spark(app="libchunk_spark-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
