from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from biz_crawlers_spark.session import get_spark

    s = get_spark(cores=4, shuffle_partitions=4, app="biz_crawlers_spark-tests")
    yield s
    s.stop()
