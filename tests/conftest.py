from __future__ import annotations

import pytest

from recmetrics_pyspark_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("recmetrics-tests", shuffle_partitions=8)
    yield s
