from __future__ import annotations

import pytest

from rockefeller_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rockefeller-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
