from __future__ import annotations

import pytest

from rockefeller_spark.backends import FakeObjectStoreBackend
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rockefeller-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(params=["posix", "s3sem"])
def commit_backend(request, monkeypatch):
    """Parametrize a test over both commit-protocol backends: the POSIX
    forms this sandbox runs natively, and the S3-semantics fake
    (conditional PUT + catalog-CAS pointer, no rename visibility, no
    unconditional overwrite) — see ``rockefeller_spark/backends.py``.
    Applied module-wide to the crash/race suites via ``usefixtures``."""
    if request.param == "s3sem":
        monkeypatch.setattr(LakeTable, "backend_factory",
                            FakeObjectStoreBackend)
    return request.param
