"""Commit-protocol backend contract tests (no Spark): both backends must
expose identical put-if-absent / pointer semantics, and the S3-semantics
fake must additionally honor object-store rules — no rename visibility,
monotonic catalog-CAS pointer. The engine-level proof that the commit
protocol only needs this contract is the parametrized crash/race suites
(``test_crash.py``, ``test_two_writers.py``,
``test_manifests.py::test_expire_and_rollback_interleave_safely``)."""

from __future__ import annotations

import threading

import pytest

from rockefeller_spark.backends import FakeObjectStoreBackend, PosixBackend

BACKENDS = [PosixBackend, FakeObjectStoreBackend]


@pytest.mark.parametrize("cls", BACKENDS)
def test_put_if_absent_is_write_once(tmp_path, cls):
    b = cls(str(tmp_path))
    b.put_if_absent("obj.json", b"one")
    with pytest.raises(FileExistsError):
        b.put_if_absent("obj.json", b"two")
    assert b.read("obj.json") == b"one"     # loser never corrupts the winner


@pytest.mark.parametrize("cls", BACKENDS)
def test_put_if_absent_race_single_winner(tmp_path, cls):
    b = cls(str(tmp_path))
    outcomes: list[bool] = []
    barrier = threading.Barrier(8)

    def contender(i: int):
        barrier.wait()
        try:
            b.put_if_absent("v1.json", f"writer-{i}".encode())
            outcomes.append(True)
        except FileExistsError:
            outcomes.append(False)

    threads = [threading.Thread(target=contender, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(outcomes) == 1
    assert b.read("v1.json").startswith(b"writer-")


@pytest.mark.parametrize("cls", BACKENDS)
def test_pointer_roundtrip(tmp_path, cls):
    b = cls(str(tmp_path))
    b.advance_pointer("ptr", 0)
    assert b.read_pointer("ptr") == 0
    b.advance_pointer("ptr", 7)
    assert b.read_pointer("ptr") == 7


def test_fake_pointer_cas_is_monotonic(tmp_path):
    """The catalog-CAS pointer never regresses: a delayed/replayed publish
    of an older version is a lost CAS, not a rollback of readers."""
    b = FakeObjectStoreBackend(str(tmp_path))
    b.advance_pointer("ptr", 5)
    b.advance_pointer("ptr", 3)             # stale publish arrives late
    assert b.read_pointer("ptr") == 5


@pytest.mark.parametrize("cls", BACKENDS)
def test_delete_and_exists(tmp_path, cls):
    b = cls(str(tmp_path))
    b.put_if_absent("m-x.json", b"{}")
    assert b.exists("m-x.json")
    b.delete("m-x.json")
    assert not b.exists("m-x.json")
    with pytest.raises(FileNotFoundError):
        b.read("m-x.json")
    with pytest.raises(FileNotFoundError):
        b.delete("m-x.json")
