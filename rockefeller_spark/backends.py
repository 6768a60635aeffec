"""Commit-protocol storage backends (the object-store deployment seam).

The icelake commit protocol needs exactly three primitives beyond plain
write-once blobs (see the protocol notes at the top of ``lake.py``):

1. **put-if-absent** of an immutable metadata object (the version race:
   two writers of ``v{N}.json``, one winner);
2. **monotonic pointer advance** of the readers' current-version pointer
   (``version-hint.text``);
3. object delete / existence (expiry, orphan reclaim).

``PosixBackend`` implements them with the POSIX forms this sandbox runs
on (``O_EXCL`` create; write-temp + atomic ``rename``). On an S3-class
object store the same contract maps to a conditional PUT
(``If-None-Match: *`` — supported by S3, GCS and Azure) for (1) and a
catalog compare-and-swap (Iceberg's catalog pointer; a DynamoDB
conditional update) for (2); ``FakeObjectStoreBackend`` emulates exactly
those semantics — its API simply has no unconditional-overwrite
operation (stronger than rejecting one), never uses rename for
visibility, and implements the pointer as a locked read-compare-write
(a catalog row update), so the commit/crash/race suites prove the
ENGINE depends only on the portable contract, not on POSIX rename
atomicity or overwrite behavior.

(The maintenance mutex — primitive 3 of the lake.py protocol notes — maps
to a TTL lease in a transactional store; it serializes only maintenance
and is orthogonal to the commit protocol, so it stays POSIX here.)
"""

from __future__ import annotations

import fcntl
import os
import uuid


class PosixBackend:
    """The POSIX implementation of the commit-protocol contract (what a
    local/NFS/HDFS deployment uses)."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    def _abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    # -- primitive 1: conditional create of an immutable object ----------
    def put_if_absent(self, rel: str, data: bytes) -> None:
        """Create-or-raise: ``FileExistsError`` when the object already
        exists (the caller translates to its conflict type).

        All-or-nothing content: the bytes are written and fsynced at a
        temp name first, then published via ``os.link`` — an atomic
        create-or-EEXIST that can never expose a partially written
        object. (A direct ``O_EXCL`` create-then-write would, on a crash
        mid-write, leave a truncated ``v{N}.json`` that permanently wins
        the version race: the pointer never advances to it and every
        retry of that version hits the conflict — a wedged table.)"""
        final = self._abs(rel)
        tmp = f"{final}.put.{uuid.uuid4().hex}"
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
                fh.flush()
                os.fsync(fh.fileno())
            os.link(tmp, final)            # atomic publish or FileExistsError
        finally:
            os.unlink(tmp)
        self._fsync_dir(os.path.dirname(final))

    @staticmethod
    def _fsync_dir(path: str) -> None:
        """Durably record a directory entry (link/rename publish)."""
        try:
            dfd = os.open(path, os.O_RDONLY)
        except OSError:                    # pragma: no cover - exotic fs
            return
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    # -- primitive 2: the readers' current-version pointer ----------------
    def read_pointer(self, rel: str) -> int:
        with open(self._abs(rel)) as fh:
            return int(fh.read().strip())

    def advance_pointer(self, rel: str, version: int) -> None:
        """Publish ``version`` as the current pointer — MONOTONIC, like
        the object-store catalog CAS: a publish carrying a version ≤ the
        current pointer is a no-op, so a replayed/delayed publish (or
        future restore tooling) cannot regress readers on one backend
        while being a no-op on the other.

        The read+rename pair holds an ``flock`` on a sibling lock file:
        with concurrent advancers (a commit racing the crash-publish
        repair path, or FeedCursor acks) a bare read-then-rename is a
        TOCTOU — a delayed rename could still transiently regress the
        pointer. The lock serializes only ADVANCERS; readers stay
        lock-free (rename is atomic). The Fake object-store backend does
        the same check under its store-atomicity lock, so the monotonic
        guarantee is now identical on both backends."""
        lock = self._abs(f"{rel}.lock")
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            try:
                if version <= self.read_pointer(rel):
                    return
            except (FileNotFoundError, ValueError):
                pass                       # no pointer yet / unreadable
            tmp = self._abs(f"{rel}.{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                fh.write(str(version))
                fh.flush()
                os.fsync(fh.fileno())
            os.rename(tmp, self._abs(rel))
            self._fsync_dir(os.path.dirname(self._abs(rel)))
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    # -- blob management ---------------------------------------------------
    def read(self, rel: str) -> bytes:
        with open(self._abs(rel), "rb") as fh:
            return fh.read()

    def exists(self, rel: str) -> bool:
        return os.path.exists(self._abs(rel))

    def delete(self, rel: str) -> None:
        os.remove(self._abs(rel))


class FakeObjectStoreBackend:
    """S3-semantics test double over a plain directory: conditional PUT
    and catalog-CAS only — no rename-based visibility, blind overwrites
    of existing objects raise ``BlindOverwriteError``. A cross-process
    ``fcntl`` lock on ``.objectstore.lock`` stands in for the store's
    server-side conditional-operation atomicity (each call opens its own
    fd, so the lock also serializes threads within one process)."""

    LOCK_FILE = ".objectstore.lock"

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    class _lock:
        def __init__(self, backend: "FakeObjectStoreBackend"):
            self.path = os.path.join(backend.root,
                                     FakeObjectStoreBackend.LOCK_FILE)

        def __enter__(self):
            self.fd = os.open(self.path, os.O_CREAT | os.O_WRONLY)
            fcntl.flock(self.fd, fcntl.LOCK_EX)
            return self

        def __exit__(self, *exc):
            fcntl.flock(self.fd, fcntl.LOCK_UN)
            os.close(self.fd)

    def put_if_absent(self, rel: str, data: bytes) -> None:
        with self._lock(self):
            path = self._abs(rel)
            if os.path.exists(path):
                raise FileExistsError(rel)      # HTTP 412 PreconditionFailed
            # an S3-class PUT is all-or-nothing server-side; model that
            # with temp-write + link so a crashed client can't leave a
            # truncated object visible (which no real store ever would)
            tmp = f"{path}.put.{uuid.uuid4().hex}"
            with open(tmp, "wb") as fh:
                fh.write(data)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, path)
            finally:
                os.unlink(tmp)

    def read_pointer(self, rel: str) -> int:
        with self._lock(self):
            with open(self._abs(rel)) as fh:
                return int(fh.read().strip())

    def advance_pointer(self, rel: str, version: int) -> None:
        """Catalog-style compare-and-swap, monotonic: the pointer only
        ever moves forward, so even a delayed/replayed publish cannot
        regress readers to an older snapshot."""
        with self._lock(self):
            path = self._abs(rel)
            cur = -1
            try:
                with open(path) as fh:
                    cur = int(fh.read().strip())
            except FileNotFoundError:
                pass
            if version <= cur:
                return                          # CAS lost to a newer publish
            with open(path, "w") as fh:         # in-place row update (no
                fh.write(str(version))          # rename), guarded by the
                fh.flush()                      # store-atomicity lock
                os.fsync(fh.fileno())

    def read(self, rel: str) -> bytes:
        with open(self._abs(rel), "rb") as fh:
            return fh.read()

    def exists(self, rel: str) -> bool:
        return os.path.exists(self._abs(rel))

    def delete(self, rel: str) -> None:
        with self._lock(self):
            os.remove(self._abs(rel))
