"""Multi-instance topic locks (SURVEY §2 T5; reference
accounting/RedisRemoteLockManager.kt:8-45, usage
worker/RadarKafkaRestructure.kt:108-128).

The reference coordinates replicated restructure services through Redis:
`SET <prefix>/<topic>.lock <instance-uuid> NX PX 24h`; release deletes the
key only if it still holds the instance's own UUID. A single Spark
application doesn't need this — the driver serializes topics — but two
restructure *applications* pointed at the same output tree do, so the same
contract is provided over the filesystem the deployment already shares:

* acquire  = exclusive create (`O_CREAT|O_EXCL`) of `<dir>/<name>.lock`
             containing `{owner uuid, expires_at}`;
* TTL      = a stale lock (expires_at in the past — a crashed holder) is
             broken and re-acquired;
* release  = owner-checked delete (a broken-then-reacquired lock is never
             deleted by the old holder), same as the reference's
             `if (redis.get(lockKey) == uuid) redis.del(lockKey)`.

POSIX hard-link creation (`os.link`) is atomic on local and NFS
filesystems. Object stores need a conditional PUT (S3 `If-None-Match: *`);
the manager is an ABC so such a backend is one subclass away.

Unlike Redis `SET NX PX` (expiry + acquire are one server-side atomic op),
a filesystem has no CAS, so two details close the races a naive
create-then-write scheme leaves open:

* the lock file *appears* fully written: the payload goes to a private temp
  file first and is then `os.link`ed to the lock path — readers never see a
  zero-byte/torn lock, so "unreadable" can't misclassify a brand-new lock
  as breakable;
* every *mutation* of an existing lock (stale break, owner-checked release)
  is serialized under a kernel-arbitrated `flock` on a per-name sidecar
  mutex file, with the staleness/ownership decision re-validated INSIDE the
  critical section. Rename-aside alone is not enough: of two breakers that
  both read the same expired payload, the loser of the create race can
  still rename the winner's *fresh* lock aside (observed in an 8-thread
  stress test). Under the mutex the lock path can only go absent→fresh via
  the atomic `os.link` (single winner by definition) and fresh→absent via a
  validated unlink, so two instances can never both hold the same topic.
  `flock` is auto-released on process death, so a crashed breaker cannot
  wedge the mutex.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
import uuid
from abc import ABC, abstractmethod
from contextlib import contextmanager

DEFAULT_TTL_S = 24 * 3600.0  # reference: SetParams().px(1.days)


class RemoteLock:
    def __init__(self, manager: "RemoteLockManager", name: str):
        self._manager = manager
        self.name = name

    def renew(self) -> bool:
        """Re-stamp expires_at to now + the manager's TTL (for holders that
        outlive the TTL — e.g. a resident streaming query; the reference
        re-SETs its Redis key per work cycle, RedisRemoteLockManager.kt).
        False = the lock is no longer this holder's (expired and broken, or
        already released): mutual exclusion is LOST and the caller must
        stop relying on it — renew never re-acquires."""
        return self._manager._renew(self.name)

    def close(self) -> None:
        self._manager._release(self.name)

    def __enter__(self) -> "RemoteLock":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class RemoteLockManager(ABC):
    """acquire_lock(name) -> RemoteLock | None (None = held elsewhere)."""

    @abstractmethod
    def acquire_lock(self, name: str) -> RemoteLock | None: ...

    @abstractmethod
    def _release(self, name: str) -> None: ...

    @abstractmethod
    def _renew(self, name: str) -> bool:
        """Owner-checked expiry extension; False = no longer held here."""

    @contextmanager
    def try_with_lock(self, name: str):
        """`with manager.try_with_lock(topic) as lock:` — lock is None when
        another instance holds it (reference RemoteLockManager.tryWithLock)."""
        lock = self.acquire_lock(name)
        try:
            yield lock
        finally:
            if lock is not None:
                lock.close()


class FileRemoteLockManager(RemoteLockManager):
    """Lock files under a shared directory; one instance uuid per manager
    (the reference logs "Managing locks as ID {uuid}" per process)."""

    def __init__(self, directory: str, ttl_s: float = DEFAULT_TTL_S):
        self.directory = directory
        self.ttl_s = ttl_s
        self.uuid = str(uuid.uuid4())
        os.makedirs(directory, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, f"{name}.lock")

    @contextmanager
    def _mutation_mutex(self, path: str, blocking: bool):
        """flock-serialized critical section for mutating the lock at
        `path`; yields False (without blocking) when another instance is
        mid-mutation and `blocking` is False. The sidecar mutex file is
        never unlinked, and the flock dies with a crashed holder."""
        fd = os.open(f"{path}.mutex", os.O_CREAT | os.O_RDWR, 0o644)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB))
            except OSError:
                yield False
                return
            try:
                yield True
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    @staticmethod
    def _expired(path: str) -> bool:
        """Stale check; an ABSENT lock reads as breakable (the unlink-then-
        link under the mutex handles it). Locks are link-published fully
        written, so an unreadable file is genuine corruption, not a
        mid-write window: also breakable."""
        try:
            with open(path) as fh:
                info = json.load(fh)
            return float(info.get("expires_at", 0)) <= time.time()
        except (OSError, ValueError):
            return True

    def acquire_lock(self, name: str) -> RemoteLock | None:
        path = self._path(name)
        # Per-call unique tmp name: two threads of one manager share
        # self.uuid, and a shared tmp path lets the loser's finally-unlink
        # race the winner's os.link (same pattern as storage.py's writers).
        tmp = f"{path}.w.{self.uuid}.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({"owner": self.uuid, "expires_at": time.time() + self.ttl_s}, fh)
        try:
            try:
                os.link(tmp, path)  # atomic create of a FULLY-written lock
                return RemoteLock(self, name)
            except FileExistsError:
                pass
            if not self._expired(path):  # cheap unsynchronized pre-check
                return None
            with self._mutation_mutex(path, blocking=False) as won:
                if not won:
                    return None  # another breaker is mid-break: contended
                if not self._expired(path):  # re-validate INSIDE the mutex
                    return None  # it was broken + re-acquired: fresh holder
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
                try:
                    os.link(tmp, path)
                    return RemoteLock(self, name)
                except FileExistsError:
                    return None  # a direct creator slipped in: single winner
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def _renew(self, name: str) -> bool:
        path = self._path(name)
        # Serialized with breakers: a renew can't interleave with a break
        # (the ownership re-check happens INSIDE the mutex, like release).
        with self._mutation_mutex(path, blocking=True):
            try:
                with open(path) as fh:
                    if json.load(fh).get("owner") != self.uuid:
                        return False  # broken + re-acquired: lost
            except (OSError, ValueError):
                return False  # absent (released) or corrupt: lost
            tmp = f"{path}.w.{self.uuid}.{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                json.dump(
                    {"owner": self.uuid, "expires_at": time.time() + self.ttl_s},
                    fh,
                )
            # atomic fresh->fresh swap under the mutex; readers outside it
            # (the unsynchronized pre-check) see old or new, never torn
            os.replace(tmp, path)
            return True

    def _release(self, name: str) -> None:
        path = self._path(name)
        # Serialized with breakers so an owner releasing its *expired* lock
        # can't unlink a breaker's freshly re-acquired one.
        with self._mutation_mutex(path, blocking=True):
            try:
                with open(path) as fh:
                    if json.load(fh).get("owner") != self.uuid:
                        return  # broken + re-acquired elsewhere: not ours
                os.unlink(path)
            except (OSError, ValueError):
                pass
