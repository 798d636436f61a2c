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

POSIX `O_EXCL` is atomic on local and NFS filesystems. Object stores need a
conditional PUT (S3 `If-None-Match: *`); the manager is an ABC so such a
backend is one subclass away. The stale-break path is check-then-delete —
not CAS — which matches the reference's own race window (its TTL expiry vs
release check is equally unsynchronized); the 24 h TTL makes the window
irrelevant in practice.
"""

from __future__ import annotations

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

    def acquire_lock(self, name: str) -> RemoteLock | None:
        path = self._path(name)
        payload = json.dumps(
            {"owner": self.uuid, "expires_at": time.time() + self.ttl_s}
        ).encode()
        for _attempt in (0, 1):
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if not self._break_if_stale(path):
                    return None
                continue  # stale lock removed: retry the exclusive create
            try:
                os.write(fd, payload)
            finally:
                os.close(fd)
            return RemoteLock(self, name)
        return None

    def _break_if_stale(self, path: str) -> bool:
        """True if a stale (expired or unreadable) lock was removed."""
        try:
            with open(path) as fh:
                info = json.load(fh)
            expired = float(info.get("expires_at", 0)) <= time.time()
        except (OSError, ValueError):
            # vanished (racing release) or torn write: treat as breakable
            expired = True
        if not expired:
            return False
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
        return True

    def _release(self, name: str) -> None:
        path = self._path(name)
        try:
            with open(path) as fh:
                if json.load(fh).get("owner") != self.uuid:
                    return  # broken + re-acquired elsewhere: not ours anymore
            os.unlink(path)
        except (OSError, ValueError):
            pass
