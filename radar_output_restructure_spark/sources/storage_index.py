"""Incremental source-storage index (SURVEY §2 S9's optimization half;
reference source/StorageIndexManager.kt:29-95,
source/InMemoryStorageIndex.kt:13-121).

At millions of source files, re-LISTing the whole topic tree every poll
cycle is the reference's stated pain point: each S3 LIST returns 1,000 keys,
so an idle tick over 10M files costs 10,000 requests. The reference keeps an
in-memory tree index and, per update, lists each directory only PAST its
lexicographically-last known file (`startAfter`) — O(new files) requests —
with two safety valves:

* a FULL re-sync every `rescan_s` (default 3600 s) that also drops deleted
  entries (reference `rescanDirectoryDuration`);
* empty directories re-listed every `rescan_empty_s` (default 900 s) rather
  than every tick (reference `rescanEmptyDuration`) — a topic that has never
  produced data shouldn't cost a request per poll.

Same trade-offs as the reference: a file that arrives with a name SORTING
BEFORE the cursor (out-of-order upload) is picked up by the next full sync,
not the incremental pass. New subdirectories ARE discovered incrementally:
file-bearing directories report them in the same LIST the cursor pass
issues, and dirs-only/empty directories (the tree root, topic dirs) re-list
on the `rescan_empty_s` cadence — so a new topic or partition appears within
~15 min, not the full-sync hour. The Kafka sink's `<topic>+<partition>+<offset>` naming is
only lexicographically monotonic when offsets are ZERO-PADDED (the Confluent
sinks' default, width 10): unpadded offsets roll over at every digit-length
boundary (`t+0+1000` sorts BEFORE `t+0+999`), which would make the cursor
skip every new file for the whole next decade of offsets. So the cursor is
used per directory only when its observed names prove padding (uniform field
widths with a leading-zero witness, or a constant field); otherwise the
directory is fully re-listed each update — still one LIST round per
directory, just without the O(new) head start.

Driver-side only: the index is file METADATA (path, mtime, size), ~100 bytes
per file; 10M files is ~1 GB on the driver, the same envelope as the
reference's InMemoryStorageIndex (its own class doc carries the same
caveat). The Spark executors never see this structure — candidate files
flow into the normal read path.
"""

from __future__ import annotations

import os
import re
import time
from collections.abc import Callable

_NUM_FIELDS = re.compile(r"\+(\d+)")


def _cursor_safe(names) -> bool:
    """True when every FUTURE file name in this directory is guaranteed to
    sort lexicographically after the current maximum, so a `startAfter`
    cursor cannot skip arrivals. Offset-style names (`topic+part+from+to`)
    qualify per numeric field when the field is constant across files or
    zero-padded to a uniform width (leading-zero witness); anything else —
    including unpadded offsets, which roll over at digit-length boundaries —
    gets a full per-directory listing instead."""
    fields_per_name = [_NUM_FIELDS.findall(n) for n in names]
    nfields = {len(f) for f in fields_per_name}
    if len(nfields) != 1 or nfields == {0}:
        return False
    for pos in range(nfields.pop()):
        vals = {f[pos] for f in fields_per_name}
        if pos == 0 and len(vals) == 1:
            # the first numeric field is the Kafka partition, constant per
            # `partition=N` directory BY CONSTRUCTION — the only field a
            # constant-so-far observation actually proves anything about
            continue
        if len({len(v) for v in vals}) != 1:
            return False  # mixed widths: already rolled over once
        if not any(len(v) > 1 and v[0] == "0" for v in vals):
            return False  # no MULTI-digit leading-zero witness (a bare
            # '0' proves nothing — 0..9 then 10 rolls over; a lone
            # unpadded '990' rolls over at 1000): the next digit-length
            # rollover would sort before the cursor
    return True


class StorageIndexManager:
    """In-memory tree index over `storage` rooted at `root`, updated
    incrementally via per-directory `startAfter` cursors."""

    def __init__(
        self,
        storage,
        root: str,
        rescan_s: float = 3600.0,
        rescan_empty_s: float = 900.0,
        clock: Callable[[], float] = time.time,
    ):
        self.storage = storage
        self.root = root.rstrip("/")
        self.rescan_s = rescan_s
        self.rescan_empty_s = rescan_empty_s
        self._clock = clock
        #: dir path -> {file name: (mtime_ms, size)}
        self._files: dict[str, dict[str, tuple[int, int]]] = {}
        #: dir path -> sorted subdir names
        self._subdirs: dict[str, list[str]] = {}
        #: dir path -> (n_names_when_computed, cursor_safe, max_name):
        #: _cursor_safe + max() are O(files in dir); recomputing them for
        #: every directory on every tick would cost O(all indexed files)
        #: driver CPU per poll — against the module's O(new) goal. The
        #: cache invalidates on name-set size change (files only ever merge
        #: in between syncs; remove() invalidates explicitly).
        self._cursor_cache: dict[str, tuple[int, bool, str]] = {}
        self._next_sync = float("-inf")
        self._next_empty_sync = float("-inf")
        self.list_ops = 0  # cumulative, for tests/metrics

    # -- update scheduling (StorageIndexManager.update) ---------------------

    def update(self) -> int:
        """Refresh the index honouring the re-scan intervals; returns the
        number of LIST operations performed."""
        now = self._clock()
        if now >= self._next_sync:
            return self.sync()
        rescan_empty = now >= self._next_empty_sync
        if rescan_empty:
            self._next_empty_sync = now + self.rescan_empty_s
        ops = self._update_level(self.root, rescan_empty)
        self.list_ops += ops
        return ops

    def sync(self) -> int:
        """Full re-list from the root: discovers everything, drops deleted
        entries (reference StorageIndexManager.sync)."""
        now = self._clock()
        self._next_sync = now + self.rescan_s
        self._next_empty_sync = now + self.rescan_empty_s
        fresh_files: dict[str, dict[str, tuple[int, int]]] = {}
        fresh_subdirs: dict[str, list[str]] = {}
        ops = self._sync_level(self.root, fresh_files, fresh_subdirs)
        self._files = fresh_files
        self._subdirs = fresh_subdirs
        self._cursor_cache.clear()
        self.list_ops += ops
        return ops

    def _sync_level(self, d: str, files, subdirs) -> int:
        dirs, entries = self.storage.list_entries(d)
        files[d] = {name: (m, s) for name, m, s in entries}
        subdirs[d] = [n for n in dirs if n != "+tmp"]
        ops = 1
        for name in subdirs[d]:
            ops += self._sync_level(os.path.join(d, name), files, subdirs)
        return ops

    def _dir_cursor(self, d: str, known_files) -> tuple[bool, str]:
        """(cursor_safe, max_name) for a file-bearing directory, cached by
        name-set size so an unchanged directory costs O(1) per tick."""
        cached = self._cursor_cache.get(d)
        n = len(known_files)
        if cached is not None and cached[0] == n:
            return cached[1], cached[2]
        safe = _cursor_safe(known_files)
        mx = max(known_files)
        self._cursor_cache[d] = (n, safe, mx)
        return safe, mx

    def _update_level(self, d: str, rescan_empty: bool) -> int:
        known_files = self._files.get(d)
        known_dirs = self._subdirs.get(d)
        if known_files is None:
            self._files[d] = known_files = {}
        if known_dirs is None:
            self._subdirs[d] = known_dirs = []
        ops = 0
        if known_files:
            safe, cursor = self._dir_cursor(d, known_files)
            if safe:
                dirs, entries = self.storage.list_entries(
                    d, start_after=cursor
                )
            else:
                # names don't prove lexicographic monotonicity (unpadded
                # offsets roll over): full per-directory list, no cursor
                dirs, entries = self.storage.list_entries(d)
            ops = 1
            for name, m, s in entries:
                known_files[name] = (m, s)
            if entries:
                self._cursor_cache.pop(d, None)  # recompute on next tick
            for name in dirs:
                if name != "+tmp" and name not in known_dirs:
                    known_dirs.append(name)
            known_dirs.sort()
        elif rescan_empty:
            # NO files known here — the dir is empty OR holds only subdirs
            # (the tree root, a topic dir). Either way a new child (a new
            # topic, a new partition=N) is only discoverable by re-listing;
            # the empty-rescan cadence bounds the cost. The old code
            # re-listed only fully-EMPTY dirs, so a new topic under the
            # root stayed invisible until the hourly full sync.
            dirs, entries = self.storage.list_entries(d)
            ops = 1
            for name, m, s in entries:
                known_files[name] = (m, s)
            for name in dirs:
                if name != "+tmp" and name not in known_dirs:
                    known_dirs.append(name)
            known_dirs.sort()
        for name in list(known_dirs):
            ops += self._update_level(os.path.join(d, name), rescan_empty)
        return ops

    # -- read surface -------------------------------------------------------

    def file_status_under(self, root: str) -> list[tuple[str, int, int]]:
        """(path, mtime_ms, size) for every indexed file under `root` — the
        drop-in replacement for storage.walk_file_status in listings."""
        root = root.rstrip("/")
        out: list[tuple[str, int, int]] = []
        for d, files in self._files.items():
            if d == root or d.startswith(root + os.sep):
                out += [
                    (os.path.join(d, name), m, s)
                    for name, (m, s) in files.items()
                ]
        return out

    def subdirs_of(self, d: str) -> list[str]:
        """Immediate subdirectory names from the INDEX (no LIST request) —
        the topic-discovery read path."""
        return list(self._subdirs.get(d.rstrip("/"), []))

    def remove(self, path: str) -> None:
        """Drop one file (the cleaner deleted it — SourceDataCleaner calls
        this after every source delete) without waiting for the next full
        sync (reference StorageIndex.remove)."""
        d, name = os.path.split(path)
        self._files.get(d, {}).pop(name, None)
        # a remove followed by exactly one add would leave the size-keyed
        # cursor cache stale; invalidate explicitly
        self._cursor_cache.pop(d, None)
