"""Processed-file manifest: the engine's exactly-once ledger (SURVEY §2.8).

The reference tracks per-record offset intervals in Redis
(accounting/OffsetIntervals.kt, OffsetRedisPersistence.kt) because it streams
records one at a time. Spark reads whole immutable files, so file granularity
is sufficient and *equivalent*: a file is the unit of reprocessing, and the
reference's reprocess-on-modify rule (OffsetIntervals.kt:33-44 — a record is
"seen" only when the file's lastModified <= lastProcessed) maps to comparing
stored vs current modification time.

The ledger is a set of JSON-lines files under `<dir>/manifest/` — the same
shape as Structured Streaming's file-source commit log. Operations:

* `prune(files)`       — anti-join candidate files against the ledger
                         (seen && unmodified -> drop), reference P4/P5/J1.
* `commit(files)`      — append after a successful write (write-then-commit,
                         reference T2 Accountant.kt:33-46).
* `revoke(files)`      — cleaner's offset revocation for incompletely
                         extracted files (reference AccountantImpl.kt:55-59).

All operations are driver-side: even at 100 TB the *file list* is millions of
rows, not billions — a pandas frame, not a distributed dataset. The data
itself never flows through here.

At-least-once window (reference parity): both the batch plan and the
streaming restructure WRITE output files first and commit() the ledger
second. A crash between the two replays the whole batch on restart and
appends its rows a second time into the exact-name output files — the same
window the reference has (worker/FileCache.kt:181-186 commits offsets to
Redis only after the file store succeeds). The mitigation is the same as
the reference's: run the dedup pass (`DedupConfig`) on affected topics, or
re-extract after deleting the affected hour files. Commit-then-write would
trade duplicates for silent LOSS on the same crash, which is strictly
worse. (The streaming IVF ingest closes its window with intent manifests —
streaming/index_ingest.py — because index segments, unlike append-mode CSV
rows, cannot be deduplicated after the fact.)
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass


@dataclass(frozen=True)
class FileEntry:
    path: str
    modified_ms: int  # storage mtime when processed


class _SegmentVanished(Exception):
    """A listed manifest segment disappeared mid-replay: a concurrent
    replica's compact() deleted it after publishing the compacted segment
    that subsumes it. The caller must re-list and replay again."""


class ProcessedFileManifest:
    def __init__(self, directory: str, storage=None):
        from radar_output_restructure_spark.sinks.storage import (
            LocalTargetStorage,
        )

        self.directory = directory
        self.storage = storage if storage is not None else LocalTargetStorage()
        self.storage.makedirs(directory)
        self._seq = 0  # intra-process append order within one timestamp tick
        self._seq_lock = threading.Lock()  # topic-parallel runs share one manifest
        self._last_ts = 0  # monotonic clamp for segment-name timestamps

    def _segments(self) -> list[str]:
        return sorted(
            p for p in self.storage.walk_files(self.directory)
            if p.endswith(".jsonl")
        )

    def load(self) -> dict[str, int]:
        """path -> last committed mtime (latest entry wins, tombstones drop).

        Tolerates a concurrent compactor: between our listing and our reads
        another replica's compact() may delete a listed segment. Its state is
        not lost — the compacted segment that subsumes it is published BEFORE
        any original is deleted, so a fresh listing always sees the full
        state — so a vanished segment means "re-list and replay again", never
        "skip". Bounded retries: each retry requires a whole additional
        compaction to have raced us in the window.
        """
        last_exc: Exception | None = None
        for _ in range(8):
            try:
                return self._replay(self._segments())
            except _SegmentVanished as exc:
                last_exc = exc
                continue
        raise RuntimeError(
            "manifest replay kept losing segments to concurrent compaction"
        ) from last_exc

    def _replay(self, segments: list[str]) -> dict[str, int]:
        state: dict[str, int] = {}
        for seg in segments:
            try:
                data = self.storage.read(seg)
            except Exception as exc:
                if self.storage.exists(seg):
                    raise  # real read failure, not a compactor race
                raise _SegmentVanished(seg) from exc
            for line in data.decode().splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec.get("op") == "revoke":
                    state.pop(rec["path"], None)
                else:
                    state[rec["path"]] = rec["modified_ms"]
        return state

    def prune(self, files: list[FileEntry]) -> list[FileEntry]:
        """Files still needing processing: unseen, or modified since commit
        (reference reprocess-on-modify, T7)."""
        state = self.load()
        return [
            f
            for f in files
            if f.path not in state or f.modified_ms > state[f.path]
        ]

    def _append(self, op: str, files: list[FileEntry]) -> None:
        if not files:
            return
        # lexicographic segment order MUST equal append order (load() replays
        # segments sorted by name): nanosecond timestamp + per-instance
        # sequence keeps same-tick appends ordered; the uuid only guards
        # against two writers colliding (single-writer driver in practice).
        # The timestamp is clamped MONOTONIC per instance: a backward NTP
        # step would otherwise let a later revoke sort before an earlier
        # commit, replaying to "committed" and silently losing the
        # revocation — strictly worse than the accepted duplicate window.
        with self._seq_lock:
            self._seq += 1
            seq = self._seq
            ts = max(time.time_ns(), self._last_ts + 1)
            self._last_ts = ts
        seg = os.path.join(
            self.directory,
            f"{ts:020d}-{seq:08d}-{uuid.uuid4().hex[:8]}.jsonl",
        )
        body = "".join(
            json.dumps({"op": op, "path": f.path, "modified_ms": f.modified_ms})
            + "\n"
            for f in files
        )
        # atomic publish, like the reference's temp->move; segment-per-append
        # needs no native append support, so object stores work unchanged
        self.storage.store_atomic(seg, body.encode())

    def commit(self, files: list[FileEntry]) -> None:
        self._append("commit", files)

    def revoke(self, files: list[FileEntry]) -> None:
        self._append("revoke", files)

    def compact(self, segments: list[str] | None = None) -> None:
        """Rewrite the current segments into one (the reference's full-sync
        analog) — every commit appends a segment and load() replays them
        all, so an uncompacted ledger costs O(runs) small-object reads per
        load and grows without bound. `segments` lets maybe_compact pass
        its already-fetched listing instead of re-LISTing the prefix.

        Safe against concurrent appenders (a second replica committing or
        revoking while this one compacts): the compacted segment's name is
        anchored to SORT IMMEDIATELY AFTER the last segment it subsumes,
        not at the current timestamp — any segment stored after this
        compaction's listing carries a newer timestamp name, sorts after
        the compacted state, and replays later, so a concurrent revoke (or
        mtime re-commit) is never shadowed by the older state this
        compaction captured. (Holds under the same bounded-clock-skew
        assumption every timestamped segment name already makes.) Crash
        windows are idempotent: compacted-written-but-originals-undeleted
        replays to the identical state; a later compact retries the
        deletes."""
        if segments is None:
            segments = self._segments()
        if len(segments) <= 1:
            return
        try:
            state = self._replay(segments)
        except _SegmentVanished:
            # Another replica compacted under us; its compacted segment
            # already subsumes the vanished ones. Restart from a fresh
            # listing (depth-bounded: each recursion needs another racer).
            return self.compact()
        # "<last>.jsonl" < "<last>.jsonl~compact-….jsonl" < any newer
        # "<ts>-….jsonl": prefix-extension sorts right after its prefix
        seg = f"{segments[-1]}~compact-{uuid.uuid4().hex[:8]}.jsonl"
        body = "".join(
            json.dumps({"op": "commit", "path": p, "modified_ms": m}) + "\n"
            for p, m in sorted(state.items())
        )
        self.storage.store_atomic(seg, body.encode())
        for old in segments:
            self.storage.delete(old)

    def maybe_compact(self, max_segments: int = 64) -> bool:
        """Compact when the segment count exceeds `max_segments`; the
        steady-state hook for long-lived services (one commit segment per
        fingerprint group per run adds up). Returns True when it ran.
        The listing is fetched once and handed to compact() — this runs on
        the per-cycle (streaming: per-micro-batch) hot path, where a second
        recursive LIST of the prefix would double the steady-state I/O."""
        segments = self._segments()
        if len(segments) <= max_segments:
            return False
        self.compact(segments)
        return True


class AttemptRegistry:
    """Persistent schema-fingerprint -> attempt-suffix assignment per topic.

    The reference evolves schemas per output file: a record whose rendered
    schema mismatches the file header retries into `<timebin>_1`, `_2`, ...
    (worker/RestructureWorker.kt:168-183, FixedPathFormatterPlugin.kt:36,77).
    At file granularity the equivalent invariant is: every distinct source
    schema fingerprint gets a stable attempt number, first-seen = 0 (no
    suffix). Persisted as one JSON per topic next to the manifest so appends
    across runs keep landing in the matching `_N` file.
    """

    def __init__(self, directory: str, storage=None):
        from radar_output_restructure_spark.sinks.storage import (
            LocalTargetStorage,
        )

        self.directory = directory
        self.storage = storage if storage is not None else LocalTargetStorage()
        self.storage.makedirs(directory)

    def _path(self, topic: str) -> str:
        return os.path.join(self.directory, f"attempts-{topic}.json")

    def load(self, topic: str) -> dict:
        """{"fps": {fingerprint: attempt}, "schemas": {attempt: schemaJson}}.
        Accepts the legacy flat {fingerprint: attempt} shape (no stored
        schemas — legacy attempts simply never receive subset merges)."""
        p = self._path(topic)
        if not self.storage.exists(p):
            return {"fps": {}, "schemas": {}}
        raw = json.loads(self.storage.read(p).decode())
        if "fps" in raw:
            return raw
        return {"fps": raw, "schemas": {}}

    def assign(
        self, topic: str, fingerprints: list[tuple[str, str | None]]
    ) -> tuple[dict[str, int], dict[str, str]]:
        """Resolve (fingerprint, schemaJson) pairs to attempt numbers,
        persisting the updated mapping. A NEW fingerprint whose schema is an
        order-preserving subschema of an existing attempt's superset schema
        joins that attempt (lowest wins) — the reference's subset-write rule
        (CsvAvroConverter.kt:76-85) at file granularity; otherwise it
        allocates the next number in first-seen order.

        Returns (fingerprint -> attempt, attempt(str) -> schemaJson).
        """
        from pyspark.sql import types as T

        from radar_output_restructure_spark.functions.schema_compat import (
            is_subschema,
        )

        state = self.load(topic)
        fps: dict[str, int] = state["fps"]
        schemas: dict[str, str] = state["schemas"]

        def parse(canon: str | None):
            if not canon:
                return None
            try:
                return T.StructType.fromJson(json.loads(canon))
            except Exception:
                return None

        nxt = max(fps.values(), default=-1) + 1
        for fp, canon in fingerprints:
            if fp in fps:
                continue
            sub = parse(canon)
            merged = None
            if sub is not None:
                for att in sorted(int(a) for a in schemas):
                    sup = parse(schemas[str(att)])
                    if sup is not None and is_subschema(sub, sup):
                        merged = att
                        break
            if merged is not None:
                fps[fp] = merged
            else:
                fps[fp] = nxt
                if canon:
                    schemas[str(nxt)] = canon
                nxt += 1
        self.storage.store_atomic(
            self._path(topic),
            json.dumps({"fps": fps, "schemas": schemas}, sort_keys=True).encode(),
        )
        return fps, schemas


class SchemaFingerprintCache:
    """Driver-side (path, mtime) -> canonical-schema cache with a JSON-lines
    persistence file next to the manifest.

    Fingerprinting a candidate list is O(files) metadata reads (parquet
    footer / avro header, each O(KB) but ~1-10 ms of I/O latency apiece on an
    object store). Two levers keep that off the critical path at scale:

    * misses are fetched through a thread pool (I/O-bound, so Python threads
      parallelize them), and
    * hits are free across runs — reprocessed files (cleaner verification
      passes, crash reruns, appends into an existing topic) never re-read
      metadata unless the file's mtime changed, which is exactly the
      manifest's own reprocess rule.
    """

    def __init__(self, directory: str, storage=None):
        from radar_output_restructure_spark.sinks.storage import (
            LocalTargetStorage,
        )

        self.directory = directory
        self.storage = storage if storage is not None else LocalTargetStorage()
        self.storage.makedirs(directory)
        # .cache extension: the manifest treats *.jsonl in this directory as
        # its own ledger segments
        self._path = os.path.join(directory, "schema-fingerprints.cache")
        self._cache: dict[tuple[str, int], str] = {}
        self._lock = threading.Lock()  # topic-parallel runs share the cache
        if self.storage.exists(self._path):
            for line in self.storage.read(self._path).decode().splitlines():
                if line.strip():
                    rec = json.loads(line)
                    self._cache[(rec["p"], rec["m"])] = rec["c"]

    def get_many(self, files, compute) -> dict[str, str]:
        """Canonical schema string per path; `compute(path) -> str | None`
        fills misses concurrently. A None result (unreadable file) is
        neither cached nor returned — the caller skips it, and a repaired
        file recomputes next run."""
        from concurrent.futures import ThreadPoolExecutor

        with self._lock:
            misses = [
                f for f in files if (f.path, f.modified_ms) not in self._cache
            ]
        if misses:
            workers = min(32, max(4, len(misses)))
            with ThreadPoolExecutor(max_workers=workers) as pool:
                canons = list(pool.map(lambda f: compute(f.path), misses))
            with self._lock:
                for f, canon in zip(misses, canons):
                    if canon is not None:
                        self._cache[(f.path, f.modified_ms)] = canon
                # Evict superseded entries on rewrite: only the NEWEST
                # mtime per path can ever hit again (a modified file gets a
                # fresh key; its old line would otherwise persist forever
                # and the cache — rewritten whole per miss batch — would
                # grow monotonically across a long-lived deployment).
                newest: dict[str, int] = {}
                for p, m in self._cache:
                    if m > newest.get(p, -1):
                        newest[p] = m
                self._cache = {
                    (p, m): c
                    for (p, m), c in self._cache.items()
                    if newest[p] == m
                }
                # whole-file rewrite (object stores have no append); the
                # cache is metadata-sized, one line per known file
                body = "".join(
                    json.dumps({"p": p, "m": m, "c": c}) + "\n"
                    for (p, m), c in sorted(self._cache.items())
                )
                self.storage.store_atomic(self._path, body.encode())
        with self._lock:
            return {
                f.path: self._cache[(f.path, f.modified_ms)]
                for f in files
                if (f.path, f.modified_ms) in self._cache
            }
