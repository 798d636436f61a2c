"""Legacy CSV offsets migration (SURVEY §2 T4).

The reference's pre-JSON deployments persisted seen offsets as
`<output>/offsets/<topic>.csv` with header `offsetFrom,offsetTo,partition,
topic[,lastModified]`; on startup the accountant reads that file into its
offset-range set, merges it, and deletes the CSV
(accounting/AccountantImpl.kt:38-53 readDeprecatedOffsets,
accounting/OffsetFilePersistence.kt:38-77 parseLine — topic may be quoted,
lastModified is an ISO instant and defaults to "now" when absent).

This engine's ledger is file-granularity (sources/manifest.py), so the
migration maps range coverage onto files: a candidate source file named
`<topic>+<partition>+<from>[+<to>]` counts as already-seen when some legacy
range for its (topic, partition) covers [from, to] AND the file has not been
modified since that range's lastModified (the reference's
reprocess-on-modify rule, OffsetIntervals.kt:33-44). Covered files are
committed into the manifest and the CSV is deleted — after which the JSON
ledger alone carries the state, exactly like the reference's one-shot
migration.

Files whose name lacks the `+to` end offset can still be covered when the
source storage exposes an `endOffset` object tag (SURVEY §2 S8,
source/S3SourceStorage.kt:65-90): pass `end_offset(path)` to supply it.

Driver-side only: the CSV is metadata-sized (one row per offset range), so
parsing and coverage checks never touch executors.
"""

from __future__ import annotations

import os
from bisect import bisect_right
from dataclasses import dataclass

from radar_output_restructure_spark.sources.kafka_tree import (
    parse_offset_filename,
)
from radar_output_restructure_spark.sources.manifest import FileEntry


@dataclass(frozen=True)
class OffsetRange:
    """One legacy CSV row (accounting/TopicPartitionOffsetRange.kt)."""

    topic: str
    partition: int
    offset_from: int
    offset_to: int
    last_modified_ms: int


def _parse_iso_ms(text: str) -> int:
    from datetime import datetime, timezone

    t = text.strip()
    if t.endswith("Z"):
        t = t[:-1] + "+00:00"
    dt = datetime.fromisoformat(t)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def parse_legacy_offsets_csv(body: str, now_ms: int) -> list[OffsetRange]:
    """Parse the legacy CSV body (header skipped; quoted topics unquoted;
    missing lastModified defaults to `now_ms` — OffsetFilePersistence.kt
    parseLine semantics, including its plain split-on-comma parser)."""
    out: list[OffsetRange] = []
    for line in body.splitlines()[1:]:
        if not line.strip():
            continue
        cols = line.split(",")
        topic = cols[3].strip().strip('"')
        last_modified = _parse_iso_ms(cols[4]) if len(cols) >= 5 else now_ms
        out.append(
            OffsetRange(
                topic=topic,
                partition=int(cols[2]),
                offset_from=int(cols[0]),
                offset_to=int(cols[1]),
                last_modified_ms=last_modified,
            )
        )
    return out


class OffsetRangeSet:
    """Merged offset intervals per (topic, partition) with coverage checks
    (the reference's accounting/OffsetRangeSet.kt, reduced to the read path
    the migration needs). Contiguous/overlapping ranges merge on add; the
    merged interval keeps the LATEST lastModified of its parts, which is the
    conservative choice for reprocess-on-modify (a file is only skipped if
    it predates every write that produced the covering interval... the max,
    i.e. files modified after ANY contributing write re-process)."""

    def __init__(self) -> None:
        self._by_key: dict[tuple[str, int], list[list[int]]] = {}

    def add(self, r: OffsetRange) -> None:
        ranges = self._by_key.setdefault((r.topic, r.partition), [])
        new = [r.offset_from, r.offset_to, r.last_modified_ms]
        merged: list[list[int]] = []
        for cur in ranges:
            # adjacent offsets (to + 1 == from) merge too: offsets are dense
            if cur[1] + 1 < new[0] or new[1] + 1 < cur[0]:
                merged.append(cur)
            else:
                new = [
                    min(cur[0], new[0]),
                    max(cur[1], new[1]),
                    max(cur[2], new[2]),
                ]
        merged.append(new)
        merged.sort()
        self._by_key[(r.topic, r.partition)] = merged

    def contains(
        self,
        topic: str,
        partition: int,
        offset_from: int,
        offset_to: int,
        modified_ms: int,
    ) -> bool:
        """[from, to] fully inside one merged interval whose lastModified is
        >= the file's mtime (seen && unmodified -> skip)."""
        ranges = self._by_key.get((topic, partition))
        if not ranges:
            return False
        i = bisect_right(ranges, [offset_from, offset_to, modified_ms])
        for cur in ranges[max(0, i - 1) : i + 1]:
            if cur[0] <= offset_from and offset_to <= cur[1]:
                return modified_ms <= cur[2]
        return False

    def __len__(self) -> int:
        return sum(len(v) for v in self._by_key.values())


def legacy_offsets_path(output_dir: str, topic: str) -> str:
    return os.path.join(output_dir, "offsets", f"{topic}.csv")


def _render_legacy_csv(rows: list[OffsetRange]) -> bytes:
    """Re-emit leftover ranges in the reference's own CSV shape so a later
    run (or the reference itself) can retry them."""
    from datetime import datetime, timezone

    lines = ["offsetFrom,offsetTo,partition,topic,lastModified"]
    for r in rows:
        iso = datetime.fromtimestamp(
            r.last_modified_ms / 1000, tz=timezone.utc
        ).isoformat().replace("+00:00", "Z")
        lines.append(f"{r.offset_from},{r.offset_to},{r.partition},{r.topic},{iso}")
    return ("\n".join(lines) + "\n").encode()


def migrate_legacy_offsets(
    manifest,
    storage,
    output_dir: str,
    topic: str,
    candidates: list[FileEntry],
    end_offset=None,
) -> list[FileEntry]:
    """Legacy migration for `topic`: returns the candidate files NOT covered
    by the legacy CSV; covered files are committed into the manifest and the
    CSV is deleted (AccountantImpl.kt:38-53 — read, merge, delete).

    `candidates` MUST be the pre-age-filter listing: the minimum-file-age
    filter (P5) only *defers* processing, but coverage classification is
    one-shot — a covered-but-young file missing from this list would lose
    its coverage with the CSV and be re-extracted next run (duplicate
    append when dedup is off). `plans/restructure.py` therefore applies the
    age filter to this function's RESULT, not its input.

    `end_offset(path) -> int | None` optionally supplies the range end for
    files named without `+to` (S8 object-tag lookup); such files are
    conservatively treated as not covered. Because their coverage could not
    be mapped to files yet, the CSV is not dropped wholesale: it is
    rewritten with the ranges for the partitions those files sit on (the
    reference deletes only after merging EVERY range into its accounting)
    and retried next run — e.g. when the object tags become readable again.
    """
    import time as _time

    csv_path = legacy_offsets_path(output_dir, topic)
    if not storage.exists(csv_path):
        return candidates
    now_ms = int(_time.time() * 1000)
    rows = [
        r
        for r in parse_legacy_offsets_csv(storage.read(csv_path).decode(), now_ms)
        if r.topic == topic
    ]
    ranges = OffsetRangeSet()
    for r in rows:
        ranges.add(r)

    remaining: list[FileEntry] = []
    covered: list[FileEntry] = []
    unmapped_partitions: set[int] = set()
    for f in candidates:
        parsed = parse_offset_filename(os.path.basename(f.path))
        seen = False
        if parsed is not None:
            p_topic, part, off_from, off_to = parsed
            if off_to is None and end_offset is not None:
                off_to = end_offset(f.path)
            if off_to is not None:
                seen = ranges.contains(
                    p_topic, part, off_from, off_to, f.modified_ms
                )
            else:
                # offset range indeterminate: its coverage (if any) cannot
                # be consumed yet — keep this partition's ranges around
                unmapped_partitions.add(part)
        (covered if seen else remaining).append(f)
    if covered:
        manifest.commit(covered)
    leftover = [r for r in rows if r.partition in unmapped_partitions]
    if leftover:
        storage.store_atomic(csv_path, _render_legacy_csv(leftover))
    else:
        storage.delete(csv_path)
    return remaining
