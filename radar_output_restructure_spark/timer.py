"""Per-stage timing registry (SURVEY §2 A4; reference util/Timer.kt:26-117).

Spark already meters distributed work (the UI's stage/task metrics), but the
reference's Timer also covers DRIVER-side phases — listing, pruning,
accounting, schema reads — which are exactly the phases that stop scaling
first when a deployment grows to millions of source files. This registry
reproduces the reference's surface: a process-wide enabled flag (disabled =
near-zero overhead), `time(stage)` usable as decorator or context manager,
per-stage invocation count + total wall time + distinct-thread count
(topic-parallel runs thread the same stages), and a sorted report string.

Driver-side only by design: executor work is Spark's to meter. At 100 TB the
driver phases timed here are metadata-sized (file lists, manifest segments),
so the registry itself stays tiny.
"""

from __future__ import annotations

import threading
import time as _time
from contextlib import ContextDecorator
from dataclasses import dataclass, field


@dataclass
class _Entry:
    invocations: int = 0
    total_ns: int = 0
    threads: set[int] = field(default_factory=set)


class Timer:
    """Process-wide stage timer (reference util/Timer.kt object semantics)."""

    enabled: bool = False
    _times: dict[str, _Entry] = {}
    _lock = threading.Lock()

    @classmethod
    def time(cls, stage: str) -> "_TimerContext":
        """Context manager / decorator: `with Timer.time("x"): ...` or
        `@Timer.time("x")`. When disabled, enter/exit are two attribute
        checks (reference: disabled timer skips the nanoTime calls)."""
        return _TimerContext(stage)

    @classmethod
    def add(cls, stage: str, elapsed_ns: int) -> None:
        with cls._lock:
            e = cls._times.setdefault(stage, _Entry())
            e.invocations += 1
            e.total_ns += elapsed_ns
            e.threads.add(threading.get_ident())

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._times.clear()

    @classmethod
    def entries(cls) -> dict[str, tuple[int, float, int]]:
        """stage -> (invocations, total_seconds, n_threads), sorted by stage."""
        with cls._lock:
            return {
                k: (e.invocations, e.total_ns / 1e9, len(e.threads))
                for k, e in sorted(cls._times.items())
            }

    @classmethod
    def report(cls) -> str:
        """The reference's toString shape: one line per stage, sorted."""
        if not cls.enabled:
            return "Timings: disabled"
        items = cls.entries()
        if not items:
            return "Timings: none"
        lines = ["Timings:"]
        for stage, (inv, total_s, n_thr) in items.items():
            lines.append(
                f"\t{stage} - time: {total_s:.3f} s"
                f" - threads: {n_thr} - invocations: {inv}"
            )
        return "\n".join(lines)


class _TimerContext(ContextDecorator):
    __slots__ = ("stage", "_t0")

    def __init__(self, stage: str):
        self.stage = stage
        self._t0 = 0

    def _recreate_cm(self) -> "_TimerContext":
        # ContextDecorator default returns self, which would share one _t0
        # across every call of a decorated function — concurrent topic
        # threads would clobber each other's start times. Fresh instance per
        # call keeps `@Timer.time(...)` thread-safe.
        return _TimerContext(self.stage)

    def __enter__(self):
        if Timer.enabled:
            self._t0 = _time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        # `_t0 == 0` means Timer.enabled was flipped on mid-block (or the
        # clock never started); recording now would log a bogus epoch-sized
        # sample.
        if Timer.enabled and self._t0:
            Timer.add(self.stage, _time.perf_counter_ns() - self._t0)
        self._t0 = 0
        return False
