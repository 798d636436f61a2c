"""A4 timer-stats registry (reference util/Timer.kt:26-117)."""

import threading

from radar_output_restructure_spark.timer import Timer


def setup_function(_fn):
    Timer.reset()
    Timer.enabled = True


def teardown_function(_fn):
    Timer.enabled = False
    Timer.reset()


def test_disabled_records_nothing():
    Timer.enabled = False
    with Timer.time("x"):
        pass
    assert Timer.entries() == {}
    assert Timer.report() == "Timings: disabled"


def test_counts_and_totals_accumulate():
    for _ in range(3):
        with Timer.time("stage.a"):
            pass
    with Timer.time("stage.b"):
        pass
    entries = Timer.entries()
    assert entries["stage.a"][0] == 3
    assert entries["stage.b"][0] == 1
    assert entries["stage.a"][1] >= 0.0
    # sorted-by-stage report, one line per stage (reference toString shape)
    rep = Timer.report()
    assert rep.startswith("Timings:")
    assert rep.index("stage.a") < rep.index("stage.b")


def test_decorator_form_and_exceptions_still_record():
    @Timer.time("deco")
    def fn():
        return 7

    assert fn() == 7
    try:
        with Timer.time("boom"):
            raise ValueError("x")
    except ValueError:
        pass
    entries = Timer.entries()
    assert entries["deco"][0] == 1
    assert entries["boom"][0] == 1  # finally-semantics: failures are timed too


def test_thread_count_tracks_distinct_threads():
    barrier = threading.Barrier(4)  # all workers alive at once -> distinct idents

    def work():
        barrier.wait()
        with Timer.time("mt"):
            pass
        barrier.wait()

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    with Timer.time("mt"):
        pass
    inv, _total, n_threads = Timer.entries()["mt"]
    assert inv == 5
    assert n_threads == 5  # 4 workers + this thread


def test_empty_enabled_report():
    assert Timer.report() == "Timings: none"


def test_decorator_is_thread_safe():
    """One decorated function, many concurrent callers: each call gets its
    own clock (ContextDecorator._recreate_cm override), so durations stay
    sane instead of clobbering a shared _t0."""
    import time as _t

    barrier = threading.Barrier(8)

    @Timer.time("mt.deco")
    def fn():
        barrier.wait()  # maximal overlap: all 8 enter before any exits
        _t.sleep(0.01)

    threads = [threading.Thread(target=fn) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    inv, total_s, n_threads = Timer.entries()["mt.deco"]
    assert inv == 8
    assert n_threads == 8
    # shared-_t0 clobbering yields ~0 or wildly large totals; per-call clocks
    # give 8 overlapping ~10 ms samples
    assert 0.08 <= total_s <= 8.0


def test_enable_mid_block_records_nothing():
    Timer.enabled = False
    ctx = Timer.time("late")
    with ctx:
        Timer.enabled = True  # flipped on after the clock would have started
    assert "late" not in Timer.entries()  # no bogus epoch-sized sample
