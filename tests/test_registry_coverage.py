"""Registry-coverage invariant (r4 verdict item 8): the committed
ORACLES_LOCAL.json must certify EVERY registered query green. The driver's
CORRECTNESS gate truncates at ~50 entries, so this locally-regenerated
artifact is the only per-round record covering the whole registry; a query
added (or broken) without re-running

    python scripts/check_oracles.py --json ORACLES_LOCAL.json

fails here, in-diff, instead of silently aging out of certification."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "ORACLES_LOCAL.json")


def test_oracles_artifact_covers_whole_registry():
    import __spark_entry__ as entry

    registry = set(entry.queries())
    assert os.path.exists(ARTIFACT), (
        "ORACLES_LOCAL.json missing — regenerate with "
        "`python scripts/check_oracles.py --json ORACLES_LOCAL.json`"
    )
    with open(ARTIFACT) as fh:
        artifact = json.load(fh)
    results = artifact["results"]
    uncovered = registry - set(results)
    assert not uncovered, f"queries never certified locally: {sorted(uncovered)}"
    stale = set(results) - registry
    assert not stale, f"artifact references unregistered queries: {sorted(stale)}"
    not_green = {n: v for n, v in results.items() if v == "fail"}
    assert not not_green, f"certified-failing queries committed: {not_green}"


def test_cert_age_artifact_and_rotation_invariant():
    """CERT_AGE.json (r6 verdict item 8) is fresh and the rotation promise
    holds: every registry query is driver-green within the last TWO rounds,
    or queued in the first 50 of the current gate head so the NEXT driver
    run certifies it. Debt can no longer accumulate silently."""
    import __spark_entry__ as entry
    from scripts.cert_age import build

    path = os.path.join(REPO, "CERT_AGE.json")
    assert os.path.exists(path), (
        "CERT_AGE.json missing — regenerate with `python scripts/cert_age.py`"
    )
    with open(path) as fh:
        committed = json.load(fh)
    # Compare at the committed ledger's own horizon: the driver drops
    # CORRECTNESS_r{N}.json AFTER the last round-N commit, so an artifact
    # newer than the ledger is expected at round start and must not trip
    # this test (r7 verdict "What's wrong" #1). Registry drift (queries
    # added/removed without regenerating) still fails the equality.
    current_at_committed_horizon = build(max_round=committed["latest_round"])
    assert committed == current_at_committed_horizon, (
        "CERT_AGE.json stale — regenerate with `python scripts/cert_age.py`"
    )

    # Rotation debt is checked against the FRESHEST artifacts on disk, so a
    # newly-dropped driver round tightens (never loosens) the invariant.
    current = build()
    head_50 = set(list(entry.queries())[:50])
    latest = current["latest_round"]
    debtors = {
        name
        for name, row in current["queries"].items()
        if (
            row["last_driver_green"] is None
            or latest - row["last_driver_green"] > 2
        )
        and name not in head_50
    }
    assert not debtors, (
        f"queries neither driver-green within 2 rounds nor queued in the "
        f"gate head's first 50: {sorted(debtors)}"
    )

    # Capacity bound (r7 verdict item 8): everything that needs a fresh
    # driver row at the next gate — never-certified additions plus queries
    # whose age reaches the 2-round limit after one more round — must fit
    # in the ~50 gate slots, or the rotation arithmetic breaks next round.
    needs_next_row = {
        name
        for name, row in current["queries"].items()
        if row["last_driver_green"] is None
        or latest - row["last_driver_green"] >= 2
    }
    assert len(needs_next_row) <= 50, (
        f"rotation over capacity: {len(needs_next_row)} queries need a "
        f"fresh driver row next round but the gate records only ~50 — "
        f"cut new additions or retire queries: {sorted(needs_next_row)}"
    )


def test_oracle_sql_and_queries_keys_match():
    """Every query has an oracle (or is an explicitly known rows-only op) and
    no oracle is orphaned — the driver's compare depends on both sides."""
    import __spark_entry__ as entry

    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert not o - q, f"oracles without queries: {sorted(o - q)}"
    # rows-only entries are allowed by the driver but each one weakens the
    # gate; keep the set explicit so additions are a conscious choice
    known_rows_only: set[str] = set()
    assert q - o == known_rows_only, (
        f"queries without oracles changed: {sorted(q - o)}"
    )
