#!/usr/bin/env python
"""Regenerate the SURVEY.md §9 query-registry inventory table in place.

Replaces the table (and the leading count sentence) between the
"## 9. Query registry inventory (generated)" header and the first
subsequent line that is neither blank, a table row, nor part of the
header prose. Run after ANY registry change:

    python scripts/regen_survey_inventory.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from radar_output_restructure_spark import queries as q  # noqa: E402

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
HEADER = "## 9. Query registry inventory (generated)"


def summary_of(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    first = re.split(r"(?<=[.!?])\s|\n\s*\n", doc, 1)[0]
    first = re.sub(r"\s+", " ", first).strip()
    first = re.sub(r"\s*\([a-z_./]+:?[0-9-]*\)\s*\.?$", "", first)
    return (first[:107] + "...") if len(first) > 110 else first


def module_of(fn) -> str:
    return fn.__module__.rsplit(".", 1)[-1]


def main() -> None:
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    rows = ["| query | module | oracle | summary |", "|---|---|---|---|"]
    for name in names:
        fn = q.QUERIES[name]
        rows.append(
            f"| {name} | {module_of(fn)} | "
            f"{'yes' if name in oracles else 'rows-only'} | {summary_of(fn)} |"
        )

    with open(SURVEY) as fh:
        lines = fh.read().splitlines()
    try:
        start = lines.index(HEADER)
    except ValueError:
        raise SystemExit(f"SURVEY.md is missing the header: {HEADER!r}")
    end = start + 1
    while end < len(lines):
        ln = lines[end]
        if ln.startswith("## "):
            break
        end += 1

    prose = [
        "",
        f"{len(names)} oracle-gated queries across the registry modules — the driver's",
        "correctness gate runs every one against its DuckDB oracle at sf0.01",
        "(hash-compare). Regenerate this table with",
        "`python scripts/regen_survey_inventory.py` whenever the registry changes.",
        "",
    ]
    out = lines[:start + 1] + prose + rows + [""] + lines[end:]
    # collapse any double blank runs introduced at the seam
    cleaned = []
    for ln in out:
        if ln == "" and cleaned and cleaned[-1] == "":
            continue
        cleaned.append(ln)
    with open(SURVEY, "w") as fh:
        fh.write("\n".join(cleaned) + "\n")
    print(f"SURVEY §9 regenerated: {len(names)} queries")


if __name__ == "__main__":
    main()
