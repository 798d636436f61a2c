"""Registry-wide edge-input fuzz (r9 verdict item 5).

Every registered query whose oracle touches `documents` or `embeddings`
runs against an ADVERSARIAL tiny dataset — empty/whitespace-only strings,
single chars, NUL and astral unicode, embedded quotes/commas/newlines,
NULL text/lang/source, zero-norm and duplicate embeddings — and must
(a) not crash and (b) still hash-match its DuckDB oracle (the driver's
gate semantics, reusing scripts/check_oracles.compare). The sf0.01 fixture
is too clean to exercise any of these inputs; this is the harness that
keeps "oracle green" from meaning "green on clean data only".
"""

from __future__ import annotations

import os
import shutil

import pytest

import __spark_entry__ as entry
from scripts.check_oracles import compare, duckdb_con

ADVERSARIAL_DOCS = [
    # (text, lang, source)
    ("", "en", "web"),  # empty
    ("   ", "en", "web"),  # whitespace-only
    ("x", "de", "cc"),  # single char
    ("the the the and and", "en", "web"),  # adjacent stopword repeats
    ("a\x00b nul\x00inside", "fr", "books"),  # NUL bytes
    ("\U0001d518\U0001d52b\U0001d526 astral \U0001f600 text", "es", "cc"),
    ('quote " and, comma', "en", "web"),  # CSV-hostile
    ("line\nbreak inside", "en", "books"),  # embedded newline
    ("word " * 50, "de", "cc"),  # repetitive
    ("Zx9 " + "q" * 300, "fr", "web"),  # one very long token
    (None, "en", "web"),  # NULL text
    ("der die und ist nicht das", None, "books"),  # NULL lang
    ("el los es una que por", "es", None),  # NULL source
    ("the quick brown fox jumps over the lazy dog", "en", "web"),
    ("common shared prefix doc one two three", "en", "cc"),
    ("common shared prefix doc one two four", "en", "cc"),  # near-dup pair
    ("common shared prefix doc one two three", "en", "web"),  # exact dup
]


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    """sf0.001 tables with documents/embeddings replaced by adversarial
    versions (same schemas, same embedding dims)."""
    base = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")
    out = str(tmp_path_factory.mktemp("fuzz_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array(
                range(len(ADVERSARIAL_DOCS)), type=pa.int64()
            ),
            "text": pa.array([t for t, _l, _s in ADVERSARIAL_DOCS]),
            "lang": pa.array([l for _t, l, _s in ADVERSARIAL_DOCS]),
            "source": pa.array([s for _t, _l, s in ADVERSARIAL_DOCS]),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t, _l, _s in ADVERSARIAL_DOCS],
                type=pa.int64(),
            ),
        }
    )
    pq.write_table(docs, f"{out}/documents.parquet")

    dims = 64
    vecs = []
    for i in range(40):
        if i == 7:
            v = [0.0] * dims  # zero-norm vector
        elif i == 8:
            v = [1e-30] * dims  # denormal-ish tiny
        elif i in (9, 10):
            v = [float(j % 5 - 2) for j in range(dims)]  # exact duplicates
        else:
            # deterministic spread, some negatives
            v = [((i * 31 + j * 17) % 13 - 6) / 7.0 for j in range(dims)]
        vecs.append(v)
    emb = pa.table(
        {
            "vec_id": pa.array(range(40), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            # NULL labels at 5 (a query anchor: vec_id < N_QUERIES=10) and
            # 11/23 (corpus rows): exercises the pinned IS-DISTINCT-FROM
            # label semantics (NULL vs NULL = same class, NULL vs real =
            # different) in hard_negative_mining / knn_label_accuracy
            "label": pa.array(
                [None if i in (5, 11, 23) else i % 4 for i in range(40)],
                type=pa.int32(),
            ),
        }
    )
    pq.write_table(emb, f"{out}/embeddings.parquet")
    return out


def _fuzz_targets():
    oracles = entry.oracle_sql()
    names = []
    for name, q in entry.queries().items():
        sql = oracles.get(name, "")
        if "documents" in sql or "embeddings" in sql:
            names.append(name)
    return names


@pytest.mark.parametrize("name", _fuzz_targets())
def test_fuzz_query_matches_oracle(spark, fuzz_dir, name):
    q = entry.queries()[name]
    sdf = q(spark, fuzz_dir).toPandas()  # (a) no crash
    sql = entry.oracle_sql()[name]
    odf = duckdb_con(fuzz_dir).execute(sql).df()
    assert compare(name, sdf, odf), f"{name} diverges on adversarial input"


# ---------------------------------------------------------------------------
# events-table fuzz: NULL ts/user/type/value, duplicate instants, ties
# ---------------------------------------------------------------------------

import datetime as _dt

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return None if minutes is None else _BASE_TS + _dt.timedelta(minutes=minutes)


ADVERSARIAL_EVENTS = [
    # (event_id, ts_minutes, user_id, event_type, value, props)
    (0, 0, 1, "signup", 1.0, '{"k": 1}'),
    (1, 10, 1, "view", 8.62, '{"k": 2}'),      # .62: floor-vs-round trap
    (2, 20, 1, "click", -3.5, None),            # negative value, NULL props
    (3, 30, 1, "purchase", 100.75, '{"k": 3}'),
    (4, 40, None, "view", 5.0, '{"k": 4}'),     # NULL user mid-funnel
    (5, 50, None, "click", 6.0, '{"k": 5}'),
    (6, 60, None, "purchase", 7.0, '{"k": 6}'),
    (7, None, 2, "view", 1.25, '{"k": 7}'),     # NULL ts
    (8, 70, 2, None, 2.0, '{"k": 8}'),          # NULL event_type
    (9, 80, 2, "purchase", None, '{"k": 9}'),   # NULL value
    (10, 90, 2, "purchase", 4.0, '{"k": 10}'),  # same-instant purchases:
    (11, 90, 2, "purchase", 9.0, '{"k": 11}'),  # asof right-side tie
    (12, 90, 2, "view", 1.0, '{"k": 12}'),      # ts tie across types
    (13, 100, 3, "signup", 2.5, "not json"),    # malformed props
    (14, 101, 3, "view", 2.5, '{"k": 14}'),
    (15, 102, 3, "error", 1e15, '{"k": 15}'),   # huge value
    (16, 5000, 3, "view", 0.0, '{"k": 16}'),    # far-future gap (sessions)
    (17, 5001, 3, "purchase", 1.115, '{"k": 17}'),  # half-way rounding
]


@pytest.fixture(scope="module")
def events_fuzz_dir(spark, tmp_path_factory):
    base = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")
    out = str(tmp_path_factory.mktemp("fuzz_events_sf"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = pa.table(
        {
            "event_id": pa.array(
                [r[0] for r in ADVERSARIAL_EVENTS], type=pa.int64()
            ),
            "ts": pa.array(
                [_ts(r[1]) for r in ADVERSARIAL_EVENTS],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array(
                [r[2] for r in ADVERSARIAL_EVENTS], type=pa.int64()
            ),
            "event_type": pa.array([r[3] for r in ADVERSARIAL_EVENTS]),
            "value": pa.array(
                [r[4] for r in ADVERSARIAL_EVENTS], type=pa.float64()
            ),
            "props": pa.array([r[5] for r in ADVERSARIAL_EVENTS]),
        }
    )
    pq.write_table(ev, f"{out}/events.parquet")
    return out


def _events_fuzz_targets():
    import re

    oracles = entry.oracle_sql()
    names = []
    for name, sql in oracles.items():
        if re.search(r"\bevents\b", sql) and "documents" not in sql:
            names.append(name)
    return names


@pytest.mark.parametrize("name", _events_fuzz_targets())
def test_events_fuzz_query_matches_oracle(spark, events_fuzz_dir, name):
    q = entry.queries()[name]
    sdf = q(spark, events_fuzz_dir).toPandas()  # (a) no crash
    sql = entry.oracle_sql()[name]
    odf = duckdb_con(events_fuzz_dir).execute(sql).df()
    assert compare(name, sdf, odf), f"{name} diverges on adversarial events"
