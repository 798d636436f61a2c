"""Round-6 corpus-curation operators: C4-style segment dedup, deterministic
train/val/test split, quality-weighted resampling, and Bloom-filter n-gram
decontamination. Hand-computable fixtures verify exact semantics; the
cross-engine value parity is covered by the registry oracles."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.curation import (
    quality_resample,
    segment_dedup,
    train_split,
)
from radar_output_restructure_spark.operators.sketches import (
    BLOOM_G,
    bloom_ngram_filter,
)
from radar_output_restructure_spark.operators.text import FP_BASE, FP_PRIME


def _fold(hexstr: str, chars: int = 16) -> int:
    h = 0
    for c in hexstr[:chars]:
        h = (h * FP_BASE + ord(c)) % FP_PRIME
    return h


def _hash_id(s: str) -> int:
    return _fold(hashlib.md5(s.encode()).hexdigest())


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------

_BOILER = " ".join(f"b{i}" for i in range(8))  # one exact 8-word segment
_UNIQ_A = " ".join(f"a{i}" for i in range(8))
_UNIQ_B = " ".join(f"c{i}" for i in range(8))


def test_segment_dedup_removes_corpus_wide_repeats(spark):
    df = spark.createDataFrame(
        [
            (1, f"{_BOILER} {_UNIQ_A}"),  # boiler + unique
            (2, f"{_BOILER} {_UNIQ_B}"),  # boiler + unique
            (3, _BOILER),  # all segments boilerplate
            (4, "lone words only here"),  # short doc, one partial segment
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(df, k=8, min_df=2).collect()
    }
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 1
    assert out[2]["n_segments"] == 2 and out[2]["n_kept"] == 1
    # doc 3 is pure boilerplate: nothing survives, fingerprint is NULL
    assert out[3]["n_segments"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["clean_fp"] is None
    # doc 4's single short segment is unique -> untouched
    assert out[4]["n_segments"] == 1 and out[4]["n_kept"] == 1
    # surviving text of doc 1 is exactly the unique segment
    expect_fp = _fold(hashlib.md5(_UNIQ_A.encode()).hexdigest())
    assert out[1]["clean_fp"] == expect_fp


def test_segment_dedup_keeps_order_of_survivors(spark):
    # two unique segments around a boilerplate one: fp must re-join in order
    df = spark.createDataFrame(
        [
            (1, f"{_UNIQ_A} {_BOILER} {_UNIQ_B}"),
            (2, _BOILER),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(df, k=8, min_df=2).collect()}
    expect = f"{_UNIQ_A} {_UNIQ_B}"
    assert out[1]["n_kept"] == 2
    assert out[1]["clean_fp"] == _fold(hashlib.md5(expect.encode()).hexdigest())


# ---------------------------------------------------------------------------
# train_split
# ---------------------------------------------------------------------------


def test_train_split_matches_hand_hash_and_is_total(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(200)], "doc_id long, text string"
    )
    rows = train_split(df).collect()
    assert len(rows) == 200
    for r in rows:
        bucket = _hash_id(f"{r['doc_id']}#split") % 100
        assert r["bucket"] == bucket
        expect = "train" if bucket < 80 else ("val" if bucket < 90 else "test")
        assert r["split"] == expect
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}


def test_train_split_stable_under_growth(spark):
    small = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id long, text string"
    )
    big = spark.createDataFrame(
        [(i, "x") for i in range(500)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["split"] for r in train_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in train_split(big).collect()}
    assert all(b[i] == a[i] for i in a)


# ---------------------------------------------------------------------------
# quality_resample
# ---------------------------------------------------------------------------


def test_quality_resample_keeps_iff_hash_below_weight(spark, sf_dir):
    from radar_output_restructure_spark.operators.text import quality_score
    from radar_output_restructure_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    weights = {
        r["doc_id"]: int(round(r["q"] * 1_000_000))
        for r in docs.select(
            "doc_id", quality_score("text").alias("q")
        ).collect()
    }
    kept = {r["doc_id"] for r in quality_resample(docs).collect()}
    for doc_id, w in weights.items():
        expect = _hash_id(f"{doc_id}#rs") % 1_000_000 < w
        assert (doc_id in kept) == expect, doc_id


# ---------------------------------------------------------------------------
# bloom_ngram_filter
# ---------------------------------------------------------------------------


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_bloom_flags_every_true_overlap(spark):
    eval_df = spark.createDataFrame(
        [(0, _words("e", 12))], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [
            (100, _words("e", 12)),  # exact copy -> must flag (no false negatives)
            (101, _words("q", 12)),  # disjoint vocabulary
            (102, _words("r", BLOOM_G - 1)),  # too short for one gram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bloom_ngram_filter(probe, eval_df).collect()}
    assert out[100]["flagged"] and out[100]["n_hits"] == 12 - BLOOM_G + 1
    assert out[100]["n_grams"] == 12 - BLOOM_G + 1
    assert out[102]["n_grams"] == 0 and out[102]["n_hits"] == 0
    assert not out[102]["flagged"]
    # 101 has 5 grams against a ~36-bit filter: astronomically unlikely FP,
    # and one-sided error means a flag here would be a determinism bug
    assert not out[101]["flagged"]


def test_bloom_partial_overlap_counts_shared_grams_only(spark):
    shared = _words("s", BLOOM_G)  # exactly one gram's worth of shared words
    eval_df = spark.createDataFrame(
        [(0, f"{_words('e', 10)} {shared}")], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(100, f"{shared} {_words('z', 10)}")], "doc_id long, text string"
    )
    out = bloom_ngram_filter(probe, eval_df).collect()[0]
    # only the fully-shared gram hits; mixed-boundary grams differ
    assert out["flagged"] and out["n_hits"] == 1


def test_bloom_probe_plan_is_map_only(spark):
    """The probe side must not join against anything corpus- or
    bitset-sized: the filter ships inside the Arrow closure (codebook
    pattern), so the gram stream meets only a MapInPandas node and the
    per-doc count — never a crossJoin that copies the bitset into every
    gram row (the 17 s plan this replaced)."""
    import contextlib
    import io

    eval_df = spark.createDataFrame(
        [(0, _words("e", 12))], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(100, _words("p", 12))], "doc_id long, text string"
    )
    df = bloom_ngram_filter(probe, eval_df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
