"""Regression tests for the round-10 code-review findings in
operators/text.py and operators/curation.py (each was mirrored into the
DuckDB oracle in queries_docs.py — these tests pin the SEMANTICS the
oracle comparison alone cannot see, because the oracle mirrored the bug).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    )


def test_stopword_count_counts_adjacent_repeats(spark):
    """'the the the' has three stopword hits, not two: single-space
    delimiters were consumed by non-overlapping matches."""
    from radar_output_restructure_spark.operators.text import quality_features

    df = _docs(spark, [(1, "the the the"), (2, "the cat the dog the")])
    f = quality_features("text")
    out = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", f["n_stopwords"].alias("n")).collect()
    }
    assert out == {1: 3, 2: 3}


def test_lang_marker_count_counts_adjacent_repeats(spark):
    from radar_output_restructure_spark.operators.text import lang_scores

    df = _docs(spark, [(1, "der der und und ist")])
    s = lang_scores("text")
    row = df.select(s["de"].alias("de"), s["en"].alias("en")).first()
    assert row["de"] == 5
    assert row["en"] == 0


def test_blank_doc_scores_zero_tokens(spark):
    """A blank document must have n_tokens=0 and nll_micro=0, not one
    phantom '' token with a finite NLL."""
    from radar_output_restructure_spark.operators.text import (
        unigram_logprob_score,
    )

    df = _docs(spark, [(1, "a b a"), (2, ""), (3, "   ")])
    out = {r["doc"]: r for r in unigram_logprob_score(df).collect()}
    assert out[2]["n_tokens"] == 0 and out[2]["nll_micro"] == 0
    assert out[3]["n_tokens"] == 0 and out[3]["nll_micro"] == 0
    assert out[1]["n_tokens"] == 3


def test_blank_doc_not_in_vocabulary(spark):
    from radar_output_restructure_spark.operators.text import corpus_vocabulary

    df = _docs(spark, [(1, "x y"), (2, ""), (3, "")])
    terms = {r["term"] for r in corpus_vocabulary(df, k=10).collect()}
    assert "" not in terms
    assert terms == {"x", "y"}


def test_blank_docs_do_not_cosine_match(spark):
    """Two blank docs must not emit a cos=1.0 pair on the '' term."""
    from radar_output_restructure_spark.operators.text import (
        sparse_cosine_pairs,
    )

    df = _docs(spark, [(1, ""), (2, ""), (3, "w w"), (4, "w w")])
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in sparse_cosine_pairs(df, threshold=0.5).collect()
    }
    assert (1, 2) not in pairs
    assert (3, 4) in pairs


def test_sparse_cosine_norms_use_pruned_term_space(spark):
    """With max_df pruning, cos must be the cosine of the SURVIVING-term
    vectors: a pair identical on kept terms scores 1.0 even when a capped
    term dominates the raw vectors."""
    from radar_output_restructure_spark.operators.text import (
        sparse_cosine_pairs,
    )

    # 'boiler' appears in all 4 docs (df=4 > max_df=3) and dominates the
    # raw norms; docs 1 and 2 are identical on the surviving term 'rare'.
    df = _docs(
        spark,
        [
            (1, "boiler boiler boiler rare"),
            (2, "boiler boiler boiler rare"),
            (3, "boiler other"),
            (4, "boiler thing"),
        ],
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["cos"]
        for r in sparse_cosine_pairs(df, threshold=0.1, max_df=3).collect()
    }
    assert out.get((1, 2)) == 1.0


def test_temperature_mixture_keeps_null_bucket_rows(spark):
    from radar_output_restructure_spark.operators.curation import (
        temperature_mixture_sample,
    )

    rows = [Row(doc_id=i, lang=("en" if i % 2 else None)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture_sample(df, base_rate_per_mille=1000)
    # base rate 1.0 and both buckets equal-sized: EVERY row survives,
    # including the NULL-lang half that the inner equi-join used to drop
    assert out.count() == 200
    assert out.filter(F.col("lang").isNull()).count() == 100


def test_per_source_cap_keeps_null_source_group(spark):
    from radar_output_restructure_spark.operators.curation import (
        per_source_cap,
    )

    rows = [
        Row(doc_id=i, source=("a" if i < 5 else None), text=f"doc {i} text")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = per_source_cap(df, cap=3)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("a") == 3
    assert by_src.get(None) == 3, (
        "NULL-source rows must be capped as their own group, not dropped "
        "by pandas' dropna=True default"
    )


def test_content_split_null_text_hashes_like_empty(spark):
    from radar_output_restructure_spark.operators.curation import (
        content_train_split,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="")],
        "doc_id long, text string",
    )
    out = {r["doc"]: (r["bucket"], r["split"]) for r in content_train_split(df).collect()}
    assert out[1] == out[2]  # NULL == empty content: same bucket, same split
    assert out[1][0] is not None  # a real hex bucket, not NULL-to-'test'
    assert out[1] == ("d4", "train")  # md5('')[0:2]


def test_pmi_double_factors_match_bigint_at_small_counts(spark):
    """The overflow fix (cast factors to double before multiplying) must be
    value-identical at small counts: exact integers below 2^53."""
    from radar_output_restructure_spark.operators.text import pmi_collocations

    df = _docs(
        spark,
        [(i, "fast car fast car slow boat") for i in range(4)],
    )
    out = {
        (r["lhs"], r["rhs"]): r["pmi_micro"]
        for r in pmi_collocations(df, min_count=2, k=10).collect()
    }
    import math

    # c(fast)=8, c(car)=8, n(fast car)=8, total=24
    expect = round(math.log((8 * 24) / (8 * 8)) * 1_000_000)
    assert out[("fast", "car")] == expect


# ---------------------------------------------------------------------------
# similarity.py / multimodal.py review findings
# ---------------------------------------------------------------------------


def test_cosine_topk_zero_norm_vector_is_deterministic(spark):
    """A zero-norm corpus vector must score sim 0.0 (never NaN, which ranks
    differently in numpy's batch prune vs Spark's window)."""
    from pyspark.sql import Row

    from radar_output_restructure_spark.operators.similarity import (
        cosine_topk,
    )

    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 0.0]),  # degenerate
            Row(vec_id=3, embedding=[0.9, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [Row(vec_id=10, embedding=[1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["neighbor_id"]: r["sim"]
        for r in cosine_topk(corpus, queries, k=3).collect()
    }
    assert out[2] == 0.0  # not NaN, not rank-1
    assert out[1] == 1.0


def test_near_dup_pairs_chunked_generation_matches_single_chunk(spark):
    """Per-chunk pair generation (the O(m^2)-allocation fix) must emit the
    identical pair set as one big chunk."""
    from pyspark.sql import Row

    from radar_output_restructure_spark.operators.similarity import (
        near_dup_pairs_from_buckets,
    )

    emb = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(i % 4 + 1), float((i * 7) % 5 + 1)])
            for i in range(24)
        ],
        "vec_id long, embedding array<double>",
    )
    buckets = spark.createDataFrame(
        [Row(table=0, bucket=0, vec_id=i) for i in range(24)],
        "table int, bucket int, vec_id long",
    )

    def pairs(chunk):
        return sorted(
            (r["vec_a"], r["vec_b"], r["sim"])
            for r in near_dup_pairs_from_buckets(
                emb, buckets, threshold=0.2, chunk_pairs=chunk
            ).collect()
        )

    big = pairs(1 << 21)  # single chunk covers all 276 pairs
    small = pairs(7)  # many chunks, anchors split mid-row-range
    assert big == small
    assert len(big) > 0


def test_label_centroid_zero_norm_label_pins_cos_zero(spark):
    from pyspark.sql import Row

    from radar_output_restructure_spark.operators.similarity import (
        label_centroid_similarity,
    )

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, label="a", embedding=[1.0, 2.0]),
            Row(vec_id=2, label="z", embedding=[0.0, 0.0]),  # zero centroid
        ],
        "vec_id long, label string, embedding array<double>",
    )
    rows = label_centroid_similarity(emb).collect()
    assert len(rows) == 1
    assert rows[0]["cos"] == 0.0  # not NaN


def test_audio_frame_starts_align_to_channel_boundaries(spark):
    """Stereo WAV: every sampled window must start on a PCM frame boundary
    (an even interleaved index), not mid-frame."""
    import io
    import struct
    import wave

    from pyspark.sql import Row

    from radar_output_restructure_spark.operators.multimodal import (
        audio_frame_rms,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(1000)
        # left channel loud, right silent: channel mixing would show up as
        # rms differing between aligned and misaligned windows
        frames = b"".join(
            struct.pack("<hh", 10000, 0) for _ in range(1003)  # odd-ish span
        )
        w.writeframes(frames)
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(buf.getvalue()))],
        "doc_id long, payload binary",
    )
    rows = audio_frame_rms(df, n_frames=5, frame_s=0.1).collect()
    assert len(rows) == 5
    # all windows cover identical (loud, silent) frame pairs -> equal rms
    rmss = {r["rms"] for r in rows}
    assert len(rmss) == 1, f"channel-misaligned windows: {sorted(rmss)}"
    # start_s must land on whole PCM frames (multiples of 1/rate)
    for r in rows:
        assert (r["start_s"] * 1000) == int(r["start_s"] * 1000)


# ---------------------------------------------------------------------------
# queries.py / sinks/writers.py review findings
# ---------------------------------------------------------------------------


def test_sidecar_avro_names_are_unique():
    """A schema with two struct fields must not emit duplicate Avro record
    fullnames ('Can't redefine: record')."""
    import json

    from pyspark.sql import types as T

    from radar_output_restructure_spark.sinks.writers import _avro_schema_json

    schema = T.StructType(
        [
            T.StructField(
                "key",
                T.StructType([T.StructField("userId", T.StringType())]),
            ),
            T.StructField(
                "value",
                T.StructType([T.StructField("time", T.DoubleType())]),
            ),
        ]
    )
    body = json.loads(_avro_schema_json(schema, "topic_a"))

    names = []

    def walk(node):
        if isinstance(node, dict):
            if node.get("type") == "record":
                names.append(node["name"])
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(body)
    assert len(names) == len(set(names)), names


def test_direct_writer_null_partition_uses_hive_token(spark, tmp_path):
    """A NULL partition value must become __HIVE_DEFAULT_PARTITION__ (as
    Spark's partitionBy does), not '' which os.path.join silently drops."""
    import os

    from pyspark.sql import Row

    from radar_output_restructure_spark.sinks.writers import (
        write_output_tree_direct,
    )

    df = spark.createDataFrame(
        [
            Row(pf_project=None, pf_topic="t", pf_bin="20240101_0000", v=1.0),
            Row(pf_project="p", pf_topic="t", pf_bin="20240101_0000", v=2.0),
        ],
        "pf_project string, pf_topic string, pf_bin string, v double",
    )
    out = str(tmp_path / "out")
    write_output_tree_direct(
        df, out, ["pf_project", "pf_topic", "pf_bin"], fmt="csv"
    )
    got = sorted(
        os.path.relpath(os.path.join(r, f), out)
        for r, _d, fs in os.walk(out)
        for f in fs
        if f.endswith(".csv")
    )
    assert got == [
        "__HIVE_DEFAULT_PARTITION__/t/20240101_0000.csv",
        "p/t/20240101_0000.csv",
    ]


def test_sidecar_topic_with_quote_is_valid_json(spark, tmp_path):
    import glob
    import json

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from radar_output_restructure_spark.sinks.writers import (
        write_output_tree_direct,
    )

    df = spark.createDataFrame(
        [Row(pf_topic='a"b', pf_bin="20240101_0000", v=1.0)],
        "pf_topic string, pf_bin string, v double",
    )
    out = str(tmp_path / "out")
    write_output_tree_direct(
        df,
        out,
        ["pf_topic", "pf_bin"],
        fmt="csv",
        value_schema=T.StructType([T.StructField("v", T.DoubleType())]),
    )
    sidecars = glob.glob(out + "/**/schema-*.json", recursive=True)
    assert sidecars
    body = json.loads(open(sidecars[0]).read())  # must parse
    assert body["name"] == 'a"b'


# ---------------------------------------------------------------------------
# write-then-commit crash window: documented behavior + dedup mitigation
# ---------------------------------------------------------------------------


def _crash_fixture(spark, tmp_path):
    import os

    from tests.test_restructure_e2e import _write_fixture

    input_dir = str(tmp_path / "in")
    rows = [
        Row(
            key=Row(projectId="p", userId="u", sourceId="s"),
            value=Row(time=3600.0 + i, status=s),
        )
        for i, s in enumerate(["A", "B", "C"])
    ]
    _write_fixture(spark, input_dir, "t", rows, 0, 0, 2)
    return input_dir, str(tmp_path / "out")


def _run_with_crash_before_commit(spark, cfg):
    """Run the plan but crash between the output write and the manifest
    commit — the T2 at-least-once window. run() isolates per-topic
    failures (r11 reference-parity change), so the crash surfaces on
    last_errors rather than propagating."""
    from radar_output_restructure_spark.plans.restructure import (
        RestructurePlan,
    )

    plan = RestructurePlan(spark, cfg)

    def crash(files):
        raise RuntimeError("crash between write and commit")

    plan.manifest.commit = crash
    plan.run()
    err = plan.last_errors.get("t")
    assert isinstance(err, RuntimeError) and "between write and commit" in str(
        err
    )


def test_crash_between_write_and_commit_duplicates_then_rerun(
    spark, tmp_path
):
    """Documented behavior (README, sources/manifest.py): a crash between
    write and commit replays the batch and APPENDS duplicate rows — exact
    reference parity (worker/FileCache.kt:181-186)."""
    from radar_output_restructure_spark.plans.restructure import (
        RestructureConfig,
        RestructurePlan,
    )

    input_dir, output_dir = _crash_fixture(spark, tmp_path)
    cfg = RestructureConfig(input_dir=input_dir, output_dir=output_dir)
    _run_with_crash_before_commit(spark, cfg)

    finals = RestructurePlan(spark, cfg).run()["t"]  # recovery run
    lines = open(finals[0]).read().splitlines()
    assert len(lines) == 1 + 6  # header + 3 original + 3 replayed (dup)

    # and the ledger now owns the files: a THIRD run is a no-op
    assert RestructurePlan(spark, cfg).run() == {"t": []}


def test_crash_replay_with_dedup_collapses_duplicates(spark, tmp_path):
    """The documented mitigation: dedup-on-append rewrites the whole file
    (reference FileCache.closeAndJoin), so the replayed batch's rows
    collapse into the survivors."""
    from radar_output_restructure_spark.plans.restructure import (
        DedupConfig,
        RestructureConfig,
        RestructurePlan,
    )

    input_dir, output_dir = _crash_fixture(spark, tmp_path)
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=output_dir,
        dedup=DedupConfig(enable=True),
    )
    _run_with_crash_before_commit(spark, cfg)

    finals = RestructurePlan(spark, cfg).run()["t"]  # recovery run
    lines = open(finals[0]).read().splitlines()
    assert len(lines) == 1 + 3, lines  # duplicates collapsed
    assert sorted(lines[1:]) == [
        "p,u,s,3600.0,A",
        "p,u,s,3601.0,B",
        "p,u,s,3602.0,C",
    ]


def test_dedup_on_append_across_runs_keep_last(spark, tmp_path):
    """Late data appending an already-written row must dedup against the
    EXISTING file content, not just within its own batch."""
    import os

    from tests.test_restructure_e2e import _write_fixture

    from radar_output_restructure_spark.plans.restructure import (
        DedupConfig,
        RestructureConfig,
        RestructurePlan,
    )

    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    base = [
        Row(
            key=Row(projectId="p", userId="u", sourceId="s"),
            value=Row(time=3600.0 + i, status=s),
        )
        for i, s in enumerate(["A", "B"])
    ]
    _write_fixture(spark, input_dir, "t", base, 0, 0, 1)
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=output_dir,
        dedup=DedupConfig(enable=True),
    )
    RestructurePlan(spark, cfg).run()

    # a second source file carries ONE duplicate of row A and one new row
    late = [
        Row(
            key=Row(projectId="p", userId="u", sourceId="s"),
            value=Row(time=3600.0, status="A"),
        ),
        Row(
            key=Row(projectId="p", userId="u", sourceId="s"),
            value=Row(time=3602.0, status="Z"),
        ),
    ]
    _write_fixture(spark, input_dir, "t", late, 0, 2, 3)
    finals = RestructurePlan(spark, cfg).run()["t"]
    lines = open(finals[0]).read().splitlines()
    assert len(lines) == 1 + 3, lines  # A deduped across runs
    assert lines[1:] == [
        "p,u,s,3601.0,B",
        "p,u,s,3600.0,A",  # keep-LAST: the replayed A survives, in its
        "p,u,s,3602.0,Z",  # last-occurrence position (reference order)
    ]


# ---------------------------------------------------------------------------
# sketches / timeseries / funnel review findings
# ---------------------------------------------------------------------------


def test_interval_join_drops_inverted_intervals(spark):
    """An end <= start interval must be dropped BEFORE the bucket explode —
    Spark's sequence() silently generates a huge DESCENDING array when
    start > stop (one epoch-0-end sentinel row = ~500k junk buckets)."""
    from radar_output_restructure_spark.operators.timeseries import (
        interval_join,
    )

    left = spark.createDataFrame(
        [Row(user_id=1, ts="2026-01-01 10:00:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            Row(user_id=1, s="2026-01-01 09:00:00", e="2026-01-01 11:00:00"),
            Row(user_id=1, s="2026-01-01 09:00:00", e="1970-01-01 00:00:00"),
        ],
        "user_id long, s string, e string",
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    out = interval_join(
        left, right, keys="user_id", left_ts="ts", start_col="s",
        end_col="e", bucket_s=3600
    )
    assert out.count() == 1  # matches the valid interval only, no blow-up


def test_scd2_null_state_opens_its_own_island(spark):
    from radar_output_restructure_spark.operators.timeseries import (
        scd2_intervals,
    )

    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=1.0, event_id=1, state="login"),
            Row(user_id=1, ts=2.0, event_id=2, state=None),
            Row(user_id=1, ts=3.0, event_id=3, state="logout"),
        ],
        "user_id long, ts double, event_id long, state string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_intervals(
        df, key_col="user_id", state_col="state", ts_col="ts",
        tie_col="event_id",
    ).orderBy("valid_from")
    rows = out.collect()
    assert len(rows) == 3, rows  # NULL state is its OWN interval, not
    # absorbed into 'login'
    states = [r["state"] for r in rows]
    assert states == ["login", None, "logout"]


def test_event_path_topk_drops_null_mid_path(spark):
    from radar_output_restructure_spark.operators.funnel import (
        event_path_topk,
    )

    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=float(i), event_id=i, event_type=t)
            for i, t in enumerate(["a", None, "c", "a", "b", "c"])
        ],
        "user_id long, ts double, event_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    paths = {r["path"] for r in event_path_topk(df, n=3).collect()}
    # (a, NULL, c) must not corrupt into the colliding path 'a>c'
    assert "a>c" not in paths
    assert "a>b>c" in paths


def test_funnel_excludes_null_users(spark):
    from radar_output_restructure_spark.operators.funnel import funnel

    rows = [
        Row(user_id=None, ts=1.0, event_type="view"),
        Row(user_id=None, ts=2.0, event_type="click"),
        Row(user_id=7, ts=1.0, event_type="view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts double, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = funnel(df, steps=("view", "click")).first()
    assert out["n_step1"] == 1  # the NULL "user" is not a funnel subject
    assert out["n_step2"] == 0


def test_cms_bucket_rejects_depth_past_digest():
    from pyspark.sql import functions as F

    from radar_output_restructure_spark.operators.sketches import _cms_bucket

    with pytest.raises(ValueError, match="32 hex chars"):
        _cms_bucket(F.lit("ab"), row=4, width=1024)


def test_log_bucket_quantiles_survive_nanosecond_epochs(spark):
    """Values >= 2^60 must not wrap int64 in the sub-bucket arithmetic."""
    from radar_output_restructure_spark.operators.sketches import (
        log_bucket_quantiles,
    )

    big = [1_700_000_000_000_000_000 + i * 10**15 for i in range(100)]
    df = spark.createDataFrame(
        [Row(grp="ns", v=x) for x in big], "grp string, v long"
    )
    row = log_bucket_quantiles(df, group_col="grp", value_col="v").first()
    # exact python replay of the documented bucket rule
    def lb(x):
        p = 1 << (x.bit_length() - 1)
        return p + ((x - p) // (p // 16)) * (p // 16)

    lbs = sorted(lb(x) for x in big)
    def q(pct):
        need = (len(big) * pct + 99) // 100
        return lbs[need - 1]

    assert row["q50"] == q(50) and row["q95"] == q(95) and row["q99"] == q(99)
    assert row["q99"] > 0  # the wrapped-negative symptom


# ---------------------------------------------------------------------------
# streaming/windows.py review findings (batch-mode checks; stream paths
# share the fixed code)
# ---------------------------------------------------------------------------


def test_streaming_funnel_batch_excludes_null_users(spark):
    from radar_output_restructure_spark.streaming.windows import (
        streaming_funnel_conversions,
    )

    rows = [
        Row(user_id=None, ts=1.0, event_type="view"),
        Row(user_id=None, ts=2.0, event_type="click"),
        Row(user_id=None, ts=3.0, event_type="purchase"),
        Row(user_id=5, ts=1.0, event_type="view"),
        Row(user_id=5, ts=2.0, event_type="click"),
        Row(user_id=5, ts=3.0, event_type="purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts double, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = streaming_funnel_conversions(df).collect()
    assert [r["user_id"] for r in out] == [5]


def test_session_windows_drop_null_ts(spark):
    from radar_output_restructure_spark.streaming.windows import (
        session_windows,
    )

    rows = [
        Row(user_id=1, ts=1.0),
        Row(user_id=1, ts=None),
        Row(user_id=1, ts=10.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = session_windows(df, gap_s=100.0).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 2  # the NULL-ts row neither sessions nor
    # splits the real session


def test_streaming_dedup_batch_keeps_first_arrival(spark):
    from radar_output_restructure_spark.streaming.windows import (
        streaming_dedup,
    )

    rows = [
        Row(event_id=1, ts=2.0, payload="late"),
        Row(event_id=1, ts=1.0, payload="first"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts double, payload string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = streaming_dedup(df).collect()
    assert len(out) == 1
    assert out[0]["payload"] == "first"  # deterministic, not arbitrary


def test_simhash_stream_popcount_masks_signed_fingerprints(spark, tmp_path):
    """A signed 64-bit fingerprint (-256) is 56 bits away from 0 in
    two's-complement; the unmasked Python popcount said 1 and emitted a
    false near-dup pair that batch mode rejects."""
    import glob
    import os

    from radar_output_restructure_spark.streaming.windows import (
        streaming_simhash_near_dup_pairs,
    )

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    batch = spark.createDataFrame(
        [Row(doc=1, simhash=-256), Row(doc=2, simhash=0)],
        "doc long, simhash long",
    )
    # batch mode (the reference semantics): bit_count(-256 ^ 0) = 56 > 3
    got_batch = streaming_simhash_near_dup_pairs(
        batch, bits=64, bands=8, max_hamming=3
    ).collect()
    assert got_batch == []

    # streaming mode over the same two rows must agree
    batch.coalesce(1).write.parquet(src_dir + "/d1")
    stream = (
        spark.readStream.schema("doc long, simhash long")
        .parquet(src_dir + "/d1")
    )
    out_rows = []
    q = (
        streaming_simhash_near_dup_pairs(
            stream, bits=64, bands=8, max_hamming=3
        )
        .writeStream.foreachBatch(
            lambda bdf, _i: out_rows.extend(bdf.collect())
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert out_rows == [], out_rows
