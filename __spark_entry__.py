"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship restructure-routing query on sf0.001.
`queries()` / `oracle_sql()` expose the full registry from
`radar_output_restructure_spark.queries` — one entry per implemented operator
from SURVEY.md §2 plus the training-data extensions, each with a DuckDB
oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from radar_output_restructure_spark import queries as q  # noqa: E402
from radar_output_restructure_spark import queries_docs  # noqa: E402,F401  (registers doc queries)
from radar_output_restructure_spark import queries_events  # noqa: E402,F401  (registers funnel/retention queries)
from radar_output_restructure_spark import queries_sim  # noqa: E402,F401  (registers sim queries)
from radar_output_restructure_spark import queries_stream  # noqa: E402,F401  (registers streaming/session queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.QUERIES["restructure_flagship"](spark, "/root/testdata/sf0.001")


#: The driver's gate records only the first ~50 dict entries, so ordering
#: chooses which queries get a CORRECTNESS row each round. Round-6 rotation
#: (continuing the r4-verdict rotation policy): the 44 queries whose last
#: driver-green row is round 4 — the reference-core set, TPC-H, and the doc
#: text/curation set — go FIRST so they regain fresh rows; round-6 additions
#: follow; the entire round-5-certified head rides the tail (its r5 rows
#: stand, and scripts/check_oracles.py still verifies the full registry
#: locally each round via the committed ORACLES_LOCAL.json).
_GATE_HEAD = (
    # -- round-6 additions (never certified) --
    "semantic_dedup_embeddings",
    "source_similarity_minhash",
    "snapshot_delta_dedup_docs",
    "winsorize_docs",
    "event_rollup_daily",
    "funnel_conversions_events",
    "paragraph_dedup_docs",
    "bloom_decontaminate_docs",
    "train_split_docs",
    "quality_resample_docs",
    "event_funnel",
    "retention_cohorts",
    "event_path_topk",
    "ann_int8_topk",
    "ann_int8_recall_at_k",
    "source_cap_docs",
    "cms_heavy_hitters_docs",
    "hll_distinct_docs",
    "ann_ivf_persisted_topk",
    # -- reference-core set (last driver-green: r4; the leftovers of this
    #    section past the 50-slot cap were re-certified in r5 and can wait) --
    "dedup_keep_first",
    "offset_antijoin",
    "mp_enrichment",
    "file_accounting",
    "extraction_check",
    "cleaner_candidates",
    "event_time_cascade",
    "top_events_per_user",
    # -- TPC-H set (last driver-green: r4) --
    "tpch_q1_pricing",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping",
    "tpch_q4_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_custdist",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q22_idle_customers",
    # -- events / time-series (last driver-green: r4) --
    "asof_last_purchase",
    "rolling_1h_user_stats",
    "event_props_json",
    "event_attribution_windows",
    # -- doc text/curation set (last driver-green: r4) --
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "dedup_exact_docs",
    "doc_unigram_logprob",
    "doc_bigram_logprob",
    "char_ngram_jaccard_docs",
    "doc_tfidf_top_terms",
    "stratified_sample_docs",
    "doc_contamination",
    "doc_repetition",
    "doc_redact_pii",
    "doc_sliding_chunks",
    "doc_pack_chunks",
    "curation_pipeline_docs",
    # r4/r5-green entries displaced past slot 50 by the round-6 additions:
    # restructure_flagship, time_bin_hourly, sanitize_ids,
    # flatten_projection, exclude_fields, dedup_keep_last — all
    # re-certified in r5, due again in round 7. The thirteen late-round-6
    # queries (semantic_dedup / source_similarity / snapshot_delta /
    # winsorize / event_rollup / funnel_conversions / paragraph_dedup /
    # bloom_decontaminate / train_split / quality_resample / event_funnel /
    # retention_cohorts / event_path_topk) take the first slots as
    # never-certified; that pushes doc_lang_id, dedup_exact_docs,
    # doc_unigram_logprob, doc_bigram_logprob, char_ngram_jaccard_docs,
    # doc_tfidf_top_terms, stratified_sample_docs, doc_contamination,
    # doc_repetition, doc_redact_pii, doc_sliding_chunks, doc_pack_chunks
    # and curation_pipeline_docs (r4/r5-green, locally green in
    # ORACLES_LOCAL.json) to the round-7 rotation.
)


def _gate_order(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_HEAD if k in d}
    rest = {k: v for k, v in d.items() if k not in head}
    return {**head, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_order(dict(q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_order(dict(q.ORACLES))
