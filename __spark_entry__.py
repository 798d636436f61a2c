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
    # -- round-7 additions (never certified) --
    "zorder_events",
    "sparse_cosine_pairs_docs",
    "label_centroid_similarity",
    "bucketed_join_sales",
    "salted_agg_events",
    "compaction_bins_docs",
    "token_freq_spectrum_docs",
    "global_rank_docs",
    "hard_negative_mining",
    "profile_docs",
    "constraint_checks_docs",
    "doc_char_entropy",
    "embedding_outlier_scores",
    "semantic_decontaminate_embeddings",
    "snapshot_neardup_delta_docs",
    "containment_pairs_docs",
    "source_kl_divergence_docs",
    "doc_trigram_backoff",
    "source_length_quantile_sketch",
    "embedding_random_projection",
    # -- r6-verdict demotions: these undecorated names now carry the
    #    scale-safe geometries (auto-plane LSH / wide simhash), so they
    #    need fresh certification under the new semantics --
    "embedding_near_dup_pairs",
    "simhash_near_dup_docs",
    # -- doc text/curation set (last driver-green: r4, judge re-ran in r6) --
    "char_ngram_jaccard_docs",
    "curation_pipeline_docs",
    "dedup_exact_docs",
    "doc_bigram_logprob",
    "doc_contamination",
    "doc_lang_id",
    "doc_pack_chunks",
    "doc_redact_pii",
    "doc_repetition",
    "doc_sliding_chunks",
    "doc_tfidf_top_terms",
    "doc_unigram_logprob",
    "stratified_sample_docs",
    # -- r5-green, displaced from the r6 head past slot 50 --
    "restructure_flagship",
    "time_bin_hourly",
    "sanitize_ids",
    "flatten_projection",
    "exclude_fields",
    "dedup_keep_last",
    # -- oldest r5-certified rotation slice (ANN/embedding + docs) --
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_ivfpq_recall_at_k",
    "ann_ivfpq_rerank_recall_at_k",
    "ann_ivfpq_rerank_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_recall_at_k",
    # r5-green entries left for the round-8 rotation:
    # asof_next_purchase, bpe_encode_docs, bpe_merges_docs,
    # corpus_vocabulary_docs, cosine_range_search,
    # cosine_topk_bruteforce, dedup_clusters_docs, dedup_survivors_docs,
    # doc_fingerprint_overlap, doc_length_quantiles,
    # doc_winnow_fingerprints (displaced from this head by the demotion
    # re-certifications and round-7 additions above),
    # embedding_dedup_survivors, embedding_dup_clusters,
    # embedding_norms, embedding_quantize,
    # hourly_event_counts, jaccard_pairs_docs, knn_label_accuracy,
    # minhash_lsh_pairs_docs, minhash_signatures_docs, multimodal_features,
    # pmi_collocations_docs, session_windows_events, simhash_docs,
    # source_quality_stats_docs, temperature_mixture_docs,
    # tpch_q9/q11/q12/q20/q21. (embedding_near_dup_pairs_auto and
    # simhash_near_dup_docs_wide no longer exist: the r6-verdict demotion
    # folded each into its undecorated name, re-certified in this head.)
    # Everything else was driver-certified in r5 or r6
    # (CORRECTNESS_r05/r06.json) and stays in the tail.
)


def _gate_order(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_HEAD if k in d}
    rest = {k: v for k, v in d.items() if k not in head}
    return {**head, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_order(dict(q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_order(dict(q.ORACLES))
