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
#: chooses which queries get a CORRECTNESS row each round. Round-10 rotation
#: (the r9-verdict "Next round" item 1, machine-checked by
#: tests/test_registry_coverage.py against CERT_AGE.json): slots 1-44 are
#: the full r7-certified backlog (age 2 entering round 10 -- certify-or-
#: expire), and slots 45-50 refresh six r8-certified reference-core queries
#: EARLY so the round-11 backlog shrinks from 50 to 44, matching the
#: 3-round certification capacity (144 queries / ~150 slots). No new gated
#: queries this round; scripts/check_oracles.py still verifies the full
#: registry locally via the committed ORACLES_LOCAL.json.
_GATE_HEAD = (
    # -- r7-certified backlog (44; age 2 -- certify-or-expire this round) --
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_ivfpq_recall_at_k",
    "ann_ivfpq_rerank_recall_at_k",
    "ann_ivfpq_rerank_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_recall_at_k",
    "bucketed_join_sales",
    "char_ngram_jaccard_docs",
    "compaction_bins_docs",
    "constraint_checks_docs",
    "curation_pipeline_docs",
    "dedup_exact_docs",
    "dedup_keep_last",
    "doc_bigram_logprob",
    "doc_char_entropy",
    "doc_contamination",
    "doc_lang_id",
    "doc_pack_chunks",
    "doc_redact_pii",
    "doc_repetition",
    "doc_sliding_chunks",
    "doc_tfidf_top_terms",
    "doc_trigram_backoff",
    "doc_unigram_logprob",
    "embedding_near_dup_pairs",
    "embedding_outlier_scores",
    "embedding_random_projection",
    "global_rank_docs",
    "hard_negative_mining",
    "label_centroid_similarity",
    "profile_docs",
    "salted_agg_events",
    "semantic_decontaminate_embeddings",
    "simhash_near_dup_docs",
    "snapshot_neardup_delta_docs",
    "source_kl_divergence_docs",
    "source_length_quantile_sketch",
    "sparse_cosine_pairs_docs",
    "stratified_sample_docs",
    "token_freq_spectrum_docs",
    "zorder_events",
    # -- slots 45-48: queries whose VALUES changed this round (the r10
    #    code-review stopword-count fix — adjacent repeats were
    #    undercounted — shifts quality/stopword numbers on 63 of 500
    #    sf0.01 docs). Changed values void the old certification, so they
    #    re-certify in THIS gate per the r9-verdict rule. The other two
    #    affected queries (doc_lang_id, curation_pipeline_docs,
    #    sparse_cosine_pairs_docs) are r7 rows already in the head above --
    "doc_quality",
    "quality_resample_docs",
    "source_quality_stats_docs",
    "source_cap_docs",
    # slot 49: values changed by the rollup micros fix (floor -> HALF_UP
    # round, the repo-wide cents/micros convention; 180 sf0.01 rows move)
    "event_rollup_daily",
    # -- slot 50: r8 backlog refresh certified a round early --
    "dedup_keep_first",
    # After the head: the remaining r8/r9-certified queries ride the tail at
    # age <= 1 entering round 11 -- the 44 other r8-certified queries are the
    # round-11 rotation backlog (see CERT_AGE.json for the exact ledger).
)


def _gate_order(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_HEAD if k in d}
    rest = {k: v for k, v in d.items() if k not in head}
    return {**head, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_order(dict(q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_order(dict(q.ORACLES))
