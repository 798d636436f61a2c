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


#: Round-8 new queries (gate slots 33..45; kept under the <= 18 the
#: capacity bound in tests/test_registry_coverage.py allows, so the 5
#: trailing head slots go to explicitly-chosen r6-certified queries and
#: shrink the round-9 rotation backlog).
_R8_ADDITIONS: tuple[str, ...] = (
    "doc_gopher_quality",
    "doc_type_token_ratio",
    "tokenizer_fertility_docs",
    "doc_ngram_novelty",
    "doc_train_split",
    "source_balance_weights_docs",
    "source_dup_rate_docs",
    "dup_group_size_hist_docs",
    "minhash_estimate_error_docs",
    "embedding_gram_matrix",
    "ann_multiprobe_lsh_topk",
    "ann_ivf_incremental_topk",
    "scd2_user_state_events",
)

#: The driver's gate records only the first ~50 dict entries, so ordering
#: chooses which queries get a CORRECTNESS row each round. Round-8 rotation
#: (the r7-verdict "Next round" item 1, machine-checked by
#: tests/test_registry_coverage.py against CERT_AGE.json): the 31 queries
#: whose last driver-green row is round 5 go FIRST so they regain fresh
#: rows before aging out of the 2-round window; containment_pairs_docs
#: follows because its semantics changed this round (df>50 stop-shingle
#: cap, r7 "What's wrong" #2 — jaccard_pairs_docs got the same cap and is
#: already in the stale-31). That fills 32 slots; round-8 additions take
#: the remaining ~18 (the capacity bound the cert-age test now enforces).
#: Everything else was driver-certified in r6/r7 and rides the tail;
#: scripts/check_oracles.py still verifies the full registry locally each
#: round via the committed ORACLES_LOCAL.json.
_GATE_HEAD = (
    # -- r5-certified backlog (31; age 2 — certify-or-expire this round) --
    "asof_next_purchase",
    "bpe_encode_docs",
    "bpe_merges_docs",
    "corpus_vocabulary_docs",
    "cosine_range_search",
    "cosine_topk_bruteforce",
    "dedup_clusters_docs",
    "dedup_survivors_docs",
    "doc_fingerprint_overlap",
    "doc_length_quantiles",
    "doc_winnow_fingerprints",
    "embedding_dedup_survivors",
    "embedding_dup_clusters",
    "embedding_norms",
    "embedding_quantize",
    "hourly_event_counts",
    "jaccard_pairs_docs",  # re-gated WITH the new df<=50 cap
    "knn_label_accuracy",
    "minhash_lsh_pairs_docs",
    "minhash_signatures_docs",
    "multimodal_features",
    "pmi_collocations_docs",
    "session_windows_events",
    "simhash_docs",
    "source_quality_stats_docs",
    "temperature_mixture_docs",
    "tpch_q11_important_parts",
    "tpch_q12_priority_lines",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q9_profit_by_nation",
    # -- semantics changed in r8 (df>50 stop-shingle cap): re-certify --
    "containment_pairs_docs",
    # -- round-8 additions (never certified) --
    *_R8_ADDITIONS,
    # -- r6 backlog refreshes (slots 46-50): five reference-core queries
    #    certified early so the round-9 rotation backlog shrinks to 45,
    #    keeping ~5 free gate slots for round-9 additions --
    "event_time_cascade",
    "asof_last_purchase",
    "dedup_keep_first",
    "extraction_check",
    "offset_antijoin",
    # After the head: the rest of the r6-certified set (CORRECTNESS_r06.json)
    # rides at age 2 entering round 9 — they are the round-9 rotation backlog
    # (char_ngram_jaccard_docs, curation_pipeline_docs, dedup_exact_docs,
    # the doc_* text set, restructure_flagship + reference-core six, the
    # nine ann_* queries, mp_enrichment, offset_antijoin, dedup_keep_first,
    # file_accounting, extraction_check — see CERT_AGE.json for the exact
    # ledger). The r7-certified set ages to 1 and can wait one more round.
)


def _gate_order(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_HEAD if k in d}
    rest = {k: v for k, v in d.items() if k not in head}
    return {**head, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_order(dict(q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_order(dict(q.ORACLES))
