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
from radar_output_restructure_spark import queries_sim  # noqa: E402,F401  (registers sim queries)
from radar_output_restructure_spark import queries_stream  # noqa: E402,F401  (registers streaming/session queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.QUERIES["restructure_flagship"](spark, "/root/testdata/sf0.001")


#: The driver's gate records only the first ~50 dict entries, so ordering
#: chooses which queries get a CORRECTNESS row each round. Round-5 rotation
#: (VERDICT r4 item 1): put the 21 queries that have never had a driver-green
#: row FIRST, then the 14 whose last row is round 3 (several had their LSH
#: semantics changed in r4), then the reference-core set. The r4-certified
#: TPC-H/doc queries ride the tail for one round — their r4 rows stand, and
#: scripts/check_oracles.py still verifies the full registry locally.
_GATE_HEAD = (
    # -- never driver-certified (r3/r4 additions past the 50-slot cap) --
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_recall_at_k",
    "ann_recall_at_k",
    "cosine_range_search",
    "knn_label_accuracy",
    "embedding_near_dup_pairs_auto",
    "embedding_dup_clusters",
    "embedding_dedup_survivors",
    "embedding_quantize",
    "simhash_near_dup_docs",
    # -- round-5 additions (never certified by definition) --
    "simhash_near_dup_docs_wide",
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_parts",
    "tpch_q12_priority_lines",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers",
    "source_quality_stats_docs",
    "ann_ivfpq_rerank_topk",
    "ann_ivfpq_rerank_recall_at_k",
    "corpus_vocabulary_docs",
    "doc_winnow_fingerprints",
    "doc_fingerprint_overlap",
    "temperature_mixture_docs",
    "doc_length_quantiles",
    "bpe_merges_docs",
    "bpe_encode_docs",
    "pmi_collocations_docs",
    "dedup_clusters_docs",
    "dedup_survivors_docs",
    # -- last certified in r3; LSH plane-family semantics changed in r4 --
    "minhash_signatures_docs",
    "minhash_lsh_pairs_docs",
    "simhash_docs",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "multimodal_features",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "session_windows_events",
    "hourly_event_counts",
    "embedding_near_dup_pairs",
    "embedding_norms",
    "jaccard_pairs_docs",
    "asof_next_purchase",
    # -- reference-core set (r4-green; keep inside the 50-slot window) --
    "restructure_flagship",
    "time_bin_hourly",
    "sanitize_ids",
    "flatten_projection",
    "exclude_fields",
    "dedup_keep_last",
)


def _gate_order(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_HEAD if k in d}
    rest = {k: v for k, v in d.items() if k not in head}
    return {**head, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_order(dict(q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_order(dict(q.ORACLES))
