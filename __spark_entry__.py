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
#: chooses which queries get a CORRECTNESS row each round. Round-9 rotation
#: (the r8-verdict "Next round" item 1, machine-checked by
#: tests/test_registry_coverage.py against CERT_AGE.json): the registry is
#: at its 3-round certification capacity (144 queries / ~150 slots), so the
#: round is pure rotation — the 45 queries whose last driver-green row is
#: round 6 fill slots 1-45 (certify-or-expire this round), and the 5
#: trailing slots refresh r7-certified reference-core queries EARLY so the
#: round-10 backlog shrinks from 49 to 44, recovering ~6 free slots for
#: round-10 additions. No new gated queries this round (the verdict's
#: "registry frozen" instruction); scripts/check_oracles.py still verifies
#: the full registry locally via the committed ORACLES_LOCAL.json.
_GATE_HEAD = (
    # -- r6-certified backlog (45; age 2 — certify-or-expire this round) --
    "ann_int8_recall_at_k",
    "ann_int8_topk",
    "ann_ivf_persisted_topk",
    "bloom_decontaminate_docs",
    "cleaner_candidates",
    "cms_heavy_hitters_docs",
    "doc_quality",
    "doc_token_stats",
    "event_attribution_windows",
    "event_funnel",
    "event_path_topk",
    "event_props_json",
    "event_rollup_daily",
    "file_accounting",
    "funnel_conversions_events",
    "hll_distinct_docs",
    "mp_enrichment",
    "paragraph_dedup_docs",
    "quality_resample_docs",
    "retention_cohorts",
    "rolling_1h_user_stats",
    "semantic_dedup_embeddings",
    "snapshot_delta_dedup_docs",
    "source_cap_docs",
    "source_similarity_minhash",
    "top_events_per_user",
    "tpch_q10_returned_items",
    "tpch_q13_custdist",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q1_pricing",
    "tpch_q22_idle_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping",
    "tpch_q4_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "train_split_docs",
    "winsorize_docs",
    # -- r7 backlog refreshes (slots 46-50): five reference-core queries
    #    certified a round early so the round-10 rotation backlog shrinks
    #    to 44, recovering free gate slots for round-10 additions --
    "restructure_flagship",
    "flatten_projection",
    "exclude_fields",
    "sanitize_ids",
    "time_bin_hourly",
    # After the head: the remaining r7/r8-certified queries ride the tail at
    # age <= 1 entering round 10 — the 44 other r7-certified queries are the
    # round-10 rotation backlog (see CERT_AGE.json for the exact ledger).
)


def _gate_order(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_HEAD if k in d}
    rest = {k: v for k, v in d.items() if k not in head}
    return {**head, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_order(dict(q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_order(dict(q.ORACLES))
