"""Physical-plan hygiene guard: the properties .explain() must keep showing
for the plans to survive 100x data (SURVEY §4). A refactor that silently
introduces a row-at-a-time Python stage, a cartesian product, or loses a
pushed filter fails HERE, not in the next benchmark round.

Plan-construction only (explain, no execution), so the whole module runs in
seconds against the sf0.001 tables.
"""

from __future__ import annotations

import contextlib
import io
import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

from explain_audit import audit  # noqa: E402


def _stats(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return audit(buf.getvalue())


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


# Every registered query: no row-at-a-time Python, no cartesian product.
# (BroadcastNestedLoopJoin is tolerated only for 1-row scalar frames, which
# never appear as `cartesian` in the audit.)
REPRESENTATIVE = [
    "restructure_flagship",
    "tpch_q3_shipping",
    "tpch_q13_custdist",
    "tpch_q22_idle_customers",
    "dedup_exact_docs",
    "minhash_lsh_pairs_docs",
    "simhash_near_dup_docs",
    "doc_unigram_logprob",
    "doc_tfidf_top_terms",
    "cosine_range_search",
    "ann_lsh_topk",
    "event_attribution_windows",
    "doc_length_quantiles",
    "tpch_q21_waiting_suppliers",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_no_python_rows_no_cartesian(spark, sf_dir, registry, name):
    stats = _stats(registry[name](spark, sf_dir))
    assert stats.get("py_row", 0) == 0, f"{name}: row-at-a-time Python stage"
    assert stats.get("cartesian", 0) == 0, f"{name}: cartesian product"


@pytest.mark.parametrize(
    "name",
    ["tpch_q1_pricing", "tpch_q3_shipping", "tpch_q10_returned_items",
     "tpch_q14_promo_share", "tpch_q15_top_supplier"],
)
def test_tpch_filters_reach_the_scan(spark, sf_dir, registry, name):
    stats = _stats(registry[name](spark, sf_dir))
    assert stats.get("pushed_filters", 0) >= 1, f"{name}: no pushed filters"


def test_cosine_range_search_is_scan_plus_map_only(spark, sf_dir, registry):
    stats = _stats(registry["cosine_range_search"](spark, sf_dir))
    assert stats.get("shuffle", 0) == 0  # the operator's core guarantee
    assert stats.get("py_map", 0) == 1


def test_flagship_has_single_shuffle(spark, sf_dir, registry):
    """The restructure pipeline's contract: ONE exchange (the output-file
    repartition) — nothing else in the plan may shuffle."""
    stats = _stats(registry["restructure_flagship"](spark, sf_dir))
    assert stats.get("shuffle", 0) <= 1, stats


@pytest.mark.parametrize(
    "name",
    ["corpus_vocabulary_docs", "doc_unigram_logprob", "doc_bigram_logprob",
     "doc_tfidf_top_terms", "pmi_collocations_docs"],
)
def test_no_unbounded_single_partition_window(spark, sf_dir, registry, name):
    """r4 verdict invariant: a global-rank / global-total window must never
    run over an unbounded frame (it moves every distinct term to ONE
    partition — the corpus_vocabulary scale-killer). Unpartitioned windows
    are allowed only downstream of a TakeOrdered/limit that bounds them to
    k rows."""
    stats = _stats(registry[name](spark, sf_dir))
    if stats.get("window_unpart", 0):
        assert stats.get("takeordered", 0) or stats.get("limit", 0), (
            f"{name}: unpartitioned window with unbounded input: {stats}"
        )
