"""Corpus-curation operators: deterministic sampling and near-dup removal.

The selection half of a training-data pipeline — once dedup/quality/language
signals exist, these operators turn them into a reproducible kept-corpus:

* `stratified_sample` — per-stratum rates via a 53-bit content-independent
  hash of the id (md5-Horner, the repo's shared engine-exact hash), so the
  sample is deterministic, stable under corpus growth (a doc's keep/drop
  never changes when other docs arrive), and needs NO shuffle — it is a
  map-only filter. That is the property random() sampling lacks.
* `near_dup_survivors` — drop every document of a duplicate cluster except
  the canonical (minimum-id) member. The removal list is cluster-sized
  (small by construction), so it broadcasts into an anti-join against the
  corpus: one map-side filter, no shuffle of the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.text import md5_horner_sql


def stratified_sample(
    df: DataFrame,
    rates_per_mille: dict[str, int],
    bucket_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 0,
) -> DataFrame:
    """Keep each row iff hash(id) % 1000 < rate for its bucket.

    `rates_per_mille`: bucket value -> keep-rate out of 1000. Buckets not
    listed fall back to `default_rate`. Map-only: one hash + one CASE per
    row, no shuffle, no RNG state.
    """
    bucket_hash = F.expr(md5_horner_sql(f"CAST(`{id_col}` AS STRING)")) % 1000
    rate = F.lit(default_rate)
    for bucket, r in sorted(rates_per_mille.items()):
        rate = F.when(F.col(bucket_col) == bucket, F.lit(r)).otherwise(rate)
    return df.filter(bucket_hash < rate)


def near_dup_survivors(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus minus non-canonical cluster members.

    `clusters`: (doc, cluster) labels from duplicate_clusters — only
    documents that appear in some near-dup pair, labeled with the cluster's
    min doc id. Everything except the canonical member is removed; documents
    in no cluster survive untouched.
    """
    removals = clusters.filter(F.col("doc") != F.col("cluster")).select("doc")
    return df.join(
        F.broadcast(removals),
        df[id_col] == removals["doc"],
        "left_anti",
    )
