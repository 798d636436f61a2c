"""Training-data pipeline queries over `documents` (text analysis + dedup).

Same contract as queries.py: each Spark builder is paired with a DuckDB
oracle producing identical values. The shared md5-Horner hash and
integer-count ratios keep both engines bit-aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_output_restructure_spark.operators import text as X
from radar_output_restructure_spark.operators.dedup_scale import (
    exact_dedup_groups,
    jaccard_pairs,
)
from radar_output_restructure_spark.queries import register
from radar_output_restructure_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# token counting + fingerprint (map-only text profile)
# ---------------------------------------------------------------------------

_SQL_FP = X.md5_horner_sql(
    "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))", 16
)
_SQL_NTOK = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)
_SQL_NBPE = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"


@register(
    "doc_token_stats",
    f"""
    SELECT doc_id, {_SQL_NTOK} AS n_tokens, {_SQL_NBPE} AS n_bpe_tokens,
           {_SQL_FP} AS fingerprint
    FROM documents
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts and the 53-bit content fingerprint."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.bpe_token_count("text").alias("n_bpe_tokens"),
        X.fingerprint("text").alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_SQL_NPUNCT = "length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))"
# mirrors text._word_count_normalized: non-letter runs widened to two spaces
# so adjacent repeats ("the the") are not undercounted by delimiter-consuming
# non-overlapping matches (RE2 has no lookahead, hence this form)
_SQL_WORDPAD = (
    "(' ' || regexp_replace(lower(text), '[^a-z]+', '  ', 'g') || ' ')"
)
_SQL_NSTOP = (
    f"(len(regexp_split_to_array({_SQL_WORDPAD}, "
    f"'[^a-z]({'|'.join(X.STOPWORDS_EN)})[^a-z]')) - 1)"
)


@register(
    "doc_quality",
    f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             {_SQL_NTOK} AS n_tokens,
             {_SQL_NPUNCT} AS n_punct,
             {_SQL_NSTOP} AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
           round(n_stop / greatest(n_tokens, 1), 6) AS stopword_ratio,
           round((least(n_tokens / 100.0, 1.0)
                  + (1.0 - least(round(n_punct / greatest(n_chars, 1), 6) * 5, 1.0))
                  + least(round(n_stop / greatest(n_tokens, 1), 6) * 4, 1.0)) / 3,
                 6) AS quality
    FROM f
    """,
)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword quality features + composite score."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    f = X.quality_features("text")
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        f["punct_ratio"].alias("punct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
        X.quality_score("text").alias("quality"),
    )


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------


def _sql_lang_score(words: tuple[str, ...]) -> str:
    return (
        f"(len(regexp_split_to_array({_SQL_WORDPAD}, "
        f"'[^a-z]({'|'.join(words)})[^a-z]')) - 1)"
    )


_SQL_LANG_SCORES = ",\n             ".join(
    f"{_sql_lang_score(ws)} AS s_{lang}" for lang, ws in X.LANG_MARKERS.items()
)
_SQL_LANG_CASE = " ".join(
    f"WHEN s_{lang} = best THEN '{lang}'" for lang in sorted(X.LANG_MARKERS)
)


@register(
    "doc_lang_id",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_SQL_LANG_SCORES}
      FROM documents
    ), b AS (
      SELECT *, greatest(s_en, s_de, s_fr, s_es) AS best FROM s
    )
    SELECT doc_id, lang,
           -- ELSE catches NULL text (all scores NULL, every WHEN NULL):
           -- the Spark when/otherwise chain yields 'und' there too
           CASE WHEN best = 0 THEN 'und' {_SQL_LANG_CASE}
                ELSE 'und' END AS lang_pred
    FROM b
    """,
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language ID; ties resolve to the alphabetically first
    language, no hits -> 'und'."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return docs.select("doc_id", "lang", X.lang_id("text").alias("lang_pred"))


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy) over a corpus with synthesized duplicates
# ---------------------------------------------------------------------------

_SQL_DOCS_WITH_DUPS = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return docs.unionByName(dups)


@register(
    "dedup_exact_docs",
    f"""
    SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM ({_SQL_DOCS_WITH_DUPS})
    GROUP BY 1
    """,
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: one shuffle on the md5 digest, map-side combined;
    duplicates synthesized deterministically (every 7th doc repeated)."""
    return exact_dedup_groups(_docs_with_dups(spark, sf_dir))


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity join (exact near-dup detection)
# ---------------------------------------------------------------------------

SQL_SHINGLES = r"""
      SELECT DISTINCT doc_id AS doc, s AS shingle
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS words
            FROM documents) w,
           unnest([array_to_string(words[i:i+2], ' ')
                   for i in range(1, len(words) - 1)]) AS t(s)
"""


@register(
    "jaccard_pairs_docs",
    f"""
    WITH sh AS ({SQL_SHINGLES}),
    kept AS (
      SELECT doc, shingle FROM sh
      WHERE shingle IN (SELECT shingle FROM sh
                        GROUP BY shingle HAVING count(*) <= 50)
    ),
    sizes AS (SELECT doc, count(*) AS n FROM kept GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b USING (shingle)
      WHERE a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= 0.4
    """,
)
def q_jaccard_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard join, J >= 0.4, with the df>50
    stop-shingle cap (r7 verdict "What's wrong" #2): the posting-list
    self-join is O(sum df^2) per shingle, so one boilerplate trigram with
    df=d yields d^2/2 candidates at 100 TB; dropping hot shingles BEFORE
    sizes/self-join bounds every bucket (the oracle's `kept` CTE mirrors
    the cap exactly, like char_ngram_jaccard_docs)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return jaccard_pairs(docs, threshold=0.4, max_shingle_df=50)


@register(
    "doc_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id AS doc, tok
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM documents) w,
           unnest(words) AS t(tok)
      WHERE tok != ''
    ),
    freqs AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
    total AS (SELECT count(*) AS n FROM toks),
    per_doc AS (
      SELECT doc, count(*) AS n_tokens,
             CAST(sum(CAST(round(-ln(tf / (SELECT n * 1.0 FROM total)) * 1000000)
                      AS BIGINT)) AS BIGINT) AS nll_micro
      FROM toks JOIN freqs USING (tok)
      GROUP BY doc
    )
    -- tokenless (blank) docs score (0, 0) instead of dropping out, same
    -- convention as the bigram scorer's left join
    SELECT d.doc_id AS doc,
           coalesce(p.n_tokens, 0) AS n_tokens,
           coalesce(p.nll_micro, 0) AS nll_micro
    FROM documents d LEFT JOIN per_doc p ON p.doc = d.doc_id
    """,
)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram NLL quality score (perplexity filter): word-count pass
    broadcast into a per-doc -ln p sum; integer micro-nats keep both engines
    bit-equal."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.unigram_logprob_score(docs)


@register(
    "char_ngram_jaccard_docs",
    """
    WITH norm AS (
      SELECT doc_id AS doc,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc, substr(s, CAST(i AS INT), 5) AS g
      FROM norm, UNNEST(range(1, greatest(length(s) - 4, 0) + 1)) AS t(i)
      WHERE length(s) >= 5
    ),
    kept AS (
      SELECT doc, g FROM grams
      WHERE g IN (SELECT g FROM grams GROUP BY g HAVING count(*) <= 50)
    ),
    sizes AS (SELECT doc, count(*) AS n FROM kept GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b USING (g)
      WHERE a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = inter.doc_a
    JOIN sizes sb ON sb.doc = inter.doc_b
    WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= 0.4
    """,
)
def q_char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard near-dup pairs with a stop-gram cap (df>50
    dropped) — char grams catch intra-word edits word shingles miss; the cap
    is the skew lever that keeps the inverted-index self-join bucketed at
    100 TB (common English 5-grams would otherwise pair everything)."""
    from radar_output_restructure_spark.operators.dedup_scale import (
        char_ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return char_ngram_jaccard_pairs(
        docs, n=5, threshold=0.4, max_gram_df=50
    )


@register(
    "doc_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id AS doc, tok
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM documents) w,
           unnest(words) AS t(tok)
      WHERE tok != ''
    ),
    tf AS (SELECT doc, tok AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df_ AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc) AS n FROM tf),
    scored AS (
      SELECT doc, term,
             CAST(round(tf * ln(n * 1.0 / df) * 1000000) AS BIGINT)
               AS score_micro
      FROM tf JOIN df_ USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc
                                   ORDER BY score_micro DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc, term, rank, score_micro FROM ranked WHERE rank <= 3
    """,
)
def q_doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document, deterministic (score desc, term
    asc) ties — keyword extraction for corpus curation; one corpus
    tokenization, vocab-sized reductions (operators/text.tfidf_top_terms)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.tfidf_top_terms(docs, k=3)


_SAMPLE_RATES = {"en": 500, "de": 200, "fr": 200, "es": 200, "zh": 100}
_SQL_SAMPLE_HASH = X.md5_horner_sql("CAST(doc_id AS STRING)")
_SQL_SAMPLE_CASE = "CASE lang " + " ".join(
    f"WHEN '{b}' THEN {r}" for b, r in sorted(_SAMPLE_RATES.items())
) + " ELSE 0 END"


@register(
    "stratified_sample_docs",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ({_SQL_SAMPLE_HASH}) % 1000 < {_SQL_SAMPLE_CASE}
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling: keep iff 53-bit id-hash %% 1000 <
    the stratum's rate. Map-only, no RNG state, stable under corpus growth —
    the curation sampler (operators/curation.stratified_sample)."""
    from radar_output_restructure_spark.operators.curation import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return stratified_sample(docs, _SAMPLE_RATES).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# benchmark decontamination + repetition (Gopher-rule) filters
# ---------------------------------------------------------------------------

EVAL_SET_MAX_ID = 50  # documents standing in for a benchmark/eval corpus


@register(
    "doc_contamination",
    f"""
    WITH sh AS ({SQL_SHINGLES}),
    eg AS (SELECT DISTINCT shingle FROM sh WHERE doc < {EVAL_SET_MAX_ID}),
    sc AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN eg.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contaminated
      FROM sh LEFT JOIN eg USING (shingle)
      GROUP BY doc
    )
    SELECT d.doc_id,
           coalesce(sc.n_grams, 0) AS n_grams,
           coalesce(sc.n_contaminated, 0) AS n_contaminated,
           CASE WHEN coalesce(sc.n_grams, 0) > 0
                THEN round(sc.n_contaminated * 1.0 / sc.n_grams, 6)
                ELSE 0.0 END AS contamination
    FROM documents d LEFT JOIN sc ON sc.doc = d.doc_id
    """,
)
def q_doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-overlap decontamination: fraction of each document's distinct
    word trigrams that appear in the (broadcast-small) eval set — the
    standard pre-training leak check. One map-side-combined groupBy(doc);
    no corpus-vs-corpus join (operators/curation.contamination_scores)."""
    from radar_output_restructure_spark.operators.curation import (
        contamination_scores,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return contamination_scores(
        docs, docs.filter(F.col("doc_id") < EVAL_SET_MAX_ID)
    )


@register(
    "doc_repetition",
    r"""
    WITH g AS (
      SELECT doc_id AS doc, s AS gram
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS words
            FROM documents) w,
           unnest([array_to_string(words[i:i+1], ' ')
                   for i in range(1, len(words))]) AS t(s)
    ),
    c AS (SELECT doc, gram, count(*) AS n FROM g GROUP BY doc, gram),
    s AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY doc),
    m AS (SELECT doc, CAST(max(n) AS BIGINT) AS top_gram_count
          FROM c GROUP BY doc)
    SELECT d.doc_id, coalesce(s.n_grams, 0) AS n_grams,
           coalesce(m.top_gram_count, 0) AS top_gram_count,
           CASE WHEN coalesce(s.n_grams, 0) > 0
                THEN round(m.top_gram_count * 1.0 / s.n_grams, 6)
                ELSE 0.0 END AS repetition
    FROM documents d
    LEFT JOIN s ON s.doc = d.doc_id
    LEFT JOIN m ON m.doc = d.doc_id
    """,
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: share of a document's word bigrams
    taken by its most frequent bigram. MAP-ONLY in Spark (per-row sort +
    longest-equal-run fold — nothing leaves the row); the oracle states the
    same semantics as the classic exploded groupBy
    (operators/curation.repetition_scores)."""
    from radar_output_restructure_spark.operators.curation import (
        repetition_scores,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return repetition_scores(docs)


def _sql_redact_chain() -> tuple[str, str]:
    """(count_expr, clean_expr) mirroring operators/text.PII_PATTERNS —
    generated from the same pattern list so both engines scrub and count
    the exact same text states."""
    clean = "text"
    counts = []
    for pat, repl in X.PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({clean}, '{pat}'))")
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return " + ".join(counts), clean


_SQL_RED_COUNT, _SQL_RED_CLEAN = _sql_redact_chain()


@register(
    "doc_redact_pii",
    f"""
    SELECT doc_id,
           CAST({_SQL_RED_COUNT} AS BIGINT) AS n_redactions,
           {_SQL_RED_CLEAN} AS clean_text
    FROM documents
    """,
)
def q_doc_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: URLs, emails, and long digit/phone shapes replaced
    with typed placeholders; map-only regexp chain inside codegen, no UDF
    (operators/text.redact_pii). Patterns restrict themselves to the
    Java/RE2-identical regex subset so the oracle scrubs byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.redact_pii(docs)


@register(
    "doc_bigram_logprob",
    r"""
    WITH w AS (
      SELECT doc_id AS doc,
             regexp_split_to_array(lower(trim(text)), '\s+') AS words
      FROM documents
    ),
    bg AS (
      SELECT doc, array_to_string(words[i:i+1], ' ') AS bigram,
             words[i] AS prev
      FROM w, unnest(range(1, len(words))) AS t(i)
    ),
    cb AS (SELECT bigram, count(*) AS nb FROM bg GROUP BY bigram),
    cu AS (SELECT prev, count(*) AS np FROM bg GROUP BY prev),
    v AS (SELECT count(DISTINCT s) AS v
          FROM (SELECT unnest(words) AS s FROM w)),
    scored AS (
      SELECT bg.doc,
             CAST(round(-ln((cb.nb + 1) * 1.0 / (cu.np + v.v)) * 1000000)
                  AS BIGINT) AS nll
      FROM bg JOIN cb USING (bigram) JOIN cu USING (prev) CROSS JOIN v
    ),
    per_doc AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(nll) AS BIGINT) AS nll_micro
      FROM scored GROUP BY doc
    )
    SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams,
           coalesce(p.nll_micro, 0) AS nll_micro
    FROM documents d LEFT JOIN per_doc p ON p.doc = d.doc_id
    """,
)
def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram NLL with add-1 smoothing (integer micro-nats) — the
    perplexity filter's bigram upgrade. Deliberately exercises the
    non-broadcastable-LM-table path: doc bigrams hash-join the bigram count
    table on the bigram key; prefix counts and V broadcast
    (operators/text.bigram_logprob_score)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.bigram_logprob_score(docs)


CHUNK_W = 64   # window tokens
CHUNK_S = 48   # stride (overlap = 16)


@register(
    "doc_sliding_chunks",
    f"""
    WITH w AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                   '\\s+') AS words
      FROM documents
    ),
    sized AS (SELECT doc_id, words, len(words) AS n FROM w)
    SELECT doc_id,
           CAST(c AS BIGINT) AS chunk_idx,
           CAST(least({CHUNK_W}, n - c * {CHUNK_S}) AS BIGINT) AS n_tokens,
           array_to_string(
             words[c * {CHUNK_S} + 1 : c * {CHUNK_S} + {CHUNK_W}], ' '
           ) AS chunk_text
    FROM sized,
         unnest(range(1 + (greatest(n - {CHUNK_W}, 0) + {CHUNK_S - 1})
                      // {CHUNK_S})) AS t(c)
    """,
)
def q_doc_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking for retrieval/training corpora: 64-token
    windows advancing by 48 (16-token overlap), final window short. Map-only
    HOF slices + inline explode, no shuffle
    (operators/curation.sliding_chunks)."""
    from radar_output_restructure_spark.operators.curation import (
        sliding_chunks,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return sliding_chunks(docs, window_tokens=CHUNK_W, stride=CHUNK_S)


@register(
    "doc_pack_chunks",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, {_SQL_NTOK} AS n_tokens FROM documents
    ),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS c
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST((c - n_tokens) // 2000 AS BIGINT) AS chunk_id
    FROM cum
    """,
)
def q_doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-chunk packing: sequential first-fit of documents into
    2000-token context budgets, packed independently PER LANGUAGE stratum —
    the per-stratum window keeps packing parallel across partitions instead
    of one global sequential pass (the scale problem with naive packing).
    chunk_id = exclusive-prefix-tokens div budget, deterministic in doc_id
    order."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    n_tok = X.token_count(F.col("text")).alias("n_tokens")
    toks = docs.select("doc_id", "lang", n_tok)
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(
            f"CAST((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) "
            f"div 2000 AS BIGINT)"
        ).alias("chunk_id"),
    )


@register(
    "curation_pipeline_docs",
    f"""
    WITH f AS (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             {_SQL_NTOK} AS n_tokens,
             {_SQL_NPUNCT} AS n_punct,
             {_SQL_NSTOP} AS n_stop,
             {_SQL_FP} AS fp,
             {_SQL_LANG_SCORES}
      FROM documents
    ),
    scored AS (
      SELECT *,
             round((least(n_tokens / 100.0, 1.0)
                    + (1.0 - least(round(n_punct / greatest(n_chars, 1), 6) * 5,
                                   1.0))
                    + least(round(n_stop / greatest(n_tokens, 1), 6) * 4, 1.0))
                   / 3, 6) AS quality,
             greatest(s_en, s_de, s_fr, s_es) AS best
      FROM f
    ),
    langed AS (
      SELECT *, CASE WHEN best = 0 THEN 'und' {_SQL_LANG_CASE} END AS lang_pred
      FROM scored
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canonical
        FROM langed
      ) WHERE doc_id = canonical
    ),
    kept AS (
      SELECT * FROM deduped
      WHERE lang_pred <> 'und'
        AND quality >= 0.55
        AND n_tokens BETWEEN 20 AND 500
        AND ({_SQL_SAMPLE_HASH}) % 1000 <
            CASE lang_pred WHEN 'en' THEN 700 ELSE 400 END
    )
    SELECT lang_pred, count(*) AS n_docs,
           CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
    FROM kept GROUP BY lang_pred
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation chain as ONE Catalyst plan: analyze (tokens,
    quality, language, fingerprint — map-only) -> exact-dedup canonical
    filter (one window on the fingerprint) -> quality/language/length gates
    -> deterministic stratified sample (map-only hash) -> per-language kept
    stats. Composes the individual operators; the optimizer collapses it to
    two shuffles (dedup window + final agg)."""
    from pyspark.sql import Window

    from radar_output_restructure_spark.operators.curation import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    analyzed = X.analyze_documents(docs)
    canonical = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    deduped = (
        analyzed.withColumn("__canon", canonical)
        .filter(F.col("doc_id") == F.col("__canon"))
        .filter(
            (F.col("lang_pred") != "und")
            & (F.col("quality") >= 0.55)
            & F.col("n_tokens").between(20, 500)
        )
    )
    sampled = stratified_sample(
        deduped, {"en": 700}, bucket_col="lang_pred", default_rate=400
    )
    return sampled.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
    )


VOCAB_K = 100


@register(
    "corpus_vocabulary_docs",
    f"""
    WITH toks AS (
      SELECT doc_id AS doc, tok AS term
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM documents) w,
           unnest(words) AS t(tok)
      WHERE tok != ''
    ),
    freqs AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf,
             CAST(count(DISTINCT doc) AS BIGINT) AS df
      FROM toks GROUP BY term
    )
    SELECT rank, term, tf, df FROM (
      SELECT *, row_number() OVER (ORDER BY tf DESC, term ASC) AS rank
      FROM freqs
    ) WHERE rank <= {VOCAB_K}
    """,
)
def q_corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k corpus vocabulary by term frequency (+ document frequency) —
    the tokenizer-training / stopword-mining primitive. Corpus contributes
    one map-side-combined count shuffle; the global rank runs on the
    vocab-sized frame only (operators/text.corpus_vocabulary)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.corpus_vocabulary(docs, k=VOCAB_K)


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document signatures, MOSS-style)
# ---------------------------------------------------------------------------

WINNOW_MAX_DF = 20
WINNOW_MIN_COMMON = 3


def _winnow_sql_cte() -> str:
    """The shared h->fps CTE body: k-gram polynomial hashes as a DuckDB list
    comprehension (coefficients inlined from the SAME Python constants the
    Spark operator uses), then winnowed window minima. Mirrors
    operators/text.winnowing_fingerprints exactly in int64 math."""
    k, w = X.WINNOW_K, X.WINNOW_W
    powers = X.winnow_powers(k)
    term = " + ".join(
        f"CAST(ascii(t[i+{j}:i+{j}]) AS BIGINT) * {powers[j]}"
        for j in range(k)
    )
    return f"""
    h AS (
      SELECT doc_id AS doc,
             [({term}) % {X.WINNOW_MOD}
              for i in range(1, length(t) - {k - 2})] AS hs
      FROM (SELECT doc_id,
                   lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
            FROM documents)
      WHERE length(t) >= {k}
    ),
    fps AS (
      SELECT doc,
             unnest(list_distinct(
               [list_min(hs[i:i+{w - 1}])
                for i in range(1, greatest(len(hs) - {w - 2}, 2))]
             )) AS fp
      FROM h
    )"""


@register(
    "doc_winnow_fingerprints",
    f"""
    WITH {_winnow_sql_cte()}
    SELECT doc, fp FROM fps
    """,
)
def q_doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed rolling-hash fingerprints (Schleimer et al. SIGMOD'03): the
    position-robust substring signature — any shared run of k+w-1 chars
    guarantees a shared fingerprint. Map-only exact-int64 Arrow pass, no
    shuffle at any corpus size (operators/text.winnowing_fingerprints)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.winnowing_fingerprints(docs)


@register(
    "doc_fingerprint_overlap",
    f"""
    WITH {_winnow_sql_cte()},
    keep AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING count(*) >= 2 AND count(*) <= {WINNOW_MAX_DF}
    ),
    kept AS (SELECT doc, fp FROM fps JOIN keep USING (fp))
    SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_common
    FROM kept a JOIN kept b USING (fp)
    WHERE a.doc < b.doc
    GROUP BY 1, 2
    HAVING count(*) >= {WINNOW_MIN_COMMON}
    """,
)
def q_doc_fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-overlap candidate pairs via shared winnowed fingerprints,
    with boilerplate fingerprints (df > {max_df}) dropped before the
    inverted-index self-join — group sizes stay bounded, so pair work per
    fingerprint is O(max_df^2) regardless of corpus size
    (operators/text.fingerprint_overlap_pairs)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.fingerprint_overlap_pairs(
        docs, max_df=WINNOW_MAX_DF, min_common=WINNOW_MIN_COMMON
    )


# ---------------------------------------------------------------------------
# temperature-smoothed language mixture (exponent-0.5 rebalancing)
# ---------------------------------------------------------------------------

MIXTURE_BASE_PER_MILLE = 500


@register(
    "temperature_mixture_docs",
    f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    head AS (SELECT max(n) AS n_head FROM counts),
    rates AS (
      SELECT lang,
             least(1.0, {MIXTURE_BASE_PER_MILLE / 1000.0!r}
                        * sqrt(CAST(n_head AS DOUBLE) / CAST(n AS DOUBLE))) AS r
      FROM counts, head
    )
    SELECT d.doc_id, d.lang
    FROM documents d
    -- null-safe: a NULL-lang bucket gets its own rate row (mirrors the
    -- Spark operator's eqNullSafe join)
    JOIN rates r2 ON d.lang IS NOT DISTINCT FROM r2.lang
    WHERE ({X.md5_horner_sql("CAST(doc_id AS STRING)")}) * 1.0
          / {X.FP_PRIME} < r
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponent-0.5 language-mixture rebalancing (sample share ~ p^(1/2)):
    the head language keeps the base rate, tail languages upsample toward
    parity — the standard multilingual temperature-smoothing pass, made
    deterministic with the 53-bit id-hash and an IEEE-sqrt-only rate
    formula (operators/curation.temperature_mixture_sample)."""
    from radar_output_restructure_spark.operators.curation import (
        temperature_mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return temperature_mixture_sample(
        docs, base_rate_per_mille=MIXTURE_BASE_PER_MILLE
    ).select("doc_id", "lang")


@register(
    "doc_length_quantiles",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS q1_chars,
           round(quantile_cont(n_chars, 0.50), 6) AS median_chars,
           round(quantile_cont(n_chars, 0.75), 6) AS q3_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length distribution — the corpus profiling
    step before length filtering (quality thresholds are set per language,
    not globally). Spark's exact `percentile` and DuckDB's `quantile_cont`
    share the same linear-interpolation definition, so the values
    hash-match without integer tricks. One map-side-combined shuffle on
    lang; the sort runs per group inside the aggregate, and lang
    cardinality is tiny so the final frame is driver-negligible at any
    corpus size (for unbounded group keys, swap in approx_percentile —
    documented trade, not needed for the profiling use case)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.25)"), 6).alias("q1_chars"),
        F.round(F.expr("percentile(n_chars, 0.50)"), 6).alias("median_chars"),
        F.round(F.expr("percentile(n_chars, 0.75)"), 6).alias("q3_chars"),
    )


@register("bpe_merges_docs", X.bpe_oracle_sql(X.BPE_MERGES))
def q_bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merge rules learned from the corpus (tokenizer
    training). One corpus scan into the word-frequency table; each round is
    a vocab-sized pair count + 1-row argmax + a JVM-side greedy merge via
    the double-space string trick (operators/text.bpe_learn_merges). The
    oracle replays the identical training as unrolled SQL CTE rounds."""
    docs = load_table(spark, sf_dir, "documents")
    return X.bpe_learn_merges(docs, n_merges=X.BPE_MERGES)


@register("bpe_encode_docs", X.bpe_encode_oracle_sql(X.BPE_MERGES))
def q_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the learned BPE vocabulary (the
    encode half of bpe_merges_docs): trains the same 8 merges, then joins
    the final word->symbol-count map (vocab-sized) back to the corpus
    token stream — the packing/chunking budget signal
    (operators/text.bpe_encode)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.bpe_encode(docs, n_merges=X.BPE_MERGES)


PMI_MIN_COUNT = 5
PMI_TOP_K = 20


@register(
    "pmi_collocations_docs",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks
            WHERE tok != '' GROUP BY tok),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni),
    w AS (
      SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x != '') AS ws
      FROM documents
    ),
    pair AS (
      SELECT ws[i] AS lhs, ws[i + 1] AS rhs, CAST(count(*) AS BIGINT) AS n_pair
      FROM w, unnest(range(1, greatest(len(w.ws), 1))) AS u(i)
      GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COUNT}
    ),
    scored AS (
      SELECT p.lhs, p.rhs, p.n_pair,
             CAST(round(ln((CAST(p.n_pair AS DOUBLE) * CAST(t.n_total AS DOUBLE))
                           / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))) * 1000000, 0)
                  AS BIGINT) AS pmi_micro
      FROM pair p
      JOIN uni a ON a.tok = p.lhs
      JOIN uni b ON b.tok = p.rhs
      CROSS JOIN total t
    )
    SELECT lhs, rhs, n_pair, pmi_micro,
           CAST(row_number() OVER (ORDER BY pmi_micro DESC, lhs ASC, rhs ASC)
                AS INTEGER) AS rank
    FROM scored
    ORDER BY pmi_micro DESC, lhs ASC, rhs ASC
    LIMIT {PMI_TOP_K}
    """,
)
def q_pmi_collocations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-bigram collocations by PMI (phrase mining). Linear
    pair explode, three vocab-sized aggregations, micro-nat integer scores
    for engine-exact ranking (operators/text.pmi_collocations)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.pmi_collocations(
        docs, min_count=PMI_MIN_COUNT, k=PMI_TOP_K
    )


@register(
    "source_quality_stats_docs",
    f"""
    WITH f AS (
      SELECT source,
             length(text) AS n_chars,
             {_SQL_NTOK} AS n_tok,
             {_SQL_NPUNCT} AS n_punct,
             {_SQL_NSTOP} AS n_stop,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS digest
      FROM documents
    ), q AS (
      SELECT source, n_tok, digest,
             CAST(round(round((least(n_tok / 100.0, 1.0)
                 + (1.0 - least(round(n_punct / greatest(n_chars, 1), 6) * 5, 1.0))
                 + least(round(n_stop / greatest(n_tok, 1), 6) * 4, 1.0)) / 3, 6)
                 * 1000000, 0) AS BIGINT) AS q_micro
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct_texts,
           CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS n_dup_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(q_micro) AS BIGINT) AS quality_sum_micro,
           CAST(round(sum(q_micro) / count(*), 0) AS BIGINT) AS mean_quality_micro
    FROM q GROUP BY source
    """,
)
def q_source_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain-level) corpus health rollup: doc counts, exact-dup
    pressure, token totals, and an engine-exact integer-micro mean quality -
    the table per-source sampling weights are derived from
    (operators/curation.source_quality_stats)."""
    from radar_output_restructure_spark.operators.curation import (
        source_quality_stats,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return source_quality_stats(docs)


# ---------------------------------------------------------------------------
# per-source document cap (web-pipeline per-domain cap)
# ---------------------------------------------------------------------------

SOURCE_CAP = 20


@register(
    "source_cap_docs",
    f"""
    WITH f AS (
      SELECT doc_id, source,
             length(text) AS n_chars,
             {_SQL_NTOK} AS n_tok,
             {_SQL_NPUNCT} AS n_punct,
             {_SQL_NSTOP} AS n_stop
      FROM documents
    ), q AS (
      SELECT doc_id, source,
             CAST(round(round((least(n_tok / 100.0, 1.0)
                 + (1.0 - least(round(n_punct / greatest(n_chars, 1), 6) * 5, 1.0))
                 + least(round(n_stop / greatest(n_tok, 1), 6) * 4, 1.0)) / 3, 6)
                 * 1000000, 0) AS BIGINT) AS q_micro
      FROM f
    )
    SELECT doc_id, source, source_rank FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY q_micro DESC, doc_id ASC)
               AS INTEGER) AS source_rank
      FROM q
    ) WHERE source_rank <= {SOURCE_CAP}
    """,
)
def q_source_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most SOURCE_CAP docs per source, keeping the highest-quality ones —
    the per-domain cap that stops mirror farms dominating the training
    mixture (operators/curation.per_source_cap). Integer-micro quality
    ranking keeps the survivor set engine-exact."""
    from radar_output_restructure_spark.operators.curation import (
        per_source_cap,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return per_source_cap(docs, cap=SOURCE_CAP)


# ---------------------------------------------------------------------------
# deterministic sketches: count-min heavy hitters + HyperLogLog distinct
# ---------------------------------------------------------------------------

from radar_output_restructure_spark.operators import sketches as _sk  # noqa: E402
from radar_output_restructure_spark.operators.sketches import (  # noqa: E402
    HLL_NUMERATOR,
)

CMS_Q_DEPTH = 4
CMS_Q_WIDTH = 64  # vocabulary-sized corpus: narrow sketch so collisions occur
CMS_Q_THRESHOLD = 800
HLL_Q_M = 256
HLL_Q_WBITS = 46

_SQL_TOKS = r"""
      SELECT tok
      FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS words
            FROM documents) w,
           unnest(words) AS t(tok)
      WHERE tok != ''
"""

_SQL_LANG_TOKS = r"""
      SELECT lang, tok
      FROM (SELECT lang,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS words
            FROM documents) w,
           unnest(words) AS t(tok)
      WHERE tok != ''
"""


@register(
    "cms_heavy_hitters_docs",
    f"""
    WITH toks AS ({_SQL_TOKS}),
    tmd AS (SELECT md5(tok) AS md FROM toks),
    tb AS (
      {" UNION ALL ".join(
          f"SELECT {r} AS r, {_sk._cms_bucket_sql('md', r, CMS_Q_WIDTH)} AS bucket FROM tmd"
          for r in range(CMS_Q_DEPTH)
      )}
    ),
    counters AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM tb GROUP BY 1, 2
    ),
    vocab AS (
      SELECT tok, md5(tok) AS md, CAST(count(*) AS BIGINT) AS exact_n
      FROM toks GROUP BY tok
    ),
    vb AS (
      {" UNION ALL ".join(
          f"SELECT tok, exact_n, {r} AS r, "
          f"{_sk._cms_bucket_sql('md', r, CMS_Q_WIDTH)} AS bucket FROM vocab"
          for r in range(CMS_Q_DEPTH)
      )}
    ),
    est AS (
      SELECT vb.tok, vb.exact_n, CAST(min(c.cnt) AS BIGINT) AS cms_count
      FROM vb JOIN counters c ON c.r = vb.r AND c.bucket = vb.bucket
      GROUP BY 1, 2
    )
    SELECT tok AS token, exact_n, cms_count
    FROM est WHERE cms_count >= {CMS_Q_THRESHOLD}
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters with the exact count alongside: the
    mergeable-counter frequency sketch whose shuffle is bounded by the
    sketch (depth x width counters after map-side combine), not the token
    volume — with 53-bit md5-Horner bucket hashing so the DuckDB oracle
    replays the counters bit-for-bit. cms_count >= exact_n always
    (operators/sketches.cms_heavy_hitters)."""
    from radar_output_restructure_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return cms_heavy_hitters(
        docs,
        threshold=CMS_Q_THRESHOLD,
        depth=CMS_Q_DEPTH,
        width=CMS_Q_WIDTH,
    )


@register(
    "hll_distinct_docs",
    f"""
    WITH toks AS ({_SQL_LANG_TOKS}),
    h AS (
      SELECT lang, {X.horner_fold_sql("md")} AS h
      FROM (SELECT lang, md5(tok) AS md FROM toks)
    ),
    rk AS (
      SELECT lang, h % {HLL_Q_M} AS reg,
             CASE WHEN h // {HLL_Q_M} = 0 THEN {HLL_Q_WBITS}
                  ELSE {HLL_Q_WBITS} - length(bin(h // {HLL_Q_M}))
             END AS rank
      FROM h
    ),
    regs AS (SELECT lang, reg, max(rank) AS m_rank FROM rk GROUP BY 1, 2),
    langs AS (SELECT DISTINCT lang FROM documents),
    allr AS (
      SELECT l.lang, g.reg
      FROM langs l CROSS JOIN (SELECT unnest(range({HLL_Q_M})) AS reg) g
    ),
    full_ AS (
      SELECT a.lang, a.reg, coalesce(r.m_rank, 0) AS m_rank
      FROM allr a LEFT JOIN regs r ON r.lang = a.lang AND r.reg = a.reg
    ),
    s AS (
      SELECT lang,
             CAST(sum(CAST(1 AS BIGINT) << ({HLL_Q_WBITS} - m_rank)) AS BIGINT) AS s,
             CAST(sum(CASE WHEN m_rank > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_registers_hit,
             CAST(sum(CASE WHEN m_rank = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_registers
      FROM full_ GROUP BY lang
    ),
    ex AS (
      SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
      FROM toks GROUP BY lang
    )
    SELECT s.lang, n_registers_hit, n_zero_registers,
           round({HLL_NUMERATOR!r} / CAST(s.s AS DOUBLE), 6) AS hll_estimate,
           exact_distinct
    FROM s JOIN ex ON ex.lang = s.lang
    """,
)
def q_hll_distinct_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language HyperLogLog distinct-token estimate with the exact
    count alongside. Registers merge by max (map-side combine bounds the
    shuffle at 256 rows/group/task); the register sum is the exact-integer
    form sum(2^(46-M[j])), so the raw estimate is bit-identical on any
    engine and accumulation order. Raw estimate only — the linear-counting
    correction needs ln(), which is not cross-libm exact
    (operators/sketches.hll_distinct)."""
    from radar_output_restructure_spark.operators.sketches import (
        hll_distinct,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return hll_distinct(docs)


# ---------------------------------------------------------------------------
# corpus-wide segment dedup (C4 line-dedup), splits, resampling, bloom
# ---------------------------------------------------------------------------

from radar_output_restructure_spark.operators.curation import (  # noqa: E402
    SEG_K,
    SEG_MIN_DF,
)
from radar_output_restructure_spark.operators.sketches import (  # noqa: E402
    BLOOM_G,
    BLOOM_K,
    BLOOM_M,
    _cms_bucket_sql,
)

_SEG_DEDUP_SQL = f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents
    ),
    sized AS (SELECT doc_id, words, len(words) AS n FROM w),
    nsegd AS (
      SELECT doc_id, words,
             1 + (greatest(n, 1) - 1) // {SEG_K} AS nseg
      FROM sized
    ),
    segs AS (
      SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
             array_to_string(words[i*{SEG_K}+1 : i*{SEG_K}+{SEG_K}], ' ') AS seg
      FROM nsegd, unnest(range(nseg)) AS t(i)
    ),
    hashed AS (SELECT doc_id, seg_idx, seg, md5(seg) AS h FROM segs),
    dup AS (SELECT h FROM hashed GROUP BY h HAVING count(*) >= {SEG_MIN_DF}),
    kept AS (SELECT * FROM hashed WHERE h NOT IN (SELECT h FROM dup)),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS mh
      FROM kept GROUP BY doc_id
    ),
    base AS (SELECT doc_id, CAST(nseg AS BIGINT) AS n_segments FROM nsegd)
    SELECT b.doc_id, b.n_segments,
           coalesce(a.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           {X.horner_fold_sql('mh')} AS clean_fp
    FROM base b LEFT JOIN agg a USING (doc_id)
"""


@register("paragraph_dedup_docs", _SEG_DEDUP_SQL)
def q_paragraph_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide repeated-segment removal: consecutive 8-word
    segments occurring >= 2 times anywhere in the corpus (occurrence
    count, not distinct-document count — repeats inside one document
    qualify, and the oracle matches that semantics) are
    boilerplate and vanish from every document; survivors re-join in order
    and are fingerprinted. Map-only segmenting, one map-side-combined
    groupBy for the dup set (filtered small BEFORE rejoining the corpus, so
    AQE broadcasts the anti-join), one doc-keyed shuffle for reassembly
    (operators/curation.segment_dedup)."""
    from radar_output_restructure_spark.operators.curation import segment_dedup

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return segment_dedup(docs)


_BLOOM_P = [_cms_bucket_sql("mh", r, BLOOM_M) for r in range(BLOOM_K)]
_BLOOM_POS_COLS = ", ".join(f"{p} AS p{r}" for r, p in enumerate(_BLOOM_P))
_BLOOM_BITS_UNION = " UNION ALL ".join(
    f"SELECT p{r} AS p FROM pos WHERE doc_id < {EVAL_SET_MAX_ID}"
    for r in range(BLOOM_K)
)
_BLOOM_ALL_IN = " AND ".join(
    f"p{r} IN (SELECT p FROM bits)" for r in range(BLOOM_K)
)

_BLOOM_SQL = f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents
    ),
    sized AS (SELECT doc_id, words, len(words) AS n FROM w),
    grams AS (
      SELECT doc_id,
             md5(array_to_string(words[i : i+{BLOOM_G - 1}], ' ')) AS mh
      FROM sized,
           unnest(range(1, greatest(n - {BLOOM_G} + 2, 1))) AS t(i)
    ),
    pos AS (SELECT doc_id, {_BLOOM_POS_COLS} FROM grams),
    bits AS (SELECT DISTINCT p FROM ({_BLOOM_BITS_UNION})),
    hits AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM pos
      WHERE doc_id >= {EVAL_SET_MAX_ID} AND {_BLOOM_ALL_IN}
      GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id,
             CAST(greatest(n - {BLOOM_G} + 1, 0) AS BIGINT) AS n_grams
      FROM sized WHERE doc_id >= {EVAL_SET_MAX_ID}
    )
    SELECT b.doc_id, b.n_grams,
           coalesce(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
           CAST(coalesce(h.n_hits, 0) > 0 AS INT) AS flagged
    FROM base b LEFT JOIN hits h USING (doc_id)
"""


@register("bloom_decontaminate_docs", _BLOOM_SQL)
def q_bloom_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter n-gram decontamination: the eval slice's sliding 8-gram
    set folds into a 65536-bit filter (4 disjoint-md5-span bit positions
    per gram) that ships inside the Arrow probe closure; probing the
    training corpus is map-only — one md5 per gram, 4 vectorized bitset
    lookups — so nothing corpus-sized shuffles, unlike the exact gram-join.
    One-sided error: flagged docs are a superset of true overlaps; run the
    exact check on the sliver (operators/sketches.bloom_ngram_filter)."""
    from radar_output_restructure_spark.operators.sketches import (
        bloom_ngram_filter,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    out = bloom_ngram_filter(
        docs.filter(F.col("doc_id") >= EVAL_SET_MAX_ID),
        docs.filter(F.col("doc_id") < EVAL_SET_MAX_ID),
    )
    return out.withColumn("flagged", F.col("flagged").cast("int"))


@register(
    "train_split_docs",
    f"""
    SELECT doc_id, lang,
           CAST(({X.md5_horner_sql("CAST(doc_id AS STRING) || '#split'")}) % 100
                AS INT) AS bucket,
           CASE WHEN ({X.md5_horner_sql("CAST(doc_id AS STRING) || '#split'")}) % 100 < 80
                THEN 'train'
                WHEN ({X.md5_horner_sql("CAST(doc_id AS STRING) || '#split'")}) % 100 < 90
                THEN 'val' ELSE 'test' END AS split_name
    FROM documents
    """,
)
def q_train_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket train/val/test split (80/10/10): salted
    53-bit id-hash mod 100, map-only, stable under corpus growth — adding
    documents never moves an existing one across the boundary, the property
    that keeps eval sets uncontaminated across refreshes
    (operators/curation.train_split)."""
    from radar_output_restructure_spark.operators.curation import train_split

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return train_split(docs).select(
        "doc_id", "lang", "bucket", F.col("split").alias("split_name")
    )


@register(
    "quality_resample_docs",
    f"""
    WITH f AS (
      SELECT doc_id, source,
             length(text) AS n_chars,
             {_SQL_NTOK} AS n_tokens,
             {_SQL_NPUNCT} AS n_punct,
             {_SQL_NSTOP} AS n_stop
      FROM documents
    ),
    q AS (
      SELECT doc_id, source,
             CAST(round(
               round((least(n_tokens / 100.0, 1.0)
                      + (1.0 - least(round(n_punct / greatest(n_chars, 1), 6) * 5, 1.0))
                      + least(round(n_stop / greatest(n_tokens, 1), 6) * 4, 1.0)) / 3,
                     6) * 1000000, 0) AS BIGINT) AS weight_micro
      FROM f
    )
    SELECT doc_id, source, weight_micro
    FROM q
    WHERE ({X.md5_horner_sql("CAST(doc_id AS STRING) || '#rs'")}) % 1000000
          < weight_micro
    """,
)
def q_quality_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic Bernoulli resampling (DSIR-lite):
    keep each document with probability = its composite quality score,
    decided by a salted id-hash against the score in integer micros —
    map-only, no RNG state, reproducible row-for-row
    (operators/curation.quality_resample)."""
    from radar_output_restructure_spark.operators.curation import (
        quality_resample,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return quality_resample(docs).select("doc_id", "source", "weight_micro")


@register(
    "winsorize_docs",
    """
    WITH b AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents GROUP BY lang
    )
    SELECT doc_id, d.lang, CAST(n_chars AS BIGINT) AS n_chars,
           round(least(greatest(CAST(n_chars AS DOUBLE), lo), hi), 6)
             AS clamped
    FROM documents d JOIN b USING (lang)
    """,
)
def q_winsorize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorization of document length: clamp n_chars to the
    language's exact [p05, p95] — the outlier trim before lengths feed any
    mixture statistic. One group-bounded percentile aggregate + a pinned
    broadcast join back (lang is a bounded vocabulary); clamping is
    map-only (operators/curation.winsorize_by_group)."""
    from radar_output_restructure_spark.operators.curation import (
        winsorize_by_group,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return winsorize_by_group(docs, "n_chars", group_col="lang")


#: prior snapshot = doc_id < 300; incoming batch = doc_id >= 200. The windows
#: OVERLAP on purpose: a refresh re-fetches live URLs, so part of every real
#: batch is content the history already holds — that overlap is what
#: exercises the dup_of_history classification.
SNAPSHOT_HIST_MAX = 300
SNAPSHOT_BATCH_MIN = 200


@register(
    "snapshot_delta_dedup_docs",
    f"""
    WITH new_side AS (
      SELECT doc_id, md5(coalesce(text, '')) AS digest FROM documents
      WHERE doc_id >= {SNAPSHOT_BATCH_MIN}
    ),
    hist AS (
      SELECT DISTINCT md5(coalesce(text, '')) AS digest FROM documents
      WHERE doc_id < {SNAPSHOT_HIST_MAX}
    ),
    canon AS (
      SELECT digest, min(doc_id) AS canon FROM new_side GROUP BY digest
    )
    SELECT n.doc_id, n.digest,
           CASE WHEN h.digest IS NOT NULL THEN 'dup_of_history'
                WHEN n.doc_id != c.canon THEN 'dup_in_batch'
                ELSE 'new' END AS status
    FROM new_side n
    JOIN canon c USING (digest)
    LEFT JOIN hist h USING (digest)
    """,
)
def q_snapshot_delta_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: classify the incoming half of the corpus
    against the prior-snapshot half by content digest — dup_of_history /
    dup_in_batch (min-id survivor) / new. Digest-keyed joins carry 16
    bytes per doc, never documents
    (operators/dedup_scale.snapshot_delta_dedup)."""
    from radar_output_restructure_spark.operators.dedup_scale import (
        snapshot_delta_dedup,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return snapshot_delta_dedup(
        docs.filter(F.col("doc_id") >= SNAPSHOT_BATCH_MIN),
        docs.filter(F.col("doc_id") < SNAPSHOT_HIST_MAX),
    )


# ---------------------------------------------------------------------------
# lakehouse compaction planning + corpus frequency spectrum
# ---------------------------------------------------------------------------

COMPACT_TARGET = 2000  # chars per output group (sf-scaled docs are ~300)


def _compaction_oracle() -> str:
    from radar_output_restructure_spark.operators.compaction import (
        compaction_bins_sql,
    )

    return compaction_bins_sql(
        "documents", "source", "doc_id", "n_chars", COMPACT_TARGET
    )


@register("compaction_bins_docs", _compaction_oracle())
def q_compaction_bins_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan over the corpus listing: per source,
    documents ordered by doc_id pack greedily into ~2000-char output
    groups via a cumulative-prefix window cut — the plan a lakehouse
    compactor audits before rewriting (one window shuffle on the group
    key, exact BIGINT cumsums in both engines;
    operators/compaction.compaction_bins)."""
    from radar_output_restructure_spark.operators.compaction import (
        compaction_bins,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return compaction_bins(docs, "source", "doc_id", "n_chars", COMPACT_TARGET)


@register(
    "token_freq_spectrum_docs",
    """
    WITH toks AS (
      SELECT tok AS term
      FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM documents) w,
           unnest(words) AS t(tok)
      WHERE tok != ''
    ),
    freqs AS (
      SELECT term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY term
    )
    SELECT tf, CAST(count(*) AS BIGINT) AS n_terms FROM freqs GROUP BY tf
    """,
)
def q_token_freq_spectrum_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus frequency-of-frequencies (Zipf / Good-Turing input): how many
    distinct terms occur exactly tf times. Two strictly-shrinking map-side-
    combined shuffles — corpus -> vocab -> distinct frequencies — with no
    global sort anywhere (operators/text.token_freq_spectrum)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.token_freq_spectrum(docs)


@register(
    "global_rank_docs",
    """
    WITH r AS (
      SELECT doc_id, n_chars,
             CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
                  AS BIGINT) AS rank
      FROM documents
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
    SELECT doc_id, n_chars, rank,
           CAST((((rank - 1) * 10) - ((rank - 1) * 10) % total) / total
                AS BIGINT) AS decile
    FROM r, n
    """,
)
def q_global_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide rank + decile by document length (the curriculum /
    quality-bucketing primitive) — computed WITHOUT the oracle's
    single-partition global window: range-repartition distributed sort +
    per-partition offsets, a map-only second pass
    (operators/ranking.global_rank). The decile derives from the rank with
    exact integer arithmetic, so both engines agree bit-for-bit."""
    from radar_output_restructure_spark.operators.ranking import global_rank

    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "n_chars"
    )
    total = docs.count()
    ranked = global_rank(
        docs, [F.col("n_chars").desc(), F.col("doc_id").asc()]
    )
    tens = (F.col("rank") - 1) * 10
    return ranked.select(
        "doc_id",
        "n_chars",
        "rank",
        ((tens - tens % F.lit(total)) / F.lit(total))
        .cast("long")
        .alias("decile"),
    )


SPARSE_COS_THR = 0.3
SPARSE_MAX_DF = 100  # drop terms in >100 docs before the postings join


@register(
    "sparse_cosine_pairs_docs",
    f"""
    WITH toks AS (
      SELECT doc_id AS doc, s AS term
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM documents) w,
           unnest([array_to_string(words[i:i+2], ' ')
                   for i in range(1, len(words) - 1)]) AS t(s)
    ),
    tf AS (
      SELECT doc, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    keep AS (SELECT term FROM dfreq WHERE df >= 2 AND df <= {SPARSE_MAX_DF}),
    -- norms over the SAME pruned term space as the dots (see the Spark
    -- operator): full-vector norms with pruned dots is not the cosine of
    -- any consistent vector pair
    norms AS (SELECT doc, CAST(sum(tf * tf) AS BIGINT) AS n2
              FROM tf JOIN keep USING (term) GROUP BY doc),
    dots AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b,
             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
      FROM tf a JOIN keep USING (term) JOIN tf b USING (term)
      WHERE a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(dot / (sqrt(CAST(na.n2 AS DOUBLE)) *
                        sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos
    FROM dots
    JOIN norms na ON na.doc = doc_a
    JOIN norms nb ON nb.doc = doc_b
    WHERE round(dot / (sqrt(CAST(na.n2 AS DOUBLE)) *
                       sqrt(CAST(nb.n2 AS DOUBLE))), 6) >= {SPARSE_COS_THR}
    """,
)
def q_sparse_cosine_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (tf-vector) cosine near-dup pairs over word TRIGRAMS
    (with multiplicity — the weighted counterpart of the distinct-shingle
    Jaccard join), postings-style: shared-term candidates only, df-pruned
    before the self-join so boilerplate posting lists never go quadratic.
    Integer dots/norms, one rounded float chain per pair
    (operators/text.sparse_cosine_pairs)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.sparse_cosine_pairs(
        docs, threshold=SPARSE_COS_THR, max_df=SPARSE_MAX_DF, ngram=3
    )


@register(
    "profile_docs",
    """
    WITH base AS (SELECT count(*) AS n FROM documents)
    SELECT 'doc_id' AS column, (SELECT n FROM base) AS n_rows,
           CAST(count(*) FILTER (WHERE doc_id IS NULL) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'text', (SELECT n FROM base),
           CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT),
           CAST(count(DISTINCT text) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'lang', (SELECT n FROM base),
           CAST(count(*) FILTER (WHERE lang IS NULL) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'source', (SELECT n FROM base),
           CAST(count(*) FILTER (WHERE source IS NULL) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_chars', (SELECT n FROM base),
           CAST(count(*) FILTER (WHERE n_chars IS NULL) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT) FROM documents
    """,
)
def q_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time data-quality profile: null + distinct counts for every
    documents column in ONE aggregation scan (conditional aggregates +
    multi-column count-distinct in a single agg; the per-column rows
    unpivot from one driver-side row — the corpus is never re-scanned per
    column, unlike the oracle's five UNION branches;
    operators/profile.profile_columns)."""
    from radar_output_restructure_spark.operators.profile import (
        profile_columns,
    )

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs)


@register(
    "constraint_checks_docs",
    """
    SELECT 'doc_id_not_null' AS rule,
           CAST(count(*) FILTER (WHERE doc_id IS NULL) AS BIGINT)
             AS n_violations,
           count(*) FILTER (WHERE doc_id IS NULL) = 0 AS passed
    FROM documents
    UNION ALL
    SELECT 'doc_id_unique',
           CAST((SELECT count(*) - count(DISTINCT doc_id) FROM documents)
                AS BIGINT),
           (SELECT count(*) = count(DISTINCT doc_id) FROM documents)
    UNION ALL
    SELECT 'n_chars_matches_text',
           CAST(count(*) FILTER (WHERE n_chars != length(text)) AS BIGINT),
           count(*) FILTER (WHERE n_chars != length(text)) = 0
    FROM documents
    UNION ALL
    SELECT 'lang_in_domain',
           CAST(count(*) FILTER (
             WHERE lang NOT IN ('en', 'de', 'fr', 'es', 'nl')) AS BIGINT),
           count(*) FILTER (
             WHERE lang NOT IN ('en', 'de', 'fr', 'es', 'nl')) = 0
    FROM documents
    """,
)
def q_constraint_checks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint validation — non-null, uniqueness, derived-
    column consistency, domain membership — every rule a conditional
    aggregate in ONE scan (operators/profile.check_constraints; the
    uniqueness rule rides the same agg as a count-distinct delta)."""
    from radar_output_restructure_spark.operators.profile import (
        check_constraints,
    )

    docs = load_table(spark, sf_dir, "documents")
    return check_constraints(
        docs,
        [
            ("doc_id_not_null", F.col("doc_id").isNull()),
            ("n_chars_matches_text", F.col("n_chars") != F.length("text")),
            (
                "lang_in_domain",
                ~F.col("lang").isin("en", "de", "fr", "es", "nl"),
            ),
        ],
    ).unionAll(
        docs.agg(
            (F.count(F.lit(1)) - F.count_distinct("doc_id"))
            .cast("bigint")
            .alias("d")
        ).select(
            F.lit("doc_id_unique").alias("rule"),
            F.col("d").alias("n_violations"),
            (F.col("d") == 0).alias("passed"),
        )
    )


@register(
    "doc_char_entropy",
    """
    WITH chars AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ),
    hist AS (
      SELECT doc_id, ch, count(*)::DOUBLE AS n FROM chars GROUP BY 1, 2
    ),
    tot AS (
      SELECT doc_id, sum(n) AS t, count(*) AS n_distinct
      FROM hist GROUP BY 1
    )
    SELECT h.doc_id AS doc,
           CAST(t.t AS BIGINT) AS n_chars,
           CAST(t.n_distinct AS INT) AS distinct_chars,
           CAST(sum(CAST(round(-(h.n / t.t) * log2(h.n / t.t) * 1000000, 0)
                         AS BIGINT)) AS BIGINT) AS entropy_micro
    FROM hist h JOIN tot t USING (doc_id)
    GROUP BY 1, 2, 3
    """,
)
def q_doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document (micro-bits) —
    gibberish/boilerplate screen (operators/text.char_entropy: map-only
    Arrow Counter per doc, per-class integer terms so the sum is
    order-free; the oracle replays the identical terms via log2)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.char_entropy(docs)


@register(
    "containment_pairs_docs",
    f"""
    WITH sh AS ({SQL_SHINGLES}),
    kept AS (
      SELECT doc, shingle FROM sh
      WHERE shingle IN (SELECT shingle FROM sh
                        GROUP BY shingle HAVING count(*) <= 50)
    ),
    sizes AS (SELECT doc, count(*) AS n FROM kept GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b USING (shingle)
      WHERE a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / sa.n, 6) AS containment_a,
           round(n_common * 1.0 / sb.n, 6) AS containment_b
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE greatest(round(n_common * 1.0 / sa.n, 6),
                   round(n_common * 1.0 / sb.n, 6)) >= 0.6
    """,
)
def q_containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment >= 0.6 in either direction — the
    quote/subset-duplication signal symmetric Jaccard misses
    (operators/dedup_scale.containment_pairs). Carries the same df>50
    stop-shingle cap as jaccard_pairs_docs (r7 verdict "What's wrong" #2)
    so no gated query ships an uncapped posting self-join; the oracle's
    `kept` CTE mirrors the cap (sizes computed AFTER the drop, matching
    the operator)."""
    from radar_output_restructure_spark.operators.dedup_scale import (
        containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return containment_pairs(docs, threshold=0.6, max_shingle_df=50)


@register(
    "source_kl_divergence_docs",
    """
    WITH toks AS (
      SELECT source, tok
      FROM (SELECT source,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM documents) w,
           unnest(words) AS t(tok)
      WHERE tok != ''
    ),
    st AS (SELECT source, tok, count(*) AS ns FROM toks GROUP BY 1, 2),
    stot AS (SELECT source, sum(ns) AS s_tot FROM st GROUP BY 1),
    ct AS (SELECT tok, count(*) AS ct FROM toks GROUP BY 1),
    ctot AS (SELECT sum(ct) * 1.0 AS c_tot FROM ct)
    SELECT st.source,
           CAST(sum(st.ns) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(CAST(round(
                 (st.ns / (stot.s_tot * 1.0))
                 * ln((st.ns / (stot.s_tot * 1.0)) / (ct.ct / ctot.c_tot))
                 * 1000000) AS BIGINT)) AS BIGINT) AS kl_micro
    FROM st
    JOIN ct USING (tok)
    JOIN stot USING (source)
    CROSS JOIN ctot
    GROUP BY 1
    """,
)
def q_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution
    (micro-nats) — domain-drift / mixture-health monitoring
    (operators/text.source_kl_divergence; per-token integer terms make the
    sum order-free)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.source_kl_divergence(docs)


TRI_TRAIN_MAX = 300  # LM snapshot: docs below train the model, all score
_A2 = repr(0.4 * 0.4)  # alpha^2 as the EXACT double Python/Spark computes


@register(
    "doc_trigram_backoff",
    f"""
    WITH w AS (
      SELECT doc_id AS doc,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents
    ),
    tw AS (SELECT words FROM w WHERE doc < {TRI_TRAIN_MAX}),
    c1 AS (SELECT tok, count(*) AS n1
           FROM (SELECT unnest(words) AS tok FROM tw) GROUP BY tok),
    nv AS (SELECT sum(n1) * 1.0 AS n_total, count(*) * 1.0 AS v FROM c1),
    c2 AS (SELECT bg, count(*) AS n2 FROM (
             SELECT array_to_string(words[i:i+1], ' ') AS bg
             FROM tw, unnest(range(1, len(words))) AS t(i)) GROUP BY bg),
    c3 AS (SELECT tg, count(*) AS n3 FROM (
             SELECT array_to_string(words[i:i+2], ' ') AS tg
             FROM tw, unnest(range(1, len(words) - 1)) AS t(i)) GROUP BY tg),
    sg AS (
      SELECT doc,
             array_to_string(words[i:i+2], ' ') AS tri,
             array_to_string(words[i:i+1], ' ') AS ctx,
             array_to_string(words[i+1:i+2], ' ') AS bi,
             words[i+1] AS mid,
             words[i+2] AS lst
      FROM w, unnest(range(1, len(words) - 1)) AS t(i)
    ),
    j AS (
      SELECT sg.doc,
             CASE WHEN c3.n3 IS NOT NULL THEN 3
                  WHEN b.n2 IS NOT NULL THEN 2 ELSE 1 END AS path,
             CASE WHEN c3.n3 IS NOT NULL THEN c3.n3 / (ctx.n2 * 1.0)
                  WHEN b.n2 IS NOT NULL THEN 0.4 * (b.n2 / (m.n1 * 1.0))
                  ELSE {_A2} * ((coalesce(l.n1, 0) + 1.0)
                                / (nv.n_total + nv.v))
             END AS s
      FROM sg
      LEFT JOIN c3 ON c3.tg = sg.tri
      LEFT JOIN c2 ctx ON ctx.bg = sg.ctx
      LEFT JOIN c2 b ON b.bg = sg.bi
      LEFT JOIN c1 m ON m.tok = sg.mid
      LEFT JOIN c1 l ON l.tok = sg.lst
      CROSS JOIN nv
    ),
    scored AS (SELECT doc, path,
                      CAST(round(-ln(s) * 1000000) AS BIGINT) AS nll FROM j),
    per_doc AS (
      SELECT doc,
             CAST(count(*) AS BIGINT) AS n_trigrams,
             CAST(sum(nll) AS BIGINT) AS nll_micro,
             CAST(sum(CASE WHEN path = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
             CAST(sum(CASE WHEN path = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
             CAST(sum(CASE WHEN path = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni
      FROM scored GROUP BY doc
    )
    SELECT d.doc_id,
           coalesce(p.n_trigrams, 0) AS n_trigrams,
           coalesce(p.nll_micro, 0) AS nll_micro,
           coalesce(p.n_tri, 0) AS n_tri,
           coalesce(p.n_bi, 0) AS n_bi,
           coalesce(p.n_uni, 0) AS n_uni
    FROM documents d LEFT JOIN per_doc p ON p.doc = d.doc_id
    """,
)
def q_doc_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff LM score (Brants et al.): model trained on
    the snapshot below doc_id {max}, every document scored held-out-style;
    per-path counters prove the backoff CASE arms against the oracle
    (operators/text.trigram_backoff_score)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.trigram_backoff_score(
        docs, docs.filter(F.col("doc_id") < TRI_TRAIN_MAX)
    )


@register(
    "source_length_quantile_sketch",
    """
    WITH v AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS x
               FROM documents WHERE n_chars > 0),
    b AS (SELECT grp, x,
                 CAST(power(2.0, length(bin(x)) - 1) AS BIGINT) AS p
          FROM v),
    -- overflow-safe form mirrors the Spark operator (divide first when
    -- p >= 16; identical values, proven s|p)
    lbs AS (SELECT grp,
                   p + (CASE WHEN p >= 16
                        THEN ((x - p) // (p // 16)) * (p // 16)
                        ELSE (((x - p) * 16 // p) * p) // 16 END) AS lb
            FROM b),
    buckets AS (SELECT grp, lb, count(*) AS c FROM lbs GROUP BY 1, 2),
    cum AS (SELECT grp, lb,
                   sum(c) OVER (PARTITION BY grp ORDER BY lb
                                ROWS UNBOUNDED PRECEDING) AS cum
            FROM buckets),
    totals AS (SELECT grp, sum(c) AS n FROM buckets GROUP BY 1),
    j AS (SELECT * FROM cum JOIN totals USING (grp))
    SELECT grp AS source,
           CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lb END)
                AS BIGINT) AS q50,
           CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN lb END)
                AS BIGINT) AS q95,
           CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lb END)
                AS BIGINT) AS q99
    FROM j GROUP BY 1
    """,
)
def q_source_length_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HdrHistogram-style quantile sketch of document length per
    source — log2 major buckets + 16 linear sub-buckets, every boundary
    pure integer math so engines agree bit-for-bit
    (operators/sketches.log_bucket_quantiles)."""
    from radar_output_restructure_spark.operators.sketches import (
        log_bucket_quantiles,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return log_bucket_quantiles(docs, "n_chars")


# ---------------------------------------------------------------------------
# round-8 additions: rule-based quality, splits, mixing, dedup observability
# ---------------------------------------------------------------------------

_SQL_WORDS_GUARDED = (
    "CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END"
)
_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS_EN) + "]"
_SQL_MEAN_MILLI = (
    "CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(round(sum_chars * 1000.0 / n_words, 0) AS BIGINT) END"
)
_SQL_ALPHA_MICRO = (
    "CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(round(n_alpha * 1000000.0 / n_words, 0) AS BIGINT) END"
)


@register(
    "doc_gopher_quality",
    f"""
    WITH w AS (
      SELECT doc_id AS doc, {_SQL_WORDS_GUARDED} AS words FROM documents
    ),
    f AS (
      SELECT doc,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum([length(x) for x in words]), 0)
                  AS BIGINT) AS sum_chars,
             CAST(len(list_intersect(words, {_SQL_STOPLIST}))
                  AS BIGINT) AS n_stop_distinct,
             CAST(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
                  AS BIGINT) AS n_alpha
      FROM w
    )
    SELECT doc, n_words,
           {_SQL_MEAN_MILLI} AS mean_word_len_milli,
           n_stop_distinct,
           {_SQL_ALPHA_MICRO} AS alpha_ratio_micro,
           CAST(n_words BETWEEN 50 AND 100000
                AND {_SQL_MEAN_MILLI} BETWEEN 3000 AND 10000
                AND n_stop_distinct >= 2
                AND {_SQL_ALPHA_MICRO} >= 800000 AS INT) AS passes
    FROM f
    """,
)
def q_doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule screen: word-count window, mean word length,
    distinct-stopword floor, alpha-word ratio — map-only, integer-exact
    (operators/text.gopher_quality)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.gopher_quality(docs)


@register(
    "doc_type_token_ratio",
    f"""
    WITH w AS (
      SELECT doc_id AS doc, {_SQL_WORDS_GUARDED} AS words FROM documents
    )
    SELECT doc,
           CAST(len(words) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(words)) AS BIGINT) AS n_types,
           CASE WHEN len(words) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(round(len(list_distinct(words)) * 1000000.0
                                / len(words), 0) AS BIGINT) END AS ttr_micro
    FROM w
    """,
)
def q_doc_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity (distinct words / words, integer-micro) — the
    template/keyword-stuffing screen (operators/text.type_token_ratio)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.type_token_ratio(docs)


@register(
    "tokenizer_fertility_docs",
    f"""
    SELECT source,
           CAST(sum({_SQL_NTOK}) AS BIGINT) AS n_words,
           CAST(sum({_SQL_NBPE}) AS BIGINT) AS n_bpe_tokens,
           CASE WHEN sum({_SQL_NTOK}) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(round(sum({_SQL_NBPE}) * 1000000.0
                                / sum({_SQL_NTOK}), 0) AS BIGINT)
           END AS fertility_micro
    FROM documents GROUP BY source
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word tokens per whitespace word per source — the tokenizer-
    efficiency audit before fixing a data mixture
    (operators/text.tokenizer_fertility)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.tokenizer_fertility(docs)


@register(
    "doc_ngram_novelty",
    f"""
    WITH sh AS ({SQL_SHINGLES}),
    dfs AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle)
    SELECT doc,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000.0
                      / count(*), 0) AS BIGINT) AS novelty_micro
    FROM sh JOIN dfs USING (shingle)
    GROUP BY doc
    """,
)
def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of a doc's distinct trigrams unique in the corpus (df=1) —
    originality vs boilerplate-recombination signal; df-count + join-back,
    no self-join (operators/text.ngram_novelty)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return X.ngram_novelty(docs)


@register(
    "doc_train_split",
    """
    SELECT doc_id AS doc,
           substr(md5(coalesce(text, '')), 1, 2) AS bucket,
           CASE WHEN substr(md5(coalesce(text, '')), 1, 2) < 'f6' THEN 'train'
                WHEN substr(md5(coalesce(text, '')), 1, 2) < 'fb' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (~96/2/2): stable
    under corpus growth, leakage-proof for exact copies, map-only
    (operators/curation.content_train_split; the id-hash complement is
    train_split_docs)."""
    from radar_output_restructure_spark.operators.curation import (
        content_train_split,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return content_train_split(docs)


@register(
    "source_balance_weights_docs",
    """
    WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS s FROM per)
    SELECT source, n_docs,
           CAST(round(t * 1000000.0 / (s * n_docs), 0) AS BIGINT)
             AS weight_micro
    FROM per CROSS JOIN tot
    """,
)
def q_source_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source upsampling factor equalizing the training mixture —
    groupBy(source) + broadcast 1-row total, no data-sized shuffle
    (operators/curation.source_balance_weights)."""
    from radar_output_restructure_spark.operators.curation import (
        source_balance_weights,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return source_balance_weights(docs)


@register(
    "source_dup_rate_docs",
    """
    WITH w AS (SELECT source, md5(text) AS digest FROM documents),
    c AS (SELECT digest, count(*) AS n FROM w GROUP BY digest)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(round(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000.0
                      / count(*), 0) AS BIGINT) AS dup_rate_micro
    FROM w JOIN c USING (digest)
    GROUP BY source
    """,
)
def q_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source share of exact-duplicate docs (corpus-wide digests) —
    the mirror/blocklist signal; single md5 shuffle
    (operators/dedup_scale.source_dup_rate)."""
    from radar_output_restructure_spark.operators.dedup_scale import (
        source_dup_rate,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return source_dup_rate(docs)


@register(
    "dup_group_size_hist_docs",
    """
    WITH g AS (SELECT md5(text) AS digest, count(*) AS n_copies
               FROM documents GROUP BY md5(text))
    SELECT CAST(n_copies AS BIGINT) AS n_copies,
           CAST(count(*) AS BIGINT) AS n_groups
    FROM g GROUP BY n_copies
    """,
)
def q_dup_group_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of exact-dup group sizes — the shape that picks the dedup
    strategy (operators/dedup_scale.dup_group_size_hist)."""
    from radar_output_restructure_spark.operators.dedup_scale import (
        dup_group_size_hist,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return dup_group_size_hist(docs)
