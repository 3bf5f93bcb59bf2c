"""Text-analysis queries over the documents table: token counting,
quality scoring, language ID, fingerprinting (the corpus-statistics
pass every training-data pipeline runs before filtering).

Oracles re-express the same deterministic formulas in DuckDB SQL; the
rolling fingerprint is not SQL-portable and is pinned by unit tests
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_2025_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


def _r4(c):
    return F.round(c, 4)


@query(
    "text_token_stats",
    oracle="""
    SELECT source,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS total_tokens,
           ROUND(AVG(len(string_split_regex(trim(text), '\\s+'))), 4)
               AS avg_tokens,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts per source — scan-bound, one partial
    aggregate; the canonical corpus-size pass."""
    docs = read_table(spark, sf_dir, "documents")
    nt = token_count("text")
    return docs.groupBy("source").agg(
        F.sum(nt).alias("total_tokens"),
        _r4(F.avg(nt)).alias("avg_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_quality_scores",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(trim(text)) AS n,
             len(string_split_regex(trim(text), '\\s+')) AS ntok,
             len(text) - len(regexp_replace(text, '[^a-zA-Z0-9_\\s]', '', 'g'))
                 AS npunct
      FROM documents
    ), parts AS (
      SELECT doc_id, lang,
             CASE WHEN n < 200 THEN n / 200.0
                  WHEN n > 2000 THEN GREATEST(0.0, 1.0 - (n - 2000.0) / 8000.0)
                  ELSE 1.0 END AS len_score,
             CASE WHEN n = 0 THEN 0.0 ELSE npunct * 1.0 / n END AS punct_r,
             CASE WHEN ntok = 0 THEN 0.0
                  ELSE (n - ntok + 1) * 1.0 / ntok END AS mean_wl
      FROM scored
    )
    SELECT doc_id, lang,
           ROUND(0.4 * len_score + 0.3 * (1.0 - punct_r) +
                 0.3 * (CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1.0
                             WHEN mean_wl < 3.0 THEN mean_wl / 3.0
                             ELSE GREATEST(0.0, 1.0 - (mean_wl - 10.0) / 10.0)
                        END), 4) AS quality
    FROM parts
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document composite quality score (length band + punctuation
    + mean word length), entirely in codegen.

    The oracle computes mean word length as (chars - tokens + 1)/tokens
    which equals non-space-chars/tokens only for single-space-joined
    text — true for this corpus; the Spark side uses the general
    regexp_replace form.
    """
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", _r4(quality_score("text")).alias("quality")
    )


@query(
    "text_lang_id_confusion",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(ws, w -> list_contains(['der','die','das','und','ist'], w))) * 1.0 / len(ws) AS s_de,
        len(list_filter(ws, w -> list_contains(['the','a','and','of','to'], w))) * 1.0 / len(ws)     AS s_en,
        len(list_filter(ws, w -> list_contains(['el','la','los','y','que'], w))) * 1.0 / len(ws)     AS s_es,
        len(list_filter(ws, w -> list_contains(['le','la','les','et','est'], w))) * 1.0 / len(ws)    AS s_fr,
        len(list_filter(ws, w -> list_contains(['的','是','了','在','我'], w))) * 1.0 / len(ws)        AS s_zh
      FROM toks
    ), pred AS (
      SELECT lang,
             CASE
               WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
               WHEN s_zh > s_de AND s_zh > s_en AND s_zh > s_es AND s_zh > s_fr THEN 'zh'
               WHEN s_fr > s_de AND s_fr > s_en AND s_fr > s_es THEN 'fr'
               WHEN s_es > s_de AND s_es > s_en THEN 'es'
               WHEN s_en > s_de THEN 'en'
               ELSE 'de' END AS predicted
      FROM scores
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred
    GROUP BY lang, predicted
    """,
)
def text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID confusion matrix (labeled lang vs
    predicted). The argmax-with-earlier-language-ties-winning fold in
    lang_id() matches the oracle's strictly-greater CASE cascade."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_punct_and_bpe",
    oracle="""
    SELECT source,
           ROUND(AVG(CASE WHEN len(text) = 0 THEN 0.0
                ELSE (len(text) - len(regexp_replace(text, '[^a-zA-Z0-9_\\s]', '', 'g')))
                      * 1.0 / len(text) END), 4) AS avg_punct_ratio,
           CAST(SUM(len(regexp_extract_all(text,
                '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1))) AS BIGINT)
               AS total_bpe_ish_tokens
    FROM documents
    GROUP BY source
    """,
)
def text_punct_and_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Punctuation-ratio stats + BPE-ish (regex pre-tokenizer) token
    totals per source."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        _r4(F.avg(punct_ratio("text"))).alias("avg_punct_ratio"),
        F.sum(bpe_ish_token_count("text")).alias("total_bpe_ish_tokens"),
    )


@query(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
               (acc, x) -> (acc*31 + x) % 2147483647) AS fingerprint
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash per document (content fingerprint):
    fp = Horner(base 31, mod 2^31-1) over the char codepoints. The
    mod keeps every intermediate < 2^36, so the same recurrence is
    expressible overflow-free in DuckDB as a list_reduce over the
    split chars — full hash-parity oracle (was rows-only through
    round 2). Exact values additionally pinned in
    tests/test_text_functions.py against a Python reimplementation."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint("text").alias("fingerprint")
    )
