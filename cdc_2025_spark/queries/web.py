"""Web-pipeline operators: URL-level deduplication.

The documents fixture has no url column (TESTDATA.md), so the
registered query derives a deterministic messy-URL fixture IN-PLAN —
identically in Spark and the DuckDB oracle — exercising every
normalization rule (scheme/case/www variants, tracking params, param
order, trailing slash, fragment). The operator under test is the
``canonical_url`` kernel (functions/url.py); the derivation is a
fixture shim, stated as such, and swaps for a real url column
one-for-one in deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.functions.url import canonical_url
from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query

# the messy-URL fixture: doc_id residues drive each variant so every
# normalization rule sees both sides within a duplicate group
_URL_SQL = """
    CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END ||
    CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
    source || '.Example.COM/Docs/' || CAST(doc_id % 50 AS {int}) ||
    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&id=7'
         WHEN doc_id % 7 = 0 THEN '?id=7&utm_campaign=x'
         ELSE '' END ||
    CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END
"""


@query(
    "text_url_canonical_dedup",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, {_URL_SQL.format(int="VARCHAR")} AS url
      FROM documents
    ),
    c1 AS (
      SELECT doc_id,
        regexp_replace(
          lower(regexp_replace(regexp_replace(url, '#.*$', ''),
                               '^[Hh][Tt][Tt][Pp][Ss]?://', '')),
          '^www\\.', '') AS u
      FROM raw
    ),
    c2 AS (
      SELECT doc_id,
        CASE WHEN contains(u, '?') THEN split_part(u, '?', 1)
             ELSE u END AS path,
        CASE WHEN contains(u, '?')
             THEN substr(u, position('?' IN u) + 1)
             ELSE '' END AS q
      FROM c1
    ),
    c3 AS (
      SELECT doc_id,
        regexp_replace(path, '/+$', '') AS path,
        list_sort(list_filter(str_split(q, '&'),
          p -> p != '' AND NOT starts_with(p, 'utm_')
               AND NOT starts_with(p, 'fbclid=')
               AND NOT starts_with(p, 'gclid='))) AS params
      FROM c2
    ),
    canon AS (
      SELECT doc_id,
        path || CASE WHEN len(params) > 0
                     THEN '?' || array_to_string(params, '&')
                     ELSE '' END AS canonical_url
      FROM c3
    )
    SELECT doc_id, canonical_url,
           MIN(doc_id) OVER (PARTITION BY canonical_url)
             AS canonical_id,
           doc_id != MIN(doc_id) OVER (PARTITION BY canonical_url)
             AS is_dup
    FROM canon
    """,
)
def text_url_canonical_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """URL-level dedup: canonicalize (functions/url.py — fragment,
    scheme, www, case, tracking params, param order, trailing slash)
    and keep the min-doc_id fetch per canonical URL.

    The url column is a deterministic in-plan fixture (module
    docstring) because the corpus has none; the canonicalization
    kernel and the dedup decision are the operator.

    Shape: canonicalization is codegen'd string expressions riding
    the scan; the decision is ONE window shuffle partitioned by the
    canonical string. At 100 TB the same plan holds — the shuffle
    key can swap to xxhash64(canonical_url) for 8-byte exchange rows
    (the repeated-spans trade) without changing semantics, and URL
    dedup stays the cheapest stage of the web pipeline: no content
    is compared at all."""
    docs = read_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id", F.expr(_URL_SQL.format(int="STRING")).alias("url")
    )
    canon = raw.select(
        "doc_id", canonical_url(F.col("url")).alias("canonical_url")
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "doc_id",
        "canonical_url",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )
