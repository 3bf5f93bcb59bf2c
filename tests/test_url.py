"""URL canonicalization kernel: rule-by-rule pins plus the
idempotence property (canonicalizing an already-canonical URL is a
no-op — the property that makes the kernel safe to apply at any
pipeline stage without tracking whether input is raw)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_2025_spark.functions.url import canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"]
        for r in df.select(canonical_url("url").alias("c")).collect()
    ]


def test_normalization_rules(spark):
    cases = {
        # scheme + www + case
        "https://WWW.Example.COM/Docs/1": "example.com/docs/1",
        "HTTP://example.com/a": "example.com/a",
        # fragment dropped
        "http://h.com/p#sec-2": "h.com/p",
        # trailing slashes stripped (incl. multiple)
        "http://h.com/p///": "h.com/p",
        "http://h.com/": "h.com",
        # tracking params removed, rest sorted, empty query dropped
        "http://h.com/p?utm_source=x&b=2&a=1": "h.com/p?a=1&b=2",
        "http://h.com/p?utm_campaign=c&gclid=g&fbclid=f": "h.com/p",
        "http://h.com/p?": "h.com/p",
        # no scheme at all still normalizes
        "www.h.com/p?z=1&a=2": "h.com/p?a=2&z=1",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values()), list(zip(cases, got))


def test_idempotence_on_fixture_urls(spark):
    """canonical(canonical(u)) == canonical(u) for every URL the
    registered query derives over the fixture corpus — idempotence
    makes the kernel composable at any stage."""
    from cdc_2025_spark.queries.web import text_url_canonical_dedup

    out = text_url_canonical_dedup(spark, "/root/testdata/sf0.001")
    once = [r["canonical_url"] for r in out.collect()]
    twice = _canon(spark, once)
    assert twice == once


def test_double_question_mark_splits_on_first(spark):
    """r8 ADVICE: path and query must split on the SAME (first) '?' —
    the old substring_index(u, '?', -1) took text after the LAST '?',
    silently losing the middle segment."""
    cases = {
        # later '?' is part of the query per RFC 3986; the whole
        # remainder after the FIRST '?' is one param string here
        "http://h.com/p?a=1?b=2": "h.com/p?a=1?b=2",
        # tracking param carrying a '?' inside its value: the filter
        # still sees the full first-split query and drops it whole
        "http://h.com/p?utm_source=x?y&a=1": "h.com/p?a=1",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values()), list(zip(cases, got))


def test_registered_oracle_splits_on_first_question_mark():
    """r9 review: the Spark-side first-'?' fix must be mirrored by
    the registered query's DuckDB oracle — pin the oracle's query
    extraction on a double-'?' URL directly in DuckDB."""
    import duckdb

    got = duckdb.connect().execute(
        """SELECT CASE WHEN contains(u, '?')
                  THEN substr(u, position('?' IN u) + 1)
                  ELSE '' END
           FROM (SELECT 'h.com/p?a=1?b=2' AS u)"""
    ).fetchone()[0]
    assert got == "a=1?b=2"
    from cdc_2025_spark.queries import ORACLES

    assert "position('?' IN u)" in ORACLES["text_url_canonical_dedup"]
