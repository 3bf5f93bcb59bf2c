"""Unit tests for the text-analysis expression library, including a
Python reimplementation oracle for the rolling fingerprint (which has
no SQL oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    quality_score,
    rolling_fingerprint,
    shingles,
    token_count,
)


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog"),
            (2, "der hund und die katze ist da"),
            (3, "el perro y la casa que los gatos"),
            (4, "xyzzy plugh"),
            (5, ""),
            (6, "  spaced   out   tokens  "),
            (7, "mixed123 tokens, with punct!"),
        ],
        "id long, text string",
    )


def collect_map(df, col):
    return {r["id"]: r[col] for r in df.select("id", col).collect()}


def test_token_count(tdf):
    got = collect_map(tdf.withColumn("n", token_count("text")), "n")
    assert got[1] == 8
    assert got[5] == 0
    assert got[6] == 3
    assert got[7] == 4


def test_bpe_ish_token_count(tdf):
    got = collect_map(tdf.withColumn("n", bpe_ish_token_count("text")), "n")
    # "mixed123 tokens, with punct!" -> mixed,123,tokens,',',with,punct,'!'
    assert got[7] == 7
    assert got[5] == 0


def test_lang_id(tdf):
    got = collect_map(tdf.withColumn("l", lang_id("text")), "l")
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "es"
    assert got[4] == "und"


def test_quality_score_bounds(tdf):
    got = collect_map(tdf.withColumn("q", quality_score("text")), "q")
    for _id, q in got.items():
        assert 0.0 <= q <= 1.0


def test_rolling_fingerprint_matches_python(tdf):
    BASE, MOD = 31, 2**31 - 1

    def py_fp(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * BASE + (ord(ch) if ord(ch) < 128 else 0)) % MOD
        return acc

    got = collect_map(
        tdf.withColumn("fp", rolling_fingerprint("text")), "fp"
    )
    rows = {r["id"]: r["text"] for r in tdf.collect()}
    for _id, text in rows.items():
        assert got[_id] == py_fp(text), (_id, text)


def test_shingles(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b")], "id long, text string"
    )
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", shingles("text", 3).alias("sh")).collect()
    }
    assert got[1] == ["a b c", "b c d", "c d e", "d e f"]
    assert got[2] == ["a b"]


def test_repetition_scores_degenerate_docs(spark):
    """Single-token and fully-repeated docs: bigram stats coalesce to
    zero for 1-token docs; a constant doc flags as repetitive with
    distinct=1; an all-distinct doc does not flag."""
    from cdc_2025_spark.queries.text import (
        text_doc_entropy,
        text_repetition_scores,
    )
    import tempfile, os

    rows = [
        (0, "solo", "en", "s", 4),
        (1, "a a a a a a", "en", "s", 11),
        (2, "v w x y z", "en", "s", 9),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        rep = (
            text_repetition_scores(spark, d)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        ent = (
            text_doc_entropy(spark, d)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
    assert rep.loc[0, "n_tokens"] == 1
    assert rep.loc[0, "n_bigrams"] == 0 and rep.loc[0, "top_bigram_n"] == 0
    # a 1-token doc IS flagged: its top unigram is 100% of the doc
    assert bool(rep.loc[0, "is_repetitive"])
    assert rep.loc[1, "n_distinct"] == 1 and bool(rep.loc[1, "is_repetitive"])
    assert rep.loc[1, "top_bigram_n"] == 5
    assert rep.loc[2, "n_distinct"] == 5 and not rep.loc[2, "is_repetitive"]
    # entropy: constant doc -> 0; all-distinct doc -> ln(5)
    import math

    assert ent.loc[1, "entropy_nats"] == 0.0
    assert abs(ent.loc[2, "entropy_nats"] - round(math.log(5), 4)) < 1e-9
    assert ent.loc[0, "entropy_nats"] == 0.0


@pytest.mark.parametrize("k", [1, 2, 5])
def test_exploded_spans_matches_shingles_explode(spark, k):
    """exploded_spans must emit exactly the multiset of
    explode(shingles(text, k)) for every k >= 1 — including k=1 (no
    window leads at all) and docs shorter than k (one whole-text
    span). NULL text deliberately diverges (documented) and is
    excluded here."""
    from cdc_2025_spark.functions.text import exploded_spans

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "one two"),
            (3, "single"),
            (4, ""),
            (5, "a b c d e f"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["span"])
        for r in exploded_spans(docs, k=k).collect()
    )
    want = sorted(
        (r["doc_id"], r["span"])
        for r in docs.select(
            "doc_id",
            F.explode(shingles(F.col("text"), k=k)).alias("span"),
        ).collect()
    )
    assert got == want


def test_exploded_spans_rejects_bad_k(spark):
    from cdc_2025_spark.functions.text import exploded_spans

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        exploded_spans(docs, k=0)


def test_tfidf_smoothing_and_ranking(spark):
    """TF-IDF pins: a term present in every doc gets idf exactly 1
    (smoothed ln((N+1)/(N+1)) + 1), so its tfidf equals its tf; rarer
    terms outrank ubiquitous ones at equal tf; ranks are 1..k dense
    per doc."""
    import math

    from unittest import mock

    from cdc_2025_spark.queries.text import text_tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common rare1 common common"),
            (2, "common rare2 rare2"),
            (3, "common filler words here"),
        ],
        "doc_id long, text string",
    )
    with mock.patch(
        "cdc_2025_spark.queries.text.read_table", return_value=docs
    ):
        out = text_tfidf_top_terms(spark, "ignored").toPandas()
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    for d, g in by_doc.items():
        assert sorted(g["rnk"]) == list(range(1, len(g) + 1)), d
    # doc 2: rare2 (tf=2, df=1) must beat common (tf=1, df=3)
    d2 = by_doc[2].set_index("term")
    assert d2.loc["rare2", "rnk"] == 1
    want = 2 * (math.log(4 / 2) + 1)
    assert abs(d2.loc["rare2", "tfidf"] - round(want, 4)) < 1e-9
    # 'common' appears in all 3 docs -> idf == 1 -> tfidf == tf
    assert d2.loc["common", "tfidf"] == 1.0


def test_chunk_documents_edge_cases(spark):
    """Chunker start-rule pinned on literal docs: one chunk for short
    docs (incl. empty text), stride-spaced starts, a clamped final
    chunk that is never fully contained in its predecessor, and every
    token covered by at least one chunk."""
    import os
    import tempfile

    from cdc_2025_spark.queries.text import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        text_chunk_documents,
    )

    n_long = CHUNK_SIZE + CHUNK_STRIDE + 7  # 119: starts 0, 48, 96
    rows = [
        (1, "", "en", "s", 0),
        (2, "one two three", "en", "s", 13),
        (3, " ".join(f"t{i}" for i in range(CHUNK_SIZE)), "en", "s", 1),
        (4, " ".join(f"t{i}" for i in range(n_long)), "en", "s", 1),
        (5, None, "en", "s", 0),  # NULL text == '' (r7 ADVICE)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        out = {}
        for r in text_chunk_documents(spark, d).collect():
            out.setdefault(r["doc_id"], []).append(
                (r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
            )
    for v in out.values():
        v.sort()
    assert out[1] == [(0, 1, "")]  # empty text: one empty chunk
    assert out[5] == [(0, 1, "")]  # NULL text: same single chunk
    assert out[2] == [(0, 3, "one two three")]
    assert [c[:2] for c in out[3]] == [(0, CHUNK_SIZE)]
    # long doc: starts every stride while start < n - overlap,
    # final chunk clamped to the document end
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    want_starts = list(range(0, n_long - overlap, CHUNK_STRIDE))
    assert [c[0] for c in out[4]] == want_starts
    assert out[4][-1][1] == n_long - want_starts[-1]  # clamped tail
    covered = set()
    for s, n, _ in out[4]:
        covered.update(range(s, s + n))
    assert covered == set(range(n_long))  # every token in >= 1 chunk


def test_bigram_perplexity_literal_model(spark):
    """Hand-computed add-1 bigram LM on a three-doc corpus:
    C(a,b)=3, C(b,a)=1, C(b,x)=1; contexts C(a)=3, C(b)=2; V=4
    (a, b, x, solo). P(w2|w1) = (C(w1,w2)+1)/(C(w1)+V); doc scores
    are exp(mean negative log-likelihood). A 1-token doc has no
    bigrams -> n_bigrams=0 with NULL metrics."""
    import math
    import os
    import tempfile

    from cdc_2025_spark.queries.text import text_bigram_perplexity

    rows = [
        (1, "a b a b", "en", "s", 7),
        (2, "a b x", "en", "s", 5),
        (3, "solo", "en", "s", 4),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["perplexity"])
            for r in text_bigram_perplexity(spark, d).collect()
        }
    nll_ab = math.log((3 + 4) / (3 + 1))  # P(b|a) = 4/7
    nll_ba = math.log((2 + 4) / (1 + 1))  # P(a|b) = 1/3
    nll_bx = math.log((2 + 4) / (1 + 1))  # P(x|b) = 1/3
    d1 = (2 * nll_ab + nll_ba) / 3
    d2 = (nll_ab + nll_bx) / 2
    assert got[1] == (3, round(d1, 4), round(math.exp(d1), 4))
    assert got[2] == (2, round(d2, 4), round(math.exp(d2), 4))
    assert got[3] == (0, None, None)
    # the repeated phrase scores LOWER perplexity than the novel one
    assert got[1][2] < got[2][2]


def test_topk_weighted_sample_matches_hashlib_model(spark, sf_dir):
    """The per-source quota sampler vs a sequential python model:
    identical md5 buckets, identical priority ordering (one IEEE
    division of the same integers), identical top-k per source —
    exact group quotas, zero-token docs excluded, and the long-doc
    bias direction visible on the fixture corpus."""
    import hashlib
    import re

    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.queries.llmdata import (
        RESERVOIR_K,
        WEIGHT_CAP,
        WEIGHT_SCALE,
        sample_topk_weighted_per_source,
    )

    got = sorted(
        (r["source"], r["rk"], r["doc_id"], r["n_tokens"])
        for r in sample_topk_weighted_per_source(spark, sf_dir).collect()
    )

    rows = read_table(spark, sf_dir, "documents").collect()
    per_source: dict[str, list] = {}
    all_tokens = []
    for r in rows:
        text = r["text"].strip()
        n = 0 if not text else len(re.split(r"\s+", text))
        all_tokens.append(n)
        if n == 0:
            continue
        bucket = (
            int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
            % WEIGHT_SCALE
        )
        prio = bucket / min(n, WEIGHT_CAP)
        per_source.setdefault(r["source"], []).append(
            (prio, r["doc_id"], n)
        )
    want = []
    for src, cands in per_source.items():
        cands.sort()
        for rk, (_, doc_id, n) in enumerate(cands[:RESERVOIR_K], 1):
            want.append((src, rk, doc_id, n))
    assert got == sorted(want)
    # quotas are exact and the weighting skews long
    from collections import Counter

    sizes = Counter(s for s, *_ in got)
    assert all(
        v == min(RESERVOIR_K, len(per_source[s])) for s, v in sizes.items()
    )
    sampled_mean = sum(g[3] for g in got) / len(got)
    assert sampled_mean > sum(all_tokens) / len(all_tokens)


def test_dsir_importance_matches_python_model(spark, sf_dir):
    """DSIR vs a sequential python model: identical hashed-unigram
    bucket counts, identical add-1 log-ratios, identical per-doc
    weights and salted-Gumbel keys (4dp), identical top-K selected
    set — plus the semantic direction: the target split's mean log
    importance weight exceeds the raw pool's (targets are
    target-like by construction)."""
    import hashlib
    import math
    import re
    from collections import Counter

    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.queries.llmdata import (
        DSIR_BUCKETS,
        DSIR_K,
        DSIR_TARGET_MAX_ID,
        WEIGHT_SCALE,
        sample_dsir_importance,
    )

    got = {
        r["doc_id"]: (r["log_weight"], r["gumbel_key"], r["selected"])
        for r in sample_dsir_importance(spark, sf_dir).collect()
    }

    rows = read_table(spark, sf_dir, "documents").collect()
    c_t: Counter = Counter()
    c_r: Counter = Counter()
    doc_buckets: dict[int, list[int]] = {}
    for r in rows:
        toks = re.split(r"\s+", r["text"].strip().lower())
        bks = [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS
            for t in toks
        ]
        doc_buckets[r["doc_id"]] = bks
        tgt = r["doc_id"] < DSIR_TARGET_MAX_ID
        for b in bks:
            (c_t if tgt else c_r)[b] += 1
    n_t, n_r = sum(c_t.values()), sum(c_r.values())
    lr = {
        b: math.log(
            (c_t[b] + 1)
            * (n_r + DSIR_BUCKETS)
            / ((c_r[b] + 1) * (n_t + DSIR_BUCKETS))
        )
        for b in set(c_t) | set(c_r)
    }
    scored = {}
    for did, bks in doc_buckets.items():
        w = sum(lr[b] for b in bks)
        u = (
            int(
                hashlib.md5(f"g:{did}".encode()).hexdigest()[:8], 16
            )
            % WEIGHT_SCALE
            + 0.5
        ) / WEIGHT_SCALE
        scored[did] = (round(w, 4), round(w - math.log(-math.log(u)), 4))
    top = sorted(scored, key=lambda d: (-scored[d][1], d))[:DSIR_K]
    want = {d: (*scored[d], d in set(top)) for d in scored}
    assert got == want

    tmean = sum(
        v[0] for d, v in want.items() if d < DSIR_TARGET_MAX_ID
    ) / DSIR_TARGET_MAX_ID
    rmean = sum(
        v[0] for d, v in want.items() if d >= DSIR_TARGET_MAX_ID
    ) / (len(want) - DSIR_TARGET_MAX_ID)
    assert tmean > rmean
    # resampling follows the weights: selected docs are heavier on
    # average than the pool
    smean = sum(v[0] for v in want.values() if v[2]) / DSIR_K
    assert smean > sum(v[0] for v in want.values()) / len(want)


def test_reservoir_bottomk_merge_equals_whole(spark, sf_dir):
    """Mergeability: bottom-k of the corpus == merge of the bottom-k
    samples of any split of it — the property that makes the sample
    maintainable per-shard and per-microbatch. Plus: exact size,
    contiguous ranks, and priorities actually are the K smallest."""
    from cdc_2025_spark.functions.reservoir import (
        bottomk_sample,
        merge_samples,
        priority,
    )
    from cdc_2025_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    k = 50
    whole = bottomk_sample(docs, k, "doc_id")
    a = bottomk_sample(docs.filter("doc_id % 3 = 0"), k, "doc_id")
    b = bottomk_sample(docs.filter("doc_id % 3 != 0"), k, "doc_id")
    merged = merge_samples(a, b, k)
    rows_w = sorted(map(tuple, whole.collect()))
    rows_m = sorted(map(tuple, merged.collect()))
    assert rows_w == rows_m
    assert len(rows_w) == k
    assert sorted(r[2] for r in rows_w) == list(range(1, k + 1))
    # the sample's max priority is <= every out-of-sample priority
    cut = max(r[1] for r in rows_w)
    sampled = {r[0] for r in rows_w}
    outside = (
        docs.select("doc_id", priority("doc_id").alias("p"))
        .filter(~F.col("doc_id").isin(sampled))
        .agg(F.min("p"))
        .first()[0]
    )
    assert cut <= outside


def test_reservoir_null_keys_excluded(spark):
    """NULL keys never enter the sample (their NULL priority would
    sort first in Spark but last in DuckDB — pinned out on both
    sides by the kernel's filter)."""
    from cdc_2025_spark.functions.reservoir import bottomk_sample

    df = spark.createDataFrame(
        [(None,), (1,), (2,), (3,)], "doc_id long"
    )
    got = bottomk_sample(df, 10, "doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2, 3]
    assert all(r["prio"] is not None for r in got)


def test_language_temperature_flattens_distribution(spark, sf_dir):
    """α-sampling invariants (mT5 §3.1): acceptance rates are valid
    probabilities; rarer languages get strictly HIGHER acceptance
    rates than commoner ones (the flattening that motivates the
    operator); every corpus language keeps its output row even at
    zero accepts; sampled counts never exceed corpus counts."""
    from cdc_2025_spark.queries import QUERIES

    rows = (
        QUERIES["sample_language_temperature"](spark, sf_dir)
        .orderBy("lang")
        .collect()
    )
    assert rows, "documents fixture has languages"
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    for r in rows:
        assert 0 <= r["accept_per_10k"] <= 10_000
        assert 0 <= r["n_sampled"] <= r["n_docs"]
    for small, big in zip(by_n, by_n[1:]):
        if small["n_docs"] < big["n_docs"]:
            assert small["accept_per_10k"] >= big["accept_per_10k"], (
                "temperature sampling must favor rarer languages: "
                f"{small['lang']} vs {big['lang']}"
            )
    # α < 1 strictly flattens: the most- and least-common languages
    # must get different rates whenever their counts differ
    if by_n[0]["n_docs"] < by_n[-1]["n_docs"]:
        assert by_n[0]["accept_per_10k"] > by_n[-1]["accept_per_10k"]


def test_language_temperature_alpha1_is_proportional(spark):
    """Degenerate check of the rate formula on a literal corpus:
    with the registered α = 0.3 and a 2-language 4:1 corpus, the
    rarer language's rate must exceed the commoner's by the closed
    form (q ∝ n^0.3)/n — computed here with python floats and
    compared to the engine's quantized rates exactly."""
    import math

    from cdc_2025_spark.queries.llmdata import (
        LANG_ALPHA,
        LANG_RATE_SCALE,
        LANG_TARGET_DOCS,
        sample_language_temperature,
    )

    docs = spark.createDataFrame(
        [(i, "w", "en" if i < 400 else "fr", "s", 1) for i in range(500)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["lang"]: r
            for r in sample_language_temperature(spark, d).collect()
        }
    ss = 400**LANG_ALPHA + 100**LANG_ALPHA
    for lang, n in (("en", 400), ("fr", 100)):
        expect = round(
            min(1.0, LANG_TARGET_DOCS * n**LANG_ALPHA / ss / n)
            * LANG_RATE_SCALE
        )
        assert out[lang]["accept_per_10k"] == expect
        assert out[lang]["n_docs"] == n


def test_bm25_ranking_pins(spark):
    """BM25 pins: higher tf outranks lower tf at equal length; at
    equal tf the shorter document outranks the longer (length
    normalization, b=0.75); docs with no query term are absent; a doc
    hitting all three query terms reports n_terms_hit == 3."""
    from unittest import mock

    from cdc_2025_spark.queries.text import text_bm25_search

    docs = spark.createDataFrame(
        [
            (1, "stream stream stream filler"),
            (2, "stream filler filler filler"),
            (3, "stream filler"),
            (4, "stream vector merge"),
            (5, "filler words only here"),
        ],
        "doc_id long, text string",
    )
    with mock.patch(
        "cdc_2025_spark.queries.text.read_table", return_value=docs
    ):
        out = text_bm25_search(spark, "ignored").toPandas()
    scores = dict(zip(out["doc_id"], out["bm25"]))
    hits = dict(zip(out["doc_id"], out["n_terms_hit"]))
    assert 5 not in scores  # no query term -> never scored
    assert scores[1] > scores[2]  # tf monotone at equal dl
    assert scores[3] > scores[2]  # shorter doc wins at equal tf
    assert hits[4] == 3 and hits[1] == 1
    # all-terms doc dominates single-term docs (three idf terms sum)
    assert scores[4] == max(scores.values())


def test_winnowing_match_guarantee_and_density(spark):
    """The winnowing guarantee (Schleimer et al. SIGMOD'03 thm): any
    shared substring of length >= k + w - 1 yields at least one
    shared fingerprint HASH, even at different positions in the two
    documents. Density on a long aperiodic string sits near the
    expected 2/(w+1)."""
    from cdc_2025_spark.queries.text import (
        WINNOW_K,
        WINNOW_W,
        _WINNOW_ENC,
        winnow_selected,
    )

    shared = "zqxjkvbwp mfgh ytrl"  # len 19 >= k + w - 1 = 11
    long_doc = " ".join(
        f"{(i * 7919) % 104729:x}" for i in range(400)
    )  # aperiodic filler, ~2000 chars
    docs = spark.createDataFrame(
        [
            (1, "aaa " + shared + " bbb"),
            (2, "cc " + long_doc[:50] + " " + shared),
            (3, long_doc),
        ],
        "doc_id long, text string",
    )
    rows = winnow_selected(docs).collect()
    hashes = {}
    for r in rows:
        hashes.setdefault(r["doc_id"], set()).add(r["sel"] // _WINNOW_ENC)
    assert hashes[1] & hashes[2], "shared substring lost by winnowing"
    n3 = {r["doc_id"]: r["n_kgrams"] for r in rows}[3]
    density = len(hashes[3]) / n3
    expected = 2.0 / (WINNOW_W + 1)
    assert abs(density - expected) < 0.15, density
    # every position-selected fingerprint lies within the doc
    assert all(1 <= r["pos"] <= r["n_kgrams"] for r in rows)


def test_yield_curve_accounting_invariants(spark, sf_dir):
    """The yield curve must account for the whole corpus: the lowest
    bucket's cumulative row covers every doc and 100% of tokens;
    cumulative counts are monotone nonincreasing in the threshold."""
    from cdc_2025_spark.io import read_table
    from cdc_2025_spark.queries.text import text_quality_yield_curve

    rows = sorted(
        text_quality_yield_curve(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert rows[0]["cum_docs"] == n_docs
    assert rows[0]["token_yield"] == 1.0
    for lo, hi in zip(rows, rows[1:]):
        assert lo["cum_docs"] >= hi["cum_docs"]
        assert lo["cum_tokens"] >= hi["cum_tokens"]
        assert lo["threshold_lo"] < hi["threshold_lo"]
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_pmi_collocations_ranking_and_value(spark):
    """PMI pins: a pair that always co-occurs scores ln(N·c/(c·c)) =
    ln(N/c) and outranks an independent pair (PMI ~ 0); fixture
    co-occurrence counts satisfy both floors."""
    import math

    from unittest import mock

    from cdc_2025_spark.queries.text import text_pmi_collocations

    rows = []
    # x,y co-occur in docs 0..9 (and nowhere else): dependent pair
    for i in range(10):
        rows.append((i, "x y filler" + str(i)))
    # p in 10..19, q in 15..24: overlap 5 of N=25
    # -> PMI(p,q) = ln(25*5/100) = ln(1.25), well below PMI(x,y)
    for i in range(10, 20):
        rows.append((i, "p pad" + str(i)))
    for i in range(15, 20):
        rows[i] = (i, rows[i][1] + " q")
    for i in range(20, 25):
        rows.append((i, "q pad" + str(i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with mock.patch(
        "cdc_2025_spark.queries.text.read_table", return_value=docs
    ):
        got = {
            (r["t1"], r["t2"]): r
            for r in text_pmi_collocations(spark, "fixture").collect()
        }
    xy = got[("x", "y")]
    assert xy["cooc"] == 10
    assert abs(xy["pmi"] - round(math.log(25 / 10), 4)) < 1e-9
    pq = got[("p", "q")]
    assert pq["cooc"] == 5
    assert abs(pq["pmi"] - round(math.log(1.25), 4)) < 1e-9
    assert xy["pmi"] > pq["pmi"]


def test_clean_text_kernel_on_dirty_fixtures(spark):
    """Normalization pins: control chars and zero-width characters
    are stripped, whitespace runs collapse, clean text is a fixpoint
    (idempotence), and cleaning restores exact-dedup key equality
    between a clean doc and its mojibake twin."""
    from cdc_2025_spark.dedup.exact import content_key
    from cdc_2025_spark.queries.text import clean_text

    dirty = "hello\x00 ​world‍  \t\n spark\x7f"
    rows = [(1, dirty), (2, "hello world spark"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            clean_text("text").alias("clean"),
            content_key(clean_text("text")).alias("k"),
        ).collect()
    }
    assert got[1]["clean"] == "hello world spark"
    assert got[1]["k"] == got[2]["k"]  # dedup key restored
    assert got[3]["clean"] == ""
    # idempotence: cleaning the cleaned text changes nothing
    again = df.select(
        clean_text(clean_text("text")).alias("c2"),
        clean_text("text").alias("c1"),
    ).collect()
    assert all(r["c1"] == r["c2"] for r in again)


def test_vocab_coverage_monotone_and_exact(spark):
    """Coverage pins on a literal Zipf-ish corpus: monotone
    nondecreasing in V, saturates at 1.0 once V >= |vocab|, and the
    smallest grid point equals the hand-computed top-10 occurrence
    share."""
    from collections import Counter

    from unittest import mock

    from cdc_2025_spark.queries.text import (
        VOCAB_COVERAGE_GRID,
        text_vocab_coverage,
    )

    # 30 distinct terms with frequencies 30, 29, ..., 1
    words = []
    for i in range(30):
        words += [f"w{i:02d}"] * (30 - i)
    text = " ".join(words)
    docs = spark.createDataFrame(
        [(1, text), (2, "")], "doc_id long, text string"
    )
    with mock.patch(
        "cdc_2025_spark.queries.text.read_table", return_value=docs
    ):
        rows = sorted(
            text_vocab_coverage(spark, "fixture").collect(),
            key=lambda r: r["vocab_size"],
        )
    assert [r["vocab_size"] for r in rows] == list(VOCAB_COVERAGE_GRID)
    cov = [r["coverage"] for r in rows]
    assert cov == sorted(cov)
    counts = sorted(Counter(words).values(), reverse=True)
    want10 = round(sum(counts[:10]) / sum(counts), 4)
    assert rows[0]["coverage"] == want10
    assert all(r["coverage"] == 1.0 for r in rows if r["vocab_size"] >= 30)


def test_winnowing_overflow_guard_raises(spark):
    """A document longer than the 2^20-char position slot must fail
    loud, not silently corrupt the (hash, pos) key encoding."""
    from cdc_2025_spark.queries.text import _WINNOW_ENC, winnow_selected

    big = spark.createDataFrame(
        [(1, "x" * (_WINNOW_ENC + 8))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="overflow"):
        winnow_selected(big).count()


def test_weighted_reservoir_plan_and_weight_dominance(spark):
    """The weighted bottom-k take must plan as TakeOrderedAndProject
    (same contract as the uniform sampler — no global sort), and a
    key whose weight dwarfs the field must always be sampled (its
    Exp(w) race key is ~w times smaller)."""
    from cdc_2025_spark.functions.reservoir import (
        weighted_bottomk_sample,
    )
    from cdc_2025_spark.plans import plan_string

    rows = [(i, 1.0) for i in range(200)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    s = weighted_bottomk_sample(df, 5, "doc_id", "w")
    assert "TakeOrderedAndProject" in plan_string(s)
    assert 999 in {r["doc_id"] for r in s.collect()}


def test_weighted_merge_conflicting_weights_deterministic(spark):
    """A key whose weight differs between shards merges to the copy
    with the smallest race key (the highest-weight version's ticket)
    — deterministically, not whichever dropDuplicates saw first."""
    from cdc_2025_spark.functions.reservoir import (
        merge_weighted_samples,
        weighted_bottomk_sample,
    )

    a = spark.createDataFrame(
        [(42, 1.0), (1, 3.0)], "doc_id long, w double"
    )
    b = spark.createDataFrame(
        [(42, 500.0), (2, 3.0)], "doc_id long, w double"
    )
    sa = weighted_bottomk_sample(a, 3, "doc_id", "w")
    sb = weighted_bottomk_sample(b, 3, "doc_id", "w")
    m1 = {
        r["doc_id"]: (r["weight"], r["wprio"])
        for r in merge_weighted_samples(sa, sb, 3).collect()
    }
    m2 = {
        r["doc_id"]: (r["weight"], r["wprio"])
        for r in merge_weighted_samples(sb, sa, 3).collect()
    }
    assert m1 == m2  # order of shards cannot matter
    # the high-weight version of key 42 wins (smaller race key)
    assert m1[42][0] == 500.0
    wp_500 = {
        r["doc_id"]: r["wprio"] for r in sb.collect()
    }[42]
    assert m1[42][1] == wp_500
