"""BPE vocabulary induction: exact merge-sequence equality against a
pure-python Sennrich reference model, segmentation behavior,
early-stop, and argument guards."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from cdc_2025_spark.functions.bpe import bpe_segment, bpe_train
from cdc_2025_spark.io import read_table


def _python_bpe(word_freq: dict[str, int], n_merges: int):
    """Sennrich et al. ACL'16 reference loop over a word-frequency
    dict, with the engine's deterministic tiebreak (max count, then
    lexicographically smallest (left, right))."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _corpus_word_freq(spark, sf_dir):
    wf: Counter = Counter()
    for r in read_table(spark, sf_dir, "documents").collect():
        for w in re.split(r"\s+", r["text"].strip().lower()):
            if w:
                wf[w] += 1
    return dict(wf)


def test_merges_match_python_model_on_corpus(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    got = bpe_train(docs, 15)
    want = _python_bpe(_corpus_word_freq(spark, sf_dir), 15)
    assert got == want
    # merge counts are non-increasing in rank only within a fixed
    # symbol alphabet — not guaranteed globally — but every count is
    # positive and ranks are 1..n
    assert [m[0] for m in got] == list(range(1, len(got) + 1))
    assert all(m[3] > 0 for m in got)


def test_merges_on_literal_corpus(spark):
    # 'low' x5, 'lower' x2 — the Sennrich paper's own example shape:
    # ('l','o') count 7 wins round 1, then ('lo','w') count 7
    docs = spark.createDataFrame(
        [(0, "low low low low low"), (1, "lower lower")],
        "doc_id long, text string",
    )
    got = bpe_train(docs, 3)
    assert got[0] == (1, "l", "o", 7)
    assert got[1] == (2, "lo", "w", 7)
    # round 3: 'low' is now one symbol in both words; ('low','e')
    # count 2 beats nothing else ≥ 2 except ('e','r') — tiebreak
    # picks the lexicographically smaller ('e','r')
    assert got[2] == (3, "e", "r", 2)


def test_early_stop_when_no_pairs_remain(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab")], "doc_id long, text string"
    )
    got = bpe_train(docs, 10)
    # one merge exhausts every multi-symbol word
    assert got == [(1, "a", "b", 2)]


def test_segment_applies_merges_in_rank_order(spark):
    docs = spark.createDataFrame(
        [(0, "low low low low low"), (1, "lower lower")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, 3)
    assert bpe_segment("low", merges) == ["low"]
    assert bpe_segment("lower", merges) == ["low", "er"]
    assert bpe_segment("slow", merges) == ["s", "low"]
    # unseen word with no applicable merges stays character-split
    assert bpe_segment("unseen", merges) == list("unseen")


def test_registered_query_shape(spark, sf_dir):
    from cdc_2025_spark.queries.text import (
        BPE_N_MERGES,
        text_bpe_vocab_merges,
    )

    out = text_bpe_vocab_merges(spark, sf_dir)
    rows = out.collect()
    assert out.columns == ["rank", "left", "right", "merged", "pair_count"]
    assert 1 <= len(rows) <= BPE_N_MERGES
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_bad_args(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(docs, 0)


def test_apply_counts_match_segmenter(spark, sf_dir):
    """Corpus-scale application vs python bpe_segment word by word:
    identical subword counts per document, and the structural bounds
    n_words <= n_subwords (merges never cross word boundaries)."""
    from cdc_2025_spark.functions.bpe import bpe_apply_counts
    from cdc_2025_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, 10)
    got = {
        r["id"]: (r["n_words"], r["n_subwords"])
        for r in bpe_apply_counts(docs, merges).collect()
    }
    for r in docs.collect():
        ws = [w for w in r["text"].strip().lower().split() if w]
        want = sum(len(bpe_segment(w, merges)) for w in ws)
        assert got[r["doc_id"]] == (len(ws), want)
        assert len(ws) <= want


def test_registered_apply_query(spark, sf_dir):
    from cdc_2025_spark.queries.text import text_bpe_token_counts

    rows = text_bpe_token_counts(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["n_words"] <= r["n_subwords"]
        if r["n_subwords"]:
            # Spark F.round is HALF_UP; python round() is banker's —
            # exact quotients like 0.28125 land on the boundary
            assert abs(
                r["compression"] - r["n_words"] / r["n_subwords"]
            ) <= 5e-5
