"""Distributed BPE vocabulary induction (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — the byte-pair-encoding merge-learning algorithm behind
most LLM tokenizers' vocab construction).

Scale shape — the published algorithm's own insight, kept intact:
BPE training operates on the WORD-FREQUENCY table, not the corpus.
One corpus-wide aggregate produces (word, freq); every one of the N
merge rounds then runs entirely on that vocabulary-sized frame
(adjacent-pair explode → weighted grouped count → global argmax →
apply the winning merge). At 100 TB the corpus is touched exactly
once; rounds cost |vocab|-sized shuffles regardless of corpus size.

Determinism: the winning pair each round is (max total count,
tiebreak lexicographically smallest (left, right)) — the same rule
the pure-python reference model in tests uses, so the merge
sequences agree exactly.

The per-word adjacent-merge rewrite is inherently sequential over a
symbol list, so it runs as an Arrow-batched mapInPandas over the
vocabulary frame (never the corpus) — the module's one Python stage,
consistent with the repo's UDF policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens of lowered text — the one
    corpus-sized aggregate BPE training needs (map-side partials;
    output is vocabulary-sized)."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_round(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol sequence, replacing each non-overlapping
    adjacent (left, right) occurrence left-to-right with the merged
    symbol — the sequential Sennrich rewrite, Arrow-batched over the
    vocabulary frame."""

    def fn(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                merged, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            yield pd.DataFrame(
                {"word": pdf["word"], "freq": pdf["freq"], "syms": out}
            )

    return vocab.mapInPandas(fn, "word string, freq long, syms array<string>")


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    ``[(rank, left, right, pair_count), ...]`` in merge order
    (rank 1-based). Stops early when no adjacent pair remains.

    Each round: adjacent pairs explode from the vocab frame's symbol
    arrays weighted by word frequency, one grouped sum (|pairs| ≤
    total symbol count of the VOCABULARY), and a limit(1) argmax with
    the lexicographic tiebreak; the winner is applied via one
    vocabulary-sized rewrite. The vocab frame is eagerly
    localCheckpoint'd per round so round k+1 reads materialized
    symbols instead of re-executing k rewrites.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")

    vocab = (
        word_freq_table(docs, text_col)
        .select(
            # split at every between-char boundary: not at the start,
            # and followed by a char (the lookahead avoids Spark
            # split's trailing empty element)
            "word",
            "freq",
            F.split(F.col("word"), r"(?!^)(?=.)").alias("syms"),
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        n1 = F.greatest(F.size("syms") - 1, F.lit(0))
        pairs = (
            vocab.filter(F.size("syms") > 1)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, n1).alias("l"),
                        F.slice(F.col("syms"), 2, n1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(
                F.col("p.l").alias("l"), F.col("p.r").alias("r")
            )
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        top = pairs[0]
        merges.append((rank, top["l"], top["r"], int(top["cnt"])))
        nxt = _merge_round(vocab, top["l"], top["r"]).localCheckpoint()
        vocab = nxt
    return merges


def bpe_segment(word: str, merges: list[tuple[int, str, str, int]]) -> list[str]:
    """Apply a learned merge list to one word (greedy by merge rank —
    the standard BPE inference rule). Driver-side helper for tests
    and spot checks; corpus-scale application would ride mapInPandas
    with the merge list in the closure."""
    syms = list(word)
    for _, left, right, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to every document and return
    (id, n_words, n_subwords) — the subword-aware token budget a
    packing/chunking stage plans against (whitespace counts
    under-estimate; char counts over-estimate).

    Scale shape: the merge list rides the mapInPandas closure
    (n_merges tuples — broadcast-sized); segmentation memoizes per
    DISTINCT word within each Arrow batch, so per-batch work is
    bounded by the batch's vocabulary, not its length. One Python
    stage, no shuffle."""

    def fn(batches):
        import pandas as pd  # noqa: PLC0415

        cache: dict[str, int] = {}

        def n_sub(word: str) -> int:
            got = cache.get(word)
            if got is None:
                got = len(bpe_segment(word, merges))
                cache[word] = got
            return got

        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_words, n_subwords = [], []
            for text in pdf["text"]:
                ws = [w for w in (text or "").strip().lower().split() if w]
                n_words.append(len(ws))
                n_subwords.append(sum(n_sub(w) for w in ws))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_words": n_words,
                    "n_subwords": n_subwords,
                }
            )

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(fn, "id long, n_words long, n_subwords long")
