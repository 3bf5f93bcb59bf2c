"""Text-analysis expressions for large-scale corpus pipelines.

Every function returns a Column built purely from
``pyspark.sql.functions`` — whole-stage-codegen'd, no Python on the
executor path. These are the per-document primitives behind the
text-analysis queries and the dedup shingling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the heuristic language
# classifier. Deliberately small and transparent: the operator's value
# is the distributed scoring pattern, not lexicon quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "que"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace, trimmed)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token estimate: count of letter-runs, digit-runs,
    and single punctuation marks — the regex analogue of a BPE
    pre-tokenizer's word-split stage. A cheap, deterministic proxy for
    LLM token budgeting at corpus scale."""
    pieces = F.regexp_extract_all(
        F.col(text) if isinstance(text, str) else text,
        F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"),
        1,
    )
    return F.size(pieces)


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    """Fraction of whitespace tokens that are in ``stopwords``."""
    toks = tokens(F.lower(text) if isinstance(text, str) else F.lower(text))
    arr = F.array(*[F.lit(s) for s in stopwords])
    # filter, not array_intersect: intersect would dedup occurrences
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop / F.size(toks)
    )


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    col = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[^\w\s]", "")
    )
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        n_punct / F.length(col)
    )


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]:

    0.4 * length-band score (ideal 200..2000 chars)
    + 0.3 * (1 - punctuation ratio)
    + 0.3 * mean-word-length band score (ideal 3..10)

    The formula is arbitrary but fixed — its role is the distributed
    scoring pattern used to filter corpora before training.
    """
    col = F.col(text) if isinstance(text, str) else text
    n = F.length(col).cast("double")
    len_score = F.when(n < 200, n / 200.0).when(
        n > 2000, F.greatest(F.lit(0.0), 1.0 - (n - 2000.0) / 8000.0)
    ).otherwise(F.lit(1.0))
    ntok = token_count(col).cast("double")
    mean_wl = F.when(ntok == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(col, r"\s+", "")) / ntok
    )
    wl_score = (
        F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0))
        .when(mean_wl < 3.0, mean_wl / 3.0)
        .otherwise(F.greatest(F.lit(0.0), 1.0 - (mean_wl - 10.0) / 10.0))
    )
    return 0.4 * len_score + 0.3 * (1.0 - punct_ratio(col)) + 0.3 * wl_score


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword-marker
    ratios, 'und' (undetermined) when all scores are 0. Ties break by
    fixed language order (de, en, es, fr, zh — alphabetical).

    Real pipelines swap in fastText/CLD3 behind the same column
    contract; this keeps the whole classifier inside codegen.
    """
    scores = {
        lang: stopword_ratio(text, words) for lang, words in LANG_MARKERS.items()
    }
    ordered = sorted(scores)  # deterministic tie order
    # fold left: strictly-greater replaces, so earlier languages win ties
    expr_lang, expr_score = F.lit("und"), F.lit(0.0)
    for lang in ordered:
        take = scores[lang] > expr_score
        expr_lang = F.when(take, F.lit(lang)).otherwise(expr_lang)
        expr_score = F.when(take, scores[lang]).otherwise(expr_score)
    return expr_lang


def rolling_fingerprint(text: Column | str, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash of the whole document's characters:
    fp = sum(code(c_i) * base^(n-1-i)) mod m — computed distributed
    via aggregate() over the char array (Horner's rule, JVM-side).

    Deterministic content fingerprint usable for exact-dup detection
    and incremental chunk hashing. Not SQL-portable (no oracle) —
    pinned by unit tests against a Python reimplementation.
    """
    col = F.col(text) if isinstance(text, str) else text
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def exploded_spans(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, span) rows — every word k-span of every document,
    built with posexplode + window ``lead``s instead of exploding the
    higher-order ``shingles`` array.

    Same output as ``explode(shingles(text, k))`` (pinned in
    tests/test_dedup.py), but every expression is codegen'd — Spark
    interprets ``transform``/``aggregate`` lambdas per element, which
    made shingle construction the dominant cost of the repeated-spans
    scan (2.6 s of 3.7 s at sf0.1). As a bonus the window's
    (id, pos) shuffle spreads a single-file corpus across all cores,
    where the array explode ran on the one scan task. Measured 5x
    end-to-end on dedup_repeated_spans.

    Documents with <= k tokens (including empty text, whose token
    array is [""]) yield one whole-text span, exactly like
    ``shingles``: the pos==0 row's concat_ws skips the NULL leads.

    NULL-text divergence (deliberate, untriggered by the fixture
    corpus, whose text is non-null): posexplode of a NULL token array
    emits no rows, so NULL-text docs vanish here, while
    ``explode(shingles(NULL))`` emits one NULL-span row (size(NULL) is
    -1, taking the n <= k branch). Equivalent to filtering
    ``text_col IS NOT NULL`` first — dedup semantics treat a NULL doc
    as having no content to match on.
    """
    return exploded_spans_with_pos(docs, k, text_col, id_col).select(
        id_col, "span"
    )


def exploded_spans_with_pos(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id_col, pos, span) rows — ``exploded_spans`` keeping each
    span's 0-based start-token position, the occurrence coordinate
    span-removal needs (a repeated span is excised at every occurrence
    EXCEPT its global first, so occurrences must be addressable).

    ``toks``: an already-built (id_col, pos, tok) frame — callers
    that also need the token stream for other subtrees (span removal:
    the kept-token anti-join and the per-doc totals) pass their
    checkpointed copy so the corpus is tokenized ONCE instead of once
    per subtree (r16; the span construction itself is unchanged)."""
    if k < 1:
        raise ValueError(f"span width k must be >= 1, got {k}")
    if toks is None:
        toks = docs.select(
            id_col,
            F.posexplode(tokens(F.lower(F.col(text_col)))).alias(
                "pos", "tok"
            ),
        )
    if k == 1:
        # no leads to wait on: every token is its own span
        return toks.select(id_col, "pos", F.col("tok").alias("span"))
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, k)]
    return (
        toks.select(
            id_col,
            "pos",
            F.concat_ws(" ", F.col("tok"), *leads).alias("span"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull() | (F.col("pos") == 0))
        .select(id_col, "pos", "span")
    )


def shingles(text: Column | str, k: int = 5) -> Column:
    """Word k-shingles (k consecutive lowercase tokens, space-joined)
    as an array column — the unit set for Jaccard/MinHash dedup.
    Documents shorter than k words yield a single whole-text shingle.
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.lower(col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n <= k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
        )
    )
