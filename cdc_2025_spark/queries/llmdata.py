"""Training-data curation operators beyond dedup: benchmark
decontamination and sequence packing — both shaped for corpus scale
(inverted-index join, per-bucket windows; no global sorts, no cross
products).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_2025_spark.dedup.minhash import shingle_sets
from cdc_2025_spark.functions.text import token_count
from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query

EVAL_MAX_ID = 100
CONTAIN_K = 3
CONTAIN_THRESHOLD = 0.5


@query(
    "text_decontamination_overlap",
    oracle=f"""
    WITH sets AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ws) <= {CONTAIN_K}
               THEN [array_to_string(ws, ' ')]
               ELSE [array_to_string(ws[i:i+{CONTAIN_K - 1}], ' ')
                     for i in range(1, len(ws) - {CONTAIN_K} + 2)]
               END) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS ws
            FROM documents)
    ),
    e AS (SELECT doc_id, sh FROM sets WHERE doc_id < {EVAL_MAX_ID}),
    t AS (SELECT doc_id, sh FROM sets WHERE doc_id >= {EVAL_MAX_ID})
    SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
           ROUND(len(list_intersect(e.sh, t.sh)) * 1.0 / len(e.sh), 4)
               AS containment
    FROM e JOIN t
      ON len(list_intersect(e.sh, t.sh)) * 1.0 / len(e.sh)
         >= {CONTAIN_THRESHOLD}
    """,
)
def text_decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION: find training documents whose
    shingle sets contain >= 50% of an eval document's shingles
    (containment |T∩E|/|E| — the train/test-overlap measure; public
    practice in LLM corpus curation, e.g. n-gram overlap decontam in
    the GPT-3/PaLM papers).

    Shape: asymmetric inverted-index join on hashed shingles — eval
    side is tiny (broadcastable), train side streams; work is
    proportional to shared-shingle occurrences, never |E|x|T|. The
    oracle brute-forces the same measure over the cross product.
    """
    docs = read_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, "doc_id", "text", CONTAIN_K).persist()
    ev = sets.filter(F.col("id") < EVAL_MAX_ID).select(
        F.col("id").alias("eval_id"),
        F.size("sh").alias("esize"),
        F.explode("sh").alias("shingle"),
    )
    tr = sets.filter(F.col("id") >= EVAL_MAX_ID).select(
        F.col("id").alias("train_id"), F.explode("sh").alias("shingle")
    )
    inter = (
        F.broadcast(ev)
        .join(tr, "shingle")
        .groupBy("eval_id", "train_id", "esize")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn("containment", F.col("inter") / F.col("esize"))
        .filter(F.col("containment") >= CONTAIN_THRESHOLD)
        .select(
            "eval_id",
            "train_id",
            F.round("containment", 4).alias("containment"),
        )
    )


WEIGHT_CAP = 40
WEIGHT_SCALE = 1_000_000


@query(
    "sample_weighted_by_tokens",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END
                 AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {WEIGHT_SCALE} AS bucket
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_tokens) AS BIGINT) AS sampled_tokens
    FROM w
    WHERE bucket * {WEIGHT_CAP} <
          LEAST(n_tokens, {WEIGHT_CAP}) * {WEIGHT_SCALE}
    GROUP BY source
    """,
)
def sample_weighted_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED deterministic sampling: each document is kept with
    probability proportional to its (capped) token count — the
    "sample long documents more" curation step, reproducible across
    engines and reruns.

    The Bernoulli draw is a seed-free md5 bucket compared with an
    ALL-INTEGER inequality (``bucket * cap < w * scale`` ⇔ accept with
    P = w/cap): float-pow formulations (Efraimidis-Spirakis keys) rank
    near-ties differently across engines' libm and break hash parity,
    so the integer form is the oracle-safe spelling. Rides the scan;
    one aggregate shuffle.
    """
    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % WEIGHT_SCALE
    )
    w = F.least(token_count("text"), F.lit(WEIGHT_CAP))
    return (
        docs.select(
            "source",
            token_count("text").alias("n_tokens"),
            bucket.alias("bucket"),
            w.alias("w"),
        )
        .filter(
            F.col("bucket") * WEIGHT_CAP < F.col("w") * WEIGHT_SCALE
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_tokens").alias("sampled_tokens"),
        )
    )


PACK_BUDGET = 256
PACK_BUCKETS = 8


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END
                 AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {PACK_BUCKETS} AS bucket
      FROM documents
    ),
    packed AS (
      SELECT bucket, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY bucket
                           ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / {PACK_BUDGET}) AS BIGINT) AS pack_id
      FROM tok
    )
    SELECT CAST(bucket AS INTEGER) AS bucket, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY bucket, pack_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING: assign documents to fixed-token-budget packs
    (the batch-assembly step before LLM training) — greedy by running
    token count within deterministic hash buckets.

    Scale shape: packing is sequential by nature, so the corpus is
    split into md5-hash buckets (engine-portable, like the sampling
    queries) and the running sum is a WINDOW per bucket — each bucket
    packs independently on its executor; there is NO global sort or
    single-partition window. Pack utilization (docs/tokens per pack)
    is the rollup a pipeline monitors for padding waste.
    """
    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % PACK_BUCKETS
    ).cast("int")
    tok = docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bucket.alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = tok.withColumn(
        "pack_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET
        ),
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


PREP_REP_FACTOR = 5  # drop when top unigram > 20% of the doc


@query(
    "llm_corpus_prep",
    oracle=f"""
    WITH tr AS (
      SELECT doc_id, source,
             string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents WHERE doc_id >= {EVAL_MAX_ID}
    ),
    uni AS (
      SELECT doc_id, source, tok, COUNT(*) AS c
      FROM tr, unnest(ws) AS u(tok) GROUP BY 1, 2, 3
    ),
    ustat AS (
      SELECT doc_id, source, SUM(c) AS n_tokens, MAX(c) AS top_c
      FROM uni GROUP BY 1, 2
    ),
    keyed AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(ws)), ' '))
               AS ckey
      FROM tr
    ),
    st AS (
      SELECT u.*, k.ckey,
             ({PREP_REP_FACTOR} * u.top_c > u.n_tokens) AS drop_rep
      FROM ustat u JOIN keyed k USING (doc_id)
    ),
    canon AS (
      SELECT ckey, MIN(doc_id) AS canonical_id
      FROM st WHERE NOT drop_rep GROUP BY 1
    ),
    sets AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ws) <= {CONTAIN_K}
               THEN [array_to_string(ws, ' ')]
               ELSE [array_to_string(ws[i:i+{CONTAIN_K - 1}], ' ')
                     for i in range(1, len(ws) - {CONTAIN_K} + 2)]
               END) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS ws
            FROM documents)
    ),
    e AS (SELECT doc_id, sh FROM sets WHERE doc_id < {EVAL_MAX_ID}),
    t2 AS (SELECT doc_id, sh FROM sets WHERE doc_id >= {EVAL_MAX_ID}),
    contam AS MATERIALIZED (
      SELECT DISTINCT t2.doc_id FROM e JOIN t2
        ON len(list_intersect(e.sh, t2.sh)) * 1.0 / len(e.sh)
           >= {CONTAIN_THRESHOLD}
    ),
    labeled AS (
      SELECT st.source, st.n_tokens,
        CASE WHEN st.drop_rep THEN 'drop_repetitive'
             WHEN st.doc_id != c.canonical_id THEN 'drop_duplicate'
             WHEN st.doc_id IN (SELECT doc_id FROM contam)
               THEN 'drop_contaminated'
             ELSE 'kept' END AS status
      FROM st LEFT JOIN canon c USING (ckey)
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_in,
      CAST(SUM(CASE WHEN status = 'drop_repetitive' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_drop_repetitive,
      CAST(SUM(CASE WHEN status = 'drop_duplicate' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_drop_duplicate,
      CAST(SUM(CASE WHEN status = 'drop_contaminated' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_drop_contaminated,
      CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_kept,
      CAST(SUM(CASE WHEN status = 'kept' THEN n_tokens ELSE 0 END)
           AS BIGINT) AS kept_tokens
    FROM labeled GROUP BY source
    """,
)
def llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus-prep pipeline: repetition filter -> exact
    vocab dedup (min-id survivor among quality-passing docs) ->
    benchmark decontamination, with per-source drop accounting and
    kept-token totals — the composition a training-data run executes,
    as ONE declarative plan.

    Stage order is part of the contract: dedup canonicals are chosen
    among quality survivors only, and decontamination applies to
    dedup survivors only, so each drop is attributed to exactly one
    stage. All outputs are integer counts (hash-exact across
    engines).

    Scale shape: every stage is a hash-keyed aggregate or an
    asymmetric broadcast join (eval side tiny) — composing them adds
    no new shuffle class; Catalyst pipelines the scans, and the
    doc-level stats reuse one tokenization subplan.
    """
    from cdc_2025_spark.dedup.exact import vocab_key

    docs = read_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") >= EVAL_MAX_ID)
    uni = (
        train.select(
            "doc_id",
            "source",
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("tok"),
        )
        .groupBy("doc_id", "source", "tok")
        .count()
    )
    stats = uni.groupBy("doc_id", "source").agg(
        F.sum("count").alias("n_tokens"), F.max("count").alias("top_c")
    )
    keyed = train.select("doc_id", vocab_key("text").alias("ckey"))
    st = stats.join(keyed, "doc_id").withColumn(
        "drop_rep",
        PREP_REP_FACTOR * F.col("top_c") > F.col("n_tokens"),
    )
    canon = (
        st.filter(~F.col("drop_rep"))
        .groupBy("ckey")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    # persisted: the eval and train branches both read the shingle
    # subplan (same reason text_decontamination_overlap persists it)
    sets = shingle_sets(docs, "doc_id", "text", CONTAIN_K).persist()
    ev = sets.filter(F.col("id") < EVAL_MAX_ID).select(
        F.col("id").alias("eval_id"),
        F.size("sh").alias("esize"),
        F.explode("sh").alias("shingle"),
    )
    trs = sets.filter(F.col("id") >= EVAL_MAX_ID).select(
        F.col("id").alias("doc_id"), F.explode("sh").alias("shingle")
    )
    contam = (
        F.broadcast(ev)
        .join(trs, "shingle")
        .groupBy("eval_id", "doc_id", "esize")
        .agg(F.count("*").alias("inter"))
        .filter(
            F.col("inter") / F.col("esize") >= CONTAIN_THRESHOLD
        )
        .select("doc_id")
        .distinct()
        .withColumn("_contam", F.lit(True))
    )
    labeled = (
        st.join(canon, "ckey", "left")
        .join(contam, "doc_id", "left")
        .withColumn(
            "status",
            F.when(F.col("drop_rep"), F.lit("drop_repetitive"))
            .when(
                F.col("doc_id") != F.col("canonical_id"),
                F.lit("drop_duplicate"),
            )
            .when(F.col("_contam").isNotNull(), F.lit("drop_contaminated"))
            .otherwise(F.lit("kept")),
        )
    )
    kept = F.col("status") == "kept"
    return labeled.groupBy("source").agg(
        F.count("*").alias("n_in"),
        F.sum(
            F.when(F.col("status") == "drop_repetitive", 1).otherwise(0)
        ).alias("n_drop_repetitive"),
        F.sum(
            F.when(F.col("status") == "drop_duplicate", 1).otherwise(0)
        ).alias("n_drop_duplicate"),
        F.sum(
            F.when(F.col("status") == "drop_contaminated", 1).otherwise(0)
        ).alias("n_drop_contaminated"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(F.lit(0))).alias(
            "kept_tokens"
        ),
    )


MIX_PPM = 1_000_000


@query(
    "sample_domain_mixture_weights",
    oracle=f"""
    WITH totals AS (
      SELECT source,
             CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END)
                  AS BIGINT) AS total_tokens
      FROM documents GROUP BY source
    )
    SELECT source, total_tokens,
           CAST((SELECT MIN(total_tokens) FROM totals) * {MIX_PPM}
                // total_tokens AS BIGINT) AS weight_ppm,
           CAST(total_tokens *
                ((SELECT MIN(total_tokens) FROM totals) * {MIX_PPM}
                 // total_tokens) // {MIX_PPM} AS BIGINT)
               AS target_tokens
    FROM totals
    """,
)
def sample_domain_mixture_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Static domain-mixture reweighting: per-source sampling weights
    that equalize the token contribution of every source to the
    smallest domain's total (the uniform-mixture special case of
    static domain reweighting à la DoReMi; weights feed the
    deterministic samplers).

    Weights are INTEGER parts-per-million via floor division —
    float ratios round differently across engines' libm, ppm floor
    division is exact everywhere. Shape: ONE corpus scan + the
    per-source aggregate; the scalar min comes from a global window
    over the aggregate OUTPUT (cardinality = #domains, bounded small
    by definition — a separate agg branch would rescan the corpus).
    """
    docs = read_table(spark, sf_dir, "documents")
    totals = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("total_tokens")
    )
    return (
        totals.withColumn(
            "_tmin", F.min("total_tokens").over(Window.partitionBy())
        )
        .withColumn(
            "weight_ppm",
            F.expr(f"_tmin * {MIX_PPM} div total_tokens"),
        )
        .withColumn(
            "target_tokens",
            F.expr(f"total_tokens * weight_ppm div {MIX_PPM}"),
        )
        .select("source", "total_tokens", "weight_ppm", "target_tokens")
    )


DECONTAM_EVAL_PCT = 20
DECONTAM_COS_THRESHOLD = 0.42


@query(
    "decontam_embedding_crosssplit",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM embeddings
    ),
    ev AS (SELECT vec_id, emb FROM e WHERE bucket < {DECONTAM_EVAL_PCT}),
    tr AS (SELECT vec_id, emb FROM e WHERE bucket >= {DECONTAM_EVAL_PCT})
    SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
           ROUND(list_cosine_similarity(ev.emb, tr.emb), 4) AS cos
    FROM ev JOIN tr
      /* zero-norm guard mirroring the Spark side's F.when(nrm > 0):
         DuckDB's list_cosine_similarity yields NaN for a zero vector
         and NaN compares GREATER than everything, so without the
         guard a zero vector would pass the threshold here while the
         Spark side NULLs it out (registry collapses oracles to one
         line, hence the block comment) */
      ON list_dot_product(ev.emb, ev.emb) > 0
     AND list_dot_product(tr.emb, tr.emb) > 0
     AND list_cosine_similarity(ev.emb, tr.emb)
         >= {DECONTAM_COS_THRESHOLD}
    """,
)
def decontam_embedding_crosssplit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEMANTIC decontamination: training vectors whose cosine to any
    held-out (eval) vector crosses the near-dup threshold — the
    embedding-space complement of the n-gram containment check above
    (paraphrased contamination has low shingle overlap but high
    embedding similarity; both checks run in real curation pipelines).

    The split is the same seed-free md5 bucket the sampling operators
    use (deterministic, engine-portable): bucket < 20 -> eval.

    Scale shape: eval benchmarks are small by construction, so the
    eval side BROADCASTS and the training corpus streams through one
    scan with the cosine evaluated in codegen — no shuffle of the
    train side at all (same plan family as sim_topk_bruteforce). For
    an eval set too large to broadcast, swap in the banded LSH
    (similarity.lsh_pairs) — same contract, candidates instead of the
    full bipartite product.
    """
    emb = (
        read_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("emb"),
            (
                F.conv(
                    F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 100
            ).alias("bucket"),
        )
    )
    # norms hoisted per vector (bit-identical arithmetic — same
    # expression evaluated once instead of per pair; see the LSH
    # re-rank note in similarity.py): the bipartite scan evaluates
    # |eval| x |train| cosines, so per-pair norm re-folds dominate
    from cdc_2025_spark.functions.embeddings import dot, norm

    embn = emb.withColumn("nrm", norm("emb"))
    ev = embn.filter(F.col("bucket") < DECONTAM_EVAL_PCT).select(
        F.col("vec_id").alias("eval_id"),
        F.col("emb").alias("eemb"),
        F.col("nrm").alias("enrm"),
    )
    tr = embn.filter(F.col("bucket") >= DECONTAM_EVAL_PCT).select(
        F.col("vec_id").alias("train_id"),
        F.col("emb").alias("temb"),
        F.col("nrm").alias("tnrm"),
    )
    cos = F.when(
        (F.col("enrm") > 0) & (F.col("tnrm") > 0),
        dot("eemb", "temb") / (F.col("enrm") * F.col("tnrm")),
    )
    return (
        F.broadcast(ev)
        .crossJoin(tr)
        .withColumn("cos", cos)
        .filter(F.col("cos") >= DECONTAM_COS_THRESHOLD)
        .select("eval_id", "train_id", F.round("cos", 4).alias("cos"))
    )


RESERVOIR_K = 8


@query(
    "sample_topk_weighted_per_source",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END
                 AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {WEIGHT_SCALE} AS bucket
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_tokens,
             row_number() OVER (
               PARTITION BY source
               ORDER BY bucket * 1.0
                          / LEAST(n_tokens, {WEIGHT_CAP}),
                        doc_id) AS rk
      FROM w WHERE n_tokens > 0
    )
    SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {RESERVOIR_K}
    """,
)
def sample_topk_weighted_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIXED-SIZE weighted sample per source — exactly {RESERVOIR_K}
    documents per domain, selection biased toward long documents: the
    per-domain QUOTA sampler a token-budgeted mixture needs, where
    Bernoulli sampling (sample_weighted_by_tokens above) can only hit
    a budget in expectation.

    Each document draws the deterministic md5 bucket u ~ U[0, scale)
    and is ranked by priority u / min(n_tokens, cap) — the
    integer-inputs analogue of weighted priority sampling
    (Efraimidis-Spirakis keys use u^(1/w); that float pow ranks
    near-ties differently across engines' libm, while dividing the
    SAME two integers is one IEEE-754 rounding that DuckDB and the
    JVM perform identically, so the order — with the doc_id
    tiebreak — is engine-exact and the driver can hash-match it.
    The weight bias differs from exact E-S (heavier docs win more
    strongly under u/w); that trade is deliberate and documented).
    Zero-token documents carry zero weight and are excluded before
    ranking (also keeps the ANSI division total).

    Shape: one scan, one per-source window — partitioned by the
    group key, so no global sort; skew is bounded by the largest
    domain, the same key the mixture reweighting already audits."""
    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % WEIGHT_SCALE
    )
    nt = token_count("text")
    base = docs.select(
        "doc_id",
        "source",
        nt.alias("n_tokens"),
        bucket.alias("bucket"),
    ).filter(F.col("n_tokens") > 0)
    prio = F.col("bucket") * F.lit(1.0) / F.least(
        F.col("n_tokens"), F.lit(WEIGHT_CAP)
    )
    w = Window.partitionBy("source").orderBy(prio, "doc_id")
    return (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select(
            "source",
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def _full_ledger_oracle() -> str:
    """The five-stage prep chain as one DuckDB plan: repetition
    filter -> exact vocab dedup -> md5_km MinHash+LSH near-dup
    dedup (the shared `_minhash_pairs_ctes` chain + recursive
    connected components) -> cross-doc span removal with document
    rebuild (docs emptied by removal are dropped) -> benchmark
    decontamination over the CLEANED text. Mirrors the registered
    Spark composition stage for stage; all outputs are integer
    counts, so the driver hash is exact."""
    from cdc_2025_spark.queries.dedup import (
        JACCARD_K,
        JACCARD_THRESHOLD,
        SPAN_K,
        SPAN_MIN_DOCS,
        _minhash_pairs_ctes,
    )

    return f"""
    WITH RECURSIVE tr AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= {EVAL_MAX_ID}
    ),
    base0 AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM tr
    ),
    uni AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM base0, unnest(ws) AS u(tok) GROUP BY 1, 2
    ),
    ustat AS (
      SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_c
      FROM uni GROUP BY 1
    ),
    surv1 AS (
      SELECT doc_id FROM ustat
      WHERE NOT ({PREP_REP_FACTOR} * top_c > n_tokens)
    ),
    vocab_keys AS (
      SELECT b.doc_id,
             md5(array_to_string(list_sort(list_distinct(b.ws)), ' '))
               AS key
      FROM base0 b JOIN surv1 USING (doc_id)
    ),
    canon AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM vocab_keys GROUP BY key),
    survivors2 AS MATERIALIZED (
      SELECT t.doc_id, t.text FROM tr t JOIN canon USING (doc_id)
    ),
    {_minhash_pairs_ctes(JACCARD_K, JACCARD_THRESHOLD,
                         docs_rel="survivors2")},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM mh_pairs
      UNION SELECT id_b, id_a FROM mh_pairs
    ),
    reach(a, b) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.a, g.dst FROM reach r JOIN edges g ON r.b = g.src
    ),
    comp AS MATERIALIZED (SELECT a AS id, MIN(b) AS comp FROM reach GROUP BY a),
    surv3 AS MATERIALIZED (
      SELECT s.doc_id FROM survivors2 s
      ANTI JOIN (SELECT id FROM comp WHERE id <> comp) d
        ON s.doc_id = d.id
    ),
    sbase AS MATERIALIZED (SELECT b.doc_id, b.ws FROM base0 b JOIN surv3 USING (doc_id)),
    stoks AS MATERIALIZED (
      SELECT doc_id, i - 1 AS pos, ws[i] AS tok
      FROM sbase, unnest([i for i in range(1, len(ws) + 1)]) AS r(i)
    ),
    occ AS MATERIALIZED (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(ws[i:i+{SPAN_K - 1}], ' ') AS span
      FROM sbase,
           unnest([i for i in range(
               1, CASE WHEN len(ws) <= {SPAN_K} THEN 2
                       ELSE len(ws) - {SPAN_K} + 2 END)]) AS r(i)
    ),
    dupspan AS (
      SELECT span FROM occ GROUP BY span
      HAVING COUNT(DISTINCT doc_id) >= {SPAN_MIN_DOCS}
    ),
    ranked AS (
      SELECT o.doc_id, o.pos,
             row_number() OVER (
               PARTITION BY o.span ORDER BY o.doc_id, o.pos) AS rn
      FROM occ o JOIN dupspan d ON o.span = d.span
    ),
    cov AS MATERIALIZED (
      SELECT DISTINCT doc_id, pos + j AS cpos
      FROM ranked, unnest([j for j in range(0, {SPAN_K})]) AS u(j)
      WHERE rn > 1
    ),
    kept AS MATERIALIZED (
      SELECT t.doc_id, t.pos, t.tok
      FROM stoks t ANTI JOIN cov c
        ON t.doc_id = c.doc_id AND t.pos = c.cpos
    ),
    clean AS MATERIALIZED (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    ),
    surv4 AS (SELECT doc_id, clean_text FROM clean),
    cw AS (
      SELECT doc_id,
             string_split_regex(trim(lower(clean_text)), '\\s+') AS ws
      FROM surv4
    ),
    tsets AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ws) <= {CONTAIN_K}
               THEN [array_to_string(ws, ' ')]
               ELSE [array_to_string(ws[i:i+{CONTAIN_K - 1}], ' ')
                     for i in range(1, len(ws) - {CONTAIN_K} + 2)]
               END) AS sh
      FROM cw
    ),
    ew AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents WHERE doc_id < {EVAL_MAX_ID}
    ),
    esets AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ws) <= {CONTAIN_K}
               THEN [array_to_string(ws, ' ')]
               ELSE [array_to_string(ws[i:i+{CONTAIN_K - 1}], ' ')
                     for i in range(1, len(ws) - {CONTAIN_K} + 2)]
               END) AS sh
      FROM ew
    ),
    contam AS (
      SELECT DISTINCT t.doc_id FROM esets e JOIN tsets t
        ON len(list_intersect(e.sh, t.sh)) * 1.0 / len(e.sh)
           >= {CONTAIN_THRESHOLD}
    ),
    n0 AS (SELECT COUNT(*) AS n FROM tr),
    n1 AS (SELECT COUNT(*) AS n FROM surv1),
    n2 AS (SELECT COUNT(*) AS n FROM survivors2),
    n3 AS (SELECT COUNT(*) AS n FROM surv3),
    n4 AS (SELECT COUNT(*) AS n FROM surv4),
    n5 AS (SELECT (SELECT n FROM n4)
                  - (SELECT COUNT(*) FROM contam) AS n)
    SELECT * FROM (
      SELECT 'raw' AS stage, CAST(n0.n AS BIGINT) AS n_in,
             CAST(0 AS BIGINT) AS n_dropped,
             CAST(n0.n AS BIGINT) AS n_out
      FROM n0
      UNION ALL
      SELECT 'repetition', CAST(n0.n AS BIGINT),
             CAST(n0.n - n1.n AS BIGINT), CAST(n1.n AS BIGINT)
      FROM n0, n1
      UNION ALL
      SELECT 'exact_vocab', CAST(n1.n AS BIGINT),
             CAST(n1.n - n2.n AS BIGINT), CAST(n2.n AS BIGINT)
      FROM n1, n2
      UNION ALL
      SELECT 'minhash_lsh', CAST(n2.n AS BIGINT),
             CAST(n2.n - n3.n AS BIGINT), CAST(n3.n AS BIGINT)
      FROM n2, n3
      UNION ALL
      SELECT 'span_removal', CAST(n3.n AS BIGINT),
             CAST(n3.n - n4.n AS BIGINT), CAST(n4.n AS BIGINT)
      FROM n3, n4
      UNION ALL
      SELECT 'decontam', CAST(n4.n AS BIGINT),
             CAST(n4.n - n5.n AS BIGINT), CAST(n5.n AS BIGINT)
      FROM n4, n5
    )
    """


@query("llm_prep_full_ledger", oracle=_full_ledger_oracle())
def llm_prep_full_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL training-data prep chain as ONE declarative plan with
    a single per-stage (n_in, n_dropped, n_out) ledger — the
    composition r7's two partial ledgers (llm_corpus_prep,
    dedup_pipeline_accounting) split between them:

      repetition filter -> exact vocab dedup -> MinHash+LSH near-dup
      dedup -> cross-doc span removal (+ document rebuild; docs
      emptied by removal are dropped) -> benchmark decontamination
      over the CLEANED text.

    Stage order is the scale argument: each stage is strictly
    cheaper run AFTER the previous one shrank the corpus — the
    near-quadratic LSH stage sees only exact-dedup survivors, the
    span shuffle sees only near-dup survivors, and decontamination
    (eval side broadcast) runs over rebuilt text so boilerplate
    spans cannot mask eval overlap. Every stage keeps its measured
    component shape (hash-keyed aggregates, banded LSH candidates,
    8-byte span-hash shuffles, broadcast eval shingles); the ledger
    itself is six 1-row aggregates cross-joined into a stack —
    nothing corpus-sized reaches the driver.

    Decontamination deliberately runs LAST and over clean_text:
    span removal changes token positions, so contamination measured
    on raw text would attribute drops to text that no longer
    exists downstream."""
    from cdc_2025_spark.dedup.cluster import connected_components
    from cdc_2025_spark.queries.dedup import (
        repeated_span_kept_tokens,
    )

    # spread_key (r15 optimization): tokenization is narrow per-row
    # compute straight off the scan — without the layout-guarded
    # repartition it runs inside the single-row-group scan task on
    # one core (no-op at real scale; io.read_table)
    #
    # r16: the train corpus is tokenized EXACTLY ONCE, position-
    # carrying, and pinned — this is the only full-text pass in the
    # whole ledger. It feeds stage 1 (repetition stats + vocab key:
    # position-insensitive aggregates), and stage 4's span-removal
    # kernel consumes the same pinned stream semi-joined to the
    # stage-3 survivor ids (tokens(lower(text)) in the kernel IS
    # split(trim(lower(text)), "\\s+") — functions/text.tokens), so
    # the r15 shape's second tokenize of the survivors disappears.
    # The spread exchange executes once, inside this checkpoint
    # build.
    docs = read_table(spark, sf_dir, "documents", spread_key="doc_id")
    toks = (
        docs.filter(F.col("doc_id") >= EVAL_MAX_ID)
        .select(
            "doc_id",
            F.posexplode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("pos", "tok"),
        )
        .localCheckpoint(eager=False)
    )
    # stages 1+2 fused (r10, tightened r16): the (doc_id, tok)
    # groups ARE the distinct token set vocab_key sorts —
    # md5(array_join(array_sort(collect_list(tok)), " ")) over them
    # is literally vocab_key's
    # md5(array_join(array_sort(array_distinct(split(...))), " "))
    # with the distinct done by the aggregation, so the r15 shape's
    # second tokenize+md5 pass over the train text (plus its
    # surv1 semi-join) collapses into the stats aggregate. The
    # ledger counts ride id-only frames (surv1 / canon are subsets
    # of train's doc_ids, so their counts equal the old joined-frame
    # counts) instead of re-reading checkpointed full-text frames.
    uni = toks.groupBy("doc_id", "tok").count()
    # NULL-text docs never reach uni (split(NULL) explodes to no
    # rows) — same exclusion the old vocab_key pass produced via its
    # NULL key and the surv1 semi-join.
    stats = uni.groupBy("doc_id").agg(
        F.sum("count").alias("n_tokens"),
        F.max("count").alias("top_c"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("tok")), " ")
        ).alias("key"),
    ).localCheckpoint(eager=False)
    surv1 = stats.filter(
        ~(PREP_REP_FACTOR * F.col("top_c") > F.col("n_tokens"))
    ).select("doc_id")
    # stage 2: exact vocab dedup (min-id canonical) among stage-1
    # survivors — keys ride the pinned stats frame, never full text
    canon = (
        stats.filter(
            ~(PREP_REP_FACTOR * F.col("top_c") > F.col("n_tokens"))
        )
        .groupBy("key")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    # lazy localCheckpoints: every stage frame that feeds BOTH a
    # count branch and the next stage is pinned — without them each
    # of the six ledger counts re-executes the whole upstream chain
    # (the semdedup/bigram posture; blocks release when the plan is
    # GC'd). Stage frames are ID-ONLY from here down (r16): the old
    # d2/d3 carried full text through two checkpoint barriers just
    # so stage 4 could re-tokenize it — the span kernel now rides
    # the pinned token stream directly, so no full-text frame exists
    # past the scan.
    # stage 3: MinHash+LSH near-dup dedup (md5_km family so the
    # oracle reproduces the identical candidate set). Pairs come from
    # the session-shared FULL-corpus index restricted to the stage-2
    # survivors — exact, because every pipeline stage is subset-stable
    # (per-doc signatures, no corpus-dependent band pruning, per-pair
    # verification): pairs(d2) == pairs(full) ∩ d2×d2. The oracle
    # recomputes over the subset and hash-matches.
    from cdc_2025_spark.queries.dedup import _shared_minhash_pairs

    ids_a = canon.select(F.col("doc_id").alias("id_a"))
    ids_b = canon.select(F.col("doc_id").alias("id_b"))
    pairs = (
        _shared_minhash_pairs(spark, sf_dir)
        .join(ids_a, "id_a", "left_semi")
        .join(ids_b, "id_b", "left_semi")
        .select("id_a", "id_b")
    )
    cc = connected_components(pairs)
    # the old d3 (train semi-joined to canon, anti-joined to the CC
    # dups) carried exactly canon's ids minus the dups — train's
    # doc_ids are unique and canon ⊆ train — so the id-only frame
    # below has the same rows the old full-text d3 counted
    d3 = canon.join(
        cc.filter(F.col("id") != F.col("comp")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
        "left_anti",
    ).localCheckpoint(eager=False)
    # stage 4: span removal; emptied docs dropped. The kernel core
    # consumes the ONE pinned token stream restricted to the stage-3
    # survivors — its internal tokenize is skipped, and the
    # (doc_id, pos, tok) rows are identical to tokenizing the
    # survivors' text (same split expression, same rows). The
    # clean_text string is NEVER BUILT in this query (r16): its only
    # consumer was stage 5's shingle pass, which now derives the
    # same k-grams from the kept stream directly — the old shape
    # paid an interpreted collect_list+array_sort+transform rebuild
    # per doc and then an interpreted slice-per-index re-shingle of
    # the rebuilt string.
    ktoks = toks.join(d3, "doc_id", "left_semi").localCheckpoint(
        eager=False
    )
    kept = repeated_span_kept_tokens(ktoks)
    # stage 5: decontamination over the CLEANED token stream, one
    # window pass. Equivalence to shingle_sets(clean_text)
    # (functions/text.shingles): tokens(lower(clean_text)) == the
    # kept toks in pos order (clean_text is their space-join; no tok
    # is empty or contains whitespace — blank docs die at the
    # repetition filter, split-on-\s+ emits no interior empties).
    # Docs with n >= k kept tokens yield the n-k+1 sliding k-grams —
    # a row's gram is full exactly when its (k-1)-lead exists. Docs
    # with n < k yield the single whole-doc join: at the FIRST row
    # the (k-1)-lead is null iff n < k, and concat_ws SKIPS null
    # leads, so that row's s is precisely the n available tokens
    # joined. n == k gives the same string through either branch.
    # distinct() reproduces array_distinct + explode. The pin holds
    # the compact (doc_id, hashed shingle) pairs — the kept TOKEN
    # stream itself is never materialized (the r16 intermediate
    # shape checkpointed it: 1.7-2.6 s of barrier for rows only the
    # window below ever read).
    wo = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(wo) for i in range(1, CONTAIN_K)]
    sel = kept.select(
        "doc_id",
        F.concat_ws(" ", F.col("tok"), *leads).alias("s"),
        leads[-1].alias("_lk"),
        F.row_number().over(wo).alias("_rn"),
    )
    trs = (
        sel.filter(
            F.col("_lk").isNotNull()
            | ((F.col("_rn") == 1) & F.col("_lk").isNull())
        )
        .select("doc_id", F.xxhash64("s").alias("shingle"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # r16: the eval slice is EVAL_MAX_ID rows — read the UNSPREAD
    # handle so its scan keeps the pushed-down doc_id filter without
    # paying the spread exchange (a whole-table repartition for a
    # 100-row broadcast side).
    esets = shingle_sets(
        read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < EVAL_MAX_ID
        ),
        "doc_id",
        "text",
        CONTAIN_K,
    )
    ev = esets.select(
        F.col("id").alias("eval_id"),
        F.size("sh").alias("esize"),
        F.explode("sh").alias("shingle"),
    )
    contam = (
        F.broadcast(ev)
        .join(trs, "shingle")
        .groupBy("eval_id", "doc_id", "esize")
        .agg(F.count("*").alias("inter"))
        .filter(F.col("inter") / F.col("esize") >= CONTAIN_THRESHOLD)
        .select("doc_id")
        .distinct()
    )
    # n0 counts the raw train slice off the UNSPREAD handle (a count
    # needs no spread exchange; NULL-text docs count here exactly as
    # the old pinned train frame counted them)
    n0 = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= EVAL_MAX_ID)
        .agg(F.count("*").alias("n0"))
    )
    # surv1/canon doc_ids are subsets of train's, so their counts
    # equal the old full-text joined-frame counts
    n1 = surv1.agg(F.count("*").alias("n1"))
    n2 = canon.agg(F.count("*").alias("n2"))
    n3 = d3.agg(F.count("*").alias("n3"))
    # n4 = survivors with >= 1 kept token — exactly the docs the old
    # cleaned.filter(n_tokens - n_removed > 0) frame counted: every
    # such doc emits >= 1 trs row (grams if n >= k, else the rn==1
    # whole-doc row), and hash collisions cannot erase a doc's last
    # row (distinct is per (doc_id, shingle))
    n4 = trs.agg(F.countDistinct("doc_id").alias("n4"))
    nc = contam.agg(F.count("*").alias("nc"))
    return (
        n0.crossJoin(n1)
        .crossJoin(n2)
        .crossJoin(n3)
        .crossJoin(n4)
        .crossJoin(nc)
        .selectExpr(
            "stack(6, "
            "'raw', n0, CAST(0 AS BIGINT), n0, "
            "'repetition', n0, n0 - n1, n1, "
            "'exact_vocab', n1, n1 - n2, n2, "
            "'minhash_lsh', n2, n2 - n3, n3, "
            "'span_removal', n3, n3 - n4, n4, "
            "'decontam', n4, nc, n4 - nc"
            ") AS (stage, n_in, n_dropped, n_out)"
        )
    )


# DSIR (Xie et al., "Data Selection for Language Models via
# Importance Resampling", NeurIPS 2023): hashed-n-gram bag-of-words
# importance weights between a target split and the raw pool, then
# Gumbel-top-k resampling without replacement.
DSIR_TARGET_MAX_ID = 100   # target-domain sample: same split rule as
#                            the decontam eval set (doc_id < 100)
DSIR_BUCKETS = 256         # hashed feature space (paper uses 10k;
#                            collisions are part of the method)
DSIR_K = 150               # resample size


@query(
    "sample_dsir_importance",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                 % {DSIR_BUCKETS} AS bucket
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)),
                                             '\\s+')) AS tok
            FROM documents)
    ),
    cnt AS (
      SELECT bucket,
             SUM(CASE WHEN doc_id < {DSIR_TARGET_MAX_ID}
                 THEN 1 ELSE 0 END) AS c_t,
             SUM(CASE WHEN doc_id >= {DSIR_TARGET_MAX_ID}
                 THEN 1 ELSE 0 END) AS c_r
      FROM feat GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,
             CAST(SUM(c_r) AS BIGINT) AS n_r
      FROM cnt
    ),
    lr AS (
      SELECT bucket,
             ln(((c_t + 1) * (n_r + {DSIR_BUCKETS})) * 1.0
                / ((c_r + 1) * (n_t + {DSIR_BUCKETS}))) AS lr
      FROM cnt CROSS JOIN tot
    ),
    docw AS (
      SELECT f.doc_id, SUM(lr.lr) AS w_raw
      FROM feat f JOIN lr USING (bucket) GROUP BY f.doc_id
    ),
    scored AS (
      SELECT d.doc_id,
             ROUND(COALESCE(docw.w_raw, 0.0), 4) AS log_weight,
             ROUND(COALESCE(docw.w_raw, 0.0)
                   - ln(-ln((CAST(('0x' || substr(md5('g:' ||
                         CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % {WEIGHT_SCALE} + 0.5) / {WEIGHT_SCALE})),
                   4) AS gumbel_key
      FROM documents d LEFT JOIN docw USING (doc_id)
    )
    SELECT doc_id, log_weight, gumbel_key,
           (ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id)
            <= {DSIR_K}) AS selected
    FROM scored
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023,
    arXiv:2302.03169): score every raw document by how target-like
    its hashed-unigram bag is — log importance weight
    sum_tok ln(p_target[h(tok)] / p_raw[h(tok)]) under
    add-1-smoothed hashed-feature distributions fit in-plan — then
    resample K docs WITHOUT replacement, proportional to weight, via
    Gumbel-top-k. The target split reuses the decontam rule
    (doc_id < 100 is the "domain sample"); the Gumbel uniform is the
    engine-portable md5 bucket (salted 'g:' so it is independent of
    every other sampler's draw), so selection is reproducible across
    engines and reruns.

    Shape, built to scale: the feature frame is one codegen'd
    explode; the distribution fit is ONE grouped aggregate with
    map-side partials whose output is bounded by the feature-space
    size (256 buckets — never vocabulary-sized); the per-bucket
    log-ratio table BROADCASTS back onto the token stream (the idf /
    cnt_w1 move — Zipf-hot buckets never shuffle), leaving one
    doc-keyed aggregate. Selection is a top-K
    (TakeOrderedAndProject, never a global window) on the ROUNDED
    Gumbel key with doc_id tiebreak, re-joined as a broadcast flag.
    All-integer products inside a single ln keep the per-bucket
    ratio engine-exact; per-doc sums round to 4dp after aggregation
    (the registry determinism rule).
    """
    # spread_key: the explode+md5 featurization is the per-row cost —
    # layout-guarded repartition parallelizes it (io.read_table)
    docs = read_table(spark, sf_dir, "documents", spread_key="doc_id")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    )
    feat = tok.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast(
                "long"
            )
            % DSIR_BUCKETS
        ).alias("bucket"),
        # feat feeds two subtrees (the distribution fit and the
        # scoring join) — lazy localCheckpoint so the explode runs
        # once per action, as in perplexity_frame.
    ).localCheckpoint(eager=False)
    is_t = F.col("doc_id") < DSIR_TARGET_MAX_ID
    cnt = feat.groupBy("bucket").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(~is_t, 1).otherwise(0)).alias("c_r"),
    )
    tot = cnt.agg(
        F.sum("c_t").cast("long").alias("n_t"),
        F.sum("c_r").cast("long").alias("n_r"),
    )
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log(
            ((F.col("c_t") + 1) * (F.col("n_r") + DSIR_BUCKETS)).cast(
                "double"
            )
            / ((F.col("c_r") + 1) * (F.col("n_t") + DSIR_BUCKETS))
        ).alias("lr"),
    )
    docw = (
        feat.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("lr").alias("w_raw"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("g:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % WEIGHT_SCALE
        + F.lit(0.5)
    ) / F.lit(float(WEIGHT_SCALE))
    w_raw = F.coalesce(F.col("w_raw"), F.lit(0.0))
    # r16: the scoring join's left side only needs doc_id — read the
    # UNSPREAD handle so the plan carries exactly ONE
    # REPARTITION_BY_NUM(doc_id) (inside the feat checkpoint build,
    # where the per-row explode+md5 compute lives). The r15 shape
    # re-spread this projection too: a second shuffle of a 1-column
    # scan that the join immediately re-distributes anyway.
    scored = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(docw, "doc_id", "left")
        .select(
            "doc_id",
            F.round(w_raw, 4).alias("log_weight"),
            F.round(w_raw - F.log(-F.log(u)), 4).alias("gumbel_key"),
        )
        .localCheckpoint(eager=False)
    )
    sel = (
        scored.orderBy(F.col("gumbel_key").desc(), "doc_id")
        .limit(DSIR_K)
        .select("doc_id", F.lit(True).alias("sel"))
    )
    return scored.join(F.broadcast(sel), "doc_id", "left").select(
        "doc_id",
        "log_weight",
        "gumbel_key",
        F.coalesce(F.col("sel"), F.lit(False)).alias("selected"),
    )


RESERVOIR_SAMPLE_K = 200


@query(
    "sample_reservoir_bottomk",
    oracle=f"""
    WITH pr AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('rs:' || CAST(doc_id AS VARCHAR)),
                                  1, 8)) AS BIGINT)
                 % 1000000 AS prio
      FROM documents
    ),
    rk AS (
      SELECT doc_id, prio,
             ROW_NUMBER() OVER (ORDER BY prio, doc_id) AS rk
      FROM pr
    )
    SELECT doc_id, prio, CAST(rk AS BIGINT) AS rk
    FROM rk WHERE rk <= {RESERVOIR_SAMPLE_K}
    """,
)
def sample_reservoir_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed RESERVOIR sample: a fixed-size uniform K-sample of
    the corpus as the K smallest salted-md5 priorities (bottom-k /
    KMV sampling, Cohen & Kaplan PODC'07) — the "hold a reproducible
    10k-doc sample of the whole corpus" primitive monitoring and
    eval-set construction need.

    Unlike Bernoulli sampling (sample_hash_deterministic: fixed
    RATE, size only in expectation) this holds an exact SIZE; unlike
    the per-source quota sampler it is global and unweighted. The
    sample is MERGEABLE (bottomk(A∪B) = bottomk(bottomk(A) ∪
    bottomk(B))) — per-shard and per-microbatch maintenance is
    pinned in tests (the fourth mergeable-summary streaming leg:
    Bloom = bit_or, CMS = sum, HLL = union, reservoir = union+take).

    Shape: one scan; the take plans as TakeOrderedAndProject
    (per-partition partial top-K, K rows at the driver merge —
    never a global sort); the rank window runs on K rows only.
    """
    from cdc_2025_spark.functions.reservoir import bottomk_sample

    docs = read_table(spark, sf_dir, "documents")
    return bottomk_sample(docs, RESERVOIR_SAMPLE_K, "doc_id")


LANG_ALPHA = 0.3
LANG_TARGET_DOCS = 250
LANG_RATE_SCALE = 10_000


@query(
    "sample_language_temperature",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, COALESCE(lang, 'und') AS lang FROM documents
    ),
    c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM d GROUP BY lang
    ),
    s AS (SELECT SUM(pow(n_docs, {LANG_ALPHA})) AS ss FROM c),
    r AS (
      SELECT lang, n_docs,
             CAST(ROUND(LEAST(1.0,
                    {LANG_TARGET_DOCS} * pow(n_docs, {LANG_ALPHA}) / ss
                    / n_docs) * {LANG_RATE_SCALE}) AS BIGINT)
                 AS accept_per_10k
      FROM c, s
    )
    SELECT r.lang, r.n_docs, r.accept_per_10k,
           CAST(COUNT(*) FILTER (WHERE
                CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % {LANG_RATE_SCALE} < r.accept_per_10k)
                AS BIGINT) AS n_sampled
    FROM d JOIN r USING (lang)
    GROUP BY 1, 2, 3
    """,
)
def sample_language_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-rebalanced LANGUAGE sampling (mT5, Xue et al.
    NAACL'21 §3.1; XLM-R, Conneau et al. ACL'20): sample language l
    with probability q_l ∝ p_l^α (α = 0.3), flattening the head so
    low-resource languages are not drowned by the en-heavy crawl.
    Since p_l = n_l/N, the N^α cancels in the normalization:
    q_l = n_l^α / Σ_m n_m^α — computed directly on counts.

    Per-language acceptance rate r_l = min(1, T·q_l / n_l) for a
    T-doc budget, QUANTIZED to integer 1/10000ths before the compare
    (the repo's engine-parity convention: the Bernoulli draw is a
    seed-free md5 bucket vs an integer threshold, so both engines
    accept bit-identical doc sets; float-threshold formulations
    rank near-ties differently across libm).

    Shape: counts aggregate (|languages| rows) × a 1-row normalizer
    cross join → a BROADCAST rates table joined back onto the scan —
    no corpus shuffle; the two corpus passes (count, sample) are both
    narrow scans. At 100 TB the counts pass rides whatever earlier
    full scan the pipeline already does (or a metastore stat).
    Output keeps every language row even at 0 accepts (conditional
    aggregate, not filter-then-group).
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("lang", F.lit("und")).alias("lang")
    )
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    norm = counts.agg(
        F.sum(F.pow("n_docs", F.lit(LANG_ALPHA))).alias("ss")
    )
    rates = counts.crossJoin(F.broadcast(norm)).select(
        "lang",
        "n_docs",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(LANG_TARGET_DOCS)
                * F.pow("n_docs", F.lit(LANG_ALPHA))
                / F.col("ss")
                / F.col("n_docs"),
            )
            * LANG_RATE_SCALE
        )
        .cast("long")
        .alias("accept_per_10k"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % LANG_RATE_SCALE
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", "accept_per_10k")
        .agg(
            F.sum(
                F.when(bucket < F.col("accept_per_10k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_sampled")
        )
    )
