"""Phase profiler for llm_prep_full_ledger: replays the query body
with an explicit force after each materialization barrier so the
per-barrier cost is visible (the real query materializes the same
frames, just without the intermediate counts).
Usage: python tools/profile_ledger.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_2025_spark.io import read_table  # noqa: E402
from cdc_2025_spark.queries import QUERIES  # noqa: E402
from cdc_2025_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-ledger")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    for t in ("orders", "documents"):
        read_table(spark, sf_dir, t).count()

    from cdc_2025_spark.dedup.cluster import connected_components
    from cdc_2025_spark.dedup.exact import vocab_key
    from cdc_2025_spark.queries.dedup import (
        _shared_minhash_pairs,
        remove_repeated_spans_frame,
    )
    from cdc_2025_spark.queries.llmdata import (
        CONTAIN_K,
        CONTAIN_THRESHOLD,
        EVAL_MAX_ID,
        PREP_REP_FACTOR,
        shingle_sets,
    )

    t0 = time.perf_counter()
    _shared_minhash_pairs(spark, sf_dir).count()
    print(f"minhash index warm: {time.perf_counter()-t0:.2f}s", flush=True)

    def mark(label, t_prev):
        t = time.perf_counter()
        print(f"  {label:28s} {t - t_prev:6.2f}s", flush=True)
        return t

    for trial in range(2):
        print(f"trial {trial}:", flush=True)
        t = time.perf_counter()
        docs = read_table(spark, sf_dir, "documents", spread_key="doc_id")
        train = (
            docs.filter(F.col("doc_id") >= EVAL_MAX_ID)
            .select("doc_id", "text")
            .localCheckpoint(eager=False)
        )
        train.count()
        t = mark("train checkpoint", t)
        uni = (
            train.select(
                "doc_id",
                F.explode(
                    F.split(F.trim(F.lower("text")), r"\s+")
                ).alias("tok"),
            )
            .groupBy("doc_id", "tok")
            .count()
        )
        stats = uni.groupBy("doc_id").agg(
            F.sum("count").alias("n_tokens"),
            F.max("count").alias("top_c"),
        )
        surv1 = stats.filter(
            ~(PREP_REP_FACTOR * F.col("top_c") > F.col("n_tokens"))
        ).select("doc_id").localCheckpoint(eager=False)
        surv1.count()
        t = mark("surv1 (rep filter)", t)
        canon = (
            train.select("doc_id", vocab_key("text").alias("key"))
            .join(surv1, "doc_id", "left_semi")
            .groupBy("key")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
            .localCheckpoint(eager=False)
        )
        canon.count()
        t = mark("canon (vocab dedup)", t)
        d2 = train.join(canon, "doc_id", "left_semi").localCheckpoint(
            eager=False
        )
        d2.count()
        t = mark("d2 checkpoint", t)
        ids_a = canon.select(F.col("doc_id").alias("id_a"))
        ids_b = canon.select(F.col("doc_id").alias("id_b"))
        pairs = (
            _shared_minhash_pairs(spark, sf_dir)
            .join(ids_a, "id_a", "left_semi")
            .join(ids_b, "id_b", "left_semi")
            .select("id_a", "id_b")
        )
        cc = connected_components(pairs)
        t = mark("connected_components", t)
        d3 = d2.join(
            cc.filter(F.col("id") != F.col("comp")).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        ).localCheckpoint(eager=False)
        d3.count()
        t = mark("d3 checkpoint", t)
        cleaned = remove_repeated_spans_frame(d3)
        d4 = cleaned.filter(
            F.col("n_tokens") - F.col("n_removed") > 0
        ).select("doc_id", "clean_text").localCheckpoint(eager=False)
        d4.count()
        t = mark("d4 (span removal)", t)
        tsets = shingle_sets(d4, "doc_id", "clean_text", CONTAIN_K)
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
        trs = tsets.select(
            F.col("id").alias("doc_id"), F.explode("sh").alias("shingle")
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
        contam.count()
        t = mark("decontam", t)
        n0 = train.agg(F.count("*").alias("n0"))
        n1 = surv1.agg(F.count("*").alias("n1"))
        n2 = canon.agg(F.count("*").alias("n2"))
        n3 = d3.agg(F.count("*").alias("n3"))
        n4 = d4.agg(F.count("*").alias("n4"))
        nc = contam.agg(F.count("*").alias("nc"))
        out = (
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
        out.count()
        t = mark("final stack act", t)
    spark.stop()


if __name__ == "__main__":
    main()
