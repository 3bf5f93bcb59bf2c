"""Scale smoke for the dedup/similarity family: synthesize a 10x
corpus (sf0.1 -> "sf1") with the SAME duplicate structure, run the
headline dedup/similarity/corpus-prep plans at both scales, and
record wall time, candidate/pair counts, and per-stage shuffle + spill
from the Spark status REST API.

Corpus construction (deterministic, no RNG at runtime):

- documents x10: replica r of doc d keeps doc structure but suffixes
  every token with "~r" for r > 0. Within-replica near-dup structure
  is EXACTLY the original corpus's (token identity is all the
  shingle/jaccard/minhash pipeline sees), while cross-replica shingles
  never collide — so the true pair count scales linearly with
  replicas, and a quadratic blowup in candidates is a pipeline
  regression, not a data artifact.
- embeddings x10: replica r applies the r-th power of a fixed
  64-cycle dimension permutation PLUS per-(replica, dim) deterministic
  sign flips. Both transforms preserve norms and all within-replica
  pairwise cosines bit-for-bit (sum is commutative; signs square
  away), so the replica's internal near-dup structure is the
  original's. The sign flips are the load-bearing part for
  cross-replica independence: permutation alone preserves any common
  direction in the corpus (measured: pairs above threshold grew ~100x
  instead of 10x without flips), while random signs drive expected
  cross-replica cosine to ~0.

Usage: python tools/scale_smoke.py [--replicas 10]
Writes the corpus under .scale/ (gitignored) and prints a markdown
report (tee into SCALE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_2025_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
SCALE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scale", "sf1")

QUERIES_UNDER_TEST = [
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_repeated_spans",
    "dedup_remove_repeated_spans",
    "dedup_semdedup_decision",
    "dedup_incremental_bloom_prefilter",
    "text_chunk_documents",
    "text_trigram_stupid_backoff",
    "text_bigram_perplexity",
    "sketch_cms_heavy_terms",
    "dedup_pipeline_accounting",
    "llm_corpus_prep",
    "text_tfidf_top_terms",
    "sim_lsh_bucketed_pairs",
    "sim_ivf_topk",
    # round-8 registrations
    "llm_prep_full_ledger",
    "text_url_canonical_dedup",
    "text_quality_percentile_filter",
    "sim_pq_topk",
    "text_perplexity_buckets",
    "sim_ivfpq_topk",
    "dedup_minhash_bbit_estimates",
    "sample_kcenter_coreset",
    "sim_hard_negatives",
    "sample_dsir_importance",
    "embed_pca_project",
    "text_bpe_vocab_merges",
    "sample_reservoir_bottomk",
    "text_quality_classifier_scores",
    "text_bpe_token_counts",
    "corpus_datacard",
    "dedup_source_overlap_matrix",
    "sample_language_temperature",
    "text_ngram_novelty",
    "dedup_cluster_canonical_docs",
    "sim_knn_label_spread",
    "stats_source_length_drift",
    "dedup_containment_pairs",
    "text_bm25_search",
    "sample_leakage_free_split",
    "text_winnowing_fingerprints",
    "text_quality_yield_curve",
    "dedup_snapshot_diff",
    "text_pmi_collocations",
    "text_clean_normalize",
    "text_vocab_coverage",
    "graph_triangle_stats",
    "text_blocklist_filter",
    # round-10 registrations over the replica corpus
    "sample_weighted_reservoir_docs",
    "eval_quality_auc",
    "eval_quality_threshold_sweep",
    "sim_graph_ann_topk",
    # round-11 registrations over the replica corpus (the five
    # documents/embeddings drift diagnostics; star-schema ones —
    # KS/Benford on orders, CUSUM/ACF/Mann-Kendall on events, PSI on
    # events, HHI on lineitem — are outside the replica, shapes noted
    # in SCALE.md round-10 staging section), plus the video near-dup
    # (generated corpus, sf-independent: tracks the decode+pairing
    # wall under suite memory pressure)
    "text_zipf_fit",
    "text_heaps_vocab_growth",
    "eval_calibration_bins",
    "embed_sq8_quantization_error",
    "text_js_divergence_sources",
    "multimodal_video_neardup",
]
# merge_into_customer_balances reads the star schema (customer/orders)
# — not part of the replica corpus; its scale note lives in BASELINE.md
# (one key-shuffled full-outer join, AQE-sized).
# mine_frequent_event_sets reads events — also outside the replica
# corpus; scale shape noted in BASELINE.md (one distinct shuffle +
# basket-keyed self-joins, all prune tables broadcast).
# er_customer_golden_records reads customer — outside the replica
# corpus; measured on a dedicated 10x key-offset customer replica
# instead (SCALE.md round-10 ER section: 1.78x at 10x).
# privacy_kanon_events / stream_late_data_audit read events — outside
# the replica corpus; scale shape noted in BASELINE.md (one grouped
# count feeding both audit folds; one ordered window + one grouped
# aggregate).


def build_corpus(spark, replicas: int) -> None:
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    n_docs = docs.count()
    rep = spark.range(replicas).select(F.col("id").alias("_r"))
    # token-suffix perturbation: replica 0 is the original corpus
    scaled_docs = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_r") * F.lit(n_docs)).alias("doc_id"),
            F.when(F.col("_r") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.trim("text"), r"\s+"),
                        lambda t: F.concat(t, F.lit("~"), F.col("_r")),
                    ),
                    " ",
                )
            )
            .alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    scaled_docs.repartition(8).write.mode("overwrite").parquet(
        f"{SCALE_DIR}/documents.parquet"
    )

    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    n_emb = emb.count()
    dim = len(emb.select("embedding").first()[0])
    # fixed full-cycle permutation p(i) = (i*29 + 1) mod dim (29 coprime
    # with 64); replica r uses p^r — element j of the output is input
    # element perm_r[j]
    def perm_pow(r: int) -> list[int]:
        p = list(range(dim))
        for _ in range(r):
            p = [(i * 29 + 1) % dim for i in p]
        return p

    def sign(r: int, j: int) -> float:
        if r == 0:
            return 1.0  # replica 0 is the original corpus
        z = (r * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        z = ((z ^ (z >> 31)) * 0x94D049BB133111EB) & (2**64 - 1)
        return 1.0 if (z >> 40) & 1 else -1.0

    reps = []
    for r in range(replicas):
        pr = perm_pow(r)
        reps.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * n_emb)).alias("vec_id"),
                F.array(
                    *[
                        F.col("embedding").getItem(pr[j])
                        * F.lit(sign(r, j)).cast("float")
                        for j in range(dim)
                    ]
                ).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    out = reps[0]
    for df in reps[1:]:
        out = out.unionByName(df)
    out.repartition(8).write.mode("overwrite").parquet(
        f"{SCALE_DIR}/embeddings.parquet"
    )


def stage_metrics(spark) -> dict:
    """Per-run shuffle/spill totals + max single-stage shuffle write,
    from the status REST API (UI must be enabled)."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return {
        "n_stages": len(stages),
        "shuffle_write_mb": round(
            sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 2
        ),
        "max_stage_shuffle_write_mb": round(
            max((s["shuffleWriteBytes"] for s in stages), default=0) / 1e6, 2
        ),
        "disk_spill_mb": round(
            sum(s["diskBytesSpilled"] for s in stages) / 1e6, 2
        ),
        "mem_spill_mb": round(
            sum(s["memoryBytesSpilled"] for s in stages) / 1e6, 2
        ),
    }


def run_suite(spark, sf_dir: str, names: list[str] | None = None) -> dict:
    from cdc_2025_spark.queries import QUERIES
    from cdc_2025_spark.queries.similarity import lsh_pairs_auto

    out = {}
    for name in names or QUERIES_UNDER_TEST:
        t0 = time.perf_counter()
        if name == "sim_lsh_bucketed_pairs":
            # deployment-sized knobs, now DERIVED by lsh_auto_geometry
            # (similarity.py — bits from log2(n/target_bucket), bands
            # from the S-curve recall target): threshold 0.6 = 4.8
            # sigma of the 64-dim null cosine (the registered 0.4 cut
            # admits a quadratic noise tail on any enlarged corpus —
            # measured pairs x102). recall_at mirrors the operating
            # points the smoke measured good: 0.6 at the 2k base
            # corpus derives 16/4, 0.22 (the measured 4/18 S-curve
            # point, cost-capped) at the 20k replica corpus derives
            # 32/4 — both pinned in tests/test_similarity.py.
            scaled = sf_dir != BASE_SF
            n = lsh_pairs_auto(
                spark,
                sf_dir,
                threshold=0.6,
                recall_at=0.22 if scaled else 0.6,
            ).count()
        elif name == "dedup_semdedup_decision":
            # SemDeDup's knob scales WITH the corpus: k is sized to
            # hold the mean cell ~250-300 vectors (the paper's recipe
            # — the within-cell pair space stays ~n·cell/2, linear in
            # n at constant cell size). 2k base -> k=8; 20k replica
            # corpus -> k=64.
            from cdc_2025_spark.queries.dedup import semdedup

            scaled = sf_dir != BASE_SF
            n = semdedup(spark, sf_dir, k=64 if scaled else 8).count()
        else:
            n = QUERIES[name](spark, sf_dir).count()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}
        spark.catalog.clearCache()
    return out


def build_cdc_log(spark, n_keys: int, n_files: int) -> str:
    """Deterministic CDC change log: every key gets I -> U(+1h), every
    7th key a D(+2h), every 21st a re-I(+3h) — ~2.2 events/key, split
    into ``n_files`` parquet files BY KEY RANGE so each microbatch
    carries a disjoint slice (the append-ordered contract
    apply_changes_scd2 states: a key's events never span batches out
    of order — here they never span batches at all, the common
    compacted-topic layout). _seq is the in-key event index."""
    log_dir = os.path.join(os.path.dirname(SCALE_DIR), "cdc_log")
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    keys = spark.range(n_keys).select(F.col("id").alias("k"))
    evs = []
    ins = keys.select(
        "k", F.lit("I").alias("op"), F.lit(0).alias("_off"),
        F.lit(0).cast("long").alias("_seq"),
    )
    upd = keys.select(
        "k", F.lit("U").alias("op"), F.lit(1).alias("_off"),
        F.lit(1).cast("long").alias("_seq"),
    )
    dele = keys.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("D").alias("op"), F.lit(2).alias("_off"),
        F.lit(2).cast("long").alias("_seq"),
    )
    reins = keys.filter(F.col("k") % 21 == 0).select(
        "k", F.lit("I").alias("op"), F.lit(3).alias("_off"),
        F.lit(3).cast("long").alias("_seq"),
    )
    evs = ins.unionByName(upd).unionByName(dele).unionByName(reins)
    changes = evs.select(
        "k",
        "op",
        (base + F.make_interval(hours=F.col("_off"))
         + F.make_interval(secs=(F.col("k") % 3600).cast("double"))
         ).alias("op_ts"),
        "_seq",
        F.concat(F.lit("state-"), ((F.col("k") + F.col("_off")) % 5)
                 .cast("string")).alias("state"),
        (F.col("k") % 1000).cast("double").alias("score"),
    )
    for i in range(n_files):
        changes.filter(F.pmod(F.col("k"), F.lit(n_files)) == i).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{log_dir}/part={i}")
    return log_dir


def run_cdc_leg(spark, n_keys: int = 50_000, n_files: int = 10) -> dict:
    """Streaming SCD2 apply-changes at scale, with a crash/restart
    mid-run: one microbatch per file, merger crash injected after the
    middle batch's store swap but before its checkpoint commit, then
    restart from the same checkpoint. Validates exactly-once (history
    == one-shot scd2_history of the full log; no duplicate versions;
    <= 1 open version per key) and records throughput."""
    import shutil

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    from cdc_2025_spark.streaming.cdc import (
        cdc_scd2_stream,
        scd2_history,
        scd2_merger,
    )

    log_dir = build_cdc_log(spark, n_keys, n_files)
    work = os.path.join(os.path.dirname(SCALE_DIR), "cdc_work")
    shutil.rmtree(work, ignore_errors=True)
    hist_path = os.path.join(work, "scd2_history")
    ckpt = os.path.join(work, "ckpt")
    schema = StructType([
        StructField("k", LongType()),
        StructField("op", StringType()),
        StructField("op_ts", TimestampType()),
        StructField("_seq", LongType()),
        StructField("state", StringType()),
        StructField("score", DoubleType()),
    ])

    def make_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{log_dir}/part=*")
        )

    inner = scd2_merger(hist_path, ["k"])
    crash_at = n_files // 2
    crashed = {"done": False}

    def crashing_merge(batch, batch_id):
        inner(batch, batch_id)
        if batch_id == crash_at and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after merge")

    t0 = time.perf_counter()
    stream = (
        make_stream().writeStream.foreachBatch(crashing_merge)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    crash_seen = False
    try:
        stream.awaitTermination()
    except Exception:
        crash_seen = True
    assert crash_seen, "injected crash did not surface"
    # restart from the same checkpoint with the normal merger —
    # the crashed batch REPLAYS against an already-merged store
    stream = cdc_scd2_stream(
        make_stream(), hist_path, ["k"], checkpoint_path=ckpt
    )
    stream.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)

    hist = spark.read.parquet(hist_path)
    full_log = spark.read.parquet(f"{log_dir}/part=*")
    n_events = full_log.count()
    want = scd2_history(full_log, ["k"], keep_seq=True)
    # exactly-once: streamed history == one-shot history of the log
    diff = (
        hist.exceptAll(want).count() + want.exceptAll(hist).count()
    )
    dup_versions = (
        hist.groupBy("k", "valid_from", "valid_from_seq")
        .count().filter(F.col("count") > 1).count()
    )
    multi_open = (
        hist.filter(F.col("is_current"))
        .groupBy("k").count().filter(F.col("count") > 1).count()
    )
    assert diff == 0, f"streamed vs one-shot history differs: {diff}"
    assert dup_versions == 0 and multi_open == 0
    return {
        "n_events": n_events,
        "n_versions": hist.count(),
        "open_versions": hist.filter(F.col("is_current")).count(),
        "wall_sec": wall,
        "events_per_sec": round(n_events / wall),
        "replay_diff_rows": diff,
        "dup_versions": dup_versions,
        "multi_open_keys": multi_open,
    }


def run_compaction_leg(spark) -> dict:
    """layout.compact_table against the CDC leg's REAL streaming
    debris (the per-microbatch SCD2 history store), not a synthetic
    fixture: byte-sized-target compaction, then a Z-ordered rewrite,
    then a crash injected at the worst point of the rename-aside swap
    (live renamed aside, new layout not yet renamed in) recovered by
    the next compact_table call. Value equality is asserted after
    every step via an order-insensitive full-table fingerprint
    (count + sum of row xxhash64)."""
    import os
    import shutil

    from cdc_2025_spark.layout import compact_table

    hist_path = os.path.join(
        os.path.dirname(SCALE_DIR), "cdc_work", "scd2_history"
    )
    df = spark.read.parquet(hist_path)
    cols = [F.col(c) for c in df.columns]

    def fingerprint() -> tuple:
        # decimal(38,0) sum: 113k 64-bit hashes overflow a long sum
        # under the ANSI session; decimal is exact and order-free
        row = (
            spark.read.parquet(hist_path)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            )
            .first()
        )
        return (row["n"], row["h"])

    fp0 = fingerprint()
    out: dict = {"rows": fp0[0]}

    t0 = time.perf_counter()
    r1 = compact_table(spark, hist_path, target_file_mb=1)
    out["compact"] = {**r1, "sec": round(time.perf_counter() - t0, 2)}
    assert fingerprint() == fp0, "compaction changed table contents"

    t0 = time.perf_counter()
    r2 = compact_table(
        spark, hist_path, target_file_mb=1, zorder_cols=["k", "valid_from"]
    )
    out["compact_zorder"] = {**r2, "sec": round(time.perf_counter() - t0, 2)}
    assert fingerprint() == fp0, "z-ordered compaction changed contents"

    # crash at the swap's worst point: the new layout is fully
    # written aside and live has been renamed away — disk shows
    # .old + .compact-tmp, no live dir. The next compact_table call
    # must first roll live back (_recover_store), then compact.
    tmp = hist_path + ".compact-tmp"
    spark.read.parquet(hist_path).repartition(16).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(hist_path, hist_path + ".old")
    assert not os.path.exists(hist_path)
    r3 = compact_table(spark, hist_path, target_file_mb=1)
    out["compact_after_crash"] = dict(r3)
    assert fingerprint() == fp0, "crash recovery lost rows"
    assert not os.path.exists(hist_path + ".old")
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--only-cdc", action="store_true")
    ap.add_argument(
        "--only-suite",
        action="store_true",
        help="run just the query suite (skip the CDC/compaction legs)",
    )
    ap.add_argument(
        "--query",
        action="append",
        default=None,
        help="restrict the suite to these query names (repeatable)",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="scale-smoke",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.only_cdc:
        cdc = run_cdc_leg(spark)
        print("\n## Scale smoke: streaming SCD2/CDC leg, local[32]\n")
        for k, v in cdc.items():
            print(f"- {k}: {v}")
        pre = stage_metrics(spark)
        print(f"stage metrics: {pre}")
        comp = run_compaction_leg(spark)
        post = stage_metrics(spark)
        print("\n## Compaction leg (over the CDC store's debris)\n")
        for k, v in comp.items():
            print(f"- {k}: {v}")
        print(
            "compaction stage metrics (delta): "
            f"{ {k: round(post[k] - pre[k], 2) for k in post} }"
        )
        spark.stop()
        return
    if not args.skip_build:
        build_corpus(spark, args.replicas)

    t0 = time.perf_counter()
    base = run_suite(spark, BASE_SF, args.query)
    base_metrics = stage_metrics(spark)
    t_base = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    scaled = run_suite(spark, SCALE_DIR, args.query)
    all_metrics = stage_metrics(spark)
    t_scaled = round(time.perf_counter() - t0, 2)
    scaled_metrics = {
        k: round(all_metrics[k] - base_metrics[k], 2)
        if "mb" in k else all_metrics[k] - base_metrics[k]
        for k in all_metrics
    }
    scaled_metrics["max_stage_shuffle_write_mb"] = all_metrics[
        "max_stage_shuffle_write_mb"
    ]

    print(f"\n## Scale smoke: sf0.1 -> {args.replicas}x (\"sf1\"), local[32]\n")
    print(
        "| query | sf0.1 sec | sf0.1 rows | sf1 sec | sf1 rows |"
        " time x | rows x |"
    )
    print("|---|---|---|---|---|---|---|")
    for name in args.query or QUERIES_UNDER_TEST:
        b, s = base[name], scaled[name]
        tx = round(s["sec"] / b["sec"], 1) if b["sec"] else float("nan")
        rx = round(s["rows"] / b["rows"], 1) if b["rows"] else float("nan")
        print(
            f"| {name} | {b['sec']} | {b['rows']} | {s['sec']} |"
            f" {s['rows']} | {tx} | {rx} |"
        )
    print(f"\nwall: sf0.1 suite {t_base}s, sf1 suite {t_scaled}s")
    print(f"sf0.1 stage metrics: {base_metrics}")
    print(f"sf1 stage metrics (delta): {scaled_metrics}")

    if args.only_suite:
        spark.stop()
        return

    cdc = run_cdc_leg(spark)
    print("\n## Streaming SCD2/CDC leg (crash + restart mid-run)\n")
    for k, v in cdc.items():
        print(f"- {k}: {v}")
    pre = stage_metrics(spark)
    comp = run_compaction_leg(spark)
    post = stage_metrics(spark)
    print("\n## Compaction leg (over the CDC store's debris)\n")
    for k, v in comp.items():
        print(f"- {k}: {v}")
    print(
        "compaction stage metrics (delta): "
        f"{ {k: round(post[k] - pre[k], 2) for k in post} }"
    )
    spark.stop()


if __name__ == "__main__":
    main()
