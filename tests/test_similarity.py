"""Similarity-search tests: brute-force correctness vs numpy, LSH
recall vs the exact pair set, pandas-UDF/codegen cosine agreement."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.functions.embeddings import cosine, make_cosine_udf
from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.similarity import (
    PAIR_THRESHOLD,
    _pairs_above_threshold,
    sim_ivf_topk,
    sim_lsh_bucketed_pairs,
    sim_pairs_above_threshold,
    sim_topk_bruteforce,
)


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = read_table(spark, sf_dir, "embeddings").collect()
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}


def np_cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na > 0 and nb > 0 else None


def test_topk_matches_numpy(spark, sf_dir, emb_np):
    got = sim_topk_bruteforce(spark, sf_dir).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rn"], r["vec_id"], r["cos"]))
    for qid, rows in by_q.items():
        rows.sort()
        scored = sorted(
            (
                (-np_cos(emb_np[qid], v), vid)
                for vid, v in emb_np.items()
                if vid != qid
            ),
        )[:10]
        want = [vid for _, vid in scored]
        assert [vid for _, vid, _ in rows] == want, qid
        for (_, _, cos_got), (neg_cos, _) in zip(rows, scored):
            assert math.isclose(cos_got, -neg_cos, abs_tol=1e-3)


def test_lsh_subset_and_recall(spark, sf_dir):
    # ungated (sample_pct=100) ground truth — the registered query is
    # hash-sample-gated and would miss cross-sample pairs
    exact = {
        (r["id_a"], r["id_b"])
        for r in _pairs_above_threshold(spark, sf_dir, 100).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]) for r in sim_lsh_bucketed_pairs(spark, sf_dir).collect()
    }
    assert approx <= exact
    if len(exact) >= 5:
        recall = len(approx) / len(exact)
        # 4 bands x 4 bits at cos>=0.4: P[share a band] is modest per
        # pair; assert a sane floor rather than a tuned figure
        assert recall >= 0.3, f"recall {recall:.2f} of {len(exact)}"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = {}
    for r in sim_topk_bruteforce(spark, sf_dir).collect():
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    approx = {}
    for r in sim_ivf_topk(spark, sf_dir).collect():
        approx.setdefault(r["qid"], set()).add(r["vec_id"])
    # every query must return a full-ish candidate list, and IVF
    # scores are exact cosines, so any returned neighbor that IS in
    # the probed cells ranks identically to brute force
    recalls = []
    for qid, want in exact.items():
        got = approx.get(qid, set())
        assert got, f"IVF returned nothing for query {qid}"
        recalls.append(len(got & want) / len(want))
    # Recorded baselines at sf0.001 (deterministic, measured r4):
    #   first-16-vectors placeholder centroids: 0.88 (nprobe=4),
    #   0.90 (nprobe=6); k-means centroids (lowest_id init, 3
    #   iterations, nprobe=6): 0.96 — the k-means quantizer must keep
    #   beating both placeholder configs, with slack for future data
    #   regen (everything here is hash-deterministic per corpus).
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_cosine_udf_matches_codegen(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 2.0], [0.5, 1.0, 2.0]),
            (2, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # zero norm -> NULL
            (3, [1.0, 1.0, 1.0], [1.0, 1.0, 1.0]),
        ],
        "id long, a array<double>, b array<double>",
    )
    udf = make_cosine_udf()
    rows = df.select(
        "id",
        cosine("a", "b").alias("jvm"),
        udf("a", "b").alias("py"),
    ).collect()
    for r in rows:
        if r["jvm"] is None:
            assert r["py"] is None
        else:
            assert math.isclose(r["jvm"], r["py"], rel_tol=1e-12)
