"""Product quantization for ANN search (Jégou, Douze & Schmid,
"Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 —
public).

The vector space is split into M orthogonal subspaces; each subspace
gets its own K_SUB-centroid codebook (Lloyd's — the same distributed
k-means primitives IVF and SemDeDup train with,
functions/kmeans.py); a vector is stored as M small codes (one byte
each at K_SUB <= 256). Query-time ADC (asymmetric distance
computation) precomputes, per query, the M x K_SUB table of squared
distances from the query's subvectors to every centroid, then scores
a database vector as the SUM of M table lookups — no float vector is
read at scan time at all.

Why this is the 100 TB shape: the ADC scan touches only the code
column (M bytes/vector vs 4·dim-byte floats — 32x smaller at
dim=64, M=8), the LUTs are queries x M x K_SUB floats (broadcast),
and the scan is embarrassingly parallel with no shuffle until the
per-query top-k. Composed with IVF (probe cells first, ADC within
probed cells) this is the standard billion-scale recipe (FAISS
IVFPQ); here the two stages are registered separately so each plan
shape is auditable on its own.

Training cost is M small k-means runs (each on an n x dim/M
projection — one narrow column slice, never the full vectors), run
once per corpus and cached by the caller.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pq_train(
    spark: SparkSession,
    emb: DataFrame,
    m: int,
    k_sub: int,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace codebooks: M lists of (cid, centroid) rows from
    ONE grouped Lloyd run — all M subspaces train together, so the
    cost is one assignment pass + one (sub, cell) recenter shuffle
    PER ITERATION, not M separate k-means jobs (measured 27 s -> 4 s
    on the 500 x 64 fixture; the gap widens with M). Dimension must
    divide evenly by m (reject instead of silently degrading the
    last subspace).

    Deterministic init (the lowest_id convention of
    functions/kmeans.py): subspace i's initial centroids are the
    subvectors of the k_sub lowest-id vectors. Assignment ties break
    to the lowest cid (numpy argmin over cid-sorted codebooks — the
    assign_cells_np convention); empty cells keep their previous
    centroid. cids are 0-based."""
    dim = len(emb.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    # exploded (id, sub, xs) frame: each vector contributes one row
    # per subspace — persisted across iterations like lloyd_kmeans
    # persists its corpus
    slices = F.array(
        *[
            F.slice(
                F.col(vec_col).cast("array<double>"),
                i * sub_d + 1,
                sub_d,
            )
            for i in range(m)
        ]
    )
    sub = (
        emb.select(F.col(id_col).alias("_id"), slices.alias("_sl"))
        .select("_id", F.posexplode("_sl").alias("sub", "xs"))
        .persist()
    )
    try:
        # init: subvectors of the k_sub lowest ids (k_sub·m rows)
        seed_rows = (
            sub.join(
                F.broadcast(
                    emb.select(F.col(id_col).alias("_id"))
                    .orderBy("_id")
                    .limit(k_sub)
                ),
                "_id",
            )
            .collect()
        )
        import numpy as np

        seed_ids = sorted({row["_id"] for row in seed_rows})
        if len(seed_ids) < k_sub:
            raise ValueError(
                f"corpus has {len(seed_ids)} vectors; need >= "
                f"k_sub={k_sub} for codebook init"
            )
        id_rank = {r: i for i, r in enumerate(seed_ids)}
        books = [[None] * k_sub for _ in range(m)]
        for row in seed_rows:
            books[row["sub"]][id_rank[row["_id"]]] = np.asarray(
                list(row["xs"]), dtype=np.float64
            )
        books = [np.asarray(bk) for bk in books]
        for _ in range(n_iter):
            mats = [bk.copy() for bk in books]

            def assign_fn(batches: Iterator) -> Iterator:
                import pandas as pd

                for pdf in batches:
                    xs = np.asarray(
                        [list(v) for v in pdf["xs"]], dtype=np.float64
                    )
                    subs = pdf["sub"].to_numpy()
                    cells = np.empty(len(pdf), dtype=np.int64)
                    for i in range(m):
                        mask = subs == i
                        if not mask.any():
                            continue
                        c2 = (mats[i] * mats[i]).sum(axis=1)
                        d = c2[None, :] - 2.0 * (
                            xs[mask] @ mats[i].T
                        )
                        cells[mask] = np.argmin(d, axis=1)
                    out = pdf[["sub"]].copy()
                    out["cell"] = cells
                    for j in range(sub_d):
                        out[f"x{j}"] = xs[:, j]
                    yield out

            wide_schema = "sub int, cell long, " + ", ".join(
                f"x{j} double" for j in range(sub_d)
            )
            assigned = sub.mapInPandas(assign_fn, schema=wide_schema)
            new_rows = (
                assigned.groupBy("sub", "cell")
                .agg(
                    *[
                        F.avg(f"x{j}").alias(f"x{j}")
                        for j in range(sub_d)
                    ]
                )
                .collect()
            )
            for r in new_rows:
                books[r["sub"]][r["cell"]] = np.asarray(
                    [r[f"x{j}"] for j in range(sub_d)]
                )
    finally:
        sub.unpersist()
    return [
        [(c, [float(x) for x in bk[c]]) for c in range(k_sub)]
        for bk in books
    ]


def _book_matrices(books):
    import numpy as np

    cids = [
        np.asarray([c for c, _ in bk], dtype=np.int64) for bk in books
    ]
    mats = [
        np.asarray([v for _, v in bk], dtype=np.float64)
        for bk in books
    ]
    return cids, mats


def pq_encode(
    emb: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per subspace, the cid of the nearest
    codebook centroid (squared euclidean; ties to the lowest cid —
    the assign_cells_np convention: centroid rows sorted by cid,
    argmin takes the first minimum). One Arrow-batched pass; the
    codebooks ride the closure (M·K_SUB·dim/M floats)."""
    import pandas as pd  # noqa: F401

    cids, mats = _book_matrices(books)
    m = len(mats)
    sub_d = mats[0].shape[1]

    def fn(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            x = np.asarray(
                [list(v) for v in pdf[vec_col]], dtype=np.float64
            )
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for i in range(m):
                xs = x[:, i * sub_d : (i + 1) * sub_d]
                c2 = (mats[i] * mats[i]).sum(axis=1)
                d = c2[None, :] - 2.0 * (xs @ mats[i].T)
                codes[:, i] = cids[i][np.argmin(d, axis=1)]
            out = pdf[[id_col]].copy()
            out["codes"] = [list(map(int, row)) for row in codes]
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, codes array<int>"
    )


def pq_adc_topn(
    codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    n_short: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, vec_id, adc_dist) shortlist: for each query, the
    n_short smallest ADC distances (sum of per-subspace LUT lookups;
    ties to the lowest vec_id). The LUTs (|queries| x M x K_SUB
    doubles) ride the closure; the scan reads ONLY the codes column;
    the single shuffle is the per-query top-n aggregation of
    (qid, vec_id, dist) triples."""
    import numpy as np

    cids, mats = _book_matrices(books)
    m = len(mats)
    # LUT[q][i][cid] — indexed by raw cid (cids may be 1-based, so
    # size the table to max cid + 1)
    luts = []
    qids = []
    for qid, qv in queries:
        qa = np.asarray(list(qv), dtype=np.float64)
        sub_d = mats[0].shape[1]
        lut = [None] * m
        for i in range(m):
            qs = qa[i * sub_d : (i + 1) * sub_d]
            d = ((mats[i] - qs[None, :]) ** 2).sum(axis=1)
            full = np.full(int(cids[i].max()) + 1, np.inf)
            full[cids[i]] = d
            lut[i] = full
        luts.append(lut)
        qids.append(qid)

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            code_mat = np.asarray(
                [list(c) for c in pdf["codes"]], dtype=np.int64
            )
            ids = pdf[id_col].to_numpy()
            frames = []
            for qi, qid in enumerate(qids):
                dist = np.zeros(len(pdf), dtype=np.float64)
                for i in range(m):
                    dist += luts[qi][i][code_mat[:, i]]
                frames.append(
                    pd.DataFrame(
                        {
                            "qid": qid,
                            id_col: ids,
                            "adc_dist": dist,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    from pyspark.sql import Window

    scored = codes.mapInPandas(
        fn, schema=f"qid long, {id_col} long, adc_dist double"
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_short)
        .drop("rn")
    )


def pq_adc_candidates(
    cand_codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, vec_id, adc_dist) over a PRE-RESTRICTED candidate frame
    (qid, vec_id, codes) — the IVF+PQ composition path: the caller
    already pruned candidates to each query's probed cells, so each
    row scores against exactly its own query's LUT (contrast
    pq_adc_topn, which scores every query against the whole code
    table). Same LUT-in-closure shape; no shuffle is added here —
    ranking/shortlisting is the caller's."""
    import numpy as np

    cids, mats = _book_matrices(books)
    m = len(mats)
    sub_d = mats[0].shape[1]
    luts = {}
    for qid, qv in queries:
        qa = np.asarray(list(qv), dtype=np.float64)
        lut = [None] * m
        for i in range(m):
            qs = qa[i * sub_d : (i + 1) * sub_d]
            d = ((mats[i] - qs[None, :]) ** 2).sum(axis=1)
            full = np.full(int(cids[i].max()) + 1, np.inf)
            full[cids[i]] = d
            lut[i] = full
        luts[qid] = lut

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            code_mat = np.asarray(
                [list(c) for c in pdf["codes"]], dtype=np.int64
            )
            qarr = pdf["qid"].to_numpy()
            dist = np.zeros(len(pdf), dtype=np.float64)
            for qid in np.unique(qarr):
                mask = qarr == qid
                lut = luts[int(qid)]
                d = np.zeros(int(mask.sum()), dtype=np.float64)
                sub_codes = code_mat[mask]
                for i in range(m):
                    d += lut[i][sub_codes[:, i]]
                dist[mask] = d
            out = pdf[["qid", id_col]].copy()
            out["adc_dist"] = dist
            yield out

    return cand_codes.select("qid", id_col, "codes").mapInPandas(
        fn, schema=f"qid long, {id_col} long, adc_dist double"
    )
