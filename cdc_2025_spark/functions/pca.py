"""Distributed PCA over an embedding column.

One-pass sufficient statistics — the classic treeAggregate shape
(MLlib's RowMatrix computes its Gramian the same way): each Arrow
batch reduces to (count, sum-vector, Gram matrix) inside numpy, the
partials reduce in-plan through a position-keyed aggregate bounded by
d² (never by the corpus), and only the d×d result reaches the driver
for the eigendecomposition. Projection broadcasts the (r×d)
component matrix through the mapInPandas closure — one matmul per
batch, nothing corpus-sized at the driver.

Sign convention: each component is oriented so its largest-magnitude
entry is positive (ties broken by lowest index via numpy argmax), so
the factorization is deterministic and test-comparable across
backends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_suffstats(vectors: DataFrame, vec_col: str = "embedding"):
    """The one-pass sufficient statistics ``(n, s, g)`` — count,
    sum vector (d), Gram matrix (d×d) as numpy. These are SUMS, so
    the summary is exactly MERGEABLE: stats(A ∪ B) = stats(A) +
    stats(B) componentwise — per-shard and per-microbatch PCA
    maintenance is add-and-refit (pinned in test_streaming.py as the
    fifth mergeable-summary leg: Bloom bit_or, CMS sum, HLL union,
    reservoir union+take, PCA suffstat add).

    Scale shape: per-batch numpy partials emit (pos, val) rows —
    batch_count × (d² + d + 1) rows, reduced by ONE grouped sum
    whose output is d²-bounded; the driver receives d² + d + 1
    doubles regardless of corpus size or partition count.
    """
    import numpy as np  # noqa: PLC0415

    src = vectors.select(F.col(vec_col).cast("array<double>").alias("emb"))

    def partials(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            d = x.shape[1]
            vals = np.concatenate(
                [[float(len(x))], x.sum(axis=0), (x.T @ x).ravel()]
            )
            yield pd.DataFrame(
                {"pos": np.arange(d * d + d + 1, dtype=np.int64),
                 "val": vals}
            )

    stats = (
        src.mapInPandas(partials, "pos long, val double")
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    if not stats:
        raise ValueError("pca_suffstats: empty input")
    flat = np.zeros(max(r["pos"] for r in stats) + 1)
    for r in stats:
        flat[r["pos"]] = r["val"]
    n = int(flat[0])
    # len(flat) = d^2 + d + 1  ->  d = (-1 + sqrt(4*len - 3)) / 2
    d = int(round((-1 + (4 * len(flat) - 3) ** 0.5) / 2))
    return n, flat[1 : d + 1], flat[d + 1 :].reshape(d, d)


def pca_fit_from_stats(n: int, s, g, n_components: int):
    """Eigendecompose the covariance implied by mergeable suffstats;
    returns ``(mean, components, eigvals, n)`` under the module's
    deterministic sign convention."""
    import numpy as np  # noqa: PLC0415

    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")
    if n == 0:
        raise ValueError("pca_fit_from_stats: empty stats")
    mu = np.asarray(s, dtype=np.float64) / n
    cov = np.asarray(g, dtype=np.float64) / n - np.outer(mu, mu)
    # symmetrize against summation-order noise before eigh
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:n_components]
    eigvals = w[order]
    comps = v[:, order].T.copy()
    for i in range(comps.shape[0]):
        if comps[i, np.abs(comps[i]).argmax()] < 0:
            comps[i] = -comps[i]
    return mu, comps, eigvals, n


def pca_fit(
    vectors: DataFrame,
    n_components: int,
    vec_col: str = "embedding",
):
    """Fit PCA on ``vectors[vec_col]``: one suffstats pass + the
    driver-side eigendecomposition (see the two stages above)."""
    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")
    try:
        n, s, g = pca_suffstats(vectors, vec_col)
    except ValueError as exc:
        raise ValueError("pca_fit: empty input") from exc
    return pca_fit_from_stats(n, s, g, n_components)


def pca_project(
    vectors: DataFrame,
    mean,
    components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Project each vector onto the fitted components:
    (id, pc1..pcR) with scores rounded to ``round_dp``. The (r×d)
    component matrix and mean ride the closure (broadcast-sized);
    one centered matmul per Arrow batch."""
    import numpy as np  # noqa: PLC0415

    mu = np.asarray(mean, dtype=np.float64)
    comps = np.asarray(components, dtype=np.float64)
    r = comps.shape[0]
    cols = [f"pc{i + 1}" for i in range(r)]

    def fn(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            sc = np.round((x - mu) @ comps.T, round_dp)
            out = {"id": pdf["id"]}
            for i, c in enumerate(cols):
                out[c] = sc[:, i]
            yield pd.DataFrame(out)

    schema = "id long, " + ", ".join(f"{c} double" for c in cols)
    return vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("emb"),
    ).mapInPandas(fn, schema)
