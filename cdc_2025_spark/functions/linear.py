"""Distributed L2-regularized logistic regression (IRLS / Newton)
over hashed bag-of-words features — the linear "quality classifier"
used as a corpus filter in public LLM data pipelines (CCNet / GPT-3 /
LLaMA-class recipes train a fastText-style linear model to score
documents against a trusted target sample and filter on the
predicted probability). IRLS is the textbook distributed form
(iteratively reweighted least squares — e.g. MLlib's logistic
solvers aggregate the same sufficient statistics): first-order GD
needs hundreds of passes where Newton converges in ~5.

Per iteration, ONE action reduces everything the driver needs:

- margins/probabilities per doc — the current (d+1)-float weight
  vector rides the plan as a literal array (element_at lookup; no
  join, no broadcast stage), one doc-keyed grouped sum;
- gradient  Xᵀ(y − p)          — feature-keyed sum, d+1 rows;
- Hessian   Xᵀ diag(p(1−p)) X  — active-feature pair explode per
  doc (bounded by nnz² per doc), upper-triangle only, grouped sum
  whose output is ≤ (d+1)²/2 rows;
- the loss trace row.

All four union into one collected frame (the scored frame is a
lazily-checkpointed shared subplan, so it executes once per
iteration); the driver mirrors the (d+1)² matrix, adds the ridge
term, and solves — d = a few hundred, so the solve is trivial.
Nothing corpus-sized reaches the driver at any corpus size.
Deterministic: zero init, fixed iteration count and ridge, no
sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

W_FLOOR = 1e-6  # IRLS weight clamp p(1-p) >= floor (standard guard)


def hashed_features(
    docs: DataFrame,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, x): md5-hashed unigram PRESENCE buckets (x = 1.0
    per distinct bucket — the fastText-style binary bag)."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return (
        tok.select("id", bucket.alias("bucket"))
        .distinct()
        .withColumn("x", F.lit(1.0))
    )


def _w_lookup(w) -> F.Column:
    """w[bucket] as a literal-array element_at — the weights ride the
    plan itself (repr round-trips doubles exactly via string cast)."""
    # repr(float(v)), not repr(v): numpy >= 2.0 reprs scalars as
    # 'np.float64(x)', which the string cast would NULL out; Python
    # float repr round-trips doubles exactly on every numpy version.
    lits = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in w)
    return F.expr(f"element_at(array({lits}), CAST(bucket AS INT) + 1)")


def logreg_train_irls(
    feat: DataFrame,
    labels: DataFrame,
    n_buckets: int,
    n_iter: int = 5,
    lam_per_row: float = 1e-2,
):
    """Fit ridge-logistic weights on ``feat`` (id, bucket, x) against
    ``labels`` (id, y ∈ {0,1}); returns ``(w, b, losses)`` — numpy
    weight vector (n_buckets), float bias (the unregularized
    (n_buckets+1)-th feature), and the pre-update mean log-loss per
    iteration (strictly decreasing on the fixture — pinned in
    tests). Ridge strength is ``lam_per_row * n`` (scale-invariant:
    the penalty and the data term grow together)."""
    import numpy as np  # noqa: PLC0415

    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    d1 = n_buckets + 1
    bias_rows = labels.select(
        "id", F.lit(n_buckets).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    base = (
        feat.select("id", "bucket", "x")
        .unionByName(bias_rows)
        .join(labels, "id")
        .localCheckpoint(eager=False)
    )
    n = labels.count()
    if n == 0:
        raise ValueError("logreg_train_irls: empty input")
    lam = lam_per_row * n
    reg = np.full(d1, lam)
    reg[n_buckets] = 0.0  # bias is not regularized
    w = np.zeros(d1)
    losses: list[float] = []
    for _ in range(n_iter):
        scored = (
            base.withColumn("wx", F.col("x") * _w_lookup(w))
            .groupBy("id", "y")
            .agg(F.sum("wx").alias("m"))
            .select(
                "id",
                "y",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))).alias(
                    "p"
                ),
            )
            .localCheckpoint(eager=False)
        )
        resid = scored.select(
            "id",
            (F.col("y") - F.col("p")).alias("r"),
            F.greatest(
                F.col("p") * (1 - F.col("p")), F.lit(W_FLOOR)
            ).alias("wt"),
        )
        # joined feeds three subtrees (gradient + both sides of the
        # Hessian self-join) — checkpoint so it executes once
        joined = (
            base.select("id", "bucket", "x")
            .join(resid, "id")
            .localCheckpoint(eager=False)
        )
        grad = joined.groupBy("bucket").agg(
            F.sum(F.col("x") * F.col("r")).alias("v")
        ).select(F.col("bucket").alias("a"), F.lit(-1).cast("long").alias("b"), "v")
        pairs = (
            joined.alias("u")
            .join(
                joined.select(
                    F.col("id").alias("id2"),
                    F.col("bucket").alias("b2"),
                    F.col("x").alias("x2"),
                ),
                F.col("u.id") == F.col("id2"),
            )
            .filter(F.col("u.bucket") <= F.col("b2"))
            .groupBy(F.col("u.bucket").alias("a"), F.col("b2").alias("b"))
            .agg(F.sum(F.col("u.x") * F.col("x2") * F.col("u.wt")).alias("v"))
        )
        loss = scored.agg(
            F.avg(
                -(
                    F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                    + (1 - F.col("y"))
                    * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                )
            ).alias("v")
        ).select(
            F.lit(-3).cast("long").alias("a"),
            F.lit(-3).cast("long").alias("b"),
            "v",
        )
        rows = grad.unionByName(pairs).unionByName(loss).collect()
        g = np.zeros(d1)
        h = np.zeros((d1, d1))
        for r in rows:
            a, bb, v = r["a"], r["b"], r["v"]
            if bb == -1:
                g[a] = v
            elif a == -3:
                losses.append(float(v))
            else:
                h[a, bb] = v
                h[bb, a] = v
        g -= reg * w
        h += np.diag(reg)
        w = w + np.linalg.solve(h, g)
    return w[:n_buckets], float(w[n_buckets]), losses


def logreg_score(
    feat: DataFrame, w, b: float, round_dp: int = 4
) -> DataFrame:
    """(id, score): sigmoid(w·x + b) per document, rounded — one
    map + one doc-keyed aggregate, weights as plan literals."""
    return (
        feat.withColumn("wx", F.col("x") * _w_lookup(w))
        .groupBy("id")
        .agg(F.sum("wx").alias("m"))
        .select(
            "id",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("m") + F.lit(float(b))))),
                round_dp,
            ).alias("score"),
        )
    )
