"""Classifier evaluation in one plan: tie-corrected ROC AUC and the
per-threshold confusion table.

The evaluation step for in-plan scorers (the IRLS quality classifier,
perplexity filters, any 0/1-labeled score column): AUC via the
Mann-Whitney midrank identity (equal to the trapezoidal area under
the ROC curve with tie correction — Hanley & McNeil, Radiology 1982),
and the full threshold sweep (tp/fp/fn/tn, precision, recall) at
every distinct score.

Scale shape — the part that matters at 100 TB: nothing ranks the raw
rows. ONE grouped count collapses the corpus to the distinct-score
frame (scores are finite-precision model outputs — round them
upstream if truly continuous), and every rank/cumulative/threshold
statistic runs as windows over THAT bounded frame. The single
unpartitioned window is over |distinct scores| rows, the same
bounded-frame posture `window_mom_revenue_change` and the seasonal
decompose pin — never over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _score_groups(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """(score, np, nn): positive/negative counts per distinct score.
    NULL scores or labels are excluded; labels must be 0/1 — any
    other encoding (e.g. the -1/+1 convention) raises at runtime
    rather than silently corrupting the counts."""
    lbl = F.when(
        F.col(label_col).isin(0, 1), F.col(label_col).cast("long")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("labels must be 0/1, got "),
                F.col(label_col).cast("string"),
            )
        ).cast("long")
    )
    return (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).alias("score"))
        .agg(
            F.sum(lbl).alias("np"),
            F.sum(F.lit(1) - lbl).alias("nn"),
        )
    )


def auc_roc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One row: (n_pos, n_neg, auc). AUC is the tie-corrected
    Mann-Whitney statistic — P(score_pos > score_neg) + 0.5 *
    P(tie) — computed from midranks over the distinct-score frame.
    auc is NULL when either class is absent (undefined, not 0.5)."""
    g = _score_groups(df, score_col, label_col)
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = g.select(
        "np",
        "nn",
        # midrank of this score group among ALL rows, ascending:
        # rows strictly below + (group size + 1) / 2
        (
            F.sum(F.col("np") + F.col("nn")).over(w)
            - (F.col("np") + F.col("nn"))
            + (F.col("np") + F.col("nn") + 1) / 2.0
        ).alias("midrank"),
    )
    return ranked.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum(F.col("np") * F.col("midrank")).alias("_rank_sum"),
    ).select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                (
                    F.col("_rank_sum")
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    )


def threshold_sweep(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """The ROC/PR table: one row per distinct score used as the
    decision threshold (predict positive when score >= threshold),
    with tp/fp/fn/tn and precision/recall — every operating point
    the score column offers, computed without re-scanning the corpus
    per threshold."""
    g = _score_groups(df, score_col, label_col)
    wd = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # totals as a whole-frame window over the SAME single-partition
    # distinct-score frame the cumulative window already requires —
    # a separate g.agg() subtree re-executed the grouped count (two
    # extra exchanges + a broadcast, and double corpus work)
    w_all = Window.partitionBy()
    return (
        g.select(
            F.col("score").alias("threshold"),
            F.sum("np").over(wd).cast("long").alias("tp"),
            F.sum("nn").over(wd).cast("long").alias("fp"),
            F.sum("np").over(w_all).alias("tp_all"),
            F.sum("nn").over(w_all).alias("fp_all"),
        )
        .select(
            "threshold",
            "tp",
            "fp",
            (F.col("tp_all") - F.col("tp")).cast("long").alias("fn"),
            (F.col("fp_all") - F.col("fp")).cast("long").alias("tn"),
            F.round(
                F.col("tp") / (F.col("tp") + F.col("fp")), 6
            ).alias("precision"),
            F.when(
                F.col("tp_all") > 0,
                F.round(F.col("tp") / F.col("tp_all"), 6),
            ).alias("recall"),
        )
    )
