"""Array / higher-order-function coverage over the embeddings table,
plus string-distance ops — the remaining scalar-function families
(SURVEY.md §2.7 north-star extensions).

Array expressions here are analysis-path (per-label statistics), not
the similarity hot path — dedup/similarity use explode+agg instead
(higher-order lambdas are interpreted; see dedup/minhash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_table
from cdc_2025_spark.queries.registry import query


@query(
    "array_norm_stats_by_label",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(sqrt(list_sum(list_transform(
             CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS avg_l2,
           ROUND(MAX(list_max(CAST(embedding AS DOUBLE[]))), 4) AS max_dim,
           CAST(MAX(len(embedding)) AS INTEGER) AS dim
    FROM embeddings
    GROUP BY label
    """,
)
def array_norm_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norms via transform/aggregate/array_max —
    the higher-order-function surface, exercised off the hot path."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.transform("emb", lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(l2), 4).alias("avg_l2"),
        F.round(F.max(F.array_max("emb")), 4).alias("max_dim"),
        F.max(F.size("emb")).cast("int").alias("dim"),
    )


@query(
    "array_dimension_profile",
    oracle="""
    SELECT dim, ROUND(AVG(v), 4) AS mean_v, ROUND(STDDEV_SAMP(v), 4) AS sd_v
    FROM (
      SELECT UNNEST(CAST(embedding AS DOUBLE[])) AS v,
             UNNEST(range(1, len(embedding) + 1)) AS dim
      FROM embeddings
    )
    WHERE dim <= 8
    GROUP BY dim
    """,
)
def array_dimension_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile (first 8 dims): posexplode
    to (dim, value), one grouped aggregate — the layout-independent
    way to profile embedding columns at corpus scale (shuffles k*dims
    partial aggregates, not vectors)."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "v"
        )
    )
    return (
        emb.withColumn("dim", (F.col("dim0") + 1).cast("bigint"))
        .filter(F.col("dim") <= 8)
        .groupBy("dim")
        .agg(
            F.round(F.avg("v"), 4).alias("mean_v"),
            F.round(F.stddev_samp("v"), 4).alias("sd_v"),
        )
        .select("dim", "mean_v", "sd_v")
    )


@query(
    "string_close_part_names",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey <= 200 AND b.p_partkey <= 200
      AND levenshtein(a.p_name, b.p_name) <= 5
    """,
)
def string_close_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-matches within a brand (bounded id slice —
    the pattern for catalog-entity reconciliation; the brand equi-key
    blocks the join so the quadratic term is per-brand, not global)."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_partkey") <= 200
    )
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, "brand")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 5)
        .select("key_a", "key_b", F.col("dist").cast("int").alias("dist"))
    )
