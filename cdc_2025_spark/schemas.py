"""Explicit schemas for every table the engine touches.

The reference infers all schemas positionally (SURVEY.md §1.3); at
scale, inference means an extra full scan and silent type drift, so the
ingest boundary here is always explicitly typed.

Star-schema columns mirror /root/testdata (FIXTURES.md §B); the
reference fact/mart tables mirror FIXTURES.md §A2/§A3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Reference-surface tables (SURVEY.md §1.1) -------------------------------

# data/processed/clean_va_price.csv — the tidy fact table produced by the
# reference's notebook cell 3 (ipynb:1098-1112).
CLEAN_VA_PRICE = StructType(
    [
        StructField("Industry", StringType()),
        StructField("Year", IntegerType()),
        StructField("Nominal_Value", DoubleType()),
        StructField("Price_Index", DoubleType()),
        StructField("Real_Value", DoubleType()),
    ]
)

# data/processed/resilience_metrics.csv — the metrics mart
# (src/features/resilience.py:76-82). Recovered_Years is float in the
# golden CSV only because pandas has no nullable int; semantically int.
RESILIENCE_METRICS = StructType(
    [
        StructField("Industry", StringType()),
        StructField("Drawdown_2020", DoubleType()),
        StructField("Recovered_Years", DoubleType()),
    ]
)

# --- Driver star schema + extension tables (FIXTURES.md §B) ------------------

STAR_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(STAR_SCHEMAS)
