"""Embedding math as JVM array expressions: dot product, norms,
cosine — built from zip_with/aggregate so similarity search needs no
Python on the hot path. A vectorized pandas-UDF variant is provided
for wide batches where Arrow + numpy beats codegen'd loops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (JVM-side)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def make_cosine_udf():
    """Arrow-batched numpy cosine — the alternative hot path when
    vectors are wide (>= ~256 dims) and numpy's SIMD beats codegen'd
    loops. Same NULL contract as cosine(). Built lazily because
    pandas_udf type resolution needs an active SparkSession."""
    import numpy as np  # noqa: PLC0415

    @pandas_udf("double")
    def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        num = (av * bv).sum(axis=1)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        out = np.where(den > 0, num / np.where(den == 0, 1.0, den), np.nan)
        return pd.Series(out).where(den > 0)

    return cosine_udf
