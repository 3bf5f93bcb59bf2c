"""Data-layout optimization: Z-order (Morton-order) writes.

At 100 TB the scan cost of a selective query is decided before it
runs — by whether the parquet row-group/file min-max stats let the
reader skip data. Sorting by one column tightens stats for that
column only; interleaving the bits of several columns' ranks (the
Z-order curve, public knowledge from the Morton 1966 construction and
every lakehouse's OPTIMIZE ZORDER) tightens stats for EVERY
participating column at once, at the cost of each being somewhat
looser than a dedicated sort.

Implementation is pure DataFrame ops: per-column min/max (one tiny
aggregate, broadcast), linear bucketing to 2^bits ranks, bit
interleave via shift/or expressions (codegen'd), then
repartitionByRange + sortWithinPartitions on the Z-key so every
output file owns a compact Z-range. No UDFs, no collect of data rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # rank resolution per column; 2-3 cols -> 32/48-bit key


def _as_double(col: Column, dtype: str) -> Column:
    """Numeric view of a z-order column. Dates count days; timestamps
    (incl. TIMESTAMP_NTZ via the ltz identity cast under the pinned
    UTC session) count epoch seconds — rank order is all that
    matters, so any monotone mapping works."""
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast(
            "double"
        )
    if dtype.startswith("timestamp"):
        return col.cast("timestamp_ltz").cast("double")
    return col.cast("double")


def _bucket(col: Column, cmin: Column, cmax: Column, bits: int, dtype: str) -> Column:
    """Linear rank of ``col`` in [0, 2^bits): (v - min)/(max - min)
    scaled. Constant columns (max == min) bucket to 0. NULLs bucket to
    0 so they cluster in the first files rather than scattering."""
    v = _as_double(col, dtype)
    lo = _as_double(cmin, dtype)
    hi = _as_double(cmax, dtype)
    span = hi - lo
    scaled = F.when(
        span > 0,
        ((v - lo) / span * ((1 << bits) - 1)),
    ).otherwise(F.lit(0.0))
    return F.coalesce(
        F.least(
            F.greatest(F.round(scaled).cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        ),
        F.lit(0),
    )


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of rank i lands at position
    b * n_cols + i. Built as a sum of shifted single bits — ~bits *
    n_cols codegen'd long ops, no loops at runtime."""
    n = len(ranks)
    terms = []
    for i, r in enumerate(ranks):
        for b in range(bits):
            src = F.shiftright(r, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, b * n + i))
    return reduce(lambda a, c: a.bitwiseOR(c), terms)


def zorder_key(df: DataFrame, cols: list[str], bits: int = Z_BITS) -> DataFrame:
    """Attach a ``_zkey`` column: the Morton interleave of each
    column's linear rank between its global min and max. The min/max
    aggregate is one scan producing a single broadcast row — the only
    extra pass over the data."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    if bits * len(cols) > 63:
        raise ValueError("bits * n_cols must fit a signed long")
    dtypes = dict(df.dtypes)
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    ranks = [
        _bucket(
            F.col(c),
            F.col(f"_min_{c}"),
            F.col(f"_max_{c}"),
            bits,
            dtypes[c],
        )
        for c in cols
    ]
    return with_stats.withColumn("_zkey", _interleave(ranks, bits)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = Z_BITS,
) -> None:
    """Write parquet Z-ordered by ``cols``: every output file owns a
    compact Z-range, so its min-max stats are tight on EVERY
    participating column and a selective filter on any of them skips
    most files/row groups at scan time.

    repartitionByRange samples the Z-key for balanced file sizes
    (skew-safe); sortWithinPartitions keeps row groups inside a file
    tight too. The helper column is dropped from the output schema.
    """
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
