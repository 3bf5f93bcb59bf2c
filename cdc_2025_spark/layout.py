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


def compact_table(
    spark,
    path: str,
    target_file_mb: int = 128,
    zorder_cols: list[str] | None = None,
    bits: int = Z_BITS,
) -> dict:
    """Small-file compaction for a parquet table — the maintenance
    operator every streaming sink needs (per-microbatch writers and
    CDC mergers shed thousands of tiny files; each costs a task +
    footer read at scan time and defeats row-group pruning). The
    lake-format analog is Delta ``OPTIMIZE`` / Iceberg
    ``rewrite_data_files``; this is the plain-parquet form.

    Rewrites the table into ``ceil(total_bytes / target_file_mb)``
    files — sized from the CURRENT compressed footprint, so output
    files land near the target regardless of input skew. With
    ``zorder_cols`` the rewrite simultaneously lays files out in
    Morton order (write_zordered), making compaction the natural
    place to restore clustering that per-batch appends destroyed.

    Crash-safe via the same rename-aside swap contract as the CDC
    snapshot store (streaming/cdc.py _swap_store/_recover_store): the
    new layout is fully written beside the live table and swapped in
    with renames, so a crash at any point leaves the old or the new
    table intact — never a partial mix. A leftover ``.old`` backup
    from a previous crash is recovered first. (On an object store
    without atomic rename, use the table format's ACID rewrite
    instead — that is exactly what the formats exist for.)

    Returns ``{"files_before", "files_after", "total_mb"}``.
    """
    from cdc_2025_spark.streaming.cdc import _recover_store, _swap_store

    _recover_store(path)
    df = spark.read.parquet(path)
    files_before = len(df.inputFiles())
    # compressed footprint via the Hadoop FS API (portable across
    # local/HDFS-style filesystems, unlike os.walk)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    tmp = path + ".compact-tmp"
    if zorder_cols:
        write_zordered(df, tmp, zorder_cols, n_files=int(n_files), bits=bits)
    else:
        # repartition (round-robin), not coalesce: coalesce glues
        # existing tiny partitions without rebalancing, reproducing
        # the input skew in fewer, uneven files
        df.repartition(int(n_files)).write.mode("overwrite").parquet(tmp)
    _swap_store(path, tmp)
    out = spark.read.parquet(path)
    return {
        "files_before": files_before,
        "files_after": len(out.inputFiles()),
        "total_mb": round(total_bytes / 1024 / 1024, 2),
    }
