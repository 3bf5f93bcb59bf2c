"""Count-min sketch as a (row, col, cnt) DataFrame — the mergeable
frequency summary for heavy-hitter queries over unbounded key
domains (Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications", J. Algorithms 2005 —
public).

Probe positions use the same Kirsch-Mitzenmacher double-hashing over
the two md5 halves the MinHash ``md5_km`` family uses
(dedup/minhash.py): pos_i(key) = (hi + i·lo) mod width, with
hi/lo the first/second 8 hex chars of md5(key) — deliberately
engine-portable so a DuckDB oracle can rebuild the identical table
cell for cell. hi, lo < 2^32 and i < depth, so every intermediate
stays far inside a signed long under ANSI arithmetic.

Why a DataFrame table instead of Spark's builtin
``count_min_sketch`` aggregate: the builtin returns an opaque binary
blob that PySpark has no function to QUERY, and its murmur-based
layout has no cross-engine twin. This representation keeps the
sketch queryable with a join, mergeable with a grouped SUM (pinned
in tests/test_cms.py), and oracle-checkable — while still being ONE
aggregate over the stream with map-side partials: the shuffle
carries at most depth·width cells per partition regardless of input
size, exactly the property that makes sketches worth using at
100 TB.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 64  # deliberately small: the registered heavy-hitter
# demo WANTS visible collisions so the one-sided error is exercised;
# deployments size with cms_params below.


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """(depth, width) for the standard CMS guarantee: with
    probability >= 1 - delta, every estimate overcounts by at most
    eps * N (N = total stream count). Textbook sizing (Cormode &
    Muthukrishnan 2005): width = ceil(e / eps), depth =
    ceil(ln(1 / delta)) — a deployment states its error budget the
    way lsh_auto_geometry states a recall target, instead of
    hand-pinning cell geometry. The 4x64 registered demo
    (queries/analytics.py sketch_cms_heavy_terms) corresponds to
    eps ~ e/64 ~ 4.2%, delta ~ e^-4 ~ 1.8%."""
    import math

    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if not 0.0 < delta < 1.0:
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    width = math.ceil(math.e / eps)
    depth = max(1, math.ceil(math.log(1.0 / delta)))
    return depth, width


class CmsSketch(NamedTuple):
    """A count-min table WITH its geometry. The probe positions are a
    function of (depth, width), so estimating or merging with the
    wrong geometry silently probes the wrong cells — which can
    UNDERcount and break the one-sided-error guarantee. Carrying the
    geometry in the handle makes that mismatch unrepresentable:
    estimates always use the table's own (depth, width), and merge
    refuses mismatched sketches."""

    table: DataFrame
    depth: int
    width: int


def _probe_cols(key: str, depth: int, width: int):
    """(row, col) probe expressions for ``key`` (a column name)."""
    hi = f"cast(conv(substring(md5({key}), 1, 8), 16, 10) as bigint)"
    lo = f"cast(conv(substring(md5({key}), 9, 8), 16, 10) as bigint)"
    return [
        F.expr(f"stack({depth}, "
               + ", ".join(
                   f"{i}, pmod({hi} + {i} * {lo}, {width})"
                   for i in range(depth)
               )
               + ") AS (row, col)")
    ]


def cms_table(
    items: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> CmsSketch:
    """CmsSketch whose table is (row, col, cnt) — the count-min table
    over every row of ``items`` (one increment per input ROW, so
    pre-aggregate first if you want per-distinct-key counts). One
    stack-explode + one grouped count; the result is at most
    depth·width cells."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    probes = items.select(
        F.col(key_col).alias("_k")
    ).select(*_probe_cols("_k", depth, width))
    return CmsSketch(
        probes.groupBy("row", "col").agg(F.count("*").alias("cnt")),
        depth,
        width,
    )


def cms_merge(a: CmsSketch, b: CmsSketch) -> CmsSketch:
    """Sketch of the concatenated streams: cell-wise sum. The
    incremental-maintenance path — absorb a new batch's small table
    into the store, never re-scan history. Raises on geometry
    mismatch (summing differently-hashed tables is meaningless)."""
    if (a.depth, a.width) != (b.depth, b.width):
        raise ValueError(
            f"geometry mismatch: {a.depth}x{a.width} vs "
            f"{b.depth}x{b.width} — sketches merge only with "
            "identical (depth, width)"
        )
    return CmsSketch(
        a.table.unionByName(b.table)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt")),
        a.depth,
        a.width,
    )


def cms_estimate(
    sketch: CmsSketch,
    queries: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """``queries`` (distinct keys) + ``cms_n``: the count-min
    estimate min over rows of the key's cell — an OVERESTIMATE of
    the true count, never an under-estimate (pinned in tests). Keys
    whose cells are absent (never inserted, empty cell) estimate 0.
    Probe geometry comes from the sketch handle itself, so it cannot
    disagree with the table. The table side is at most depth·width
    rows — broadcast it."""
    probes = queries.select(F.col(key_col).alias("_k")).distinct().select(
        "_k", *_probe_cols("_k", sketch.depth, sketch.width)
    )
    est = (
        probes.join(F.broadcast(sketch.table), ["row", "col"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_n"))
    )
    return queries.join(
        est, queries[key_col] == est._k, "left"
    ).select(
        *[queries[c] for c in queries.columns],
        F.coalesce("cms_n", F.lit(0)).alias("cms_n"),
    )
