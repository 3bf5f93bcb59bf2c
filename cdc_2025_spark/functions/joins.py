"""Skew-mitigating join helpers.

At 100 TB a handful of hot keys (one event type, one null-ish
customer, one boilerplate document) can put an entire shuffle's worth
of rows into one reducer. AQE's skew-join split handles the
sort-merge case at runtime, but not every plan qualifies (e.g. when
the join key feeds a downstream groupBy, or the skew is invisible to
stats). Salting is the declarative fix: spread each hot key over
``n_salt`` sub-keys on the big side, explode the small side
``n_salt``-fold, join on (key, salt) — exact same result set, shuffle
fan-out bounded by df(hot)/n_salt per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 16,
    salt_on: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted
    over ``n_salt`` sub-keys and the small side exploded to match.

    ``salt_on`` picks the deterministic salt source (a unique-ish
    column, e.g. the big side's primary key); default salts on a hash
    of the whole row. Result set is EXACTLY the plain join's — every
    (key, salt) pair exists on the exploded small side, so no big row
    gains or loses matches (holds for 'inner' and 'left'). The salt
    column is dropped from the output.

    Scale shape: small grows n_salt-fold (still broadcast-able for
    real dims); the big side's hot-key shuffle partitions shrink
    n_salt-fold, which is the point — pinned by the partition-spread
    test in tests/test_partitioning.py.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} — semi/anti "
            "reduce to key-distinct joins that don't need salting"
        )
    if SALT_COL in big.columns or SALT_COL in small.columns:
        # withColumn would silently overwrite the caller's column and
        # drop() would then erase it from the output
        raise ValueError(
            f"input already has a {SALT_COL!r} column; rename it "
            "before salting"
        )
    if salt_on is None:
        salt_src = F.xxhash64(*[F.col(c) for c in big.columns])
    else:
        salt_src = F.hash(salt_on) if isinstance(salt_on, str) else F.hash(salt_on)
    big_s = big.withColumn(SALT_COL, F.pmod(salt_src, F.lit(n_salt)))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big_s.join(small_s, [*on, SALT_COL], how).drop(SALT_COL)


def advise_salt(
    big: DataFrame,
    on: list[str],
    hot_factor: float = 2.0,
    max_salt: int = 64,
) -> int:
    """Derive the salt the data wants: the max per-key skew factor
    (hottest key's load over the mean key's) on the big side's join
    key, ceil'd and capped — the same statistic the registered
    `stats_join_skew_advisor` query reports per key, reduced to the
    single knob `salted_join` takes. Returns 1 (don't salt) when no
    key exceeds ``hot_factor``.

    Cost: one grouped count over the key column (map-side partials)
    and a 2-number collect — measure before you shuffle.

    NULL join keys are excluded from the profile: an inner equi-join
    prunes them below the exchange (Spark inserts IsNotNull), so a
    NULL-heavy nullable key must not drive salt advice for a shuffle
    those rows never reach.
    """
    import math

    keyed = big
    for c in on:
        keyed = keyed.filter(F.col(c).isNotNull())
    row = (
        keyed.groupBy(*[F.col(c) for c in on])
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("mx"), F.avg("c").alias("mean"))
        .collect()[0]
    )
    if row["mx"] is None or not row["mean"]:
        return 1
    skew = row["mx"] / row["mean"]
    if skew <= hot_factor:
        return 1
    return min(max_salt, math.ceil(skew))


def auto_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    hot_factor: float = 2.0,
    max_salt: int = 64,
    salt_on: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """`salted_join` with the salt chosen by `advise_salt` — the
    advisor feeding the mitigation, composed. A uniform key
    distribution joins plain (no exploded small side, no extra
    columns); a skewed one salts at the derived width. The result
    set is the plain join's either way."""
    # Validate up front, not only when skew is detected — otherwise
    # how='full' succeeds on uniform data and raises on skewed data
    # (data-dependent API behavior).
    if how not in ("inner", "left"):
        raise ValueError(
            "auto_salted_join supports how='inner'|'left' (the salted "
            f"small side replicates rows under {how!r} semantics)"
        )
    n = advise_salt(big.select(*on), on, hot_factor, max_salt)
    if n <= 1:
        return big.join(small, on, how)
    return salted_join(
        big, small, on, n_salt=n, salt_on=salt_on, how=how
    )
