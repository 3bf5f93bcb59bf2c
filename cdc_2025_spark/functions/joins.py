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
