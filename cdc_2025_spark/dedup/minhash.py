"""MinHash + LSH banding near-dup detection — the 100 TB dedup path.

Pipeline (all JVM-side, no Python on the executor path):

1. shingle once, hash each shingle to a long (xxhash64) at
   construction — every downstream stage (signatures, verification)
   works on 8-byte keys, never re-touching strings;
2. signatures via explode + 128 codegen'd ``min`` aggregates:
   ``min over shingles of xxhash64(h, seed, i)``. Grouped min-agg
   is whole-stage-codegen'd and partially aggregated map-side,
   unlike higher-order array transforms (interpreted per element);
   the xxhash64-with-index family is ANSI-overflow-free (no modular
   multiply of 61-bit coefficients);
3. LSH banding: the 128 signature columns split into ``n_bands``
   bands of ``r``; the band bucket is a single multi-argument
   ``xxhash64(s_j..s_{j+r-1})`` — no array slicing or string joins.

Why k independent hashes are the DEFAULT and not one-permutation
hashing (OPH, Li et al. NIPS'12 — 1 hash/shingle bucketed into k
bins): OPH wins when set size >> k, but this corpus averages ~50-260
shingles against k=128 — most bins would be EMPTY and the estimate
would ride on densification (Shrivastava ICML'17), i.e. extra
machinery for a regime OPH isn't built for. ``family="oph"``
implements exactly that switch for the long-document regime (typical
|set| several times n_hashes): one xxhash64 per shingle instead of
128, pmod binning, per-bin min, and optimal densification (each
empty bin borrows from an independently hash-chosen random non-empty
bin — the Shrivastava'17 scheme, whose estimator variance matches
fresh minwise hashes as |set|/k grows). The banding and verification
stages are UNCHANGED by the swap; signature-accuracy parity on long
docs is pinned in tests/test_dedup.py. ``family="oph_md5"`` is the
same OPH construction with every hash derived from md5 (shingle
value from the two hex halves, donor choice from md5 of "i_j") so
the ENTIRE pipeline reproduces in DuckDB SQL — the md5_km posture:
oracle-checkable, ~2x the per-shingle hash cost, xxhash64 stays the
scale default.

The hash family is deterministic (fixed seeds), so results are stable
across runs and cluster layouts. With J the true Jaccard,
P[candidate] = 1 - (1 - J^r)^b — 16 bands x 8 rows puts the S-curve
threshold at (1/16)^(1/8) ~ 0.71. This is the textbook MMDS ch.3
construction (public knowledge), re-expressed in Spark aggregates.

Scale: cost is |docs| x n_hashes map-side work + one shuffle of
(band_hash -> id) pairs; bucket sizes are bounded by real duplicate
clusters, and candidate verification (exact Jaccard on the hashed
shingle sets) touches only candidate ids, not the corpus cross
product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_2025_spark.functions.text import shingles


def shingle_sets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    family: str = "xxhash64",
) -> DataFrame:
    """(id, sh) distinct HASHED shingle sets, spread across the
    cluster. Hashing at construction means the shuffle and every set
    operation downstream carries small keys instead of ~k-word strings
    (a 64-bit collision among corpus shingles is ~|shingles|^2 / 2^64
    — negligible against float tolerance).

    Families:
    - ``xxhash64`` (default): array<long> keys — cheapest, JVM-native;
      not reproducible outside Spark.
    - ``md5_km``: array<string> of the first 16 md5 hex chars. ~2x the
      per-shingle hash cost and 16-byte keys, but reproducible in any
      engine with md5 — the two 8-hex halves also seed the
      Kirsch-Mitzenmacher signature family (see _signature_cols), so
      the ENTIRE minhash+LSH pipeline becomes oracle-checkable.
    """
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    if family in ("xxhash64", "oph"):  # oph shares the long-key sets
        hashed = F.transform(shingles(text_col, k), lambda s: F.xxhash64(s))
    elif family in ("md5_km", "oph_md5"):  # both ride the hex keys
        hashed = F.transform(
            shingles(text_col, k), lambda s: F.substring(F.md5(s), 1, 16)
        )
    else:
        raise ValueError(f"unknown minhash family {family!r}")
    return docs.repartition(n_part, id_col).select(
        F.col(id_col).alias("id"),
        F.array_distinct(hashed).alias("sh"),
    )


def _signature_cols(
    n_hashes: int, seed: int, h: str, family: str = "xxhash64"
) -> list:
    """The n_hashes permuted-min aggregate expressions over a hashed
    shingle column ``h``. Built as SQL expression strings: one py4j
    round trip per aggregate instead of ~6 (measurably faster driver
    plan construction for wide signatures).

    Families (any uniform hash family is valid for MinHash, MMDS
    ch.3):
    - ``xxhash64``: ``min(xxhash64(h, seed, i))`` — the per-index
      literal makes each i an independent 64-bit permutation
      surrogate. Unlike an affine ``(a*h + b) mod P`` family, this
      never multiplies two ~2^61 longs, so it is exact under ANSI
      arithmetic (no bigint overflow) and identical with ANSI off.
    - ``md5_km``: Kirsch-Mitzenmacher double hashing over the two
      32-bit md5 halves carried by the hex key ``h``:
      ``min(hi + i*lo)`` (Kirsch & Mitzenmacher, ESA'06 — public
      knowledge; i*lo < 2^39 so every value stays far inside a signed
      long under ANSI). Reproducible in DuckDB SQL, which is the
      point: it makes the LSH candidate set oracle-checkable."""
    if family == "xxhash64":
        return [
            F.expr(f"min(xxhash64({h}, {seed}, {i})) AS _s{i}")
            for i in range(n_hashes)
        ]
    if family == "md5_km":
        hi = f"cast(conv(substring({h}, 1, 8), 16, 10) as bigint)"
        lo = f"cast(conv(substring({h}, 9, 8), 16, 10) as bigint)"
        return [
            F.expr(f"min({hi} + {i} * {lo}) AS _s{i}")
            for i in range(n_hashes)
        ]
    raise ValueError(f"unknown minhash family {family!r}")


def _check_seed(family: str, seed: int) -> None:
    """md5_km signatures min(hi + i*lo) contain no seed term at all —
    a caller varying seed with that family would get byte-identical
    output, which is exactly the kind of silent surprise that corrupts
    an A/B of 'independent' dedup runs. Fail loudly instead."""
    if family in ("md5_km", "oph_md5") and seed != 42:
        raise ValueError(
            f"family={family!r} is seed-free (derived from fixed md5 "
            "halves); varying seed has no effect — use "
            "family='xxhash64'/'oph' for seeded signature families"
        )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 128,
    seed: int = 42,
    sets: DataFrame | None = None,
    family: str = "xxhash64",
) -> DataFrame:
    """(id, signature array<long>[n_hashes]) per document.

    ``seed`` only varies the ``xxhash64`` family; ``md5_km``
    signatures are seed-FREE (min(hi + i*lo) is fully determined by
    the md5 halves), so passing a non-default seed with it raises
    instead of silently returning identical output."""
    _check_seed(family, seed)
    wide = _signature_wide(
        docs, id_col, text_col, k, n_hashes, seed, sets, family
    )
    return wide.select(
        "id", F.array(*[f"_s{i}" for i in range(n_hashes)]).alias("signature")
    )


def _signature_wide(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    n_hashes: int,
    seed: int,
    sets: DataFrame | None = None,
    family: str = "xxhash64",
) -> DataFrame:
    """(id, _s0.._s{n-1}) signature columns: explode the hashed sets
    and run one codegen'd hash-aggregate with n_hashes min buffers —
    partial aggregation happens map-side, so the shuffle carries one
    row per document regardless of shingle count."""
    if sets is None:
        sets = shingle_sets(docs, id_col, text_col, k, family=family)
    ex = sets.select("id", F.explode("sh").alias("h"))
    if family in ("oph", "oph_md5"):
        return _oph_wide(ex, n_hashes, seed, family=family)
    if family == "md5_km":
        # hex -> (hi, lo) ONCE per exploded row, not once per
        # aggregate: 2 conv calls instead of 256
        ex = ex.select(
            "id",
            F.conv(F.substring("h", 1, 8), 16, 10).cast("long").alias("hi"),
            F.conv(F.substring("h", 9, 8), 16, 10).cast("long").alias("lo"),
        )
        aggs = [
            F.expr(f"min(hi + {i} * lo) AS _s{i}") for i in range(n_hashes)
        ]
        return ex.groupBy("id").agg(*aggs)
    return ex.groupBy("id").agg(
        *_signature_cols(n_hashes, seed, "h", family)
    )


def _oph_wide(
    ex: DataFrame, n_hashes: int, seed: int, family: str = "oph"
) -> DataFrame:
    """One-permutation hashing + optimal densification signature
    columns (id, _s0.._s{n-1}) from exploded hashed shingles ``ex``.

    OPH (Li, Owen & Zhang, NIPS'12): ONE seeded rehash per shingle
    (vs n_hashes in the independent family — the whole point for long
    documents), binned by pmod into n_hashes bins, min per bin. The
    per-(id, bin) min aggregate partially aggregates map-side, so the
    shuffle carries ≤ n_hashes rows per doc regardless of shingle
    count.

    Empty bins take OPTIMAL densification (Shrivastava, ICML'17):
    each empty bin i borrows the value of an INDEPENDENTLY chosen
    random non-empty bin — selected here as
    argmin_{j non-empty} hash2(i, j), which picks a uniform random
    non-empty donor per empty bin, deterministically. (The older
    NIPS'14 rotation scheme reuses one donor direction for runs of
    empty bins, correlating them; independent choices are what
    restores fresh-minhash variance.) The densification lambdas are
    interpreted per element, but only run per DOC (not per shingle),
    and in the long-document regime OPH targets, empty bins are rare
    (P[empty] = (1-1/k)^|set| ~ e^-8 at |set|=8k).

    Families: ``oph`` (default) rehashes with seeded xxhash64 — the
    cheapest per-shingle path, Spark-only. ``oph_md5`` derives BOTH
    the shingle value (hi * (2^31 - 1) + lo over the two md5 halves —
    max (2^32-1)*2^31 < 2^63, ANSI-exact) and the donor hash (first
    15 md5 hex chars of "i_j" — 60 bits, BIGINT-positive) from md5,
    so every stage reproduces in DuckDB SQL and the full OPH pipeline
    becomes oracle-checkable (the md5_km posture; seed-free).

    Estimator: P[sig_a[i] == sig_b[i]] -> J for J the true Jaccard;
    accuracy parity vs the independent family on long docs is pinned
    in tests/test_dedup.py. Banding/verification are unchanged —
    buckets hash the same _s{i} longs."""
    kb = F.lit(n_hashes).cast("long")
    # one rehash drives BOTH bin assignment and in-bin order (the
    # "one permutation"); pmod keeps it non-negative
    if family == "oph_md5":
        v = (
            F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
            * F.lit(2147483647)
            + F.conv(F.substring("h", 9, 8), 16, 10).cast("long")
        )

        def _hash2(i, j):
            return F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_", i.cast("string"), j.cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")

    else:
        v = F.xxhash64("h", F.lit(seed))

        def _hash2(i, j):
            return F.xxhash64(i, j, F.lit(seed))
    binned = (
        ex.select("id", v.alias("v"), F.pmod(v, kb).alias("bin"))
        .groupBy("id", "bin")
        .agg(F.min("v").alias("mh"))
    )
    packed = binned.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bin", "mh"))
        ).alias("_m")
    )
    idx = F.sequence(F.lit(0).cast("long"), kb - 1)
    vals = F.transform(idx, lambda i: F.element_at("_m", i))
    packed = packed.select("id", vals.alias("_vals"))
    nonempty = F.filter(idx, lambda j: F.get("_vals", j).isNotNull())
    empty_cnt = F.lit(n_hashes) - F.size(nonempty)
    donor = lambda i: F.get(  # noqa: E731
        F.col("_vals"),
        F.aggregate(
            nonempty,
            F.struct(
                F.lit(2**63 - 1).alias("h"), F.lit(-1).cast("long").alias("j")
            ),
            # strict < keeps the FIRST (lowest-j) donor on a hash tie
            # — nonempty is ascending, so this mirrors ORDER BY h, j
            lambda acc, j: F.when(
                _hash2(i, j) < acc["h"],
                F.struct(_hash2(i, j).alias("h"), j.alias("j")),
            ).otherwise(acc),
        )["j"],
    )
    dens = F.transform(
        idx,
        lambda i: F.coalesce(F.get("_vals", i), donor(i)),
    )
    # skip the densification expression entirely for docs with no
    # empty bins — the common case in the long-doc regime
    sig = F.when(empty_cnt == 0, F.col("_vals")).otherwise(dens)
    packed = packed.select("id", sig.alias("_sig"))
    return packed.select(
        "id", *[F.get("_sig", i).alias(f"_s{i}") for i in range(n_hashes)]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 128,
    n_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard) whose EXACT shingle
    Jaccard >= threshold, found via LSH candidates then verified.

    Verification joins candidates back to exact Jaccard over the
    hashed shingle sets, so precision is 1.0; recall follows the LSH
    S-curve for the (bands, rows) geometry.

    ``seed`` is rejected for the seed-free ``md5_km`` family — see
    minhash_signatures.
    """
    _check_seed(family, seed)
    r = n_hashes // n_bands
    # one shingle-set computation, persisted, feeding signatures AND
    # candidate verification — the expression is the dominant map cost
    sets = shingle_sets(docs, id_col, text_col, k, family=family).persist()
    candidates = lsh_candidates(
        docs, id_col, text_col, k, n_hashes, n_bands, seed, sets, family
    )

    # Verify ONLY the candidate pairs: join their shingle sets back and
    # compute exact Jaccard per pair — work proportional to
    # |candidates|, not |docs|^2 (that full join is what LSH avoids).
    sa = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 128,
    n_bands: int = 16,
    seed: int = 42,
    sets: DataFrame | None = None,
    family: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b) LSH candidate pairs (id_a < id_b, distinct) from
    banded minhash signatures — the candidate stage of
    ``minhash_lsh_pairs``, exposed so estimators that SKIP exact
    verification (b-bit minhashing) can reuse the identical banding.

    Band bucket over the band's signature columns — pure codegen, no
    array materialization. xxhash64 family: one multi-arg xxhash64
    (8-byte buckets — cheapest shuffle). md5_km family: comma-joined
    signature string, which DuckDB's array_to_string reproduces
    byte-for-byte (the oracle needs bucket equality, not the value).
    """
    _check_seed(family, seed)
    r = n_hashes // n_bands
    wide = _signature_wide(
        docs, id_col, text_col, k, n_hashes, seed, sets, family
    )

    def _bucket(j: int):
        cols = [F.col(f"_s{j * r + i}") for i in range(r)]
        if family in ("md5_km", "oph_md5"):
            # comma-joined signature string: DuckDB's array_to_string
            # reproduces it byte-for-byte (the oracle needs bucket
            # equality, not the value)
            return F.concat_ws(",", *cols)
        return F.xxhash64(*cols)

    bands = wide.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _bucket(j).alias("bucket"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")
    # persist: both sides of the bucket self-join read this subplan —
    # without it the whole sets->signatures->banding pipeline executes
    # twice
    bands = bands.persist()

    left = bands.select("band", "bucket", F.col("id").alias("id_a"))
    right = bands.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
