"""Streaming distribution-drift monitor: per-window PSI against a
broadcast reference histogram.

The streaming twin of the batch ``stats_psi_value_drift`` query
(queries/pending_r11.py) — same decile-edge construction, same 1e-4
zero-proportion floor, same contribution formula — restated for
Structured Streaming's single-aggregation constraint: per-bin counts
become CONDITIONAL aggregates inside one ``groupBy(window)`` (ten
``sum(when(bin == b, 1))`` columns), so the whole monitor is one
streaming aggregation with watermark-bounded state, valid in append
mode. A second aggregation layer (the batch query's whole-frame
window over the bin frame) would be rejected by the engine.

Reference edges and shares are computed BATCH-side from a frozen
reference corpus and enter the streaming plan as literals — the
stream never joins, never holds more state than (windows in the
watermark horizon) x (n_bins + 2) longs.

At 100 TB/day this is the shape you want: map-side partial conditional
counts per executor, one shuffle on the window key, state eviction by
watermark; the PSI arithmetic runs on one bounded row per window.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_N_BINS = 10
PSI_FLOOR = 1e-4  # standard zero-proportion floor (matches the batch query)


def _bin_expr(edges: list[float], value_col: str):
    """Bin assignment shared by the reference-share builder and the
    monitor — ONE definition so the two sides can never bin
    differently: 1 + count of edges strictly below the 4dp-rounded
    value (the batch PSI query's integer-exact rule)."""
    return sum(
        (F.round(F.col(value_col), 4) > F.lit(c)).cast("int")
        for c in edges
    ) + F.lit(1)


def reference_decile_edges(
    ref: DataFrame, value_col: str = "value", n_bins: int = PSI_N_BINS
) -> list[float]:
    """Bin edges from the reference distribution: percentile_disc over
    4dp-rounded values — the verified engine-parity construction the
    batch PSI query uses (disc percentiles of rounded values, never
    interpolated). Returns n_bins - 1 internal edges."""
    qs = [i / n_bins for i in range(1, n_bins)]
    row = ref.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP "
                f"(ORDER BY round({value_col}, 4))"
            ).alias(f"e{i}")
            for i, q in enumerate(qs)
        ]
    ).first()
    edges = [row[i] for i in range(len(qs))]
    if any(e is None for e in edges):
        raise ValueError(
            f"reference frame has no non-NULL '{value_col}' values — "
            "percentile edges are undefined (an all-None edge list "
            "would silently build a broken bin expression)"
        )
    return edges


def reference_bin_shares(
    ref: DataFrame, edges: list[float], value_col: str = "value"
) -> list[float]:
    """Reference proportion per bin (len(edges) + 1 entries). With
    deciles of the same corpus these are ~1/n_bins, but ties on the
    disc edges skew them — compute, don't assume."""
    n_bins = len(edges) + 1
    counts = {
        r["bin"]: r["n"]
        for r in ref.filter(F.col(value_col).isNotNull())
        .select(_bin_expr(edges, value_col).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    if total == 0:
        raise ValueError(
            f"reference frame has no non-NULL '{value_col}' values — "
            "bin shares are undefined"
        )
    return [counts.get(b, 0) / total for b in range(1, n_bins + 1)]


def streaming_psi_monitor(
    events: DataFrame,
    edges: list[float],
    ref_shares: list[float],
    window_duration: str = "6 hours",
    watermark: str = "2 hours",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-window PSI of ``value_col`` against the reference
    histogram: one row per closed event-time window with the event
    count and the drift score (PSI < 0.1 stable, > 0.25 shifted).

    NULL values are excluded before windowing: the monitor scores the
    NON-NULL value distribution, so ``n`` always equals the sum of
    the bin counts (a window's nulls inflating ``n`` while landing in
    no bin would deflate every share and fire spurious drift alarms).
    A null-RATE monitor is a separate, simpler windowed aggregate.

    Returns an UNSTARTED streaming frame (append-mode-valid: ONE
    aggregation, watermark-bounded state); also runs verbatim on a
    batch frame (``withWatermark`` is a no-op there), which is how the
    parity test pins streaming == batch on the same files."""
    n_bins = len(edges) + 1
    if len(ref_shares) != n_bins:
        raise ValueError(
            f"ref_shares must have {n_bins} entries, got {len(ref_shares)}"
        )
    per_window = (
        events.filter(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(F.col(ts_col), _bin_expr(edges, value_col).alias("bin"))
        .groupBy(F.window(ts_col, window_duration))
        .agg(
            F.count("*").alias("n"),
            *[
                F.sum((F.col("bin") == b).cast("long")).alias(f"c{b}")
                for b in range(1, n_bins + 1)
            ],
        )
    )
    def _contrib(b: int):
        pc = F.greatest(F.col(f"c{b}") / F.col("n"), F.lit(PSI_FLOOR))
        pr = F.lit(max(ref_shares[b - 1], PSI_FLOOR))
        return (pc - pr) * F.log(pc / pr)

    psi = sum(_contrib(b) for b in range(1, n_bins + 1))
    return per_window.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n",
        F.round(psi, 6).alias("psi"),
    )


CUSUM_OUT_SCHEMA = (
    "key string, n_seen long, s_pos double, s_neg double, "
    "n_alarms long"
)


def streaming_cusum_monitor(
    events: DataFrame,
    mu0: float,
    k: float,
    h: float,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key SEQUENTIAL tabular CUSUM (Page 1954): s_pos_t =
    max(0, s_pos_{t-1} + (x_t - mu0 - k)), s_neg_t = max(0,
    s_neg_{t-1} + (mu0 - k - x_t)); when either side crosses ``h``
    the alarm count increments and BOTH sides reset (the textbook
    restart). The stateful companion to the windowed PSI monitor:
    PSI scores each closed window against a reference histogram,
    CUSUM reacts mid-window to a sustained mean shift — the two
    cover the drift-detection split the batch family states offline
    (events_cusum_changepoint is the offline global-mean form; this
    is its causal fixed-reference twin, parameters frozen from a
    reference corpus like the PSI edges).

    Ordering contract: rows are processed in EVENT-TIME order within
    each microbatch (sorted per group) but in ARRIVAL order across
    batches — a straggler updates the statistic late. That is the
    sequential-monitoring reality; the batch query over the settled
    corpus is the after-the-fact audit.

    Scale shape: state is three numbers per key in the executor
    state store; each batch shuffles only its own rows on the key.
    NULL values are excluded (the PSI monitor's rule). Unstarted
    streaming frame; requires outputMode('update') — streaming only
    (applyInPandasWithState has no batch form; the batch-side check
    is the ``cusum_replay`` python model over the same arrivals)."""
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = CUSUM_OUT_SCHEMA
    state_schema = "n long, s_pos double, s_neg double, n_alarms long"

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd  # noqa: PLC0415

        n, s_pos, s_neg, n_alarms = (
            state.get if state.exists else (0, 0.0, 0.0, 0)
        )
        # Materialize the whole microbatch for this key before
        # sorting: Arrow delivers a key's rows as MULTIPLE chunks once
        # they exceed the batch size, and sorting each chunk
        # independently would make the recurrence (and the pinned
        # engine == cusum_replay equivalence) chunk-boundary-dependent.
        # State is 3 numbers regardless; only the in-flight microbatch
        # is held, which the state-store executor already buffers.
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(ts_col, kind="stable")
        for x in batch[value_col]:
            if pd.isna(x):
                continue
            n += 1
            s_pos = max(0.0, s_pos + (float(x) - mu0 - k))
            s_neg = max(0.0, s_neg + (mu0 - k - float(x)))
            if s_pos > h or s_neg > h:
                n_alarms += 1
                s_pos = s_neg = 0.0
        state.update((n, s_pos, s_neg, n_alarms))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n],
                "s_pos": [round(s_pos, 6)],
                "s_neg": [round(s_neg, 6)],
                "n_alarms": [n_alarms],
            }
        )

    return (
        events.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col),
            F.col(value_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


MG_OUT_SCHEMA = (
    "key string, hitter long, est_count long, rank int, n_seen long"
)


def streaming_heavy_hitters_monitor(
    events: DataFrame,
    k: int = 8,
    key_col: str = "event_type",
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key streaming heavy hitters via Misra-Gries (1982): at
    most ``k`` (id, count) counters per key; a new id consumes a free
    counter, otherwise EVERY counter decrements (the summary's
    guarantee: any id with true frequency > n/(k+1) survives, and
    est_count underestimates by at most n/(k+1)). The categorical leg
    of the drift-monitor family — PSI watches a value distribution,
    CUSUM a mean, this the identity mass (which users/domains/mirrors
    suddenly dominate a feed).

    Rows process in EVENT-TIME order within each microbatch (whole
    batch concatenated before sorting — the CUSUM chunk rule) and
    arrival order across batches. Emits the surviving counters each
    batch, ranked by (est_count desc, id); ids tie-broken
    deterministically throughout, so engine == python replay exactly.

    Scale shape: state is <= k pairs per key in the state store (two
    long arrays); each batch shuffles only its own rows on the key.
    Unstarted streaming frame; outputMode('update'); the batch-side
    check is ``mg_replay`` over the same arrivals."""
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    out_schema = MG_OUT_SCHEMA
    state_schema = (
        "ids array<long>, counts array<long>, n_seen long"
    )

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd  # noqa: PLC0415

        if state.exists:
            ids, counts, n_seen = state.get
            ctr = dict(zip(ids, counts))
        else:
            ctr, n_seen = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(ts_col, kind="stable")
        for v in batch[id_col]:
            if pd.isna(v):
                continue
            v = int(v)
            n_seen += 1
            if v in ctr:
                ctr[v] += 1
            elif len(ctr) < k:
                ctr[v] = 1
            else:
                for c in list(ctr):
                    ctr[c] -= 1
                    if ctr[c] == 0:
                        del ctr[c]
        state.update(
            (list(ctr.keys()), list(ctr.values()), n_seen)
        )
        ranked = sorted(ctr.items(), key=lambda iv: (-iv[1], iv[0]))
        if not ranked:
            # an all-decremented summary is a real, observable state
            # ("no id holds > n/(k+1) mass right now") — emit ONE
            # sentinel row (NULL hitter, rank 0) so update-mode
            # consumers see the transition instead of silence
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "hitter": pd.array([None], dtype="Int64"),
                    "est_count": [0],
                    "rank": [0],
                    "n_seen": [n_seen],
                }
            )
            return
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(ranked),
                "hitter": [i for i, _ in ranked],
                "est_count": [c for _, c in ranked],
                "rank": list(range(1, len(ranked) + 1)),
                "n_seen": [n_seen] * len(ranked),
            }
        )

    return (
        events.filter(F.col(id_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col),
            F.col(id_col).cast("long").alias(id_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def mg_replay(ids: list[int], k: int) -> tuple[dict, int]:
    """Plain-python Misra-Gries replay over one key's id sequence —
    the model the tests compare the engine's final counters against.
    Returns ({id: est_count}, n_seen)."""
    ctr: dict = {}
    n = 0
    for v in ids:
        n += 1
        if v in ctr:
            ctr[v] += 1
        elif len(ctr) < k:
            ctr[v] = 1
        else:
            for c in list(ctr):
                ctr[c] -= 1
                if ctr[c] == 0:
                    del ctr[c]
    return ctr, n


def cusum_replay(
    values: list[float], mu0: float, k: float, h: float
) -> tuple[int, float, float, int]:
    """Plain-python replay of the monitor's recurrence over one
    key's value sequence — the model the tests compare the engine's
    final state row against."""
    n, s_pos, s_neg, n_alarms = 0, 0.0, 0.0, 0
    for x in values:
        n += 1
        s_pos = max(0.0, s_pos + (x - mu0 - k))
        s_neg = max(0.0, s_neg + (mu0 - k - x))
        if s_pos > h or s_neg > h:
            n_alarms += 1
            s_pos = s_neg = 0.0
    return n, s_pos, s_neg, n_alarms


def psi_of_shares(cur: list[float], ref: list[float]) -> float:
    """Plain-python PSI over two share vectors — the oracle the tests
    compare both engines' output against."""
    s = 0.0
    for pc, pr in zip(cur, ref):
        pc = max(pc, PSI_FLOOR)
        pr = max(pr, PSI_FLOOR)
        s += (pc - pr) * math.log(pc / pr)
    return s


# ---------------------------------------------------------------------------
# Streaming HyperLogLog cardinality monitor
# ---------------------------------------------------------------------------

HLL_OUT_SCHEMA = (
    "key string, estimate double, n_seen long, n_zero_regs long, "
    "n_regs long"
)


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_hash64(v: int) -> int:
    """Deterministic 64-bit hash of an id — md5 of the decimal string
    (the same derivation the md5-based query family uses), identical
    in the engine and the python replay by construction."""
    import hashlib  # noqa: PLC0415

    return int.from_bytes(
        hashlib.md5(str(int(v)).encode()).digest()[:8], "big"
    )


def _hll_add(regs: list[int], v: int, p: int) -> None:
    h = _hll_hash64(v)
    idx = h & ((1 << p) - 1)
    w = h >> p
    rho = (64 - p) - w.bit_length() + 1
    if rho > regs[idx]:
        regs[idx] = rho


def hll_estimate(regs: list[int]) -> tuple[float, int]:
    """(estimate, n_zero_registers) from an HLL register vector —
    Flajolet et al. 2007 with the small-range linear-counting
    correction (the 64-bit hash makes the large-range correction
    unnecessary)."""
    m = len(regs)
    inv = sum(2.0 ** -r for r in regs)
    e = _hll_alpha(m) * m * m / inv
    zeros = sum(1 for r in regs if r == 0)
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return e, zeros


def streaming_hll_cardinality_monitor(
    events: DataFrame,
    p: int = 10,
    key_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Per-key streaming DISTINCT-COUNT monitor via HyperLogLog
    (Flajolet-Fuks-Gandouet-Meunier 2007): 2^p one-byte-ish registers
    of state per key, relative error ~1.04/sqrt(2^p) (3.2% at p=10).
    The cardinality leg of the drift-monitor family — PSI watches a
    value distribution, CUSUM a mean, Misra-Gries the identity mass,
    this the number of distinct identities (a crawler feed whose
    distinct-domain count collapses is recycling; one whose distinct
    user count explodes is being flooded).

    Register max-merge is COMMUTATIVE, so unlike the CUSUM/MG
    monitors no in-batch event-time sort is needed — any arrival
    order yields the same registers, and engine == python replay is
    exact by construction (both call the same _hll_add/hll_estimate).

    Emits one row per key per batch: the current estimate (4dp),
    exact n_seen, and the zero-register count (the linear-counting
    regime indicator). Scale shape: state is one 2^p-int array per
    key; each batch shuffles only its own rows on the key; the
    estimate is O(m) driver-free arithmetic inside the state
    function."""
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd  # noqa: PLC0415

        if state.exists:
            regs_t, n_seen = state.get
            regs = list(regs_t)
        else:
            regs, n_seen = [0] * m, 0
        for pdf in pdfs:
            for v in pdf[id_col]:
                if pd.isna(v):
                    continue
                _hll_add(regs, int(v), p)
                n_seen += 1
        state.update((regs, n_seen))
        est, zeros = hll_estimate(regs)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "estimate": [round(est, 4)],
                "n_seen": [n_seen],
                "n_zero_regs": [zeros],
                "n_regs": [m],
            }
        )

    return (
        events.filter(F.col(id_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(id_col).cast("long").alias(id_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=HLL_OUT_SCHEMA,
            stateStructType="regs array<integer>, n_seen long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def hll_replay(ids: list[int], p: int) -> tuple[float, int, int]:
    """Plain-python replay of the monitor over one key's id sequence
    (order-irrelevant): (estimate, n_seen, n_zero_regs) — the model
    the tests compare the engine's final row against, sharing
    _hll_add/hll_estimate with the engine so agreement is exact."""
    regs = [0] * (1 << p)
    n = 0
    for v in ids:
        _hll_add(regs, int(v), p)
        n += 1
    est, zeros = hll_estimate(regs)
    return round(est, 4), n, zeros


# ---------------------------------------------------------------------------
# Streaming quantile monitor (deterministic bottom-K reservoir)
# ---------------------------------------------------------------------------

QUANTILE_OUT_SCHEMA = (
    "key string, n_seen long, sample_n long, "
    "q50 double, q90 double, q99 double"
)


def _q_priority(event_id: int) -> int:
    """Deterministic md5 priority for the streaming reservoir — the
    same CONSTRUCTION as functions/reservoir.bottomk_sample (md5 of
    a salted id, bottom-K by priority; this salt is 'q:' and the
    batch sampler's is 'rs:', so the two select different — equally
    uniform — K-subsets). Merge = take K smallest priorities,
    order-independent and restart-idempotent."""
    import hashlib  # noqa: PLC0415

    return int(
        hashlib.md5(f"q:{int(event_id)}".encode()).hexdigest()[:8], 16
    )


def _disc_quantile(sorted_vals: list[float], p: float) -> float:
    """percentile_disc: smallest value with cumulative share >= p."""
    import math  # noqa: PLC0415

    n = len(sorted_vals)
    return sorted_vals[max(math.ceil(p * n) - 1, 0)]


def streaming_quantile_monitor(
    events: DataFrame,
    k: int = 256,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key streaming quantile monitor (p50/p90/p99 of the value
    distribution) over a DETERMINISTIC bottom-K reservoir: each row's
    priority is md5 of its unique id, the state keeps the K smallest
    (priority, id, value) triples KEYED BY ID — a uniform
    without-replacement K-sample whose membership is a pure function
    of the SET of ids seen: a redelivered/duplicate event_id can
    never occupy two slots (an in-reservoir duplicate dedupes
    against the id key; a duplicate of an already-EVICTED id
    re-sorts above the kth priority — which only ever decreases —
    and truncates straight back out). Merges are therefore
    order-independent and restart-idempotent for sample membership
    and quantiles. ``n_seen`` counts first deliveries: a duplicate
    of an id still in the reservoir is detected and NOT recounted;
    a duplicate of an evicted id is indistinguishable from a new id
    under bounded state and over-counts by one (the documented
    at-least-once caveat — exact unique counting is the HLL
    monitor's job). Engine == python replay is EXACT (the batch
    functions/reservoir.bottomk_sample construction lifted into
    applyInPandasWithState). Quantiles are percentile_disc over the
    sample (error O(1/sqrt(K)) — k=256 gives ~6% rank error at p50,
    tighter in the tails than nothing and honest about being a
    sample; swap k up for precision, state is 3*k scalars per key).
    The quantile leg beside the drift quartet: PSI = distribution
    shape, CUSUM = mean, MG = identity mass, HLL = cardinality, this
    = tail latency/value percentiles.

    NULL values and NULL ids are excluded. Emits one row per key per
    batch."""
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd  # noqa: PLC0415

        if state.exists:
            prios, ids, vals, n_seen = state.get
            by_id = {
                i: (p, i, v) for p, i, v in zip(prios, ids, vals)
            }
        else:
            by_id, n_seen = {}, 0
        for pdf in pdfs:
            for eid, v in zip(pdf[id_col], pdf[value_col]):
                if pd.isna(eid) or pd.isna(v):
                    continue
                i = int(eid)
                if i in by_id:
                    # redelivered id: one slot per id, first
                    # delivery wins, n_seen not recounted
                    continue
                n_seen += 1
                by_id[i] = (_q_priority(i), i, float(v))
        triples = sorted(by_id.values())[:k]
        state.update(
            (
                [p for p, _, _ in triples],
                [i for _, i, _ in triples],
                [v for _, _, v in triples],
                n_seen,
            )
        )
        sv = sorted(v for _, _, v in triples)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n_seen],
                "sample_n": [len(sv)],
                "q50": [_disc_quantile(sv, 0.5)],
                "q90": [_disc_quantile(sv, 0.9)],
                "q99": [_disc_quantile(sv, 0.99)],
            }
        )

    return (
        events.filter(
            F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(id_col).cast("long").alias(id_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=QUANTILE_OUT_SCHEMA,
            stateStructType=(
                "prios array<long>, ids array<long>, "
                "vals array<double>, n_seen long"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def quantile_replay(
    rows: list[tuple[int, float]], k: int
) -> tuple[int, int, float, float, float]:
    """Plain-python replay over one key's (id, value) rows — exact
    model of the monitor's final row (shared _q_priority /
    _disc_quantile). Mirrors the reservoir's id-keyed dedupe:
    first delivery of an id wins, duplicates don't occupy slots."""
    by_id: dict = {}
    for i, v in rows:
        if i not in by_id:
            by_id[i] = (_q_priority(i), i, float(v))
    triples = sorted(by_id.values())[:k]
    sv = sorted(v for _, _, v in triples)
    return (
        len(by_id),
        len(sv),
        _disc_quantile(sv, 0.5),
        _disc_quantile(sv, 0.9),
        _disc_quantile(sv, 0.99),
    )
