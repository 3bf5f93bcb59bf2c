"""Round-11 registration queue (drift & corpus-law diagnostics):
every pending query must already pass the exact driver-style oracle
comparison so registration day is a rename, not a debug session —
the test_pending_r10 posture. NOT imported by queries/__init__.py;
pending queries are plain functions."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from cdc_2025_spark.queries import pending_r11
from cdc_2025_spark.schemas import TABLE_NAMES

SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_TEST_SF_DIR", "/root/testdata/sf0.001"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-7, abs_tol=1e-7)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return str(a) == str(b)


@pytest.mark.parametrize("name", pending_r11.PENDING_ORDER)
def test_pending_oracle_match(spark, duck, name):
    fn, oracle = pending_r11._PENDING[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, sr, dr)
        for i, (sr, dr) in enumerate(zip(s_norm, d_norm))
        if not all(_close(a, b) for a, b in zip(sr, dr))
    ][:3]
    assert not mismatches, f"{name}: value mismatches {mismatches}"


@pytest.mark.parametrize("name", pending_r11.PENDING_ORDER)
def test_pending_outputs_driver_sortable(spark, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    fn, _ = pending_r11._PENDING[name]
    df = fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: container columns {bad}"


def test_pending_module_not_registered():
    """Importing pending_r11 must leave the live registry untouched
    (the freshness guard requires new registrations to LEAD a
    verification window — the round-10 window is already composed)."""
    from cdc_2025_spark.queries import QUERIES

    assert not (set(pending_r11.PENDING_ORDER) & set(QUERIES))


def test_statistics_are_nontrivial(spark):
    """The fixtures must make each diagnostic non-degenerate at test
    scale: both KS samples populated with D strictly inside (0, 1);
    every PSI bin populated on the reference side; the CUSUM series
    longer than a week; the Zipf fit negatively sloped with
    meaningful fit quality; the Heaps curve strictly increasing in
    both coordinates."""
    ks = pending_r11.stats_ks_drift_segments(spark, SF_DIR).first()
    assert ks["n_a"] > 0 and ks["n_b"] > 0
    assert 0.0 < ks["ks_d"] < 1.0
    assert 0.0 <= ks["p_value"] <= 1.0

    psi = pending_r11.stats_psi_value_drift(spark, SF_DIR).collect()
    assert len(psi) == pending_r11.PSI_N_BINS
    assert all(r["n_ref"] > 0 for r in psi)
    total_psi = sum(r["psi_contrib"] for r in psi)
    assert total_psi >= 0.0  # PSI is a sum of nonnegative-ish terms

    cu = pending_r11.events_cusum_changepoint(spark, SF_DIR).first()
    assert cu["n_days"] > 7 and cu["max_abs_s"] >= 0.0

    # the synthetic corpus draws from a small near-uniform vocabulary
    # (31 distinct terms at sf0.001), so the Zipf fit is SHALLOW by
    # construction — assert the computation's invariants (negative
    # slope, r2 in range), not natural-text magnitudes
    z = pending_r11.text_zipf_fit(spark, SF_DIR).first()
    assert z["n_ranks"] > 10
    assert z["slope"] < 0.0
    assert 0.0 <= z["r2"] <= 1.0

    h = pending_r11.text_heaps_vocab_growth(spark, SF_DIR).collect()
    h = sorted(h, key=lambda r: r["checkpoint"])
    assert len(h) >= 2
    assert all(
        a["cum_tokens"] < b["cum_tokens"] and a["vocab"] <= b["vocab"]
        for a, b in zip(h, h[1:])
    )

    cal = pending_r11.eval_calibration_bins(spark, SF_DIR).collect()
    assert len(cal) == pending_r11.CALIB_N_BINS
    assert all(r["n"] > 0 for r in cal)
    assert all(r["ece_contrib"] >= 0.0 for r in cal)
    # mean score inside each fixed-width bin must sit inside the bin
    for r in cal:
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0
        assert lo <= r["mean_score"] < hi, r

    sq = pending_r11.embed_sq8_quantization_error(spark, SF_DIR).collect()
    assert len(sq) >= 2  # multiple labels present
    for r in sq:
        # int8 on 64-dim unit-ish vectors: geometry nearly intact
        assert r["avg_cos"] > 0.999, r
        assert r["min_cos"] > 0.99, r
        assert 0.0 < r["max_abs_err"] < 0.05, r


def test_js_divergence_invariants(spark):
    """JS divergence: every source pair present exactly once
    (|S|*(|S|-1)/2 rows), values inside [0, ln 2], and the synthetic
    same-generator sources sit well below the disjoint-vocabulary
    ceiling."""
    import math

    rows = pending_r11.text_js_divergence_sources(spark, SF_DIR).collect()
    srcs = {r["src_a"] for r in rows} | {r["src_b"] for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    assert len({(r["src_a"], r["src_b"]) for r in rows}) == len(rows)
    ln2 = math.log(2.0)
    for r in rows:
        assert 0.0 <= r["js_divergence"] <= ln2 + 1e-9, r
        assert r["n_shared_terms"] > 0, r  # same generator vocabulary
    assert max(r["js_divergence"] for r in rows) < 0.9 * ln2
