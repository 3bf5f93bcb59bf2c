"""Golden-parity tests against the reference's committed outputs.

The reference ships no tests (tests/.gitkeep only); its committed CSVs
are the end-to-end oracles (SURVEY.md §5):

- data/processed/clean_va_price.csv — 1188 fact rows incl. the
  duplicate-key fanout and footnote-marker names.
- data/processed/resilience_metrics.csv — 93 rows, full-precision
  floats, NULLs as empty fields.
"""

from __future__ import annotations

import csv
import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_2025_spark.io import read_csv, with_row_order
from cdc_2025_spark.reference import (
    clean_merge,
    pivot_wide,
    resilience_metrics,
    shock_simulation,
    top_k_fastest_recovery,
    top_k_worst_hit,
    trend_forecast,
)
from cdc_2025_spark.schemas import CLEAN_VA_PRICE

from tests.conftest import REFERENCE_DATA

FACT_CSV = os.path.join(REFERENCE_DATA, "clean_va_price.csv")
METRICS_CSV = os.path.join(REFERENCE_DATA, "resilience_metrics.csv")


def load_golden_metrics() -> dict[str, tuple[float | None, float | None]]:
    out = {}
    with open(METRICS_CSV, newline="") as f:
        for row in csv.DictReader(f):
            dd = float(row["Drawdown_2020"]) if row["Drawdown_2020"] else None
            rec = float(row["Recovered_Years"]) if row["Recovered_Years"] else None
            out[row["Industry"]] = (dd, rec)
    return out


def reference_algorithm_metrics() -> dict[str, tuple[float | None, float | None]]:
    """Execute the reference's exact algorithm (resilience.py:29-76) in
    pandas on the committed fact table.

    This — not the committed resilience_metrics.csv — is the
    authoritative oracle: rerunning the reference's own code on its own
    committed fact table disagrees with its committed metrics CSV for
    exactly the 2 duplicate-key industries ('General government',
    'Government enterprises'), so the committed mart is a stale
    artifact generated from an earlier row ordering of the fact file.
    test_resilience_metrics_golden additionally pins the other 91
    industries directly to the committed CSV.
    """
    import pandas as pd  # noqa: PLC0415

    df = pd.read_csv(FACT_CSV)
    out: dict[str, tuple[float | None, float | None]] = {}
    for industry, g in df.groupby("Industry"):
        g = g.sort_values("Year")
        v19s = g.loc[g["Year"] == 2019, "Real_Value"].values
        if len(v19s) == 0:
            continue
        v19 = v19s[0]
        v20s = g.loc[g["Year"] == 2020, "Real_Value"].values
        # np.errstate: a zero 2019 base yields inf/nan by design
        # (matches the reference's pandas arithmetic); silenced so
        # real warnings in the suite stay visible
        with np.errstate(divide="ignore", invalid="ignore"):
            dd = (v20s[0] - v19) / v19 if len(v20s) else None
        rec = None
        for y in (2020, 2021, 2022, 2023):
            vals = g.loc[g["Year"] == y, "Real_Value"].values
            if len(vals) > 0 and vals[0] >= v19:
                rec = float(y - 2019)
                break
        out[industry] = (dd, rec)
    return out


@pytest.fixture(scope="module")
def fact(spark):
    df = read_csv(spark, FACT_CSV, schema=CLEAN_VA_PRICE)
    return with_row_order(df).cache()


def approx_eq(a, b, tol=1e-9):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if math.isnan(a) and math.isnan(b):
        return True
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)


def test_fact_table_shape(fact):
    # 1188 rows, 99/year x 12 years, 93 distinct industry strings — the
    # blank-leading-lines CSV quirk and the duplicate-key fanout both
    # visible here (SURVEY.md §1.4).
    assert fact.count() == 1188
    assert fact.select("Industry").distinct().count() == 93
    per_year = fact.groupBy("Year").count().collect()
    assert len(per_year) == 12
    assert all(r["count"] == 99 for r in per_year)


DUP_KEY_INDUSTRIES = {
    "            General government",
    "            Government enterprises",
}


def test_resilience_metrics_golden(fact):
    got = {
        r["Industry"]: (r["Drawdown_2020"], r["Recovered_Years"])
        for r in resilience_metrics(fact).collect()
    }
    want = reference_algorithm_metrics()
    assert set(got) == set(want)
    for industry, (dd, rec) in want.items():
        gdd, grec = got[industry]
        assert approx_eq(gdd, dd), (industry, gdd, dd)
        assert approx_eq(
            None if grec is None else float(grec), rec
        ), (industry, grec, rec)

    # The committed mart CSV is additionally pinned for every industry
    # except the two duplicate-key ones where it is self-inconsistent
    # (see reference_algorithm_metrics docstring). NaN drawdowns are
    # written as empty fields by pandas.to_csv, so golden None matches
    # a computed NaN there.
    golden = load_golden_metrics()
    assert set(golden) == set(got)
    for industry, (dd, rec) in golden.items():
        if industry in DUP_KEY_INDUSTRIES:
            continue
        gdd, grec = got[industry]
        if dd is None and gdd is not None and math.isnan(gdd):
            gdd = None
        assert approx_eq(gdd, dd), (industry, gdd, dd)
        assert approx_eq(
            None if grec is None else float(grec), rec
        ), (industry, grec, rec)


def test_top_k_views_golden(fact):
    """Replicates streamlit_app.py:18,22-26 on the golden metrics."""
    metrics = resilience_metrics(fact)
    worst = [r["Industry"] for r in top_k_worst_hit(metrics).collect()]
    oracle = reference_algorithm_metrics()
    want_worst = [
        k
        for k, _ in sorted(
            (
                (k, v[0])
                for k, v in oracle.items()
                if v[0] is not None and not math.isnan(v[0])
            ),
            key=lambda kv: kv[1],
        )[:10]
    ]
    assert set(worst) == set(want_worst)

    fastest = top_k_fastest_recovery(metrics).collect()
    assert len(fastest) == 10
    assert all(r["Recovered_Years"] is not None for r in fastest)
    got_years = [r["Recovered_Years"] for r in fastest]
    want_years = sorted(
        v[1] for v in oracle.values() if v[1] is not None
    )[:10]
    assert [float(y) for y in got_years] == want_years


def test_grouped_map_agrees_with_aggregate_form(spark, fact):
    """The applyInPandas fallback must produce identical metrics to
    the conditional-aggregate form on the real reference fact table
    (duplicate keys, missing years, inf/NaN zero-base branches)."""
    import math

    from cdc_2025_spark.reference.resilience import (
        resilience_metrics,
        resilience_metrics_grouped_map,
    )

    agg = {
        r["Industry"]: (r["Drawdown_2020"], r["Recovered_Years"])
        for r in resilience_metrics(fact).collect()
    }
    gm = {
        r["Industry"]: (r["Drawdown_2020"], r["Recovered_Years"])
        for r in resilience_metrics_grouped_map(fact).collect()
    }
    assert set(agg) == set(gm)
    for k, (dd_a, rec_a) in agg.items():
        dd_g, rec_g = gm[k]
        if dd_a is None or dd_g is None:
            assert dd_a is None and dd_g is None, k
        elif math.isnan(dd_a) or math.isnan(dd_g):
            assert math.isnan(dd_a) and math.isnan(dd_g), k
        else:
            assert math.isclose(dd_a, dd_g, rel_tol=1e-12), k
        assert (rec_a is None) == (rec_g is None), k
        if rec_a is not None:
            assert float(rec_a) == float(rec_g), k


def test_clean_merge_roundtrip(spark, fact):
    """Rebuild long nominal/price inputs from the golden fact table and
    re-run the merge+derive pipeline; the output must equal the golden
    fact multiset exactly — including the 2x2 duplicate-name fanout
    (nb:1098) and Real_Value derivation (nb:1104).

    Reconstruction uses the merge-order block structure: a k-row
    (Industry, Year) block came from sqrt(k) nominal rows x sqrt(k)
    price rows, ordered nominal-major (pandas many-to-many merge order)
    — distinct() alone would collapse the 2017 base year where both
    branches share Price_Index == 100.000 exactly.
    """
    import pandas as pd  # noqa: PLC0415

    pdf = pd.read_csv(FACT_CSV)
    nom_rows, price_rows = [], []
    for (ind, yr), g in pdf.groupby(["Industry", "Year"], sort=False):
        k = len(g)
        m = int(round(k**0.5))
        assert m * m == k, (ind, yr, k)
        rows = g.reset_index(drop=True)
        for i in range(m):
            nom_rows.append((ind, str(yr), float(rows.loc[i * m, "Nominal_Value"])))
            price_rows.append((ind, str(yr), float(rows.loc[i, "Price_Index"])))
    nominal = spark.createDataFrame(
        nom_rows, "Industry string, Year string, Nominal_Value double"
    )
    price = spark.createDataFrame(
        price_rows, "Industry string, Year string, Price_Index double"
    )
    rebuilt = clean_merge(nominal, price)
    assert rebuilt.count() == 1188
    # Exact multiset equality on the join structure (fanout included);
    # Real_Value compared with tolerance because the golden CSV stores
    # it at 10 significant digits.
    keys = ["Industry", "Year", "Nominal_Value", "Price_Index"]
    assert rebuilt.select(keys).exceptAll(fact.select(keys)).count() == 0
    assert fact.select(keys).exceptAll(rebuilt.select(keys)).count() == 0
    agg = lambda df: {  # noqa: E731
        (r["Industry"], r["Year"]): r["s"]
        for r in df.groupBy("Industry", "Year")
        .agg(F.sum("Real_Value").alias("s"))
        .collect()
    }
    got, want = agg(rebuilt), agg(fact)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-8, abs_tol=1e-6), (
            k,
            got[k],
            want[k],
        )


def test_pivot_wide_mean_collapse(fact):
    """pandas pivot_table averages duplicate keys (nb:1591); pivot_wide
    must do the same, yielding 93 rows x (1 + 12 years)."""
    wide = pivot_wide(fact)
    assert wide.count() == 93
    assert len(wide.columns) == 13
    row = wide.filter(F.col("Industry") == "Space economy1").collect()[0]
    got = row["2012"]
    want = 110992 * 100.0 / 108.853
    assert math.isclose(got, want, rel_tol=1e-9)


def test_shock_simulation(fact):
    """A 100% shock at 2021 forces every industry's 2021 value to 0:
    drawdown -1.0 everywhere a 2020 base exists and 2021 never >= base
    (base > 0)."""
    sim = shock_simulation(fact, shock_pct=1.0, shock_year=2021).collect()
    assert len(sim) > 0
    for r in sim:
        dd = r["Drawdown_2020"]
        if dd is not None and not math.isnan(dd):
            # zero-base industries yield nan (pandas parity); all others
            # must show a full -100% drawdown
            assert math.isclose(dd, -1.0, abs_tol=1e-12), r


def test_trend_forecast(fact):
    fc = trend_forecast(fact, through_year=2026)
    rows = fc.filter(F.col("Industry") == "Space economy1").orderBy("Year").collect()
    assert [r["Year"] for r in rows] == [2024, 2025, 2026]
    assert all(r["forecast_value"] is not None for r in rows)
