"""S7 serving sink: the static HTML report must render exactly the
three views streamlit_app.py serves (full metrics, top-10 worst hit,
top-10 fastest recovery) with pandas-parity ordering, plus the
missing-metrics warning branch — golden-checked against a pandas
replay of the app's own view code on the reference data."""

from __future__ import annotations

import os
import re

import pandas as pd
import pytest

from cdc_2025_spark.io import read_csv, with_row_order
from cdc_2025_spark.reference.resilience import resilience_metrics
from cdc_2025_spark.report import (
    WARNING_TEXT,
    resilience_report_html,
    write_resilience_report,
)
from cdc_2025_spark.schemas import CLEAN_VA_PRICE

from tests.conftest import REFERENCE_DATA

FACT_CSV = os.path.join(REFERENCE_DATA, "clean_va_price.csv")


@pytest.fixture(scope="module")
def metrics(spark):
    fact = with_row_order(
        read_csv(spark, FACT_CSV, schema=CLEAN_VA_PRICE)
    )
    return resilience_metrics(fact).cache()


def _first_cells(section_html: str) -> list[str]:
    """The first column of each body row of the FIRST table in the
    section fragment."""
    table = section_html.split("</table>")[0]
    body = table.split("<tbody>")[1]
    return re.findall(r"<tr><td>(.*?)</td>", body)


def test_report_renders_the_apps_three_views(metrics):
    html_out = resilience_report_html(metrics)
    assert "Resilience Metrics (full dataset)" in html_out
    assert "Top 10 Worst Hit in 2020" in html_out
    assert "Fastest to Recover" in html_out

    pdf = metrics.toPandas()
    # the app: df.sort_values("Drawdown_2020").head(10) — NaN last
    worst = pdf.sort_values("Drawdown_2020").head(10)
    sec = html_out.split("Top 10 Worst Hit in 2020</h2>")[1]
    got = _first_cells(sec)
    want = [str(x) for x in worst.iloc[:, 0]]
    assert got == want
    # the app: dropna + sort_values("Recovered_Years").head(10)
    fastest = (
        pdf.dropna(subset=["Recovered_Years"])
        .sort_values("Recovered_Years", kind="stable")
        .head(10)
    )
    sec = html_out.split("Fastest to Recover</h2>")[1]
    got = set(_first_cells(sec))
    # ties in Recovered_Years make exact order app-unspecified;
    # compare the SET at the k-boundary group (every tie at the
    # boundary shares the same value, so the top-10 set is only
    # determined up to that tie group — compare values instead)
    rec = {
        r: v
        for r, v in zip(
            fastest.iloc[:, 0], fastest["Recovered_Years"]
        )
    }
    kth = max(rec.values())
    sure = {r for r, v in rec.items() if v < kth}
    assert sure <= got
    assert len(got) == len(rec)


def test_report_escapes_and_nulls(spark):
    df = spark.createDataFrame(
        [("<b>Ind&1</b>", None, 1.0), ("x", -0.5, None)],
        "Industry string, Drawdown_2020 double, Recovered_Years double",
    )
    out = resilience_report_html(df, k=5)
    assert "&lt;b&gt;Ind&amp;1&lt;/b&gt;" in out
    assert "<b>Ind&1</b>" not in out
    # NULLs render as empty cells
    assert "<td></td>" in out


def test_report_warning_branch_and_writer(spark, tmp_path, metrics):
    warn = resilience_report_html(None)
    assert WARNING_TEXT in warn
    assert "<table>" not in warn
    p = str(tmp_path / "report.html")
    write_resilience_report(metrics, p)
    text = open(p, encoding="utf-8").read()
    assert text == resilience_report_html(metrics)
    assert text.startswith("<!doctype html>")
