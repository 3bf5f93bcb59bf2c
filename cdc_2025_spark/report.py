"""S7 — the reference's serving layer as an engine-side sink.

``/root/reference/app/streamlit_app.py:1-29`` renders three
interactive views of the resilience metrics (full table, top-10 worst
hit by ``Drawdown_2020``, top-10 fastest to recover) plus a warning
branch when the metrics file is missing. This module is the faithful
static form: the SAME three views with the same titles, ordering
semantics (pandas sorts NaN last on ascending sort — mirrored by the
``asc_nulls_last`` view builders in reference/resilience.py) and
warning branch, rendered as a dependency-free HTML artifact any
static file server can serve.

The one deliberate refinement over the app: pandas' default
``sort_values`` is an UNSTABLE quicksort, so the app's order among
tied drawdowns is implementation-defined — the views here break ties
by the group column, which is deterministic and agrees with the app
whenever ties are absent (golden-tested on the reference data, which
has none).

Deliberately tiny: the serving layer reads engine OUTPUT; everything
expensive already happened upstream. ``df.show()`` remains the
interactive form.
"""

from __future__ import annotations

import html
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8">
<title>{title}</title>
<style>
 body {{ font-family: sans-serif; margin: 2rem; }}
 table {{ border-collapse: collapse; margin-bottom: 2rem; }}
 th, td {{ border: 1px solid #999; padding: 0.3rem 0.7rem;
           text-align: left; }}
 th {{ background: #eee; }}
 .warn {{ color: #a40; font-weight: bold; }}
</style></head><body>
<h1>{title}</h1>
{body}
</body></html>
"""

WARNING_TEXT = (
    "No metrics yet. Run the resilience pipeline first to "
    "generate them."
)


def _cell(v) -> str:
    if v is None:
        return ""
    return html.escape(str(v))


def _table(df: DataFrame) -> str:
    cols = df.columns
    rows = df.collect()
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_cell(v)}</td>" for v in row) + "</tr>"
        for row in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def resilience_report_html(
    metrics: DataFrame | None,
    k: int = 10,
    title: str = "Industry Resilience Explorer",
) -> str:
    """The serving page: streamlit_app.py's three views (or its
    missing-metrics warning when ``metrics`` is None). The full-set
    view renders in a deterministic order (group column) rather than
    the app's file order — the CSV the app reads is itself written in
    that order by the pipeline."""
    if metrics is None:
        return _PAGE.format(
            title=html.escape(title),
            body=f'<p class="warn">{html.escape(WARNING_TEXT)}</p>',
        )
    group_col = metrics.columns[0]
    # the app's views (top_k_worst_hit / top_k_fastest_recovery in
    # reference/resilience.py) leave tied rows at the limit boundary
    # unordered — fine interactively, nondeterministic for a written
    # artifact; the report's twins add the group tiebreak BEFORE the
    # limit so two renders are byte-identical
    worst = metrics.orderBy(
        F.col("Drawdown_2020").asc_nulls_last(), group_col
    ).limit(k)
    fastest = (
        metrics.na.drop(subset=["Recovered_Years"])
        .orderBy(
            F.col("Recovered_Years").asc_nulls_last(), group_col
        )
        .limit(k)
    )
    sections = [
        (
            "Resilience Metrics (full dataset)",
            _table(metrics.orderBy(group_col)),
        ),
        (f"Top {k} Worst Hit in 2020", _table(worst)),
        ("Fastest to Recover", _table(fastest)),
    ]
    body = "".join(
        f"<h2>{html.escape(h)}</h2>{t}" for h, t in sections
    )
    return _PAGE.format(title=html.escape(title), body=body)


def write_resilience_report(
    metrics: DataFrame | None, path: str, k: int = 10
) -> None:
    """Render and write the report (single local file — the artifact
    is human-page-sized by construction: |groups| + 2k rows)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(resilience_report_html(metrics, k))
