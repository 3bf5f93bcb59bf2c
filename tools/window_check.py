"""Driver-style rehearsal of the CORRECTNESS window: run the first-50
registry entries at sf0.01 Spark-vs-DuckDB exactly the way the round
driver does (row count + column-name-sorted schema + order-insensitive
value comparison), so registration day is a rename, not a debug
session.

Usage: python tools/window_check.py [n] [--sf DIR]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb  # noqa: E402

from cdc_2025_spark.queries import ORACLES, QUERIES  # noqa: E402
from cdc_2025_spark.schemas import TABLE_NAMES  # noqa: E402
from cdc_2025_spark.session import get_spark  # noqa: E402


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


def main() -> None:
    n = 50
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    if args and args[0].isdigit():
        n = int(args[0])
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    spark = get_spark(app_name="window-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    names = list(QUERIES)[:n]
    n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            cols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {exc!r}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(
                f"ok   {name}: rows-only, {len(srows)} rows "
                f"({time.perf_counter() - t0:.1f}s)"
            )
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {exc!r}")
            n_fail += 1
            continue
        if sorted(cols) != sorted(dcols):
            print(f"FAIL {name}: schema {cols} vs {dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(
                f"FAIL {name}: rows {len(srows)} vs {len(drows)}"
            )
            n_fail += 1
            continue
        s_norm = _normalize(srows, cols)
        d_norm = _normalize(drows, dcols)
        bad = [
            (sr, dr)
            for sr, dr in zip(s_norm, d_norm)
            if not all(_close(a, b) for a, b in zip(sr, dr))
        ][:2]
        if bad:
            print(f"FAIL {name}: value mismatches {bad}")
            n_fail += 1
            continue
        print(
            f"ok   {name}: {len(srows)} rows hash-green "
            f"({time.perf_counter() - t0:.1f}s)"
        )
        spark.catalog.clearCache()
    print(f"\n{len(names) - n_fail}/{len(names)} green")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
