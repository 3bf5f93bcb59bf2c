"""Driver-style rehearsal of the CORRECTNESS window: run the first-50
registry entries at sf0.01 Spark-vs-DuckDB the way the round driver
does (row count + column-name-sorted schema + order-insensitive value
comparison) — at DRIVER STRENGTH: exact value equality (no rounding,
no isclose — the driver hashes values bit-exactly) and result-TYPE
checks on the oracle side (the driver's value hash is type-sensitive:
a HUGEINT oracle column hash-mismatches a BIGINT Spark column even
when every value is equal — the r12/r13 `survival_km_reorder` lesson).

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

# Oracle output types the driver's hash layer demonstrably handles
# (every hash-green oracle across r7-r13 emits only these).  HUGEINT
# and DECIMAL are explicitly NOT here: DuckDB's SUM(BIGINT) returns
# HUGEINT and the driver hashes int128 differently from int64.
SAFE_ORACLE_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "BOOLEAN",
    "TIMESTAMP",
}


def _norm_val(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_val(row[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _same(a, b):
    """Driver-strength equality: exact value AND same type family.

    int vs float cross-type equality (5 == 5.0) is a FAIL here — the
    driver hashes typed values, so a Spark BIGINT next to an oracle
    DOUBLE mismatches even when numerically equal.
    """
    if a is None or b is None:
        return a is b
    num_a = isinstance(a, (int, float)) and not isinstance(a, bool)
    num_b = isinstance(b, (int, float)) and not isinstance(b, bool)
    if num_a and num_b:
        if isinstance(a, float) != isinstance(b, float):
            return False
        return a == b
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b


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
            rel = con.sql(ORACLES[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {exc!r}")
            n_fail += 1
            continue
        unsafe = [
            f"{c}:{t}"
            for c, t in zip(dcols, dtypes)
            if t.split("(")[0] not in SAFE_ORACLE_TYPES
        ]
        if unsafe:
            print(
                f"FAIL {name}: oracle emits driver-unsafe "
                f"column types {unsafe} (CAST them)"
            )
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
            if not all(_same(a, b) for a, b in zip(sr, dr))
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
