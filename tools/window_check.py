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

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb  # noqa: E402

from cdc_2025_spark.queries import ORACLES, QUERIES  # noqa: E402
from cdc_2025_spark.queries.driver_model import (  # noqa: E402
    compare_frames,
)
from cdc_2025_spark.schemas import TABLE_NAMES  # noqa: E402
from cdc_2025_spark.session import get_spark  # noqa: E402


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
        failure = compare_frames(
            cols, srows, dcols, dtypes, drows, max_examples=2
        )
        if failure:
            print(f"FAIL {name}: {failure}")
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
