"""Per-query deep timing for the optimization round: separates query
CONSTRUCTION wall (python + any eager actions during build: iterative
components, centroid collects, session-index builds) from the timed
action (count, matching bench.py methodology). Reports per-run
build/act pairs plus min(build+act) over runs (default 4 — this
sandbox shows multi-second interference stalls, so min-of-2 is not
stable).

Usage: [N_RUNS=4] python tools/opt_measure.py <query> [<query> ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_2025_spark.io import read_table  # noqa: E402
from cdc_2025_spark.queries import QUERIES  # noqa: E402
from cdc_2025_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    n_runs = int(os.environ.get("N_RUNS", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    for t in ("orders", "customer", "events", "documents", "embeddings"):
        read_table(spark, sf_dir, t).count()
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            runs.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        spark.catalog.clearCache()
        best = min(b + a for b, a in runs)
        print(
            json.dumps(
                {"name": name, "min_total": round(best, 3), "runs": runs}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
