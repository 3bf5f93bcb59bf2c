"""Barrier profiler for llm_prep_full_ledger: wraps
DataFrame.localCheckpoint so every eager-compiled barrier in the REAL
query body reports its wall cost (no replay copy to drift), then
times the final act. Run on an idle machine; host stalls inflate
single trials.

Usage: [N_TRIALS=2] python tools/profile_ledger.py [query_name]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from cdc_2025_spark.io import read_table  # noqa: E402
from cdc_2025_spark.queries import QUERIES  # noqa: E402
from cdc_2025_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "llm_prep_full_ledger"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_trials = int(os.environ.get("N_TRIALS", "2"))
    spark = get_spark(app_name="profile-ledger")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    for t in ("orders", "documents"):
        read_table(spark, sf_dir, t).count()

    orig = DataFrame.localCheckpoint
    last = [time.perf_counter()]

    def timed(self, eager=True):
        t0 = time.perf_counter()
        out = orig(self, eager=eager)
        t1 = time.perf_counter()
        cols = ",".join(self.columns)[:60]
        print(
            f"  ckpt({cols:60s}) barrier {t1 - t0:6.2f}s "
            f"(since prev {t0 - last[0]:6.2f}s)",
            flush=True,
        )
        last[0] = t1
        return out

    DataFrame.localCheckpoint = timed
    try:
        for trial in range(n_trials):
            print(f"trial {trial}:", flush=True)
            t0 = time.perf_counter()
            last[0] = t0
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            print(
                f"  build {t1 - t0:6.2f}s  act {t2 - t1:6.2f}s  "
                f"total {t2 - t0:6.2f}s",
                flush=True,
            )
    finally:
        DataFrame.localCheckpoint = orig
    spark.stop()


if __name__ == "__main__":
    main()
