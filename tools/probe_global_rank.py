"""A/B probe: naive single-partition global rank vs w1c's banded two-phase
rank, on the sf0.1 orders table replicated Nx (same replication scheme as
bench_scale.py). Records the numbers behind SCALE.md's global-rank entry.

Usage: python tools/probe_global_rank.py [multipliers...]   (default: 1 4 16)
Prints ONE JSON line per multiplier.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench_scale import build_scaled_dir  # noqa: E402  (tools/ sibling)
from prometheus_remote_kinesis_spark.operators.windows import (  # noqa: E402
    w1c_global_rank_scalable,
)
from prometheus_remote_kinesis_spark.session import get_spark  # noqa: E402


def naive_global_rank(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.row_number().over(w).alias("pos"),
        F.rank().over(Window.orderBy(F.desc("o_totalprice"))).alias("rnk"),
    )


def timed(df) -> float:
    df.toPandas()  # warm-up: plan + page cache
    t0 = time.time()
    df.toPandas()
    return round(time.time() - t0, 3)


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("probe_global_rank")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    workdir = tempfile.mkdtemp(prefix="probe_rank_")
    try:
        for m in multipliers:
            sf_dir = build_scaled_dir(spark, m, workdir)
            out = {
                "multiplier": m,
                "naive_global_window_sec": timed(naive_global_rank(spark, sf_dir)),
                "banded_two_phase_sec": timed(w1c_global_rank_scalable(spark, sf_dir)),
            }
            print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
