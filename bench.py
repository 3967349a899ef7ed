"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed twice: a warm-up pass (JVM/codegen warm, parquet
footer cache) is NOT counted; the timed pass materializes the full result
to the driver via the Arrow path (``toPandas``) — full execution plus
transfer, without the Py4J row-at-a-time deserialization tax that
``collect()`` adds on 100k-row results (measured 2-3× the query's own
runtime at sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prometheus_remote_kinesis_spark.registry import bench_queries
from prometheus_remote_kinesis_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name, fn in sorted(bench_queries().items()):
        fn(spark, sf_dir).toPandas()  # warm-up: not timed
        t0 = time.time()
        fn(spark, sf_dir).toPandas()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
