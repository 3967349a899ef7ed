"""Measure (not just design) the streaming stateful operators at scale —
r4-VERDICT task #5: SCALE.md's state-bound table was design reasoning;
this probe records actual drain throughput and state-store footprint.

For each streaming query it times the full ``fn(spark, sf_dir)`` call
(source build + availableNow drain through the memory sink — the part
``bench_scale`` can NOT time, since streaming executes inside fn(), not at
toPandas()), then reads the engine's own state-operator metrics captured
by ``streaming.queries.last_run_progress`` (numRowsTotal = live state
rows, memoryUsedBytes = provider-reported store size).

Replication uses bench_scale's shape: m× more samples PER SERIES (same
key space) — the hard direction for per-key state and the realistic one
for a metrics corpus.

Usage: python tools/probe_stateful_scale.py [multipliers...]  (default 1 4 16)
       python tools/probe_stateful_scale.py --queries t14s_rate_5m_stream 1 16
       python tools/probe_stateful_scale.py --noop-sink --queries t12s_stream_stream_join 16
Prints ONE JSON line per (query, multiplier).

``--noop-sink`` swaps the registered queries' memory sink for a
foreachBatch counting sink (rows counted executor-side, never collected):
the memory sink serializes EVERY result row to the driver and trips
``spark.driver.maxResultSize`` on quadratic-output shapes (t12s at 16×
produces ~21 M join rows), which measures the harness, not the operator.
A real deployment's sink is partition-parallel — the noop sink is the
faithful stand-in for measuring operator throughput/state alone.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_remote_kinesis_spark.registry import all_queries
from prometheus_remote_kinesis_spark.session import get_spark
from tools.bench_scale import build_scaled_dir

DEFAULT_QUERIES = [
    "t9s_stream_dedup",
    "t10s_counter_increase_stream",
    "t12s_stream_stream_join",
    "t14s_rate_5m_stream",
    "t17s_prefix_anomaly_stream",
    "t20s_holt_winters_stream",
]


def _install_noop_sink(sq) -> None:
    """Replace run_to_batch with a foreachBatch counting sink: output rows
    are counted per-batch on executors and only the scalar count returns,
    so quadratic-output probes measure the OPERATOR, not driver collect."""
    import json as _json

    def run_to_batch_counting(streaming_df, output_mode):
        counts = {"n": 0}

        def fb(df, _epoch):
            counts["n"] += df.count()

        query = (
            streaming_df.writeStream.foreachBatch(fb)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="skt_noop_"))
            .start()
        )
        query.awaitTermination()
        sq.last_run_progress = [_json.loads(p.json) for p in query.recentProgress]
        return streaming_df.sparkSession.createDataFrame(
            [(counts["n"],)], "output_rows bigint"
        )

    sq.run_to_batch = run_to_batch_counting


def main() -> None:
    argv = sys.argv[1:]
    names = DEFAULT_QUERIES
    noop = "--noop-sink" in argv
    if noop:
        argv.remove("--noop-sink")
    if "--queries" in argv:
        i = argv.index("--queries")
        names = argv[i + 1].split(",")
        del argv[i : i + 2]
    multipliers = [int(a) for a in argv] or [1, 4, 16]
    spark = get_spark("probe_stateful_scale")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import prometheus_remote_kinesis_spark.streaming.queries as sq

    if noop:
        _install_noop_sink(sq)

    qs = all_queries()
    workdir = tempfile.mkdtemp(prefix="probe_stateful_")
    try:
        for m in multipliers:
            sf_dir = build_scaled_dir(spark, m, workdir)
            n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
            for name in names:
                t0 = time.time()
                df = qs[name].fn(spark, sf_dir)
                if noop and df.columns == ["output_rows"]:
                    out_rows = df.collect()[0][0]
                else:
                    out_rows = df.count()
                dt = time.time() - t0
                state = [
                    {
                        "op": so.get("operatorName"),
                        "state_rows": so.get("numRowsTotal"),
                        "state_bytes": so.get("memoryUsedBytes"),
                    }
                    for p in sq.last_run_progress[-1:]
                    for so in p.get("stateOperators", [])
                ]
                print(
                    json.dumps(
                        {
                            "query": name,
                            "multiplier": m,
                            "input_rows": n_events,
                            "output_rows": out_rows,
                            "drain_sec": round(dt, 2),
                            "rec_per_sec": round(n_events / dt, 1),
                            "state": state,
                        }
                    ),
                    flush=True,
                )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
