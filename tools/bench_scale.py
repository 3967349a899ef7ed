"""Scaling probe: replicate the sf0.1 fact tables Nx and re-time the
headline queries, to measure how runtime grows with data volume on a
fixed local[32] box (SCALE.md records the results).

Replication shape: each fact row is copied ``m`` times with shifted
surrogate ids (event_id/orderkey/doc_id/vec_id) but the SAME key-space for
join/group keys (user_id, custkey, lang, ...) — so per-key data volume
grows m×, which is the hard direction for shuffles and windows (more rows
per partition-key, same parallelism), and the realistic one for a metrics
corpus (more samples per series, not more series).

Usage: python tools/bench_scale.py [multipliers...]   (default: 1 4 16)
       python tools/bench_scale.py --queries t25_rate_extrapolated,t28_slo_burn_alert 1 16
       python tools/bench_scale.py --fresh 16 64
Prints ONE JSON line per multiplier. --queries probes an arbitrary
registered subset instead of the bench set (how SCALE.md's per-family
scaling rows are measured). --fresh times ONE pass of a NEWLY-built plan
per query (no warm-up, no shuffle-stage reuse — bench.py's
``queries_fresh`` convention): stage reuse can hide pre-shuffle
superlinearity, so SCALE.md's "no new superlinear entry" conclusion is
confirmed on fresh lineage (VERDICT r7 task #4). Fresh timings include
~0.4 s/query Py4J plan construction; compare fresh-to-fresh only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import all_queries, bench_queries
from prometheus_remote_kinesis_spark.schema import TABLES
from prometheus_remote_kinesis_spark.session import get_spark

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Fact tables to replicate, with their surrogate-id column to shift so
# replicated rows stay distinct where distinctness matters.
FACTS = {
    "events": "event_id",
    "lineitem": None,  # (l_orderkey, l_linenumber) keeps rows distinct per replica via l_orderkey shift
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
ID_SHIFT = 1_000_000_000


def scale_table(spark, src: str, name: str, m: int, out_dir: str) -> None:
    raw = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    if m == 1:
        scaled = raw
    else:
        rep = F.explode(F.array(*[F.lit(i) for i in range(m)])).alias("rep")
        scaled = raw.select("*", rep)
        id_col = FACTS[name]
        if name == "lineitem":
            id_col = "l_orderkey"
        if id_col is not None:
            scaled = scaled.withColumn(
                id_col, F.col(id_col) + F.col("rep").cast("long") * ID_SHIFT
            )
        if name == "documents":
            # Suffix every token with the replica id: token counts and
            # lengths stay comparable, but replicas share no shingles —
            # otherwise each doc gains m-1 exact copies and the near-dup
            # pair space grows m² (unrepresentative of a bigger corpus).
            scaled = scaled.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
                    ),
                    " ",
                ),
            )
        scaled = scaled.drop("rep")
    # Multiple files so scans parallelize like a real multi-file dataset
    # (the driver's single-row-group files scan as 1 task — round-1 lesson).
    scaled.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, f"{name}.parquet"))


def build_scaled_dir(spark, m: int, workdir: str) -> str:
    out = os.path.join(workdir, f"x{m}")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t in FACTS:
            scale_table(spark, BASE_SF_DIR, t, m, out)
        else:
            os.symlink(
                os.path.join(BASE_SF_DIR, f"{t}.parquet"),
                os.path.join(out, f"{t}.parquet"),
            )
    return out


def main() -> None:
    argv = sys.argv[1:]
    subset: dict | None = None
    if "--queries" in argv:
        i = argv.index("--queries")
        names = argv[i + 1].split(",")
        del argv[i : i + 2]
        qs = all_queries()
        subset = {n: qs[n].fn for n in names}
    fresh = "--fresh" in argv
    if fresh:
        argv.remove("--fresh")
    multipliers = [int(a) for a in argv] or [1, 4, 16]
    spark = get_spark("bench_scale")
    # events.parquet is TIMESTAMP(NANOS); the rewrite (via nanosAsLong set
    # by queries later) must preserve the raw long readably — read it with
    # the flag up front so the copy keeps int64 nanos out of the picture.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    workdir = tempfile.mkdtemp(prefix="bench_scale_")
    try:
        for m in multipliers:
            sf_dir = build_scaled_dir(spark, m, workdir)
            fns = sorted((subset or bench_queries()).items())
            timings = {}
            if fresh:
                for name, fn in fns:
                    t0 = time.time()
                    fn(spark, sf_dir).toPandas()  # new lineage, single pass
                    timings[name] = round(time.time() - t0, 3)
            else:
                plans = {name: fn(spark, sf_dir) for name, fn in fns}
                for name, df in plans.items():
                    df.toPandas()  # warm-up
                    t0 = time.time()
                    df.toPandas()
                    timings[name] = round(time.time() - t0, 3)
            print(
                json.dumps(
                    {
                        "metric": "headline_queries_total_time",
                        "multiplier": m,
                        "value": round(sum(timings.values()), 3),
                        "unit": "sec",
                        "queries": timings,
                        "mode": "fresh" if fresh else "warm",
                        "base_sf_dir": BASE_SF_DIR,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
