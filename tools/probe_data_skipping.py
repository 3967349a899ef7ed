"""Measure parquet row-group data skipping from time-sorted archival
writes (S9's second pruning axis; SCALE.md records the results).

Writes the same event archive twice — time-clustered
(``write_parquet_archive(sort_by_time=True)``) and unclustered — with a
small row-group size so each file holds many groups, then:

1. reads every row group's ``time`` min/max from the parquet FOOTERS
   (pyarrow; this is exactly the metadata a scan consults) and counts how
   many groups overlap a narrow time band — the groups a reader MUST
   decode vs the ones the stats eliminate;
2. times the equivalent Spark scan+filter over both layouts.

Usage: python tools/probe_data_skipping.py [band_hours]   (default 24)
Prints ONE JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.session import get_spark
from prometheus_remote_kinesis_spark.sinks import write_parquet_archive
from prometheus_remote_kinesis_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROW_GROUP_BYTES = 64 * 1024  # small groups → many per file → skipping visible


def rowgroup_overlap(path: str, lo: int, hi: int) -> tuple[int, int]:
    """(row groups overlapping [lo, hi], total row groups) across the
    archive, judged purely from footer min/max — the scan's own logic."""
    import pyarrow.parquet as pq

    overlap = total = 0
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx["time"]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                overlap += 1  # no stats → must read
            elif st.min <= hi and st.max >= lo:
                overlap += 1
    return overlap, total


def timed_scan(spark, path: str, lo: int, hi: int) -> tuple[float, int]:
    df = spark.read.parquet(path).filter(F.col("time").between(lo, hi))
    df.count()  # warm page cache / JIT
    t0 = time.time()
    n = df.count()
    return round(time.time() - t0, 3), n


def main() -> None:
    band_hours = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    spark = get_spark("probe_data_skipping")
    # parquet.block.size is a Hadoop write conf — spark.conf.set after
    # session start does NOT reach the writer; set it on hadoopConfiguration
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("parquet.block.size", str(ROW_GROUP_BYTES))
    hconf.set("parquet.page.size", str(8 * 1024))
    events = load_table(spark, SF_DIR, "events").select(
        F.col("event_type").alias("name"),
        F.unix_millis("ts").alias("time"),
        "value",
        "user_id",
    )
    # Replicate 32× (distinct user ids, same time span) so each archive
    # file holds MANY row groups — sf0.1 alone writes one group per file
    # and no within-file skipping is possible at any sort order.
    rep = F.explode(F.array(*[F.lit(i) for i in range(32)])).alias("rep")
    events = events.select("*", rep).withColumn(
        "user_id", F.col("user_id") + F.col("rep").cast("long") * 1_000_000_000
    ).drop("rep")
    lo_all, hi_all = events.agg(F.min("time"), F.max("time")).first()
    mid = (lo_all + hi_all) // 2
    lo, hi = mid, mid + band_hours * 3_600_000

    work = tempfile.mkdtemp(prefix="skip_probe_")
    sorted_path = os.path.join(work, "clustered")
    unsorted_path = os.path.join(work, "unclustered")
    try:
        # same data, same file count; only the row order differs
        write_parquet_archive(events.repartition(8), sorted_path, sort_by_time=True)
        write_parquet_archive(
            events.repartition(8), unsorted_path, sort_by_time=False
        )
        s_overlap, s_total = rowgroup_overlap(sorted_path, lo, hi)
        u_overlap, u_total = rowgroup_overlap(unsorted_path, lo, hi)
        s_sec, s_rows = timed_scan(spark, sorted_path, lo, hi)
        u_sec, u_rows = timed_scan(spark, unsorted_path, lo, hi)
        assert s_rows == u_rows, (s_rows, u_rows)
        print(
            json.dumps(
                {
                    "band_hours": band_hours,
                    "rows_selected": s_rows,
                    "clustered_rowgroups_read": s_overlap,
                    "clustered_rowgroups_total": s_total,
                    "unclustered_rowgroups_read": u_overlap,
                    "unclustered_rowgroups_total": u_total,
                    "clustered_scan_sec": s_sec,
                    "unclustered_scan_sec": u_sec,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
