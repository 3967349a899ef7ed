"""Null-value robustness: every registered query must survive inputs with
NULL metric values (the NaN→NULL staleness model — real Prometheus replay
data is full of them, prometheus.go:28-32) and NULL document text, written
in the DIRECTORY parquet layout every production writer produces.

Found by this probe (round 4): the prompb encoder struct.pack'd None, the
Misra-Gries partition summary called .split on None, stream_table's
pathGlobFilter silently matched ZERO part-files for directory-layout
tables (streams read nothing), and the rate/Holt-Winters stateful ops
lacked the null-skip their four siblings had.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import all_queries
from prometheus_remote_kinesis_spark.schema import TABLES

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")),
            )
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("text")),
            )
        # DIRECTORY layout on purpose — regression-pins stream_table's
        # isdir branch (glob-filter streams read zero files otherwise)
        df.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_survive_nulls(spark, null_sf_dir):
    crashed = {}
    zero_rows_streaming = []
    for name, q in all_queries().items():
        try:
            n = q.fn(spark, null_sf_dir).count()
        except Exception as e:  # noqa: BLE001 — we report the full set
            crashed[name] = (str(e).splitlines() or [type(e).__name__])[0][:120]
            continue
        # streaming twins must actually SEE the directory-layout data —
        # zero rows here means the source matched no files
        if "stream" in name and n == 0:
            zero_rows_streaming.append(name)
    assert not crashed, crashed
    assert not zero_rows_streaming, zero_rows_streaming
