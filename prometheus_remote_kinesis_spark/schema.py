"""Declared schemas — the engine never relies on inference.

``RECORD_SCHEMA`` is THE core schema: the reference's flat metric record
(``/root/reference/record.go:8-14``):

    type Record struct {
        Name      string          `json:"name"`
        Timestamp int64           `json:"time"`    // epoch MILLISECONDS
        Value     JsonNullFloat64 `json:"value"`   // nullable float64
        Labels    Labels          `json:"labels"`  // map[string]string
    }

Field order (name, time, value, labels) is preserved so NDJSON emitted by
``to_json(struct(...))`` matches the reference's wire format
(``/root/reference/README.rst:49-61``).

``WRITE_REQUEST_SCHEMA`` mirrors ``prompb.WriteRequest`` (the Prometheus
remote-write protobuf, consumed at ``/root/reference/kinesis.go:83-84``):
a list of TimeSeries, each with ``labels: [{name, value}]`` and
``samples: [{value, timestamp}]``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Layer A: the metric record model -------------------------------------

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("time", T.LongType(), nullable=False),
        T.StructField("value", T.DoubleType(), nullable=True),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), nullable=True),
    ]
)

LABEL_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("timestamp", T.LongType()),  # epoch ms (record.go:10)
    ]
)

TIMESERIES_SCHEMA = T.StructType(
    [
        T.StructField("labels", T.ArrayType(LABEL_SCHEMA)),
        T.StructField("samples", T.ArrayType(SAMPLE_SCHEMA)),
    ]
)

WRITE_REQUEST_SCHEMA = T.StructType(
    [T.StructField("timeseries", T.ArrayType(TIMESERIES_SCHEMA))]
)

# --- Sink limits (mirrors the AWS PutRecords / PutRecordBatch caps the
# reference hardcodes: kinesis.go:22-23, firehose.go:22-23) ----------------

MAX_PUT_ENTRIES = 500
MAX_PUT_BYTES = 4_500_000  # deliberate margin under the AWS 5 MB cap

# --- Driver test tables (TESTDATA.md / FIXTURES.md §A) --------------------

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
