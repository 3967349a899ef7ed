"""S1 end-to-end: a real HTTP POST of a snappy+protobuf remote-write body
→ RemoteWriteServer → NDJSON spool → Structured Streaming relay — the
reference's full dataflow (kinesis.go:68-93 → chan → writer) with our
durable spool as the channel. Also pins the handler's Python flatten
against the Spark-side ingest on the same fixtures."""

from __future__ import annotations

import http.client
import math

import pytest

from prometheus_remote_kinesis_spark.server import RemoteWriteServer, flatten_timeseries
from prometheus_remote_kinesis_spark.sources.prompb import (
    encode_remote_write_body,
    snappy_compress_literal,
)

FIXTURE = [
    ({"__name__": "up", "job": "api"}, [(1.0, 1000), (0.0, 2000)]),
    ({"__name__": "stale", "job": "api"}, [(float("nan"), 3000)]),  # NaN → null
    ({"__name__": "empty_series"}, []),  # labels-only row, time=0
    ({"no_name": "x"}, [(2.5, 4000)]),  # missing __name__ → ""
]


def _post(url_host: str, port: int, body: bytes, path: str = "/receive") -> int:
    conn = http.client.HTTPConnection(url_host, port, timeout=10)
    conn.request("POST", path, body=body)
    status = conn.getresponse().status
    conn.close()
    return status


def test_http_receive_to_streaming_relay(spark, tmp_path):
    spool = str(tmp_path / "spool")
    srv = RemoteWriteServer(spool).start()
    host, port = srv.server_address[:2]
    try:
        assert _post(host, port, encode_remote_write_body(FIXTURE)) == 200
        # reference status codes: bad snappy → 400, bad route → 404
        assert _post(host, port, b"\xff\xff not snappy") == 400
        # valid snappy wrapping garbage protobuf → 400 (kinesis.go:85-88)
        assert _post(host, port, snappy_compress_literal(b"\x99\x99\x99")) == 400
        assert _post(host, port, encode_remote_write_body(FIXTURE), "/else") == 404
    finally:
        srv.stop()

    from prometheus_remote_kinesis_spark.streaming.pipeline import read_record_stream

    out = (
        read_record_stream(spark, spool)
        .writeStream.format("memory")
        .queryName("srv_relay")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    out.awaitTermination()
    rows = {
        (r["name"], r["time"]): r for r in spark.table("srv_relay").collect()
    }
    assert len(rows) == 5  # 2 + 1 + 1 + 1
    assert rows[("up", 1000)]["value"] == 1.0
    assert rows[("up", 2000)]["labels"] == {"__name__": "up", "job": "api"}
    assert rows[("stale", 3000)]["value"] is None  # NaN → null, wire-level
    assert rows[("empty_series", 0)]["value"] is None  # labels-only row
    assert rows[("", 4000)]["value"] == 2.5  # missing __name__ → ""


def test_python_flatten_matches_spark_ingest(spark):
    """The handler's row-at-a-time flatten and the declarative Spark
    flatten must agree cell-for-cell on the edge fixtures."""
    from prometheus_remote_kinesis_spark.schema import WRITE_REQUEST_SCHEMA
    from prometheus_remote_kinesis_spark.ingest import flatten_write_requests
    from prometheus_remote_kinesis_spark.sources.prompb import (
        encode_write_request,
        parse_write_request,
    )

    timeseries = parse_write_request(encode_write_request(FIXTURE))
    py_rows = flatten_timeseries(timeseries)

    spark_df = flatten_write_requests(
        spark.createDataFrame([(timeseries,)], WRITE_REQUEST_SCHEMA)
    )
    spark_rows = [
        {
            "name": r["name"],
            "time": r["time"],
            "value": r["value"],
            "labels": dict(r["labels"]),
        }
        for r in spark_df.collect()
    ]

    key = lambda r: (r["name"], r["time"])  # noqa: E731
    assert sorted(py_rows, key=key) == sorted(spark_rows, key=key)
    assert not any(
        isinstance(r["value"], float) and math.isnan(r["value"]) for r in py_rows
    )


def test_raw_spool_to_prompb_stream_relay(spark, tmp_path):
    """Raw-spool mode: the handler validates (same status codes) but
    persists the original snappy body; the format("prompb") DataSource
    decodes it inside Spark. Same five records as the NDJSON path."""
    spool = str(tmp_path / "raw_spool")
    srv = RemoteWriteServer(spool, raw=True).start()
    host, port = srv.server_address[:2]
    try:
        assert _post(host, port, encode_remote_write_body(FIXTURE)) == 200
        assert _post(host, port, b"\xff\xff not snappy") == 400
        assert _post(host, port, snappy_compress_literal(b"\x99\x99\x99")) == 400
    finally:
        srv.stop()

    from prometheus_remote_kinesis_spark.streaming.pipeline import (
        read_prompb_record_stream,
    )

    out = (
        read_prompb_record_stream(spark, spool, parallel=True)
        .writeStream.format("memory")
        .queryName("raw_relay")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_raw"))
        .start()
    )
    out.awaitTermination()
    rows = {(r["name"], r["time"]): r for r in spark.table("raw_relay").collect()}
    assert len(rows) == 5
    assert rows[("up", 1000)]["value"] == 1.0
    assert rows[("up", 2000)]["labels"] == {"__name__": "up", "job": "api"}
    assert rows[("stale", 3000)]["value"] is None
    assert rows[("empty_series", 0)]["value"] is None
    assert rows[("", 4000)]["value"] == 2.5
