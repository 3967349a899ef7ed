"""Spark 4 custom Python DataSource for the reference's wire format.

``spark.read.format("prompb").load(dir)`` scans a directory of
snappy-compressed protobuf ``WriteRequest`` spool files — the exact bytes
the reference receives per HTTP POST (kinesis.go:68-93) and our
``server.py`` endpoint spools — and produces RECORD_SCHEMA rows with the
reference's flatten semantics (prometheus.go:10-37: label-map build, name
projection, empty-series passthrough, NaN→NULL).

This is the idiomatic Spark-4 way to expose a bespoke wire format as a
first-class source: one InputPartition per spool file, so a directory of N
files scans N-way parallel and the decode (pure-Python snappy + prompb,
sources/prompb.py) runs on executors — the driver never touches payload
bytes. At 100 TB the same class pointed at an object-store prefix keeps the
shape; only file listing grows, and Spark batches that on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

RECORD_DDL = "name string, time bigint, value double, labels map<string,string>"


class PrompbDataSource(DataSource):
    """format("prompb") — directory of ``*.pb.sz`` WriteRequest files."""

    @classmethod
    def name(cls) -> str:
        return "prompb"

    def schema(self) -> str:
        return RECORD_DDL

    def reader(self, schema) -> "PrompbReader":  # noqa: ANN001 (API signature)
        return PrompbReader(self.options)


class PrompbReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options.get("path")
        if not self.path:
            raise ValueError("prompb source requires a path")
        self.suffix = options.get("suffix", ".pb.sz")

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.path) if f.endswith(self.suffix)
        )
        # One partition per spool file: parallelism = file count, decode
        # executor-side. Empty dir → one no-op partition (Spark requires ≥1).
        if not files:
            return [InputPartition(None)]
        return [InputPartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition):
        if partition.value is None:
            return
        from prometheus_remote_kinesis_spark.server import flatten_timeseries
        from prometheus_remote_kinesis_spark.sources.prompb import (
            parse_write_request,
            snappy_decompress,
        )

        with open(partition.value, "rb") as fh:
            body = fh.read()
        for rec in flatten_timeseries(parse_write_request(snappy_decompress(body))):
            yield (rec["name"], rec["time"], rec["value"], rec["labels"])


def register_prompb_source(spark) -> None:  # noqa: ANN001
    """Idempotently register format("prompb") on this session."""
    spark.dataSource.register(PrompbDataSource)
