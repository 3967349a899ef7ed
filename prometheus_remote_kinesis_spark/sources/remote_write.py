"""S1-S3: the remote-write ingest stage as a Spark transform.

``decode_remote_write`` turns a DataFrame of raw POST bodies (binary
snappy+protobuf, the exact bytes of ``kinesis.go:69``) into
WriteRequest-shaped rows, which then flow through the SAME declarative
``ingest.flatten_write_requests`` as every other path — decode is the only
Python step, and it is Arrow-batched ``mapInPandas`` (SURVEY.md §2.10 U1).

The HTTP listener itself is peripheral (BASELINE.json): in production the
bodies arrive via a stream transport (Kinesis/Kafka topic of raw bodies, or
files on object storage); any of those sources yields the ``body`` column
this stage consumes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from prometheus_remote_kinesis_spark.ingest import flatten_write_requests
from prometheus_remote_kinesis_spark.schema import WRITE_REQUEST_SCHEMA
from prometheus_remote_kinesis_spark.sources.prompb import (
    parse_write_request,
    snappy_decompress,
)


def decode_remote_write(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """binary bodies → RECORD_SCHEMA rows (decode → flatten → normalize).

    Stage 2+3 of the reference's hot path (kinesis.go:76-90); malformed
    bodies raise (the reference answers HTTP 400 — at the pipeline level
    a poison message is surfaced, not dropped silently)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "timeseries": [
                        parse_write_request(snappy_decompress(bytes(b)))
                        for b in pdf[body_col]
                    ]
                }
            )

    requests = bodies.mapInPandas(decode, WRITE_REQUEST_SCHEMA)
    return flatten_write_requests(requests)
