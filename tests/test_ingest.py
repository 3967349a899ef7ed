"""Layer A golden tests (FIXTURES.md §B): the ingest pipeline's semantics
pinned against the reference's documented behavior, each case citing the
reference line it pins."""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.ingest import flatten_write_requests
from prometheus_remote_kinesis_spark.schema import WRITE_REQUEST_SCHEMA
from prometheus_remote_kinesis_spark.sinks import encode_ndjson


def make_wr(spark, timeseries):
    """Build a one-row WriteRequest DataFrame from plain python structures:
    timeseries = [(labels_dict, [(value, ts_ms), ...]), ...]"""
    data = [
        {
            "timeseries": [
                {
                    "labels": [{"name": k, "value": v} for k, v in labels.items()],
                    "samples": [{"value": v, "timestamp": t} for v, t in samples],
                }
                for labels, samples in timeseries
            ]
        }
    ]
    return spark.createDataFrame(data, WRITE_REQUEST_SCHEMA)


def flat(spark, timeseries):
    rows = flatten_write_requests(make_wr(spark, timeseries)).collect()
    return [(r["name"], r["time"], r["value"], dict(r["labels"])) for r in rows]


def test_basic_flatten(spark):
    """2 samples → 2 rows, full label map on each (prometheus.go:25-34);
    name = labels['__name__'] (prometheus.go:19)."""
    labels = {"__name__": "up", "job": "node", "instance": "a:9100"}
    rows = flat(spark, [(labels, [(1.0, 1000), (0.0, 2000)])])
    assert rows == [
        ("up", 1000, 1.0, labels),
        ("up", 2000, 0.0, labels),
    ]


def test_nan_value_becomes_null(spark):
    """Stale-marker NaN → NULL (prometheus.go:28-32)."""
    rows = flat(spark, [({"__name__": "m"}, [(float("nan"), 5)])])
    assert rows == [("m", 5, None, {"__name__": "m"})]


def test_empty_samples_emits_labels_only_row(spark):
    """0 samples → exactly 1 row with time=0, value NULL
    (prometheus.go:20-23)."""
    rows = flat(spark, [({"__name__": "m", "a": "b"}, [])])
    assert rows == [("m", 0, None, {"__name__": "m", "a": "b"})]


def test_missing_name_label(spark):
    """No __name__ → empty-string name, like labels[k] on a missing key in
    Go (prometheus.go:19)."""
    rows = flat(spark, [({"job": "x"}, [(1.5, 1)])])
    assert rows == [("", 1, 1.5, {"job": "x"})]


def test_multi_series_row_count(spark):
    """Row count = Σ max(1, len(samples)) (prometheus.go:11,20-23)."""
    ts = [
        ({"__name__": "a"}, [(1.0, 1), (2.0, 2), (3.0, 3)]),
        ({"__name__": "b"}, []),
        ({"__name__": "c"}, [(4.0, 4)]),
    ]
    rows = flat(spark, ts)
    assert len(rows) == 5
    assert sorted(r[0] for r in rows) == ["a", "a", "a", "b", "c"]


def test_ndjson_wire_format(spark):
    """NDJSON field order + explicit null value, matching the reference's
    documented format (README.rst:49-61; record.go:21-27)."""
    records = flatten_write_requests(
        make_wr(
            spark,
            [
                ({"__name__": "up", "job": "n"}, [(1.0, 1513264725773)]),
                ({"__name__": "stale"}, [(float("nan"), 7)]),
            ],
        )
    )
    lines = {r["partition_key"]: r["line"] for r in encode_ndjson(records).collect()}
    up = json.loads(lines["up"])
    assert list(up) == ["name", "time", "value", "labels"]  # Go struct order
    assert up == {
        "name": "up",
        "time": 1513264725773,
        "value": 1.0,
        "labels": {"__name__": "up", "job": "n"},
    }
    stale = json.loads(lines["stale"])
    assert stale["value"] is None  # explicit null, never NaN
    assert "NaN" not in lines["stale"]


def test_unicode_labels_roundtrip(spark):
    """Multi-byte label values survive encode (kinesis.go:158)."""
    labels = {"__name__": "メトリック", "ラベル": "値"}
    records = flatten_write_requests(make_wr(spark, [(labels, [(1.0, 1)])]))
    line = encode_ndjson(records).collect()[0]["line"]
    assert json.loads(line)["labels"] == labels


label_st = st.dictionaries(
    st.text(alphabet="abcdefghij_", min_size=1, max_size=8),
    st.text(min_size=0, max_size=12),
    max_size=5,
)
samples_st = st.lists(
    st.tuples(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=False, width=64),
            st.just(float("nan")),
        ),
        st.integers(min_value=-(2**40), max_value=2**40),
    ),
    max_size=6,
)


@given(ts=st.lists(st.tuples(label_st, samples_st), min_size=1, max_size=4))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_property_row_count_and_no_nan(spark, ts):
    """Invariants (SURVEY.md §5.4): row count == Σ max(1, len(samples));
    serialized JSON never contains a NaN token."""
    records = flatten_write_requests(make_wr(spark, ts))
    rows = records.collect()
    assert len(rows) == sum(max(1, len(s)) for _, s in ts)
    for line in encode_ndjson(records).collect():
        parsed = json.loads(line["line"])  # valid JSON, incl. NaN→null
        assert parsed["value"] is None or not math.isnan(parsed["value"])
