"""Custom format("prompb") Python DataSource (sources/prompb_datasource.py):
decode semantics pinned file-by-file, independent of the r4 oracle query.
"""

from __future__ import annotations

from prometheus_remote_kinesis_spark.sources.prompb import encode_remote_write_body
from prometheus_remote_kinesis_spark.sources.prompb_datasource import (
    register_prompb_source,
)


def test_prompb_datasource_reads_spool(spark, tmp_path):
    body1 = encode_remote_write_body(
        [({"__name__": "m1", "job": "a"}, [(1.5, 1000), (float("nan"), 2000)])]
    )
    # No __name__ (name projects to "") and no samples (labels-only
    # passthrough row, time=0, value NULL — prometheus.go:19-23).
    body2 = encode_remote_write_body([({"job": "b"}, [])])
    (tmp_path / "a.pb.sz").write_bytes(body1)
    (tmp_path / "b.pb.sz").write_bytes(body2)
    (tmp_path / "ignored.txt").write_bytes(b"junk")  # suffix-filtered out

    register_prompb_source(spark)
    df = spark.read.format("prompb").load(str(tmp_path))

    assert df.rdd.getNumPartitions() == 2  # one InputPartition per spool file
    rows = {(r.name, r.time): (r.value, r.labels) for r in df.collect()}
    assert rows[("m1", 1000)] == (1.5, {"__name__": "m1", "job": "a"})
    assert rows[("m1", 2000)][0] is None  # stale-marker NaN → NULL
    assert rows[("", 0)] == (None, {"job": "b"})
    assert len(rows) == 3


def test_prompb_datasource_empty_dir(spark, tmp_path):
    register_prompb_source(spark)
    assert spark.read.format("prompb").load(str(tmp_path)).count() == 0


def _drain(spark, src_dir, out_dir, ckpt):
    q = (
        spark.readStream.format("prompb")
        .load(str(src_dir))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_prompb_stream_reader_exactly_once(spark, tmp_path):
    """Two availableNow runs over a growing spool with a shared checkpoint:
    the second run must pick up ONLY the new file (offset = seen-file set)."""
    src, out, ckpt = tmp_path / "spool", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    register_prompb_source(spark)

    (src / "a.pb.sz").write_bytes(
        encode_remote_write_body([({"__name__": "m1"}, [(1.0, 1000), (2.0, 2000)])])
    )
    _drain(spark, src, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 2

    (src / "b.pb.sz").write_bytes(
        encode_remote_write_body([({"__name__": "m2"}, [(3.0, 3000)])])
    )
    _drain(spark, src, out, ckpt)
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3  # no re-read of a.pb.sz, new file consumed
    assert {(r.name, r.time) for r in rows} == {("m1", 1000), ("m1", 2000), ("m2", 3000)}


def test_prompb_parallel_stream_reader_exactly_once(spark, tmp_path):
    """Same growing-spool contract as the simple reader, through the
    executor-parallel DataSourceStreamReader (option parallel=true):
    InputPartition per new file, driver lists only."""
    src, out, ckpt = tmp_path / "spool", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    register_prompb_source(spark)

    def drain():
        q = (
            spark.readStream.format("prompb")
            .option("parallel", "true")
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src / "a.pb.sz").write_bytes(
        encode_remote_write_body([({"__name__": "m1"}, [(1.0, 1000)])])
    )
    (src / "b.pb.sz").write_bytes(
        encode_remote_write_body([({"__name__": "m2"}, [(2.0, 2000)])])
    )
    drain()
    assert spark.read.parquet(str(out)).count() == 2

    (src / "c.pb.sz").write_bytes(
        encode_remote_write_body([({"__name__": "m3"}, [(3.0, 3000)])])
    )
    drain()
    rows = spark.read.parquet(str(out)).collect()
    assert {(r.name, r.time) for r in rows} == {
        ("m1", 1000),
        ("m2", 2000),
        ("m3", 3000),
    }
    assert len(rows) == 3


def test_prompb_writer_roundtrip(spark, tmp_path):
    """write.format("prompb") → read.format("prompb") is lossless,
    including NaN→NULL values and empty metric names."""
    from pyspark.sql import Row

    from prometheus_remote_kinesis_spark.schema import RECORD_SCHEMA

    register_prompb_source(spark)
    rows = [
        Row(name="m1", time=1000, value=1.5, labels={"__name__": "m1", "job": "a"}),
        Row(name="m1", time=2000, value=None, labels={"__name__": "m1", "job": "a"}),
        Row(name="", time=3000, value=2.5, labels={"no_name": "x"}),
    ]
    out = tmp_path / "archive"
    df = spark.createDataFrame(rows, RECORD_SCHEMA)
    df.write.format("prompb").mode("append").save(str(out))

    back = spark.read.format("prompb").load(str(out))
    got = {(r.name, r.time): (r.value, dict(r.labels)) for r in back.collect()}
    assert got == {
        ("m1", 1000): (1.5, {"__name__": "m1", "job": "a"}),
        ("m1", 2000): (None, {"__name__": "m1", "job": "a"}),
        ("", 3000): (2.5, {"no_name": "x"}),
    }


def test_decode_file_matches_flatten_property(tmp_path):
    """Property: for arbitrary label maps (unicode) and samples (incl. NaN
    and negative epoch values), decoding a spool file through the
    DataSource's per-partition path equals the reference flatten of the
    same parsed body. Pure-Python — no Spark job per example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from prometheus_remote_kinesis_spark.server import flatten_timeseries
    from prometheus_remote_kinesis_spark.sources.prompb import parse_write_request
    from prometheus_remote_kinesis_spark.sources.prompb import snappy_decompress
    from prometheus_remote_kinesis_spark.sources.prompb_datasource import _decode_file

    text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
    )
    labels_st = st.dictionaries(text, text, max_size=4)
    sample_st = st.tuples(
        st.one_of(st.floats(allow_infinity=False), st.just(float("nan"))),
        st.integers(min_value=-(2**40), max_value=2**40),
    )
    series_st = st.lists(st.tuples(labels_st, st.lists(sample_st, max_size=5)), max_size=4)

    @given(series_st)
    @settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
    def check(series):
        body = encode_remote_write_body(series)
        path = tmp_path / "prop.pb.sz"
        path.write_bytes(body)
        got = list(_decode_file(str(path)))
        want = [
            (r["name"], r["time"], r["value"], r["labels"])
            for r in flatten_timeseries(parse_write_request(snappy_decompress(body)))
        ]
        assert got == want

    check()
