"""CLI parity tests: flag semantics of the reference's main() plus a full
drain-mode run — HTTP POST → spool → relay → file sink in one process."""

from __future__ import annotations

import http.client

import pytest

from prometheus_remote_kinesis_spark.cli import main
from prometheus_remote_kinesis_spark.sources.prompb import encode_remote_write_body


def test_stream_name_required():
    with pytest.raises(SystemExit):  # main.go:88-90
        main(["--sink-dir", "/tmp/x", "--drain"])


@pytest.mark.slow  # HTTP server + streaming relay e2e (~14 s with setup)
def test_drain_run_end_to_end(spark, tmp_path, monkeypatch):
    """--drain: post one body at the moment the server is up, relay the
    backlog with availableNow, exit. Exercises flag plumbing, server
    lifecycle, writer selection (file sink), and the relay itself."""
    spool = tmp_path / "spool"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    sink.mkdir()

    # Post the body BEFORE main(): the spool dir is the durable channel,
    # so records written to it before the stream starts are still drained
    # (the availableNow trigger reads the backlog).
    from prometheus_remote_kinesis_spark.server import RemoteWriteServer

    srv = RemoteWriteServer(str(spool)).start()
    host, port = srv.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request(
        "POST",
        "/receive",
        body=encode_remote_write_body(
            [({"__name__": "m1", "job": "j"}, [(1.5, 1000), (2.5, 2000)])]
        ),
    )
    assert conn.getresponse().status == 200
    conn.close()
    srv.stop()

    rc = main(
        [
            "--stream-name",
            "test-stream",
            "--listen-addr",
            "127.0.0.1:0",
            "--spool-dir",
            str(spool),
            "--checkpoint-dir",
            str(ckpt),
            "--sink-dir",
            str(sink),
            "--drain",
        ]
    )
    assert rc == 0

    lines = []
    for p in sink.iterdir():
        lines += p.read_bytes().decode().splitlines()
    assert len(lines) == 2
    assert all("\t" in ln for ln in lines)  # kinesis mode keeps partition keys
    keys = {ln.split("\t", 1)[0] for ln in lines}
    assert keys == {"m1"}  # partition key = metric name (kinesis.go:174)


@pytest.mark.slow  # HTTP server + prompb DataSource relay e2e (~9 s)
def test_drain_raw_spool_end_to_end(spark, tmp_path):
    """--raw-spool --drain: the posted body lands as wire bytes, the relay
    decodes it through format("prompb") on executors, same sink output."""
    spool = tmp_path / "spool"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    sink.mkdir()

    from prometheus_remote_kinesis_spark.server import RemoteWriteServer

    srv = RemoteWriteServer(str(spool), raw=True).start()
    host, port = srv.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request(
        "POST",
        "/receive",
        body=encode_remote_write_body(
            [({"__name__": "m2", "job": "j"}, [(1.5, 1000), (2.5, 2000)])]
        ),
    )
    assert conn.getresponse().status == 200
    conn.close()
    srv.stop()
    assert any(p.name.endswith(".pb.sz") for p in spool.iterdir())

    rc = main(
        [
            "--stream-name",
            "test-stream",
            "--listen-addr",
            "127.0.0.1:0",
            "--spool-dir",
            str(spool),
            "--checkpoint-dir",
            str(ckpt),
            "--sink-dir",
            str(sink),
            "--drain",
            "--raw-spool",
        ]
    )
    assert rc == 0

    lines = []
    for p in sink.iterdir():
        lines += p.read_bytes().decode().splitlines()
    assert len(lines) == 2
    keys = {ln.split("\t", 1)[0] for ln in lines}
    assert keys == {"m2"}
