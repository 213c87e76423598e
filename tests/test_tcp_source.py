"""TCP custom source test: a live socket client sends framed bytes
(split across sends, multiple connections) and the streaming query
receives whole frames — the doc's TCP test spec (doc/test.adoc:43-54)."""

from __future__ import annotations

import socket
import time

import pytest

from dsp_spark.operators import telemetry as tm
from dsp_spark.sources.tcp import TcpDataSource, _Listener


def test_listener_reassembles_across_sends():
    lst = _Listener("127.0.0.1", 0)
    f1 = tm.make_heartbeat(1, 10, 100)
    f2 = tm.make_dyn_message(b"abcdef")
    with socket.create_connection(("127.0.0.1", lst.port)) as c:
        stream = f1 + f2
        c.sendall(stream[:7])
        time.sleep(0.05)
        c.sendall(stream[7:31])
        time.sleep(0.05)
        c.sendall(stream[31:])
        time.sleep(0.2)
    frames = [f for _, f in lst.slice(0, lst.snapshot_len())]
    assert frames == [f1, f2]


def test_listener_isolates_connections():
    lst = _Listener("127.0.0.1", 0)
    fa = tm.make_heartbeat(1, 1, 1)
    fb = tm.make_dyn_message(b"zz")
    with socket.create_connection(("127.0.0.1", lst.port)) as a, socket.create_connection(
        ("127.0.0.1", lst.port)
    ) as b:
        a.sendall(fa[:10])  # partial on conn A
        b.sendall(fb)  # complete on conn B
        time.sleep(0.2)
        got = lst.slice(0, lst.snapshot_len())
        assert [(cid, f) for cid, f in got if f == fb]  # B delivered
        assert not [(cid, f) for cid, f in got if f == fa]  # A still waiting
        a.sendall(fa[10:])
        time.sleep(0.2)
    frames = {bytes(f) for _, f in lst.slice(0, lst.snapshot_len())}
    assert frames == {fa, fb}


def test_tcp_source_end_to_end(spark, tmp_path):
    """readStream from the dsp_tcp source while a client produces frames
    (the perf-tcp stage shape, scripts/perf-tcp.stage.sh, in miniature)."""
    spark.dataSource.register(TcpDataSource)
    # bind an ephemeral port via a probe listener, then reuse that port
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    stream = (
        spark.readStream.format("dsp_tcp")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tcp_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for the source's listener to bind, then send 50 frames;
        # under full-suite load the bind can take >3s, so retry connect
        time.sleep(3)
        frames = [tm.make_heartbeat(7, i, i * 10) for i in range(50)]
        c = None
        deadline = time.time() + 60
        while True:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=10)
                break
            except ConnectionRefusedError:
                if time.time() > deadline:
                    raise
                time.sleep(1)
        with c:
            for f in frames:
                c.sendall(f)
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM tcp_out").collect()[0][0] >= 50:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM tcp_out").collect()
        assert len(rows) == 50
        parsed = tm.parse_telemetry(
            spark.createDataFrame([(bytearray(r["frame"]),) for r in rows], "value binary")
        ).collect()
        assert sorted(p["sequence"] for p in parsed) == list(range(50))
        assert all(p["client_id"] == 7 for p in parsed)
    finally:
        q.stop()
