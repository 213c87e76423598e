"""Load-generator / perf-client CLI — the dsp-tools twin.

The reference ships standalone clients used by its perf stages
(reference: dsp-tools/tcp-client.cpp:65-127 — generate alphanumeric
payloads, batch N frames per send, spin over a socket;
dsp-tools/kafka-client.cpp:74-197 — produce/consume count x size with a
stat summary). Here:

    python -m dsp_spark.tools tcp-send  --port 9099 --count 100000 --size 200 --batch 10
    python -m dsp_spark.tools gen-frames --out /tmp/frames --count 1000000 --size 200
    python -m dsp_spark.tools parse-file --path /tmp/frames

Each prints the reference-format summary line
(`Summary: X MBps and Yk MPS ...`, stat.hpp:71-84) that the perf
report scripts grep for.
"""

from __future__ import annotations

import argparse
import socket
import string
import sys

from dsp_spark.streaming.metrics import Stats


def _payload(size: int) -> bytes:
    """Deterministic alphanumeric payload (tcp-client.cpp:65-72 uses a
    random one; deterministic keeps runs reproducible)."""
    alphabet = (string.ascii_letters + string.digits).encode()
    return bytes(alphabet[i % len(alphabet)] for i in range(size))


def tcp_send(args: argparse.Namespace) -> int:
    """Batch dyn_message frames over a socket (tcp-client.cpp:86-127)."""
    from dsp_spark.operators.telemetry import make_dyn_message

    frame = make_dyn_message(_payload(args.size))
    batch = frame * args.batch
    stats = Stats()
    sent = 0
    with socket.create_connection((args.host, args.port)) as conn:
        while sent < args.count:
            n = min(args.batch, args.count - sent)
            conn.sendall(batch if n == args.batch else frame * n)
            sent += n
            stats.messages += n
            stats.bytes += len(frame) * n
    print(stats.summary())
    return 0


def gen_frames(args: argparse.Namespace) -> int:
    """Write `count` heartbeat frames as parquet — the file-based load
    the parse perf path consumes (twin of kafka-client produce)."""
    from pyspark.sql import functions as F

    from dsp_spark.operators.telemetry import heartbeat_frame
    from dsp_spark.session import spread

    spark, owned = _session("dsp-tools-gen")
    stats = Stats()
    df = spread(spark.range(args.count)).select(
        heartbeat_frame(
            F.col("id") % 1000, F.col("id"), F.lit(1_700_000_000_000_000) + F.col("id")
        ).alias("value")
    )
    df.write.mode("overwrite").parquet(args.out)
    stats.messages = args.count
    stats.bytes = args.count * 28
    print(stats.summary())
    if owned:
        spark.stop()
    return 0


def parse_file(args: argparse.Namespace) -> int:
    """Parse a frame file at full parallelism and summarize (twin of
    kafka-client consume, kafka-client.cpp:127-197)."""
    from pyspark.sql import functions as F

    from dsp_spark.operators.telemetry import parse_telemetry

    spark, owned = _session("dsp-tools-parse")
    stats = Stats()
    df = spark.read.parquet(args.path)
    parsed = parse_telemetry(df).filter(F.col("error").isNull())
    agg = parsed.agg(
        F.count("*").alias("n"), F.sum(F.length("value")).alias("b")
    ).collect()[0]
    stats.messages = agg["n"]
    stats.bytes = agg["b"] or 0
    print(stats.summary())
    if owned:
        spark.stop()
    return 0


def _session(name: str):
    """Reuse an active session (don't stop it); else create our own."""
    from pyspark.sql import SparkSession

    from dsp_spark.session import get_session

    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    return get_session(name), True


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dsp_spark.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("tcp-send", help="send framed messages over TCP")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, required=True)
    s.add_argument("--count", type=int, default=100_000)
    s.add_argument("--size", type=int, default=200)
    s.add_argument("--batch", type=int, default=10)
    s.set_defaults(fn=tcp_send)

    g = sub.add_parser("gen-frames", help="write heartbeat frames parquet")
    g.add_argument("--out", required=True)
    g.add_argument("--count", type=int, default=1_000_000)
    g.add_argument("--size", type=int, default=200)
    g.set_defaults(fn=gen_frames)

    c = sub.add_parser("parse-file", help="parse + summarize a frame file")
    c.add_argument("--path", required=True)
    c.set_defaults(fn=parse_file)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
