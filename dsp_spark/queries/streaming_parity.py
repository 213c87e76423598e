"""Batch-parity forms of the reference's streaming pipeline.

Each entry drives a real engine operator (router, telemetry parser,
relay projection) over the `events` table shaped into message
envelopes, with an ANSI-SQL oracle expressing the same semantics — so
the reference's core dataflow (SURVEY.md §3.1-3.2) is covered by the
driver's correctness gate, not just unit tests.

Binary columns are surfaced as strings in outputs (blob hashing
differs across engines; the bytes are utf8 here by construction).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.config import RouterRule
from dsp_spark.operators import telemetry
from dsp_spark.operators.router import route, route_with_drops
from dsp_spark.queries._util import t

RULES = [
    RouterRule("r_click", 1, "type", "click", "include", "main-nb", "clicks"),
    RouterRule("r_purchase", 2, "type", "purchase", "include", "main-nb", "purchases"),
    RouterRule("r_not_error", 3, "type", "error", "exclude", "audit-nb", "non-errors"),
]


def _events_as_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape `events` into the canonical envelope: key=user_id bytes,
    properties={'type': event_type}, value=props json bytes."""
    from dsp_spark.message import make_message

    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        *make_message(
            key=F.col("user_id").cast("string").cast("binary"),
            topic=F.lit("events"),
            properties=F.create_map(F.lit("type"), F.col("event_type")),
            value=F.col("props"),
        ),
    )


@register(
    "router_multicast_events",
    """
    SELECT event_id, 'clicks' AS topic, 'r_click' AS rule
      FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, 'purchases' AS topic, 'r_purchase' AS rule
      FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, 'non-errors' AS topic, 'r_not_error' AS rule
      FROM events WHERE event_type <> 'error'
    """,
    doc="Router T5: ordered include/exclude rules, multicast copies with subject "
    "rewrite (reference router.hpp:70-115) — single-scan explode, no shuffle.",
)
def router_multicast_events(spark, sf_dir):
    msgs = _events_as_messages(spark, sf_dir)
    return route(msgs, RULES).select("event_id", "topic", "rule")


@register(
    "router_drop_accounting",
    """
    SELECT event_id, 'not_needed' AS drop_type
    FROM events WHERE event_type NOT IN ('click', 'purchase')
    """,
    doc="Router T8 drop accounting: messages matching no rule are dropped with "
    "drop_type=not_needed (reference svc/handler.cpp:162-165).",
)
def router_drop_accounting(spark, sf_dir):
    msgs = _events_as_messages(spark, sf_dir)
    include_only = [r for r in RULES if r.action == "include"]
    _, dropped = route_with_drops(msgs, include_only)
    return dropped.select("event_id", "drop_type")


def _heartbeat_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic heartbeat frames synthesized from `events` — the
    engine-side twin of the reference's load generator (sim.cpp:30-48):
    client_id=user_id, sequence=event_id, ts=epoch µs.

    Frames are built with the native column expression (hex+unhex,
    codegen — no Python) and materialized once per sf_dir, parser
    queries then scan stored bytes. Mirrors the reference's perf
    methodology (generator client writes, service parses,
    scripts/perf-tcp.stage.sh) and keeps generation cost out of every
    parse plan — inlining the generator into the parser's filter made
    Catalyst push a monstrous expression into the scan."""
    import hashlib
    import tempfile
    from pathlib import Path

    from dsp_spark.session import spread

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = Path(tempfile.gettempdir()) / f"dsp_spark_hb_frames_{tag}"
    if not (path / "_SUCCESS").exists():
        ev = spread(t(spark, sf_dir, "events"))
        ev.select(
            telemetry.heartbeat_frame(
                F.col("user_id"), F.col("event_id"), F.unix_micros("ts")
            ).alias("value")
        ).write.mode("overwrite").parquet(str(path))
    return spark.read.parquet(str(path))


@register(
    "telemetry_parse_heartbeats",
    """
    SELECT CAST(user_id AS BIGINT) AS client_id,
           CAST(event_id AS BIGINT) AS sequence,
           CAST(epoch_us(ts) AS BIGINT) AS ts
    FROM events
    """,
    doc="Telemetry T1/T2: length-prefixed LE binary frames parsed with native "
    "hex/conv expressions (no Python in the parse path); full generator->parser "
    "roundtrip checked against the event columns the frames encode.",
)
def telemetry_parse_heartbeats(spark, sf_dir):
    frames = _heartbeat_frames(spark, sf_dir)
    parsed = telemetry.parse_telemetry(frames)
    return parsed.filter(F.col("error").isNull()).select(
        "client_id", "sequence", "ts"
    )


@register(
    "heartbeat_projection",
    """
    SELECT CAST(user_id AS VARCHAR) AS client_id_str,
           'client_id=' || user_id || ' sequence=' || event_id
               || ' epoch=' || epoch_us(ts) AS payload_text,
           'heartbeat' AS msg_kind
    FROM events
    """,
    doc="T3 projection: parsed heartbeat -> message envelope with text payload, "
    "stringified key, type property (reference svc/handler.cpp:122-131,168-179).",
)
def heartbeat_projection(spark, sf_dir):
    frames = _heartbeat_frames(spark, sf_dir)
    parsed = telemetry.parse_telemetry(frames)
    msgs = telemetry.project_heartbeat(parsed, topic="heartbeats")
    return msgs.select(
        F.col("key").cast("string").alias("client_id_str"),
        F.col("value").cast("string").alias("payload_text"),
        F.col("properties").getItem("type").alias("msg_kind"),
    )


@register(
    "k2k_relay_identity",
    """
    SELECT CAST(user_id AS VARCHAR) AS key_str, 'dev-test-2' AS topic,
           props AS value_str
    FROM events
    """,
    doc="T6 Kafka->Kafka relay (reference svc/main.cpp:179-199): key/payload "
    "verbatim, subject from config — the identity test of doc/test.adoc:31-33.",
)
def k2k_relay_identity(spark, sf_dir):
    msgs = _events_as_messages(spark, sf_dir)
    relayed = telemetry.project_passthrough(msgs, topic="dev-test-2", value_col="value")
    return relayed.select(
        F.col("key").cast("string").alias("key_str"),
        "topic",
        F.col("value").cast("string").alias("value_str"),
    )
