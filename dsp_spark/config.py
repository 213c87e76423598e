"""YAML/dict pipeline configuration.

Mirrors the reference's config schema (reference: res/dsp.yaml:1-29 and
dsp.hpp:196-259 — `interfaces.{southbound,northbound,metrics}`, `app`,
`router`) with one deliberate fix: router rules are parsed from config
here, whereas the reference hardcodes them (router.hpp:41-68, TODOs at
router.hpp:64-65).

Example::

    app:
      topic: dev-test
    interfaces:
      southbound:
        type: kafka            # tcp | kafka | file | rate | custom
        kafka: {bootstrap: "localhost:9092", topics: [dev-test], groupid: g1,
                batchSize: 1000, pollTimeoutMs: 100}
      northbound:
        - name: main-nb
          type: kafka
          kafka: {bootstrap: "localhost:9092"}
        - name: audit
          type: parquet
          path: /data/audit
      metrics:
        port: 9555
    router:
      - name: hb
        priority: 1
        condition: {key: type, value: heartbeat}
        action: include        # include (allow) | exclude (deny)
        destination: main-nb
        subject: heartbeats
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

WILDCARD = "*"  # matches any property (reference: router.hpp:19,118)


@dataclass(frozen=True)
class RouterRule:
    """One routing rule (reference: router.hpp:30-38 rule_t).

    Semantics (router.hpp:70-115):
      include: property[key] == value  -> route a copy
      exclude: property[key] != value  -> route a copy
      missing key: include -> no match; exclude -> match (default_match)
      key == value == "*": match everything
    """

    name: str
    priority: int
    key: str
    value: str
    action: str  # "include" | "exclude"
    destination: str
    subject: str

    def __post_init__(self):
        if self.action not in ("include", "exclude"):
            raise ValueError(f"rule {self.name}: bad action {self.action!r}")

    @property
    def is_wildcard(self) -> bool:
        return self.key == WILDCARD and self.value == WILDCARD


@dataclass
class SourceConfig:
    type: str  # tcp | kafka | file | rate | custom
    options: dict[str, Any] = field(default_factory=dict)


@dataclass
class SinkConfig:
    name: str
    type: str  # kafka | parquet | csv | json | console | memory | custom
    options: dict[str, Any] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    app_topic: str | None = None
    source: SourceConfig | None = None
    sinks: list[SinkConfig] = field(default_factory=list)
    rules: list[RouterRule] = field(default_factory=list)
    metrics_port: int | None = None

    @classmethod
    def from_dict(cls, cfg: dict[str, Any]) -> "PipelineConfig":
        interfaces = cfg.get("interfaces", {})
        sb = interfaces.get("southbound")
        source = None
        if sb:
            opts = {k: v for k, v in sb.items() if k != "type"}
            source = SourceConfig(type=sb["type"], options=opts)
        sinks = []
        for nb in interfaces.get("northbound", []) or []:
            opts = {k: v for k, v in nb.items() if k not in ("type", "name")}
            sinks.append(SinkConfig(name=nb["name"], type=nb["type"], options=opts))
        rules = []
        for r in cfg.get("router", []) or []:
            cond = r.get("condition", {})
            rules.append(
                RouterRule(
                    name=r["name"],
                    priority=int(r.get("priority", 0)),
                    key=str(cond.get("key", cond.get("field", WILDCARD))),
                    value=str(cond.get("value", WILDCARD)),
                    action={"allow": "include", "deny": "exclude"}.get(
                        r.get("action", "include"), r.get("action", "include")
                    ),
                    destination=r.get("destination", ""),
                    subject=r["subject"],
                )
            )
        # evaluation follows ascending priority (reference routes in rule
        # order; priority field is the declared order key)
        rules.sort(key=lambda r: r.priority)
        metrics = interfaces.get("metrics") or {}
        return cls(
            app_topic=(cfg.get("app") or {}).get("topic"),
            source=source,
            sinks=sinks,
            rules=rules,
            metrics_port=metrics.get("port"),
        )

    @classmethod
    def from_yaml(cls, path_or_text: str) -> "PipelineConfig":
        import os

        import yaml

        if os.path.exists(path_or_text):
            with open(path_or_text) as f:
                data = yaml.safe_load(f)
        else:
            data = yaml.safe_load(path_or_text)
        return cls.from_dict(data or {})
