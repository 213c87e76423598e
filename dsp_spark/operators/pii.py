"""PII detection / redaction for corpus curation.

Regex-based scanning for the classic structured-PII classes (email,
IPv4, E.164-ish phone, US SSN). Pure JVM-side `regexp_count` /
`regexp_replace` chains — no Python in the row path, no shuffle; at
100 TB this runs at parquet-scan speed and composes with the quality/
language filters as one narrow stage.

Patterns deliberately use only constructs with identical semantics in
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, `\\b` — so every operator has an exact SQL oracle.
Real-world NER-grade PII (names, addresses) needs a model pass and
belongs in a Pandas-UDF stage like multimodal.py's feature extractors;
the regex tier is the cheap always-on first pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# class -> (pattern, replacement tag); order matters for redaction
# (email before phone so the digits in a local-part aren't half-eaten)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\+\d{7,15}\b", "[PHONE]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
}


def pii_count(col: str, kind: str) -> Column:
    """Match count for one PII class (duckdb mirror: pii_count_sql)."""
    return F.regexp_count(F.col(col), F.lit(PII_PATTERNS[kind][0]))


def pii_count_sql(col: str, kind: str) -> str:
    return f"len(regexp_extract_all({col}, '{PII_PATTERNS[kind][0]}'))"


def redact(col: str) -> Column:
    """All PII classes replaced by their tags, applied in dict order
    (duckdb mirror: redact_sql)."""
    out = F.col(col)
    for pattern, tag in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, tag)
    return out


def redact_sql(col: str) -> str:
    out = col
    for pattern, tag in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pattern}', '{tag}', 'g')"
    return out
