"""PII detection and redaction for training-data curation.

Pure JVM column expressions (regexp_count / regexp_replace) — the
standard pre-training scrub pass: find and mask emails, IPv4 addresses
and phone numbers before a corpus ships.  Patterns are deliberately free
of regex features where Java's leftmost-first and RE2's leftmost-longest
matching could diverge (no alternation inside a match, no ambiguous
optionals), so the DuckDB oracle twin computes byte-identical output.

Scale shape: a narrow projection over the corpus — no shuffle, no UDF,
whole-stage codegen end to end.  At 100 TB this is a map-only pass whose
cost is the parquet scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: redaction order is part of the contract: emails first (their digit
#: runs must not feed the phone pattern), then IPs (dotted digit runs
#: would otherwise match phone-ish shapes), then phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}(-\d{3,4}){2,3}"

PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds one ``n_<kind>`` count column per rule plus ``redacted``, the
    text with every match replaced by the rule's placeholder.

    Counts are staged: each kind is counted on the text as redacted by the
    *previous* rules, so a token never counts twice (an IP inside an
    already-masked email is gone by the time the IP rule runs)."""
    out = df
    cur: Column = F.col(text_col)
    for kind, pattern, placeholder in PII_RULES:
        out = out.withColumn(f"n_{kind}",
                             F.regexp_count(cur, F.lit(pattern)).cast("long"))
        cur = F.regexp_replace(cur, pattern, placeholder)
        # stage through a projection so the replace chain isn't duplicated
        # into every downstream use of `cur`
        out = out.withColumn("_pii_stage", cur)
        cur = F.col("_pii_stage")
    return out.withColumnRenamed("_pii_stage", "redacted")


def pii_flag(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Boolean ``has_pii`` without materializing the redacted text —
    the cheap filter-only variant."""
    c = F.col(text_col)
    cond = None
    for _, pattern, _ in PII_RULES:
        hit = c.rlike(pattern)
        cond = hit if cond is None else (cond | hit)
    return df.withColumn("has_pii", cond)
