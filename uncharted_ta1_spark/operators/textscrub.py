"""Regex scrubbing / extraction operators for training-data curation.

PII redaction and URL normalization — the scrub pass every LLM corpus
pipeline runs before training.  Reference analog: the regex
normalize-and-strip passes of the metadata pipeline
(``tasks/metadata_extraction/metadata_extraction.py:903-933``,
``_normalize_scale`` / ``_normalize_quadrangles`` — re.sub over extracted
strings), generalized to corpus-scale columnar form.

Columnar throughout: ``regexp_count`` / ``regexp_replace`` /
``regexp_extract_all`` are JVM-side, inside whole-stage codegen — no UDFs,
no per-row Python.  Patterns stay in the RE2 ∩ Java-regex portable subset
(no backreferences, no lookaround) so the DuckDB oracle runs the exact
same patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import md5_i64

# Portable regex subset (RE2 == Java semantics for these):
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
URL_RE = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9/._-]*)?"
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def scrub_pii(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Redact emails, phone numbers and IPv4 addresses from ``text_col``.

    Emits per-doc PII counts plus a 60-bit hash of the redacted text (the
    hash pins the exact redaction output without shipping megabyte strings
    through the result set).  Redaction order is fixed (email → phone →
    ip) so nested-match behavior is deterministic.

    One narrow projection — no shuffle, no UDF; at 100 TB this is a pure
    map stage that rides the scan.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IPV4_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        md5_i64(redacted).alias("redacted_hash"),
    )


def url_domain_stats(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Extract URLs, normalize to a bare domain (strip scheme + leading
    ``www.``, lowercase), and aggregate corpus-wide per-domain stats —
    the URL-frequency / blocklist input of a web-corpus pipeline.

    Plan: one ``regexp_extract_all`` + explode (map-side), then ONE
    map-side-combinable groupBy on the domain.  Distinct-doc counts ride
    the same shuffle as ``count_distinct``.
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_DOMAIN_RE), F.lit(1))
    exploded = docs.select(
        "doc_id", F.explode(urls).alias("raw_domain")
    ).select(
        "doc_id",
        F.lower(F.regexp_replace(F.col("raw_domain"), r"^www\.", "")).alias("domain"),
    )
    return exploded.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
