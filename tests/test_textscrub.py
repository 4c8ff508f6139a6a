"""Semantic edge cases for textscrub / span-dedup / entropy operators
(the oracle gate covers the corpus-level behavior; these pin the
per-row semantics on crafted inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.dedup import span_duplication
from uncharted_ta1_spark.operators.textscrub import scrub_pii, url_domain_stats
from uncharted_ta1_spark.operators.textstats import word_entropy


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_pii_counts_and_hash_stability(spark):
    rows = [
        (1, "mail a.b+c@x-y.org then 555-1234 from 10.0.0.1 done"),
        (2, "no pii here at all"),
        (3, "two mails p@q.io r@s.co and 999.999.999.999"),
    ]
    out = {r["doc_id"]: r for r in scrub_pii(_docs(spark, rows)).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 1)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 0, 0)
    # 3-digit-octet pattern matches 999.999.999.999 (redaction, not validation)
    assert (out[3]["n_emails"], out[3]["n_ips"]) == (2, 1)
    # identical input rows must redact to identical hashes
    again = {r["doc_id"]: r for r in scrub_pii(_docs(spark, rows)).collect()}
    assert all(out[k]["redacted_hash"] == again[k]["redacted_hash"] for k in out)
    # and a doc with no PII hashes like its raw text (nothing was touched)
    raw_hash = (
        _docs(spark, rows[1:2])
        .select(
            F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long").alias("h")
        )
        .collect()[0]["h"]
    )
    assert out[2]["redacted_hash"] == raw_hash


def test_url_domains_normalizes_scheme_www_case(spark):
    rows = [
        (1, "see https://www.Example.COM/a and http://example.com/b"),
        (2, "also https://sub.Example.com"),
    ]
    out = {r["domain"]: r for r in url_domain_stats(_docs(spark, rows)).collect()}
    assert out["example.com"]["n_urls"] == 2
    assert out["example.com"]["n_docs"] == 1
    assert out["sub.example.com"]["n_docs"] == 1


def test_span_duplication_flags_cross_doc_spans_only(spark):
    shared = " ".join(f"w{i}" for i in range(10))  # one exact 10-word span
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(5))  # short tail span
    rows = [
        (1, shared + " " + uniq_a),  # spans: shared, uniq_a
        (2, shared + " " + uniq_b),  # spans: shared, uniq_b (tail)
        (3, uniq_b),  # same 5-word text as doc 2's tail -> duplicated
    ]
    out = {r["doc_id"]: r for r in span_duplication(_docs(spark, rows)).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_spans"] == 2 and out[2]["n_dup_spans"] == 2
    assert out[3]["n_spans"] == 1 and out[3]["n_dup_spans"] == 1
    assert out[1]["dup_span_frac"] == 0.5


def test_sliding_spans_catch_boundary_straddling_duplicates(spark):
    """A duplicated passage shifted by 5 words (half the aligned span) never
    lines up with the aligned 10-word span grid — aligned span dedup misses
    it entirely; the stride-5 sliding tier places a window at every 5-word
    offset, so both copies emit the identical p0..p9 window.  (Stride-s
    windows catch duplicates at offsets congruent mod s — the aligned tier
    is the degenerate s = span case.)"""
    from uncharted_ta1_spark.operators.dedup import sliding_span_duplication

    passage = " ".join(f"p{i}" for i in range(14))
    pre = " ".join(f"x{i}" for i in range(5))  # shift by 5: off-grid for 10
    pad_a = " ".join(f"a{i}" for i in range(6))
    pad_b = " ".join(f"b{i}" for i in range(6))
    rows = [
        (1, passage + " " + pad_a),  # passage at offset 0
        (2, pre + " " + passage + " " + pad_b),  # passage at offset 5
    ]
    aligned = {
        r["doc_id"]: r for r in span_duplication(_docs(spark, rows)).collect()
    }
    sliding = {
        r["doc_id"]: r
        for r in sliding_span_duplication(_docs(spark, rows)).collect()
    }
    assert aligned[1]["n_dup_spans"] == 0 and aligned[2]["n_dup_spans"] == 0
    assert sliding[1]["n_dup_spans"] > 0 and sliding[2]["n_dup_spans"] > 0


def test_sliding_spans_short_doc_single_window(spark):
    from uncharted_ta1_spark.operators.dedup import sliding_span_duplication

    rows = [(1, "only four words here"), (2, "only four words here")]
    out = {
        r["doc_id"]: r
        for r in sliding_span_duplication(_docs(spark, rows)).collect()
    }
    assert out[1]["n_spans"] == 1 and out[1]["n_dup_spans"] == 1
    assert out[2]["dup_span_frac"] == 1.0


def test_span_scrub_removes_shared_spans_preserving_order(spark):
    from uncharted_ta1_spark.operators.dedup import span_scrub

    boiler = " ".join(f"w{i}" for i in range(10))  # shared 10-word span
    head = " ".join(f"a{i}" for i in range(10))
    tail = " ".join(f"b{i}" for i in range(4))  # short unique tail span
    rows = [
        (1, head + " " + boiler + " " + tail),  # keep head + tail, drop mid
        (2, boiler),  # fully boilerplate -> empty text
        (3, "just unique words here"),
    ]
    out = {r["doc_id"]: r for r in span_scrub(_docs(spark, rows)).collect()}
    assert out[1]["clean_text"] == head + " " + tail
    assert out[1]["n_spans"] == 3 and out[1]["n_spans_removed"] == 1
    assert out[2]["clean_text"] == "" and out[2]["n_spans_removed"] == 1
    assert out[3]["clean_text"] == "just unique words here"
    assert out[3]["n_spans_removed"] == 0


def test_word_entropy_bounds(spark):
    rows = [
        (1, "x x x x"),  # single distinct word -> exactly 0.0
        (2, "a b c d"),  # uniform over 4 -> ln(4)
    ]
    out = {r["doc_id"]: r for r in word_entropy(_docs(spark, rows)).collect()}
    assert out[1]["entropy_nats"] == 0.0
    import math

    assert abs(out[2]["entropy_nats"] - math.log(4.0)) < 1e-6
    assert out[2]["n_distinct_words"] == 4
