"""Arrow-UDF surface: pandas path must equal the builtin JVM path, and the
multimodal stub plumbing must produce the declared schema over real batches."""

from __future__ import annotations

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.functions.arrow_udfs import (
    multimodal_features,
    token_stats_builtin,
    token_stats_pandas,
)

SF = "/root/testdata/sf0.001"


def test_pandas_udf_equals_builtin(spark):
    seq = datagen.sequences_df(spark, SF).select("doc_id", "source", "seq_no", "tokens")
    a = (
        token_stats_pandas(seq)
        .orderBy("doc_id", "source", "seq_no")
        .select("token_sum")
        .toPandas()
    )
    b = (
        token_stats_builtin(seq)
        .orderBy("doc_id", "source", "seq_no")
        .select("token_sum")
        .toPandas()
    )
    assert a.equals(b)


def test_multimodal_stub_schema_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = multimodal_features(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "byte_len", "sha256_hex", "fake_width", "fake_height",
    ]
    pdf = out.orderBy("doc_id").toPandas()
    assert len(pdf) == docs.count()
    assert (pdf.byte_len > 0).all()
    assert pdf.sha256_hex.str.len().eq(64).all()
    # deterministic across runs
    pdf2 = multimodal_features(docs).orderBy("doc_id").toPandas()
    assert pdf.equals(pdf2)
