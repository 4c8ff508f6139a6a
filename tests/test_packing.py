"""Concat-and-chunk packing semantics on hand-built streams."""

from __future__ import annotations

import pytest

from uncharted_ta1_spark.operators.packing import pack_chunks


def _seq(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, seq_no int, event_epoch long, n_tok int"
    )


def test_hand_computed_packing(spark):
    # stream: 60, 50, 10, 100 tokens at capacity 64
    rows = [
        ("d", "s", 0, 100, 60),   # [0, 60)   -> chunk 0, off 0
        ("d", "s", 1, 200, 50),   # [60, 110) -> starts chunk 0 off 60, straddles into 1
        ("d", "s", 2, 300, 10),   # [110, 120)-> chunk 1, off 46
        ("d", "s", 3, 400, 100),  # [120, 220)-> chunk 1 off 56, ends chunk 3
    ]
    out = {r.seq_no: r for r in pack_chunks(_seq(spark, rows), capacity=64).collect()}
    assert (out[0].chunk_id, out[0].chunk_off, out[0].end_chunk, out[0].straddles) == (0, 0, 0, False)
    assert (out[1].chunk_id, out[1].chunk_off, out[1].end_chunk, out[1].straddles) == (0, 60, 1, True)
    assert (out[2].chunk_id, out[2].chunk_off, out[2].end_chunk, out[2].straddles) == (1, 46, 1, False)
    assert (out[3].chunk_id, out[3].chunk_off, out[3].end_chunk, out[3].straddles) == (1, 56, 3, True)


def test_stream_is_gapless(spark):
    """Concat semantics: offsets tile the stream exactly — each sequence
    starts where the previous one ended, no token wasted to padding."""
    rows = [("d", "s", i, 100 * (i + 1), 7 + i) for i in range(10)]
    out = sorted(
        pack_chunks(_seq(spark, rows), capacity=16).collect(),
        key=lambda r: r.seq_no,
    )
    expect = 0
    for r in out:
        assert r.start_off == expect
        assert 0 <= r.chunk_off < 16
        assert r.end_chunk == (r.start_off + r.n_tok - 1) // 16
        expect += r.n_tok


def test_streams_are_independent(spark):
    rows = [("d1", "s", 0, 100, 30), ("d2", "s", 0, 100, 30)]
    out = pack_chunks(_seq(spark, rows), capacity=64).collect()
    assert all(r.start_off == 0 and r.chunk_id == 0 for r in out)


def test_bad_capacity_rejected(spark):
    with pytest.raises(ValueError):
        pack_chunks(_seq(spark, [("d", "s", 0, 1, 1)]), capacity=0)
