"""Real BMP/PPM codec: roundtrip, padding, row order, corrupt input."""

from __future__ import annotations

import numpy as np
import pytest

from uncharted_ta1_spark.functions.arrow_udfs import (
    _encode_bmp,
    _encode_ppm,
    _parse_bmp,
    _parse_ppm,
    _synth_gray,
    decode_image_features,
    synth_image_blobs,
)


@pytest.mark.parametrize("w", [8, 9, 10, 11])  # all four BMP pad widths
def test_bmp_roundtrip_every_padding_case(w):
    h = 5
    vals = _synth_gray(3, w * h)
    pw, ph, dec = _parse_bmp(_encode_bmp(vals, w, h))
    assert (pw, ph) == (w, h)
    assert np.array_equal(dec, vals.astype("int64"))


def test_bmp_rows_really_stored_bottom_up():
    # first stored row of the pixel data must be the LAST raster row
    w, h = 4, 3
    vals = np.arange(w * h, dtype="uint8")
    blob = _encode_bmp(vals, w, h)
    first_stored = blob[54]  # offset 54, first B byte
    assert first_stored == vals.reshape(h, w)[-1, 0]


def test_ppm_roundtrip_and_header_parsing():
    vals = _synth_gray(7, 6 * 4)
    pw, ph, dec = _parse_ppm(_encode_ppm(vals, 6, 4))
    assert (pw, ph) == (6, 4)
    assert np.array_equal(dec, vals.astype("int64"))


def test_corrupt_magic_raises():
    with pytest.raises(ValueError):
        _parse_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        _parse_ppm(b"P5\n1 1\n255\n\x00")


def test_spark_encode_decode_pipeline(spark):
    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    out = {r.doc_id: r for r in decode_image_features(synth_image_blobs(docs)).collect()}
    assert len(out) == 30
    for d in range(30):
        r = out[d]
        w, h = 8 + d % 9, 4 + d % 5
        vals = _synth_gray(d, w * h).astype("int64")
        assert (r.fmt, r.width, r.height) == ("bmp" if d % 2 == 0 else "ppm", w, h)
        assert r.n_px == w * h and r.pix_sum == int(vals.sum())
        assert r.pix_min == int(vals.min()) and r.pix_max == int(vals.max())
