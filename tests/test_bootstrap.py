"""Poisson bootstrap CI vs a pure-python model."""

from __future__ import annotations

import hashlib


def _md5_i64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


THS = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990)


def _w(h):
    return sum(1 for t in THS if h >= t)


def test_poisson_weights_have_unit_mean(spark):
    """The frozen CDF table must actually produce ~Poisson(1) weights:
    mean within 2% of 1.0 over 100k hashes and max weight <= 8."""
    ws = [_w(_md5_i64(f"boot|{i}") % 1_000_000) for i in range(100_000)]
    m = sum(ws) / len(ws)
    assert abs(m - 1.0) < 0.02
    assert max(ws) <= 8


def test_bootstrap_ci_matches_python(spark):
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.bootstrap import bootstrap_mean_ci

    rows = [("a", i, 10 + (i * 7) % 23) for i in range(60)] + [
        ("b", i, 100 + (i * 13) % 7) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "src string, rid long, v long")
    got = {
        r.src: r
        for r in bootstrap_mean_ci(
            df,
            group="src",
            value="v",
            row_key=F.concat_ws("#", F.col("src"), F.col("rid").cast("string")),
            n_replicates=50,
        ).collect()
    }
    # python model
    by = {}
    for src, rid, v in rows:
        by.setdefault(src, []).append((f"{src}#{rid}", v))
    for src, items in by.items():
        reps = []
        for b in range(50):
            s = c = 0
            for rk, v in items:
                w = _w(_md5_i64(f"boot|{rk}|{b}") % 1_000_000)
                s += w * v
                c += w
            reps.append((round(s / c, 9) if c else None, b))
        reps.sort(key=lambda t: (t[0] is not None, t[0], t[1]))
        lo = reps[max(1, round(0.025 * 50)) - 1][0]
        hi = reps[min(50, round(0.975 * 50)) - 1][0]
        r = got[src]
        assert (r.ci_lo, r.ci_hi) == (lo, hi), (src, r.ci_lo, r.ci_hi, lo, hi)
        mean = sum(v for _, v in items) / len(items)
        assert abs(r.mean_value - round(mean, 9)) < 1e-12
        assert r.n_rows == len(items) and r.n_replicates == 50
        # CI must bracket the point estimate and be non-degenerate
        assert r.ci_lo <= r.mean_value <= r.ci_hi
        assert r.ci_lo < r.ci_hi
