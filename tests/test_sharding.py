"""bucketed_cumsum exactness + shard manifest vs python models."""

from __future__ import annotations

import hashlib


def test_bucketed_cumsum_matches_naive_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from uncharted_ta1_spark.operators.binning import bucketed_cumsum

    import random

    rng = random.Random(13)
    rows = [
        (g, i, rng.randint(1, 50))
        for g in ("a", "b")
        for i in rng.sample(range(10_000), 500)
    ]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = bucketed_cumsum(
        df, keys=["g"], order_col="o", val_col="v", n_buckets=7
    )
    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = df.withColumn("_cum", F.sum("v").over(w).cast("long"))
    a = {(r.g, r.o): r._cum for r in got.collect()}
    b = {(r.g, r.o): r._cum for r in naive.collect()}
    assert a == b


def test_shard_manifest_matches_python(spark):
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.sharding import shard_manifest

    rows = [(i, "s%d" % (i % 2), 5 + (i * 7) % 20) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, split string, w long")
    got = {
        (r.split, r.shard_id): r
        for r in shard_manifest(
            docs, split_col=F.col("split"), weight_col=F.col("w"), budget=100
        ).collect()
    }
    # python model
    by_split = {}
    for doc_id, split, w in sorted(rows):
        by_split.setdefault(split, []).append((doc_id, w))
    exp = {}
    for split, items in by_split.items():
        cum = 0
        for doc_id, w in items:
            shard = cum // 100
            st = exp.setdefault((split, shard), [0, 0, [], None, None])
            st[0] += 1
            st[1] += w
            st[2].append(doc_id)
            cum += w
    assert set(got) == set(exp)
    for key, (n, tot, ids, _, _) in exp.items():
        r = got[key]
        assert (r.n_docs, r.n_tokens, r.first_doc, r.last_doc) == (
            n,
            tot,
            min(ids),
            max(ids),
        ), key
        h = hashlib.md5(",".join(str(i) for i in sorted(ids)).encode()).hexdigest()
        assert r.manifest_hash == h
    # shards are contiguous and never exceed budget by more than one doc
    for (split, shard), (_, tot, ids, _, _) in exp.items():
        assert tot < 100 + max(w for _, w in by_split[split])


def test_vocab_coverage_matches_python(spark):
    from uncharted_ta1_spark.operators.feathash import vocab_coverage

    texts = [
        "a a a a a a b b b c c d",
        "a a b b c e f g",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r.per_mille: r for r in vocab_coverage(docs).collect()}
    # python model
    from collections import Counter

    cnt = Counter(w for t in texts for w in t.split() if w)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    for pm in (500, 900, 990, 999):
        cum = 0
        for i, (w, c) in enumerate(ranked):
            cum += c
            if cum * 1000 >= total * pm:
                break
        r = got[pm]
        assert (r.vocab_needed, r.covered_tokens, r.total_tokens) == (
            i + 1,
            cum,
            total,
        ), pm
    # monotone: higher coverage never needs a smaller vocab
    pms = sorted(got)
    for a, b in zip(pms, pms[1:]):
        assert got[a].vocab_needed <= got[b].vocab_needed
