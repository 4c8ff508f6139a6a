"""Mergeable cardinality / frequency sketches for 100-TB aggregation.

Two classic streaming sketches, built so the *registers* are plain rows of
an aggregatable DataFrame — which is exactly what makes them scale: every
step is a map-side-combinable ``groupBy`` whose output is CONSTANT-SIZE
(64 HLL registers, 4x256 CMS counters) regardless of input rows, and two
sketches built on disjoint data merge by ``max`` / ``+`` on their register
tables.  That is the distributed-counting story the reference's
distinct-count gates (A5: ``tasks/point_extraction/point_extraction.py``
count guards, ``tasks/text_extraction/text_extraction.py:133-141``
per-class tallies) need once a single node can no longer hold the key set.

Portability contract (the DuckDB oracle reproduces every register
bit-for-bit):

  * the hash is ``md5_i64`` (functions/portable.py) — 60-bit integer from
    the md5 hex prefix, identical in both engines;
  * HLL's rank-of-first-bit uses ``length(bin(x))`` — both Spark and DuckDB
    render integers as minimal binary strings, so ``55 - length(bin(h))``
    is an exact integer rho with zero float involvement;
  * the HLL harmonic sum is kept as an exact BIGINT (``sum(1 << (55 -
    M))``, at most 64 * 2^55 < 2^63), so the only floating-point steps are
    one division and the final estimator arithmetic — a fixed IEEE tree
    that both engines evaluate identically;
  * CMS is integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import md5_i64

# 2^55 — the HLL register ceiling: md5_i64 is 60 bits, 6 go to the bucket
# index, leaving 54 payload bits; rho ranges 1..54 with 55 for payload 0.
POW2_55 = 1 << 55

HLL_M = 64  # 2^6 buckets; standard error 1.04/sqrt(64) ~ 13%

CMS_DEPTH = 4
CMS_WIDTH = 256


def hll_registers(df: DataFrame, group_cols: list[str], key_col: str,
                  salt: str = "hll") -> DataFrame:
    """Per-group HyperLogLog registers: (group, bucket, M = max rho).

    One combinable groupBy; output is <= |groups| * 64 rows no matter how
    many input rows — the shuffle carries registers, not keys.  Registers
    for disjoint inputs merge with ``max`` (see ``hll_merge``).
    """
    h = md5_i64(F.col(key_col).cast("string"), salt=salt)
    # shiftright, NOT h/64: long division routes through double in Spark
    # and a 60-bit hash does not survive a 53-bit mantissa
    h2 = F.shiftright(h, 6)  # payload: top 54 bits
    rho = F.when(h2 > 0, F.lit(55) - F.length(F.bin(h2))).otherwise(F.lit(55))
    return (
        df.select(
            *group_cols,
            (h % HLL_M).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge registers down to a coarser grouping (the mergeability that
    makes HLL the 100-TB distinct-count: partial sketches union by max)."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("m_reg").alias("m_reg")
    )


def hll_sliding_window(
    registers: DataFrame,
    *,
    day_col: str = "day",
    group_cols: list[str] | None = None,
    window_days: int = 3,
) -> DataFrame:
    """Sliding-window registers from per-day partials: day d's window
    merges the daily sketches of days ``d-window_days+1 .. d``.

    This is the windowed-distinct story at 100 TB: the event stream is
    scanned ONCE to build constant-size daily register partials
    (:func:`hll_registers`), and every sliding window after that is a
    register-table merge — each daily register row is replicated to the
    ``window_days`` windows it contributes to (an explode over a literal
    offset array, so the exploded table is |days| x 64 x window_days rows
    — droplet-sized at any event volume) and merged by ``max``.  No
    re-scan, no distinct over raw keys, no window over events.

    Windows are emitted only for OBSERVED days (an inner join against the
    distinct day list); a window's merge naturally covers however many of
    its trailing days exist.  ``n_days_merged`` reports that count so the
    partial-merge lineage is visible in the output.

    Reference analog: the CDR replay windows the reference serves by
    re-querying bounded ``created_date`` ranges (``cdr/server.py:311-319``)
    — here the range query is answered from mergeable partials instead of
    a rescan.
    """
    gcols = list(group_cols or [])
    offs = F.array(*[F.lit(i) for i in range(window_days)])
    expanded = registers.select(
        *gcols,
        F.col(day_col),
        F.explode(offs).alias("_o"),
        "bucket",
        "m_reg",
    ).withColumn("win_day", (F.col(day_col) + F.col("_o")).cast("long"))
    days = (
        registers.select(F.col(day_col).cast("long").alias("win_day"))
        .distinct()
    )
    merged = (
        expanded.join(days, "win_day")
        .groupBy(*gcols, "win_day", "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    n_days = (
        expanded.join(days, "win_day")
        .groupBy(*gcols, "win_day")
        .agg(F.countDistinct(day_col).cast("long").alias("n_days_merged"))
    )
    return merged, n_days


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse registers to the HLL cardinality estimate per group.

    The harmonic mean's denominator sum(2^-M) is scaled by 2^55 and summed
    as an exact BIGINT; missing buckets contribute 2^55 (M=0).  Small-range
    linear counting applies below 2.5*m when empty buckets remain —
    the standard Flajolet correction.
    """
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        # SQL expr: the DataFrame shiftleft() only takes a literal shift
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m_reg)"))
        .cast("long")
        .alias("present_pow"),
    )
    sum_int = (
        F.col("present_pow")
        + (F.lit(HLL_M).cast("long") - F.col("n_present")) * F.lit(POW2_55)
    )
    zeros = (F.lit(HLL_M) - F.col("n_present")).cast("long")
    raw = (
        F.lit(alpha * HLL_M * HLL_M)
        * F.lit(float(POW2_55))
        / sum_int.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    # unrounded: callers round at the contract surface (and may need the
    # raw double for relative-error math)
    return agg.select(*group_cols, est.alias("hll_est"))


BLOOM_K = 4
BLOOM_M = 16384  # bits; ~1% FP at ~1.7k inserted keys


def bloom_bits(keys: DataFrame, key_col: str = "sh_hash") -> DataFrame:
    """Bloom filter of a key set as a bit-position table: distinct
    ``pos = hash_j(key) % m`` rows for j in 0..k-1.

    At most BLOOM_M rows no matter how many keys — the constant-size
    membership state that replaces broadcasting the full eval index once
    the eval corpus itself is large.  Filters over disjoint key sets merge
    by unioning their position tables (bitwise OR).
    """
    parts = []
    for j in range(BLOOM_K):
        pos = (
            md5_i64(F.col(key_col).cast("string"), salt=f"bf{j}") % BLOOM_M
        ).cast("int")
        parts.append(keys.select(pos.alias("pos")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_membership(probes: DataFrame, bits: DataFrame,
                     key_col: str = "sh_hash") -> DataFrame:
    """Test each probe row's key against the filter: member iff ALL k bit
    positions are set.  ``bits`` (<= BLOOM_M rows) broadcasts; the probe
    side is touched k times map-side and shuffles only on its own keys.

    Returns the probe frame + boolean ``bloom_hit``.  One-sided error:
    every true member tests positive; a positive may be false.  Duplicate
    probe rows for the same ``(*other, key)`` tuple collapse to one output
    row (the historical groupBy contract, now an explicit ``distinct``).

    Plan shape: k map-side broadcast LEFT joins (one per hash function,
    each on a computed bit position against the <= BLOOM_M-row position
    table) in a single narrow stage — the probe side is expanded ZERO
    times and shuffles only for the distinct.  This replaced a k-way
    union + groupBy formulation that shuffled k x |probes| rows
    (guide §2.3: aggregate/test map-side instead of shuffling the
    expansion).
    """
    other = [c for c in probes.columns if c != key_col]
    out = probes.distinct()
    hit = F.lit(True)
    for j in range(BLOOM_K):
        pos = (
            md5_i64(F.col(key_col).cast("string"), salt=f"bf{j}") % BLOOM_M
        ).cast("int")
        bj = bits.select(
            F.col("pos").alias(f"_pos{j}"), F.lit(1).alias(f"_set{j}")
        )
        out = out.join(
            F.broadcast(bj), pos == F.col(f"_pos{j}"), "left"
        ).drop(f"_pos{j}")
        hit = hit & F.col(f"_set{j}").isNotNull()
    return out.select(*other, key_col, hit.alias("bloom_hit"))


def cms_counters(word_counts: DataFrame, word_col: str = "word",
                 count_col: str = "c",
                 group_cols: list[str] | None = None) -> DataFrame:
    """Count-min sketch counters: (group..., j, bucket, cnt) for j in 0..3.

    Input is a (word, count) table (itself one combinable groupBy over the
    corpus); output is at most |groups| * 4*256 rows.  Counters for
    disjoint corpora (or adjacent time partitions) merge by summing cnt
    on (group, j, bucket) — the additive-merge half of the sketch story
    (HLL registers merge by max, CMS counters by +).
    """
    gcols = list(group_cols or [])
    rows = []
    for j in range(CMS_DEPTH):
        bucket = (md5_i64(F.col(word_col), salt=f"cms{j}") % CMS_WIDTH).cast(
            "int"
        )
        rows.append(
            word_counts.select(
                *gcols,
                F.lit(j).alias("j"),
                bucket.alias("bucket"),
                F.col(count_col).alias("c"),
            )
        )
    all_rows = rows[0]
    for r in rows[1:]:
        all_rows = all_rows.unionByName(r)
    return (
        all_rows.groupBy(*gcols, "j", "bucket")
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def cms_lookup(words: DataFrame, counters: DataFrame,
               word_col: str = "word") -> DataFrame:
    """Point-estimate each word: min over the 4 rows' bucket counters.

    ``counters`` is tiny (<=1024 rows) and broadcast; the probe side never
    shuffles on data volume, only on the distinct words being probed.
    """
    probes = []
    for j in range(CMS_DEPTH):
        bucket = (md5_i64(F.col(word_col), salt=f"cms{j}") % CMS_WIDTH).cast(
            "int"
        )
        probes.append(
            words.select(
                F.col(word_col),
                F.lit(j).alias("j"),
                bucket.alias("bucket"),
            )
        )
    probe = probes[0]
    for p in probes[1:]:
        probe = probe.unionByName(p)
    return (
        probe.join(F.broadcast(counters), ["j", "bucket"], "inner")
        .groupBy(word_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


KMV_K = 256


def kmv_sketch(hashes: DataFrame, set_col: str, hash_col: str = "sh_hash",
               k: int = KMV_K) -> DataFrame:
    """K-minimum-values (theta-style) sketch per set: the k SMALLEST
    distinct 60-bit hashes (public method: Bar-Yossef et al. 2002 / the
    Apache DataSketches theta family).  Unlike HLL, KMV sketches support
    set INTERSECTION estimation — the "how much does train overlap eval"
    question at 100 TB without an exact distinct-join.

    Scale shape: one distinct per set, then the two-phase salted top-k
    (ascending) — never a set-partitioned window over the whole hash
    universe.  A sketch with fewer than k rows IS the exact set
    (estimators must special-case it; see kmv_estimate).
    """
    from uncharted_ta1_spark.operators.aggregates import grouped_topk

    distinct = hashes.select(set_col, hash_col).distinct()
    return grouped_topk(
        distinct,
        group_cols=[set_col],
        order_exprs=[(F.col(hash_col), False)],
        k=k,
        rank_col="_kr",
    ).drop("_kr")


def kmv_estimate(kmv: DataFrame, set_col: str, hash_col: str = "sh_hash",
                 k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per set from its KMV sketch:
    (k-1) * 2^60 / h_k, with the <k-rows sketch collapsing to the exact
    count (the sketch IS the set)."""
    agg = kmv.groupBy(set_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kmv"),
        F.max(hash_col).cast("long").alias("h_k"),
    )
    est = F.when(
        F.col("n_kmv") < k, F.col("n_kmv").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("h_k").cast("double")
    )
    return agg.select(set_col, "n_kmv", est.alias("kmv_est"))
