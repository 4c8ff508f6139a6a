"""Golden-record survivorship — the master-data-management merge step:
after entity resolution groups records into clusters, pick ONE canonical
value per attribute by explicit, deterministic survivorship rules
(most-frequent-wins with lexicographic tie-break; max for monotone
measures; min id as the surviving key).  Public MDM practice (the
"survivorship rules" of every MDM product; cf. Talend/Informatica docs).

Reference analog: tile fan-in keeps one canonical extraction among
duplicates by confidence-then-position rules
(``tasks/point_extraction/tiling.py`` fan-in dedup; ``tasks/
text_extraction/tile.py``) — survivorship is that rule block as a
reusable relational operator.

Scale design (100 TB): one groupBy per attribute-mode computation keyed
(cluster, value) — combinable — then a rank window over the per-cluster
DISTINCT-VALUE table (bounded by values-per-cluster, not rows); the
final assembly is one groupBy over clusters.  Exact integers/strings
only — no floats at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _mode_col(clustered: DataFrame, key: str, attr: str) -> DataFrame:
    """Most frequent value of ``attr`` per cluster, ties broken by the
    value's ascending sort order (deterministic)."""
    counts = clustered.groupBy(key, attr).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    w = Window.partitionBy(key).orderBy(
        F.col("_c").desc(), F.col(attr).asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(key, F.col(attr).alias(f"golden_{attr}"))
    )


def golden_records(
    docs: DataFrame,
    *,
    cluster_key,
    attrs_mode: list[str] = ("lang", "source"),
    attr_max: str = "n_chars",
) -> DataFrame:
    """One golden record per cluster: surviving id = min doc_id,
    mode-winning categorical attributes, max measure, member count."""
    clustered = docs.withColumn("_ck", cluster_key)
    base = clustered.groupBy("_ck").agg(
        F.min("doc_id").cast("long").alias("golden_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max(attr_max).cast("long").alias(f"golden_{attr_max}"),
    )
    out = base
    for attr in attrs_mode:
        out = out.join(_mode_col(clustered, "_ck", attr), "_ck")
    return out.select(
        F.col("_ck").cast("long").alias("cluster_key"),
        "golden_doc_id",
        "n_members",
        f"golden_{attr_max}",
        *[f"golden_{a}" for a in attrs_mode],
    )
