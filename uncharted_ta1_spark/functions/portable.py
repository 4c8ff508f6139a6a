"""Portable scalar kernels — identical results in Spark SQL and DuckDB SQL.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so every content hash the oracle must reproduce is md5-based:
the first 15 hex chars of md5 parsed as a 60-bit non-negative int64.

Reference analog: sha256/md5 config-content hashing for cache keys
(``tasks/metadata_extraction/metadata_extraction.py:453-476``,
``tasks/point_extraction/point_extractor.py:237-244`` — C11 in SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # modulus for minhash permutations


def md5_i64(col: Column, salt: str = "") -> Column:
    """60-bit non-negative integer hash of a string column (portable)."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def md5_i64_duck(expr: str, salt: str = "") -> str:
    """DuckDB SQL fragment computing exactly ``md5_i64``."""
    inner = f"'{salt}' || ({expr})" if salt else f"({expr})"
    return f"(('0x' || substr(md5({inner}), 1, 15))::BIGINT)"


def words_col(text: Column) -> Column:
    """Whitespace tokens with empties dropped (portable)."""
    return F.filter(F.split(text, " "), lambda w: F.length(w) > 0)


WORDS_DUCK = "list_filter(string_split({text}, ' '), w -> length(w) > 0)"


def shingles_col(words: Column, n: int = 3) -> Column:
    """All n-word shingles (space-joined), in document order; empty if too
    few words.  Portable: Spark ``sequence`` is guarded against its
    descending-range behavior when size(words) < n."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_duck(words_name: str, n: int = 3) -> str:
    """DuckDB fragment for the same n-word shingles.

    ``words_name`` must be a plain column name in scope — the lambda body
    references it directly (DuckDB lambdas close over outer columns).
    DuckDB ``range(a, b)`` excludes ``b``, Spark ``sequence(a, b)`` includes
    ``b``; bounds are offset accordingly so both yield size-n+1 shingles.
    """
    parts = " || ' ' || ".join(f"{words_name}[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({words_name}) - {n - 2}, 1)), "
        f"i -> {parts})"
    )
