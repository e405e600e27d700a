"""Cross-engine deterministic hashing + shingling helpers.

``md5_long`` produces the SAME value in Spark and DuckDB
(Spark: conv(substring(md5(x),1,15),16,10); DuckDB:
CAST('0x'||substring(md5(x),1,15) AS BIGINT)) — 60 bits, always positive,
safely inside a signed int64. Used wherever an oracle must reproduce the
engine's hash (minhash signatures, fingerprints, bucket assignments).

``xxhash64`` (JVM codegen, no string materialization) remains the fast path
where no oracle parity is needed (lake bucketing, salting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column, salt: str | None = None) -> Column:
    """60-bit positive deterministic hash, reproducible in DuckDB SQL."""
    src = F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB-side twin of :func:`md5_long` (ANSI-ish SQL string)."""
    src = f"({expr} || '{salt}')" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST(('0x' || substring(md5({src}),1,15)) AS BIGINT)"


def md5_base28(col: Column) -> Column:
    """28-bit positive deterministic hash (7 hex chars of md5) — small
    enough that (a * base + b) with a < 2^31 stays inside int64 on every
    engine (DuckDB raises on int64 overflow; Java would silently wrap)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast("long")


def md5_base28_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_base28`."""
    return f"CAST(('0x' || substring(md5({expr}),1,7)) AS BIGINT)"


def affine_params(k: int, prime: int) -> list[tuple[int, int]]:
    """K deterministic (a, b) pairs for the universal hash family
    h_i(x) = (a_i*x + b_i) mod prime — md5-seeded so both engines inline
    the same literals; a_i != 0."""
    import hashlib

    def _h(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)

    return [
        (_h(f"mh-a-{i}") % (prime - 1) + 1, _h(f"mh-b-{i}") % prime)
        for i in range(k)
    ]


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column, as array<string>.

    Pure JVM expression: split on whitespace, then slide a window with
    transform over an index sequence — no UDF, stays in codegen.
    """
    words = F.split(F.trim(F.lower(col)), r"\s+")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array(F.concat_ws(" ", words)))
    )
