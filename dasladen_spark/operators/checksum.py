"""Order-independent dataset fingerprinting — "did the rewrite
preserve the content?" as one cheap scan.

Every storage-maintenance operation this engine ships (compaction,
bucketed rewrite, z-order clustering, snapshot swap, CDC apply)
promises content preservation; this operator turns that promise into
a checkable number. The fingerprint is the SUM of a per-row portable
hash (md5 of a canonical string rendering, folded to a 60-bit int),
so it is

- order-independent (addition commutes — partitioning, shuffles and
  file layout can't change it),
- engine-portable (the same md5 arithmetic runs in DuckDB — the
  oracle proves cross-engine equality), and
- mergeable (per-partition / per-shard partial sums add up — at
  100 TB each shard publishes its partial and the totals roll up).

Multiset semantics: duplicate rows each contribute, and (sum, count)
detects any single-row change with overwhelming probability. Rows
must be rendered canonically — the caller supplies string-typed
column expressions (doubles via fixed-scale DECIMAL, timestamps via
date_format) because raw float formatting is NOT portable across
engines.

Beyond-reference operator (the reference delegates all query power
to an RDBMS, /root/reference/dasladen/task.py:94-107).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: field separator unlikely to occur in data; NULLs render as a
#: sentinel distinct from the empty string
_SEP = "\x1f"
_NULL = "\x00null"


def canonical_row(cols: list[Column]) -> Column:
    """One canonical string per row from pre-rendered string columns
    (NULL-safe, positional)."""
    return F.concat_ws(
        _SEP, *[F.coalesce(c.cast("string"), F.lit(_NULL)) for c in cols]
    )


def row_hash64(canonical: Column) -> Column:
    """Portable 60-bit row hash: the first 15 hex digits of md5,
    parsed base-16 — bigint-safe, identical in any engine with md5."""
    return F.conv(F.substring(F.md5(canonical), 1, 15), 16, 10).cast("bigint")


def dataset_fingerprint(df: DataFrame, cols: list[Column]) -> DataFrame:
    """(n_rows, content_hash): count plus the DECIMAL-exact sum of
    per-row hashes — equal fingerprints ⇒ equal row multisets (up to
    hash collision odds ~2⁻⁶⁰ per differing row). The keyless case of
    grouped_fingerprint — one definition of the hash-sum."""
    return grouped_fingerprint(df, [], cols)


def grouped_fingerprint(
    df: DataFrame, keys: list[str], cols: list[Column]
) -> DataFrame:
    """Per-group content fingerprints — (keys..., n_rows,
    content_hash): the partition-level form of dataset_fingerprint,
    for validating selective rewrites (one partition compacted, one
    source re-ingested) without re-hashing the whole table's total
    into one number."""
    return (
        df.select(
            *keys, row_hash64(canonical_row(cols)).alias("h")
        )
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("content_hash"),
        )
    )
