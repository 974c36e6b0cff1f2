"""Skew-handling join utilities.

AQE's skew-join splitting (on by default in session.py) handles most
hot-key cases by splitting oversized shuffle partitions. Explicit
salting is still the right tool when (a) AQE is unavailable (some
managed runtimes), (b) the skew is extreme enough that a single key
exceeds one executor's memory even after AQE splits neighboring keys
(splits happen at partition granularity — one monster key still lands
in one partition), or (c) the join is a sort-merge whose *sort* is
the bottleneck. The pattern: fan the big side's hot keys out over N
salt buckets, replicate the matching small-side rows N ways, join on
(key, salt). Deterministic (hash-based salt, no RNG) so results are
reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join with the big (skewed) side salted ``salt`` ways.

    The big side's salt is a deterministic hash of the full row's
    partition-id-free content (``salt_source`` overrides — pass a
    high-cardinality column for cheaper hashing); the small side is
    replicated ``salt`` times via a tiny explode (cost: |small| ×
    salt rows through the shuffle — acceptable precisely when the
    small side is small, which is when skew hurts most).

    Supports inner and left joins (the salted right side would
    duplicate unmatched-left handling otherwise).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)

    src = salt_source if salt_source is not None else F.xxhash64(*big.columns)
    b = big.withColumn(_SALT, F.pmod(src, F.lit(salt)).cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, on=keys + [_SALT], how=how).drop(_SALT)
