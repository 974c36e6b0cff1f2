"""Merge / upsert patterns — the incremental-maintenance shapes a
lakehouse pipeline runs every batch.

Without a transactional table format (Delta/Iceberg ship their own
MERGE), an upsert over parquet is a full-outer-join rewrite. These
operators express the *dataflow* so the same code drops onto a
transactional format by swapping the sink:

- merge_upsert: last-writer-wins upsert of an updates batch into a
  base snapshot (one shuffle on the key).
- scd2_apply: slowly-changing-dimension type 2 — close the current
  version of changed keys, append the new version with validity
  range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str] | str,
    version_col: str | None = None,
) -> DataFrame:
    """Return base ⊕ updates with updates winning on key collision.

    If ``version_col`` is given, the row with the highest version
    wins regardless of side (idempotent re-application of an old
    batch cannot regress the table). One shuffle on the key; no
    driver involvement."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    order = (
        [F.col(version_col).desc(), F.col("__src").desc()]
        if version_col
        else [F.col("__src").desc()]
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Type-2 SCD: ``dim`` carries (key, attrs, valid_from, valid_to)
    with the open end marked ``open_end``; ``changes`` carries
    (key, attrs, ts). Each changed key's open row is closed at the
    change timestamp and a new open row is appended.

    Single shuffle on the key (the window and the join share the
    partitioning). Change batches are assumed key-unique (dedupe
    upstream with merge_upsert semantics if not)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    end_lit = F.lit(open_end).cast(dim.schema[valid_to].dataType)

    chg = changes.select(
        *keys,
        *[c for c in changes.columns if c not in keys + [ts_col]],
        F.col(ts_col).alias(valid_from),
    ).withColumn(valid_to, end_lit)

    closing = (
        dim.join(chg.select(*keys, F.col(valid_from).alias("__chg_ts")), keys, "left")
        .withColumn(
            valid_to,
            F.when(
                (F.col(valid_to) == end_lit) & F.col("__chg_ts").isNotNull(),
                F.col("__chg_ts"),
            ).otherwise(F.col(valid_to)),
        )
        .drop("__chg_ts")
    )
    return closing.unionByName(chg.select(*closing.columns))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC between two snapshots: one row per changed key with
    ``change_type`` ∈ {insert, update, delete}. One full-outer join
    on the key; change detection is a null-safe struct comparison so
    NULL-valued attributes diff correctly."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__old"),
    )
    n = new.select(
        *keys, F.struct(*[F.col(c) for c in compare_cols]).alias("__new")
    )
    cond = [n[k].eqNullSafe(o[f"__ok_{k}"]) for k in keys]
    joined = n.join(o, cond, "full_outer")
    key_out = [F.coalesce(n[k], o[f"__ok_{k}"]).alias(k) for k in keys]
    change = (
        F.when(o["__old"].isNull(), F.lit("insert"))
        .when(n["__new"].isNull(), F.lit("delete"))
        .when(~n["__new"].eqNullSafe(o["__old"]), F.lit("update"))
    )
    return (
        joined.select(
            *key_out,
            change.alias("change_type"),
            n["__new"].alias("new_values"),
            o["__old"].alias("old_values"),
        )
        .filter(F.col("change_type").isNotNull())
    )
