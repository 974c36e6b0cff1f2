"""As-of join (point-in-time / "most recent prior row") — absent from
both the reference (SURVEY.md §2.8) and Spark's built-ins.

Spark-first implementation: union both sides, run one
``last(..., ignorenulls=True)`` window per key ordered by time, keep
the left rows. Cost = ONE shuffle on the join key + a sort within
partitions — no range cross-product, no per-key driver loop, so it
scales linearly to 100 TB and skew only affects hot keys (AQE skew
handling applies). This beats the naive broadcast/cross-join formula
whenever the right side is large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"
_TIE = "__asof_tie"
_PAYLOAD = "__asof_payload"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str] | None = None,
    left_tiebreak: str | None = None,
    right_tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) and equal keys.

    right_cols maps right column → output alias (default: all
    non-key/non-ts right columns, prefixed ``right_``). Tiebreak
    columns make ordering deterministic when timestamps collide.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        skip = set(keys) | {right_ts}
        right_cols = {c: f"right_{c}" for c in right.columns if c not in skip}

    payload = F.struct(*[F.col(c).alias(a) for c, a in right_cols.items()])
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(False).alias(_SIDE),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).cast("long").alias(_TIE),
        payload.alias(_PAYLOAD),
    )

    left_keep = [c for c in left.columns]
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_TS),
        F.lit(True).alias(_SIDE),
        (F.col(left_tiebreak) if left_tiebreak else F.lit(0)).cast("long").alias(_TIE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c).alias(f"__l_{c}") for c in left_keep],
    )
    r_aligned = r.select(
        *[F.col(k) for k in keys],
        _TS,
        _SIDE,
        _TIE,
        _PAYLOAD,
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_keep],
    )
    both = l.unionByName(r_aligned)

    # right rows sort before left rows at equal ts → inclusive ("<=")
    # semantics; flip for strict ("<").
    side_order: Column = F.col(_SIDE).cast("int")
    if strict:
        side_order = F.lit(1) - side_order
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), side_order.asc(), F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("__match", F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = matched.filter(F.col(_SIDE)).select(
        *[F.col(f"__l_{c}").alias(c) for c in left_keep],
        *[F.col("__match").getField(a).alias(a) for a in right_cols.values()],
    )
    return out


def asof_join_broadcast(
    left: DataFrame,
    right,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str] | None = None,
    strict: bool = False,
    max_right_rows: int = 2_000_000,
) -> DataFrame:
    """As-of join for a SMALL right side (rates, quotes, configs):
    the right table is collected once and shipped in the task
    closure; each left partition runs a vectorized pandas merge_asof
    locally. ZERO shuffle of the (huge) left side — the complement
    of asof_join's union+window, which shuffles both sides.

    Use when |right| fits in executor memory (≲ tens of MB); the
    union+window form handles the general case. The smallness
    contract is ENFORCED, not assumed (the scoring.py localize
    pattern): the collecting fetch is bounded at
    ``max_right_rows + 1``, so a corpus-sized right side raises
    loudly instead of silently OOMing the driver and every executor
    closure."""
    import pandas as pd

    right_df = right
    if right_cols is None:
        skip = {on, right_ts}
        right_cols = {c: f"right_{c}" for c in right_df.columns if c not in skip}

    rts = "__asof_right_ts"
    rpdf = (
        right_df.select(on, F.col(right_ts).alias(rts), *right_cols.keys())
        .limit(max_right_rows + 1)
        .toPandas()
    )
    if len(rpdf) > max_right_rows:
        raise ValueError(
            f"asof_join_broadcast: right side exceeds max_right_rows="
            f"{max_right_rows:,} — it ships in every task closure, so a"
            " corpus-sized right side belongs in asof_join (the"
            " union+window form), or raise the cap explicitly"
        )
    rpdf = (
        rpdf.rename(columns=right_cols)
        .sort_values(rts)
        .reset_index(drop=True)
    )
    from pyspark.sql.types import StructType

    out_schema = StructType(
        left.schema.fields
        + [
            type(f)(right_cols[f.name], f.dataType, True)
            for f in right_df.schema.fields
            if f.name in right_cols
        ]
    )
    allow_exact = not strict

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ordered = pdf.sort_values(left_ts).reset_index(drop=True)
            merged = pd.merge_asof(
                ordered,
                rpdf,
                left_on=left_ts,
                right_on=rts,
                by=on,
                allow_exact_matches=allow_exact,
                direction="backward",
            ).drop(columns=[rts])
            yield merged

    return left.mapInPandas(run, out_schema)
