"""Relational/analytic queries, part 8: Kaplan–Meier survival (customer
churn) and z-order space-filling-curve locality (the data-skipping
layout audit).

Beyond-reference operators (the reference delegates all query power to
an RDBMS, /root/reference/dasladen/task.py:94-107). Determinism
discipline as in relational3+: exact integer arithmetic for every
comparison and bucket boundary; per-step DECIMAL(18,12) rounding inside
the survival fold so the product is engine- and partition-order-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

# ------------------------------------------- Kaplan–Meier survival

_KM_MONTH_DAYS = 30  # duration bucket width
_KM_CHURN_DAYS = 90  # inactive-this-long-at-cutoff = churned


@query(
    "q_kaplan_meier",
    oracle=f"""
    WITH c AS (
      SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
      FROM orders GROUP BY o_custkey
    ), d AS (
      SELECT CAST(date_diff('day', f, l) // {_KM_MONTH_DAYS} AS BIGINT) AS t,
             CASE WHEN date_diff('day', l,
                    (SELECT max(o_orderdate) FROM orders))
                  > {_KM_CHURN_DAYS} THEN 1 ELSE 0 END AS ev
      FROM c
    ), r AS (
      SELECT t, COUNT(*) AS c_t, SUM(ev) AS d_t FROM d GROUP BY t
    ), rr AS (
      SELECT t, d_t,
             SUM(c_t) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_t
      FROM r
    ), fct AS (
      SELECT t, d_t, n_t,
             CAST(ROUND(CAST(n_t - d_t AS DOUBLE) / CAST(n_t AS DOUBLE), 12)
                  AS DECIMAL(18,12)) AS fac
      FROM rr
    ), lst AS (
      SELECT list(fac ORDER BY t) AS fl FROM fct
    ), idx AS (
      SELECT t, d_t, n_t, ROW_NUMBER() OVER (ORDER BY t) AS i FROM fct
    )
    SELECT idx.t AS months,
           CAST(idx.n_t AS BIGINT) AS n_at_risk,
           CAST(idx.d_t AS BIGINT) AS n_churned,
           ROUND(CAST(list_reduce(lst.fl[1:idx.i],
                   (a, b) -> CAST(ROUND(a * b, 12) AS DECIMAL(18,12)))
                 AS DOUBLE), 6) AS survival
    FROM idx, lst
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of customer lifetime: duration =
    months between a customer's first and last order, churn event =
    no order within {_KM_CHURN_DAYS} days of the observation cutoff
    (still-active customers are right-censored — they thin the risk
    set without counting as deaths, which is the whole point of KM
    over a naive churn-rate-by-age). One row per observed duration:
    the at-risk count, churn events, and the survival estimate
    S(t) = Π_{{u<=t}} (1 - d_u/n_u).

    Scale shape: one per-customer aggregate (corpus-sized, one
    shuffle), then everything runs on the duration-bucket frame —
    bounded by the calendar (≤ ~100 months), never by row count. The
    product fold multiplies per-step factors in exact DECIMAL(18,12)
    — 18, not 38: a 38-precision decimal product trips Spark's
    precision-loss scale collapse (result scale 6) and truncates the
    fold, while 18+18+1 = 37 keeps the full 24-digit product — with
    per-step rounding (Spark F.aggregate / DuckDB list_reduce compute
    the identical sequence), so the curve is bit-stable under any
    partitioning."""
    from dasladen_spark.functions.vectors import bounded_window_key

    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    end = o.agg(F.max("o_orderdate").alias("endd"))
    d = c.crossJoin(F.broadcast(end)).select(
        F.expr(
            f"CAST(datediff(l, f) DIV {_KM_MONTH_DAYS} AS BIGINT)"
        ).alias("t"),
        (F.datediff("endd", "l") > _KM_CHURN_DAYS).cast("int").alias("ev"),
    )
    r = d.groupBy("t").agg(
        F.count(F.lit(1)).alias("c_t"), F.sum("ev").alias("d_t")
    )
    w_risk = (
        Window.partitionBy(bounded_window_key(F.col("c_t")))
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rr = r.select("t", "d_t", F.sum("c_t").over(w_risk).alias("n_t"))
    fct = rr.select(
        "t",
        "d_t",
        "n_t",
        F.round(
            (F.col("n_t") - F.col("d_t")).cast("double")
            / F.col("n_t").cast("double"),
            12,
        )
        .cast("decimal(18,12)")
        .alias("fac"),
    )
    lst = fct.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "fac"))),
            lambda x: x["fac"],
        ).alias("fl")
    )
    w_i = Window.partitionBy(bounded_window_key(F.col("d_t"))).orderBy("t")
    idx = fct.select(
        "t", "d_t", "n_t", F.row_number().over(w_i).alias("i")
    )
    return idx.crossJoin(F.broadcast(lst)).select(
        F.col("t").alias("months"),
        F.col("n_t").cast("bigint").alias("n_at_risk"),
        F.col("d_t").cast("bigint").alias("n_churned"),
        F.round(
            F.aggregate(
                F.slice(F.col("fl"), F.lit(1), F.col("i")),
                F.lit(1).cast("decimal(18,12)"),
                lambda acc, x: F.round(acc * x, 12).cast("decimal(18,12)"),
            ).cast("double"),
            6,
        ).alias("survival"),
    )


# --------------------------------------------- z-order curve locality

_Z_BITS = 8  # 8 bits per dimension → 16-bit z values
_Z_CELL_SHIFT = 6  # cells of 64 consecutive z values


def zvalue(xb, yb) -> F.Column:
    """Interleave two {_Z_BITS}-bit bucket Columns into a Morton
    (z-order) value — pure JVM integer arithmetic (shifts and masks),
    no UDF. Consecutive z values are spatially adjacent in (x, y), so
    range-partitioning and sorting by z co-locates rows that a
    two-column predicate selects together: the layout behind
    file-level min/max data skipping (sinks.zorder writes it)."""
    bits = []
    for k in range(_Z_BITS):
        bits.append(
            F.shiftright(xb, k).bitwiseAND(F.lit(1)) * (1 << (2 * k + 1))
        )
        bits.append(
            F.shiftright(yb, k).bitwiseAND(F.lit(1)) * (1 << (2 * k))
        )
    z = bits[0]
    for b in bits[1:]:
        z = z + b
    return z


def _z_sql(xb: str, yb: str) -> str:
    """The identical Morton interleave in portable SQL."""
    terms = []
    for k in range(_Z_BITS):
        terms.append(f"((({xb} >> {k}) & 1) * {1 << (2 * k + 1)})")
        terms.append(f"((({yb} >> {k}) & 1) * {1 << (2 * k)})")
    return " + ".join(terms)


@query(
    "q_zorder_locality",
    oracle=f"""
    WITH b AS (
      SELECT min(o_custkey) AS minc, max(o_custkey) AS maxc,
             min(o_orderdate) AS mind, max(o_orderdate) AS maxd
      FROM orders
    ), s AS (
      SELECT ((o.o_custkey - b.minc) * 255) // (b.maxc - b.minc) AS xb,
             (date_diff('day', b.mind, o.o_orderdate) * 255)
               // date_diff('day', b.mind, b.maxd) AS yb
      FROM orders o, b
    ), z AS (
      SELECT xb, yb, {_z_sql("xb", "yb")} AS zv FROM s
    )
    SELECT zv >> {_Z_CELL_SHIFT} AS cell,
           COUNT(*) AS n_rows,
           CAST(min(xb) AS BIGINT) AS min_x,
           CAST(max(xb) AS BIGINT) AS max_x,
           CAST(min(yb) AS BIGINT) AS min_y,
           CAST(max(yb) AS BIGINT) AS max_y,
           CAST((max(xb) - min(xb) + 1) * (max(yb) - min(yb) + 1)
                AS BIGINT) AS bbox_area
    FROM z GROUP BY cell
    """,
)
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) locality audit over orders, bucketed on
    (customer, order date): rows grouped into cells of 64 consecutive
    z values, each cell reporting its row count and the bounding box
    it spans in the original two dimensions. Small bbox_area per cell
    is the property data skipping monetizes — a file holding one cell
    prunes against BOTH columns' min/max stats, where a single-column
    sort gives tight bounds on one axis and the full range on the
    other. This query is the audit; sinks.zorder.write_zordered is
    the writer that lays files out this way.

    Scale shape: two scalar aggregates broadcast the global bounds;
    bucket, interleave, and cell are pure integer JVM expressions
    (exact `DIV`, shifts, masks — no doubles anywhere), then one
    aggregate over ≤ 2^{2 * _Z_BITS - _Z_CELL_SHIFT} cells."""
    o = _t(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_custkey").alias("minc"),
        F.max("o_custkey").alias("maxc"),
        F.min("o_orderdate").alias("mind"),
        F.max("o_orderdate").alias("maxd"),
    )
    s = o.crossJoin(F.broadcast(b)).select(
        F.expr("((o_custkey - minc) * 255) DIV (maxc - minc)").alias("xb"),
        F.expr(
            "(datediff(o_orderdate, mind) * 255) DIV datediff(maxd, mind)"
        ).alias("yb"),
    )
    z = s.select(
        "xb", "yb", zvalue(F.col("xb"), F.col("yb")).alias("zv")
    )
    return z.groupBy(
        F.shiftright(F.col("zv"), _Z_CELL_SHIFT).alias("cell")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").cast("bigint").alias("min_x"),
        F.max("xb").cast("bigint").alias("max_x"),
        F.min("yb").cast("bigint").alias("min_y"),
        F.max("yb").cast("bigint").alias("max_y"),
        (
            (F.max("xb") - F.min("xb") + 1) * (F.max("yb") - F.min("yb") + 1)
        )
        .cast("bigint")
        .alias("bbox_area"),
    )
