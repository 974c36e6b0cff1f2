"""Reference-parity queries that run THROUGH the transform compiler.

These exercise the actual JSON `transform` block path (SURVEY §2.3):
convert → filter → remove → rename in the reference's fixed order —
then check the result against plain SQL, proving the compiler's
semantics, not just the operators'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t
from dasladen_spark.transforms.compiler import apply_transforms
from dasladen_spark.transforms.builtin import empty_as_null, sanitize_string


@query(
    "t_convert_filter_chain",
    oracle="""
    SELECT l_orderkey AS order_id, l_linenumber,
           lower(l_returnflag) AS l_returnflag,
           l_quantity
    FROM lineitem
    WHERE l_quantity > 45 AND lower(l_returnflag) = 'r'
    """,
)
def t_convert_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full declarative transform block compiled to one Spark plan.
    Order matters exactly as in the reference: the filter sees the
    *converted* (lowercased) flag and pre-rename field names."""
    df = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    out = apply_transforms(
        df,
        transform={
            "convert": [["l_returnflag", "lower"]],
            "filter": "{l_quantity} > 45 and {l_returnflag} == 'r'",
            "remove": ["l_extendedprice", "l_discount"],
            "rename": [["l_orderkey", "order_id"]],
        },
    )
    return out.select("order_id", "l_linenumber", "l_returnflag", "l_quantity")


@query(
    "t_empty_as_null",
    oracle="""
    SELECT event_id,
           CASE WHEN trim(props) = '' THEN NULL ELSE trim(props) END AS props
    FROM events
    """,
)
def t_empty_as_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bundled transforms chained: sanitize/trim then '' → NULL
    (parity with util/empty_as_null.py + convert('strip'))."""
    df = _t(spark, sf_dir, "events").select(
        "event_id", F.trim(F.col("props")).alias("props")
    )
    return empty_as_null(df, "props")


@query(
    "t_sanitize_string",
    oracle=r"""
    SELECT doc_id, regexp_replace(text, '[\x00-\x1F]', ' ', 'g') AS text
    FROM documents
    """,
)
def t_sanitize_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-char scrub (parity with util/sanitize_string.py)."""
    df = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return sanitize_string(df, "text")
