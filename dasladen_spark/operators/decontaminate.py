"""Shared benchmark-decontamination primitives.

ONE implementation backs both the batch ``decontaminate`` task
(tasks.run_decontaminate) and the streaming intake gate
(streaming/intake.run_decontaminate_gate), so a document is
quarantined at ingestion IFF the batch pipeline would have dropped it
in a backfill — the same no-skew contract the quality gate keeps
(streaming/intake.score_documents).

Scale shape (the decontaminate_ngrams query family's): the
benchmark's distinct gram set is MBs even when the corpus is TBs, so
it BROADCASTS; the corpus side joins that broadcast BEFORE any
distinct, so the only corpus-keyed exchange is over the matching
grams (benchmark-bounded), never the full gram stream. Grams come
from the staged words projection (functions/text.word_ngrams) —
never an inline split inside a lambda, which would re-tokenize per
gram position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dasladen_spark.functions.text import word_ngrams


def bench_gram_set(
    bench_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """The benchmark corpus's distinct word ``n``-gram set — the
    (small) broadcast side of every decontamination join. Callers
    that probe it repeatedly (streaming micro-batches) should persist
    the returned frame: it is benchmark-sized by construction."""
    return (
        bench_df.select(F.split(F.col(text_col), " ").alias("_w"))
        .select(F.explode(word_ngrams(F.col("_w"), n)).alias("ng"))
        .distinct()
    )


def contamination_hits(
    df: DataFrame,
    bench_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """(_did, n_contaminated_grams) for every doc sharing at least
    ``min_hits`` DISTINCT word n-grams with the benchmark set.
    Broadcast-filter FIRST, distinct after — the corpus-keyed
    exchange is bounded by |matching grams|, not the corpus gram
    stream."""
    return (
        df.select(
            F.col(id_col).alias("_did"),
            F.split(F.col(text_col), " ").alias("_w"),
        )
        .select("_did", F.explode(word_ngrams(F.col("_w"), n)).alias("ng"))
        .join(F.broadcast(bench_grams), "ng")
        .distinct()
        .groupBy("_did")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
        .filter(F.col("n_contaminated_grams") >= min_hits)
    )
