"""dasladen_spark — a PySpark-native ETL & data-processing engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the reference ETL tool (pagotti/dasladen): JSON task
files compile to DataFrame plans, the full Spark SQL surface (joins,
aggregates, windows, set ops) replaces SQL-pushdown-to-RDBMS, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) are first-class — all designed for 100 TB scale.

Layout:
    session     — SparkSession factory with scale-aware defaults
    plans       — relational query library (joins/aggs/windows/setops)
    operators   — dedup, similarity, as-of/range joins, multimodal
    functions   — text analysis & vector column expressions
    transforms  — the declarative transform compiler (convert/filter/
                  remove/rename + module escape hatch)
    sources     — CSV / XML / XLS / JDBC / parquet readers
    sinks       — CSV / JDBC / parquet writers
    runner      — JSON task runner, watcher, scheduler, CLI
    streaming   — Structured Streaming ingestion of capture folders
"""

__version__ = "0.1.0"

from dasladen_spark.session import get_spark  # noqa: F401
