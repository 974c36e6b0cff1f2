"""Snapshot-addressed materialized tables.

Round-11's sf1 gate exposed a destructive race: ``ensure_ann_index``
and its siblings keyed materialized tables by NAME only, reusing them
when the stored ``tag`` matched and OVERWRITING (deleting the other
run's part-files) when it didn't. Two concurrent runs over different
corpus snapshots (the sf0.1 bench and the sf1 check) ping-pong-rebuilt
``ann_idx_pq`` / ``nb_quality_model`` and killed each other's readers
with FAILED_READ_FILE.FILE_NOT_EXIST mid-scan.

The fix makes the snapshot part of the table IDENTITY: an index built
from tag T with geometry G lives at ``{base}__{md5(T,G)[:8]}``.
Different snapshots are different physical tables; nothing is ever
destructively overwritten because a (tag, geometry) pair always maps
to the same name and an existing physical table is always the right
one to reuse. A metastore-atomic pointer VIEW ``{base}_ptr`` (its body
is a constant — ``SELECT '<physical>' AS physical`` — so resolving it
touches no data files) publishes the latest physical name under the
logical one, for callers that only know the logical name (the
task-file surface: build in one task, append/search in a later one).

On a production catalog (Hive/Glue/Unity) the same layout gives
lock-free snapshot isolation: builders create new names, the pointer
flip is one atomic catalog op, readers mid-scan keep their resolved
physical table. Stale snapshots are dropped by ordinary retention
(``drop_snapshots`` below).

Beyond-reference infrastructure (the reference has no materialized
state at all — every run recomputes, /root/reference/dasladen/task.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession


def snapshot_suffix(*identity) -> str:
    """8-hex-char digest of everything that defines the physical
    content: the corpus tag plus every relevant build parameter.
    Callers pass the parts; ordering is significant (keep it fixed)."""
    blob = "\x1f".join(str(p) for p in identity)
    return hashlib.md5(blob.encode("utf-8")).hexdigest()[:8]


def snapshot_name(base: str, *identity) -> str:
    """Physical table name for ``base`` built from ``identity``."""
    return f"{base}__{snapshot_suffix(*identity)}"


def publish_pointer(spark: SparkSession, base: str, physical: str) -> None:
    """Atomically point the logical name at a physical snapshot.
    CREATE OR REPLACE VIEW is a pure catalog operation — no part
    files, so concurrent resolvers never see a half-written pointer."""
    spark.sql(
        f"CREATE OR REPLACE VIEW {base}_ptr AS "
        f"SELECT '{physical}' AS physical"
    )


def resolve_snapshot(spark: SparkSession, name: str) -> str:
    """Resolve a logical table name to its current physical snapshot.

    Precedence: the pointer view if one exists (the snapshot scheme),
    else ``name`` itself (callers holding a physical name — including
    every pre-snapshot-scheme test that builds an index under an
    explicit name — pass through unchanged)."""
    if spark.catalog.tableExists(f"{name}_ptr"):
        return spark.table(f"{name}_ptr").collect()[0]["physical"]
    return name


def drop_snapshots(spark: SparkSession, base: str, keep: str | None = None):
    """Retention: drop every ``{base}__*`` family table except the
    ``keep`` snapshot (and its suffixed siblings). Returns the dropped
    table names. Explicit maintenance — nothing calls this implicitly,
    exactly like VACUUM."""
    dropped = []
    prefix = base + "__"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix) and not (
            keep and t.name.startswith(keep)
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
            dropped.append(t.name)
    return dropped
