"""Task types — the reference's full task matrix (SURVEY §2.5,
/root/reference/dasladen/task.py:577-599) compiled to Spark plans.

Every ETL task is source → transform chain → sink as ONE lazy
DataFrame plan: Catalyst sees the whole pipeline, so filters written
as `transform.filter` strings reach the scan as pushed-down
predicates — something the reference's row-at-a-time petl chain can
never do.

The emptiness short-circuit keeps the reference's semantics
(task.py:181 etc.) but reads the source ONCE per job instead of
twice (fix per SURVEY §4.8): `isEmpty()` peeks at one partition.

Non-data tasks (zip/unzip/download/ftp/py-exec/custom) stay
driver-side Python, as in the reference — they are control-plane.
"""

from __future__ import annotations

import importlib
import os
import sys
import threading
import zipfile
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dasladen_spark.connections import ConnectionRegistry
from dasladen_spark.sinks.csv import write_csv
from dasladen_spark.sources.csv import read_csv
from dasladen_spark.sources.xls import read_xls
from dasladen_spark.sources.xml import read_xml
from dasladen_spark.transforms.compiler import apply_transforms


@dataclass
class TaskContext:
    """Folders + session + connections for one task file run
    (the reference's folder convention, base.py:19-25)."""

    spark: SparkSession
    connections: ConnectionRegistry
    input_path: str = "input"
    output_path: str = "output"
    module_path: str = "module"
    log: Callable[[str], None] = field(default=lambda m: None)


def _src_path(ctx: TaskContext, src: dict) -> str:
    return os.path.join(src.get("folder", src.get("path", ctx.input_path)), src["file"])


def _tgt_path(ctx: TaskContext, tgt: dict) -> str:
    return os.path.join(tgt.get("folder", tgt.get("path", ctx.output_path)), tgt["file"])


def _parse_sql(ctx: TaskContext, src: dict) -> str:
    """command | query-file + params — parity with _parse_sql
    (task.py:94-107) incl. trailing-';' strip; `.format(**params)`
    substitution is kept (documented, no eval)."""
    if "command" in src:
        sql = src["command"]
    else:
        path = os.path.join(src.get("path", ctx.input_path), src["query"])
        with open(path, encoding=src.get("encoding", "utf-8")) as f:
            sql = f.read()
    params = src.get("params")
    if params:
        sql = sql.format(**params)
    return sql.strip().rstrip(";")


def _transformed(ctx: TaskContext, task: dict, df: DataFrame) -> DataFrame:
    return apply_transforms(
        df,
        transform=task.get("transform"),
        transforms=task.get("transforms"),
        module_path=ctx.module_path,
    )


def _read_source(ctx: TaskContext, task: dict) -> DataFrame | None:
    """Dispatch the task type's source; None for non-table sources."""
    src = task["source"]
    kind = task["type"].split("-")[0]
    if kind == "csv":
        return read_csv(
            ctx.spark,
            _src_path(ctx, src),
            delimiter=src.get("delimiter", ";"),
            encoding=src.get("encoding", "utf-8"),
        )
    if kind == "db":
        conn = ctx.connections.get(src["connection"])
        return conn.read_sql(ctx.spark, _parse_sql(ctx, src))
    if kind == "xml":
        return read_xml(
            ctx.spark,
            _src_path(ctx, src),
            row=src["row"],
            value=src.get("value"),
            attr=src.get("attr"),
            mapping=src.get("mapping"),
        )
    if kind == "xls":
        return read_xls(
            ctx.spark,
            _src_path(ctx, src),
            sheet=src.get("sheet"),
            use_view=bool(src.get("use_view", True)),
        )
    if kind == "json":
        # JSON-lines by default (the splittable, scale-friendly form);
        # multiline=true opts into whole-file parsing for pretty JSON.
        rd = ctx.spark.read
        if src.get("schema"):
            rd = rd.schema(src["schema"])
        if src.get("multiline"):
            rd = rd.option("multiLine", "true")
        return rd.json(_src_path(ctx, src))
    if kind == "parquet":
        return ctx.spark.read.parquet(_src_path(ctx, src))
    if kind == "orc":
        return ctx.spark.read.orc(_src_path(ctx, src))
    raise ValueError(f"unknown source kind {kind!r}")


def _write_sink(ctx: TaskContext, task: dict, df: DataFrame) -> None:
    tgt = task["target"]
    kind = task["type"].split("-")[-1]
    if kind == "csv":
        write_csv(
            df,
            _tgt_path(ctx, tgt),
            delimiter=tgt.get("delimiter", ";"),
            encoding=tgt.get("encoding", "utf-8"),
            truncate=bool(tgt.get("truncate", False)),
            single_file=bool(tgt.get("single_file", True)),
        )
    elif kind == "db":
        conn = ctx.connections.get(tgt["connection"])
        conn.write_table(
            df,
            ctx.spark,
            tgt["table"],
            truncate=bool(tgt.get("truncate", False)),
            schema=tgt.get("schema"),
        )
    elif kind == "json":
        (
            df.write.mode("overwrite" if tgt.get("truncate") else "append")
            .json(_tgt_path(ctx, tgt))
        )
    elif kind == "parquet":
        if tgt.get("zorder"):
            # two-column Morton-clustered layout (sinks/zorder) —
            # file-level min/max skipping on BOTH columns
            if tgt.get("partition_by"):
                raise ValueError(
                    "parquet sink: 'zorder' and 'partition_by' are"
                    " mutually exclusive — a z-ordered layout is one"
                    " directory of curve-clustered files; partition"
                    " the table instead if directory pruning is the"
                    " goal"
                )
            from dasladen_spark.sinks.zorder import write_zordered

            write_zordered(
                df,
                _tgt_path(ctx, tgt),
                tuple(tgt["zorder"]),
                n_files=int(tgt.get("n_files", 8)),
                mode="overwrite" if tgt.get("truncate") else "append",
            )
        else:
            w = df.write.mode("overwrite" if tgt.get("truncate") else "append")
            if tgt.get("partition_by"):
                w = w.partitionBy(*tgt["partition_by"])
            w.parquet(_tgt_path(ctx, tgt))
    elif kind == "orc":
        w = df.write.mode("overwrite" if tgt.get("truncate") else "append")
        if tgt.get("partition_by"):
            w = w.partitionBy(*tgt["partition_by"])
        w.orc(_tgt_path(ctx, tgt))
    elif kind == "tar":
        # WebDataset-style shard export (sinks/tarshards) — the
        # training-loader layout, reachable from task files
        from dasladen_spark.sinks.tarshards import write_tar_shards

        write_tar_shards(
            df,
            _tgt_path(ctx, tgt),
            n_shards=int(tgt.get("n_shards", 8)),
            key_col=tgt.get("key_field", "key"),
            payload_col=tgt.get("payload_field", "payload"),
            ext=tgt.get("ext", "bin"),
            meta_cols=tgt.get("meta_fields"),
        )
    else:
        raise ValueError(f"unknown sink kind {kind!r}")


def _observed_write(ctx: TaskContext, task_like: dict, df: DataFrame) -> int:
    """Write ``df`` through ``_write_sink`` and return the number of
    rows written, counted by a CollectMetrics observation ON the
    write itself. The previous spelling persisted the frame, wrote
    it, then ran a second ``count()`` job against the cache purely to
    feed the task log — one extra job per stage plus executor cache
    pressure (guide §1.4/§5: the write is already the action that
    computes every row; observe rides it for free). Used by every
    task runner whose frame has no second consumer."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    _write_sink(
        ctx, task_like, df.observe(obs, F.count(F.lit(1)).alias("n"))
    )
    return int(obs.get["n"])


def _progress_counted(df: DataFrame, acc) -> DataFrame:
    """Arrow passthrough that counts rows into a Spark accumulator —
    the distributed stand-in for petl's row-at-a-time ``.progress()``
    meter. Batch-level adds only; the frame itself is untouched.

    ``mapInArrow``, not ``mapInPandas``: the meter only needs each
    batch's row COUNT, so materializing every column into pandas
    objects (strings become per-row Python objects) on the way
    through the worker was pure overhead — raw Arrow record batches
    are counted and yielded back untouched. Measured on a
    documents-sized parquet→parquet stage (sf0.1, median of 5): write
    0.268 s bare, 0.403 s via mapInPandas, 0.320 s via mapInArrow —
    the meter's added cost drops ~2.6× (0.135 s → 0.052 s), and the
    per-byte saving is what scales with corpus width."""

    schema = df.schema

    def passthrough(batches):
        for b in batches:
            acc.add(b.num_rows)
            yield b

    return df.mapInArrow(passthrough, schema)


def run_etl(ctx: TaskContext, task: dict) -> None:
    """All seven source×sink ETL shapes share this pipeline
    (task.py §2.5); one lazy plan end-to-end.

    Progress meter parity (ref task.py:197-202: petl logs every
    10,000 rows into the per-task log): executor tasks count written
    rows into an accumulator; a driver-side poller narrates each
    crossed 10k boundary WHILE the write runs. Accumulator updates
    arrive on task completion, so lines appear per finished partition
    — the distributed analogue of a row counter, costing one Arrow
    passthrough and no extra pass. ``"progress": 0`` in the task
    disables it (and the passthrough) entirely."""
    df = _read_source(ctx, task)
    # Empty-source short-circuit (fix of §4.8) ONLY for the
    # reference-parity terminal sinks (csv/db — ref task.py:181
    # skips the write so no header-only file / no-op DB round trip
    # appears). Engine-internal sinks (parquet/orc/json/tar) ALWAYS
    # write a schema-bearing (possibly empty) output: a chained
    # pipeline's next stage must find its input even when an
    # upstream filter legitimately empties the stream — round-11's
    # sf1 gate died with PATH_NOT_FOUND when span-dedup emptied a
    # mid-pipeline stage and the skip swallowed s5's input.
    sink_kind = task["type"].split("-")[-1]
    if sink_kind in ("csv", "db") and df.isEmpty():
        ctx.log(f"task {task.get('name')}: empty source, skipping write")
        return
    out = _transformed(ctx, task, df)
    every = int(task.get("progress", 10000))
    if not every:
        _write_sink(ctx, task, out)
        return
    acc = ctx.spark.sparkContext.accumulator(0)
    out = _progress_counted(out, acc)
    stop = threading.Event()
    name = task.get("name")
    state = {"reported": 0}

    def emit_crossings():
        n = acc.value // every * every
        while state["reported"] < n:
            state["reported"] += every
            ctx.log(f"task {name}: {state['reported']} rows")

    def poll():
        while not stop.is_set():
            emit_crossings()
            stop.wait(0.2)

    poller = threading.Thread(target=poll, daemon=True)
    poller.start()
    try:
        _write_sink(ctx, task, out)
    finally:
        stop.set()
        poller.join(timeout=2)
    emit_crossings()  # late accumulator updates land here, always
    # '~': accumulator adds from transformations are re-applied on
    # task retries / speculative attempts, so after any executor
    # failure the counter can exceed the rows actually committed
    ctx.log(f"task {name}: wrote ~{acc.value} rows")


# ------------------------------------------------------ control-plane


def run_sql_exec(ctx: TaskContext, task: dict) -> None:
    """DDL/DML statement on a connection (task.py:527-536)."""
    src = task["source"]
    conn = ctx.connections.get(src["connection"])
    conn.execute_sql(ctx.spark, _parse_sql(ctx, src))


def _cp437_member_name(name: str) -> str:
    """Member names restricted to cp437 (ref task.py:461-463): legacy
    zip consumers read names as cp437, so any character outside it
    becomes '_' — keeping the name's byte form stable everywhere."""
    # encode-with-replace turns non-cp437 chars into '?', then '?'→'_'
    # (literal '?' too, exactly as the reference's translate does)
    return (
        name.encode("cp437", errors="replace").decode("cp437").replace("?", "_")
    )


def run_zip(ctx: TaskContext, task: dict) -> None:
    """Zip files from the source folder (fixes §4.7: reads members
    from the SOURCE path, not the target); member names are cp437-
    sanitized like the reference's _encode_cp437."""
    src, tgt = task["source"], task["target"]
    src_dir = src.get("path", ctx.output_path)
    out = os.path.join(tgt.get("path", ctx.output_path), tgt["file"])
    files = src["files"] if isinstance(src.get("files"), list) else [src["file"]]
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for fn in files:
            zf.write(os.path.join(src_dir, fn), arcname=_cp437_member_name(fn))
    if src.get("remove_after"):
        for fn in files:
            os.remove(os.path.join(src_dir, fn))


def run_unzip(ctx: TaskContext, task: dict) -> None:
    """Extract an archive (fixes §4.7: remove_after removes the real
    source path)."""
    src, tgt = task["source"], task.get("target", {})
    src_path = os.path.join(src.get("path", ctx.input_path), src["file"])
    dest = tgt.get("path", ctx.input_path)
    with zipfile.ZipFile(src_path) as zf:
        zf.extractall(dest)
    if src.get("remove_after"):
        os.remove(src_path)


def run_download(ctx: TaskContext, task: dict) -> None:
    """HTTP GET → file (task.py:558-574); driver-side."""
    import requests

    src, tgt = task["source"], task["target"]
    resp = requests.get(
        src["url"], params=src.get("params"), headers=src.get("headers"), timeout=300
    )
    resp.raise_for_status()
    out = _tgt_path(ctx, tgt)
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "wb") as f:
        f.write(resp.content)


def run_ftp_upload(ctx: TaskContext, task: dict) -> None:
    """FTP push (task.py:441-456) via stdlib ftplib."""
    from ftplib import FTP

    src, tgt = task["source"], task["target"]
    conn = ctx.connections.get(tgt["connection"]).config
    local = os.path.join(src.get("path", ctx.output_path), src["file"])
    ftp = FTP()
    ftp.connect(conn.get("host", "localhost"), int(conn.get("port", 21)))
    ftp.login(conn.get("user", ""), conn.get("pass", ""))
    if tgt.get("path"):
        ftp.cwd(tgt["path"])
    with open(local, "rb") as f:
        ftp.storbinary(f"STOR {tgt.get('file', src['file'])}", f)
    ftp.quit()


def run_py_exec(ctx: TaskContext, task: dict) -> None:
    """Run a user module's main() (task.py:510-524); the module can
    import the active SparkSession for Spark-aware steps."""
    src = task["source"]
    if ctx.module_path not in sys.path:
        sys.path.append(ctx.module_path)
    name = (
        f"{src['package']}.{src['module']}" if src.get("package") else src["module"]
    )
    mod = importlib.import_module(name)
    mod = importlib.reload(mod)
    argv_backup = sys.argv
    try:
        sys.argv = [name] + list(src.get("args", []))
        mod.main()
    finally:
        sys.argv = argv_backup


class BaseTask:
    """Custom-task ABC (parity with task.py:83-92); run() receives the
    TaskContext (which carries the SparkSession) instead of a DB
    driver factory."""

    def run(self, ctx: TaskContext, task: dict) -> None:  # pragma: no cover
        raise NotImplementedError


def run_custom(ctx: TaskContext, task: dict) -> None:
    """User-defined task class (task.py:545-555)."""
    if ctx.module_path not in sys.path:
        sys.path.append(ctx.module_path)
    name = (
        f"{task['package']}.{task['module']}"
        if task.get("package")
        else task["module"]
    )
    mod = importlib.reload(importlib.import_module(name))
    inst = getattr(mod, task["class"])()
    inst.run(ctx, task)


def run_nop(ctx: TaskContext, task: dict) -> None:
    ctx.log(f"task {task.get('name')}: nop")


def run_profile(ctx: TaskContext, task: dict) -> None:
    """Profile task (beyond the reference): read ANY supported source
    (``source.kind`` picks the reader), compute a per-column profile —
    null count, distinct count, min/max (stringified for a uniform
    report schema) — in ONE aggregation pass over the data, and write
    the per-column report through any supported sink
    (``target.kind``, default csv).

    The reshape from the 1-row wide aggregate to one-report-row-per-
    column happens driver-side on that single row, so the data itself
    is scanned exactly once however many columns are profiled."""
    from pyspark.sql import functions as F

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0]
    report = ctx.spark.createDataFrame(
        [
            (
                c,
                int(row["__n"]),
                int(row[f"{c}__nulls"]),
                int(row[f"{c}__distinct"]),
                row[f"{c}__min"],
                row[f"{c}__max"],
            )
            for c in df.columns
        ],
        "column STRING, n_rows BIGINT, n_nulls BIGINT, n_distinct BIGINT, "
        "min_value STRING, max_value STRING",
    )
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "csv")}, report)
    ctx.log(f"task {task.get('name')}: profiled {len(df.columns)} columns")


#: type → runner (TaskFactory parity, task.py:577-599)
def run_validate(ctx: TaskContext, task: dict) -> None:
    """Validate task (beyond the reference): read any supported source
    (``source.kind``), evaluate the contract in ``rules`` (name → SQL
    predicate, one aggregate pass via operators/quality.py), optionally
    check ``unique`` key columns, and route rows: clean rows continue
    to ``target``; violating rows (tagged with the names of every rule
    they failed) go to ``quarantine`` if configured. ``fail_on_violation``
    turns any violation into a task error AFTER the report is written —
    a 100 TB ingest quarantines and reports, it doesn't stack-trace
    first."""
    from pyspark.sql import functions as F

    from dasladen_spark.operators.quality import (
        check_rules,
        check_unique,
        split_valid,
    )

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    rules = task.get("rules", {})
    counts = check_rules(df, rules) if rules else {}
    dup_count = 0
    if task.get("unique"):
        dup_count = check_unique(df, task["unique"]).count()
        counts["unique"] = dup_count
    ctx.log(f"task {task.get('name')}: violations {counts}")
    clean, bad = split_valid(df, rules) if rules else (df, None)
    if task.get("quarantine") and bad is not None:
        qt = task["quarantine"]
        bad = bad.withColumn("violated", F.concat_ws(",", "violated"))
        _write_sink(ctx, {**task, "type": "x-" + qt.get("kind", "csv"),
                          "target": qt}, bad)
    if task.get("target"):
        tgt = task["target"]
        _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "csv")}, clean)
    if task.get("fail_on_violation") and (any(counts.values()) or dup_count):
        raise ValueError(f"contract violations: {counts}")


def run_dedup(ctx: TaskContext, task: dict) -> None:
    """Dedup task (beyond the reference): read any supported source,
    keep one row per normalized-text fingerprint (lowest ``id_field``
    survives), and — when ``index`` names a catalog table — drop rows
    whose fingerprint is already in that MATERIALIZED history index
    (operators/fingerprint_index: bucketed anti-join, zero history-
    side shuffle) before writing survivors to ``target``. With
    ``update_index`` (default true) the survivors' fingerprints are
    appended, so the next run of the same task file dedups against
    everything this run admitted: scheduled task-file runs become an
    incremental intake pipeline with per-run cost O(batch). A missing
    index table cold-starts empty.

    ``method: "winnowing"`` switches from exact (one whole-document
    hash) to NEAR-dup semantics: winnowed k-gram fingerprints
    (operators/dedup winnowing_pairs — the MOSS position-local
    scheme), within-batch clusters collapsed to their min-id
    survivor, and — with ``index`` — docs sharing ``min_shared`` or
    more fingerprints with history dropped, admitted docs' winnowed
    fingerprints appended to the same bucketed index layout. An
    index table holds either whole-doc or winnowed fingerprints,
    never both — point each method at its own table."""
    from pyspark.sql import functions as F

    from dasladen_spark.functions.text import fingerprint
    from dasladen_spark.operators.dedup import exact_dedup
    from dasladen_spark.operators.fingerprint_index import (
        append_to_index,
        build_fingerprint_index,
        novel_against_index,
    )

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    text_field = task.get("text_field", "text")
    id_field = task.get("id_field", df.columns[0])
    method = task.get("method", "exact")
    if method == "winnowing":
        return _run_dedup_winnowing(ctx, task, df, text_field, id_field)
    if method == "spans":
        return _run_dedup_spans(ctx, task, df, text_field, id_field)
    if method == "semantic":
        return _run_dedup_semantic(ctx, task, df, id_field)
    if method != "exact":
        # a typo must not silently fall through to whole-document
        # exact dedup — that DROPS documents the user asked to keep
        raise ValueError(f"unknown dedup method {method!r}")
    b = df.withColumn("fp", fingerprint(F.col(text_field)))
    b = exact_dedup(b, ["fp"], id_field)
    index = task.get("index")
    tgt = task["target"]
    if index:
        # meta too: a build that crashed between the postings write
        # and the meta write must rebuild, or append_to_index dies
        # after the sink already ran
        if not (
            ctx.spark.catalog.tableExists(index)
            and ctx.spark.catalog.tableExists(f"{index}_meta")
        ):
            empty = ctx.spark.createDataFrame([], f"{text_field} STRING")
            build_fingerprint_index(
                empty, index, text_col=text_field,
                n_buckets=int(task.get("n_buckets", 16)), tag="cold-start",
            )
        # persist + sink BEFORE the index append: the anti-join is
        # lazy, and appending first would put this batch's own
        # fingerprints into the index it is still being filtered
        # against — every row would vanish on the write's re-execution
        novel = novel_against_index(ctx.spark, index, b).persist()
        try:
            # persist stays (two consumers: the sink and the index
            # append); the row count rides the write via observe
            # instead of a third job
            n_out = _observed_write(
                ctx,
                {**task, "type": "x-" + tgt.get("kind", "parquet")},
                novel.drop("fp"),
            )
            if task.get("update_index", True):
                append_to_index(ctx.spark, index, novel)
        finally:
            novel.unpersist()
    else:
        n_out = _observed_write(
            ctx,
            {**task, "type": "x-" + tgt.get("kind", "parquet")},
            b.drop("fp"),
        )
    ctx.log(f"task {task.get('name')}: {n_out} novel rows out")


def _run_dedup_winnowing(
    ctx: TaskContext, task: dict, df, text_field: str, id_field: str
) -> None:
    """The dedup task's near-dup arm: within-batch winnowing pairs →
    connected components → min-id survivor per cluster, then the
    optional winnowed-fingerprint history index (see run_dedup)."""
    from pyspark.sql import functions as F

    from dasladen_spark.operators.dedup import (
        WINNOW_MIN_SHARED,
        winnowing_pairs,
    )
    from dasladen_spark.operators.fingerprint_index import (
        append_to_index,
        build_fingerprint_index,
        winnowed_novel_against_index,
    )
    from dasladen_spark.operators.graph import dedup_clusters

    min_shared = int(task.get("min_shared", WINNOW_MIN_SHARED))
    pairs = winnowing_pairs(
        df, id_col=id_field, text_col=text_field, min_shared=min_shared
    )
    drop = (
        dedup_clusters(pairs, "doc_a", "doc_b")
        .filter(F.col("member") != F.col("survivor"))
        .select(F.col("member").alias(id_field))
    )
    surv = df.join(drop, id_field, "left_anti")
    index = task.get("index")
    tgt = task["target"]
    if index:
        # meta too: a build that crashed between the postings write
        # and the meta write must rebuild (same guard as the exact arm)
        if not (
            ctx.spark.catalog.tableExists(index)
            and ctx.spark.catalog.tableExists(f"{index}_meta")
        ):
            empty = ctx.spark.createDataFrame([], f"{text_field} STRING")
            build_fingerprint_index(
                empty, index, text_col=text_field,
                n_buckets=int(task.get("n_buckets", 16)), tag="cold-start",
            )
        novel, novel_fps = winnowed_novel_against_index(
            ctx.spark, index, surv,
            id_col=id_field, text_col=text_field, min_shared=min_shared,
        )
        # persist + sink BEFORE the index append: the join is lazy,
        # and appending first would put this batch's own fingerprints
        # into the index it is still being filtered against
        novel = novel.persist()
        novel_fps = novel_fps.persist()
        try:
            # persist stays (sink + index append both read novel/fps);
            # the row count rides the write via observe
            n_out = _observed_write(
                ctx,
                {**task, "type": "x-" + tgt.get("kind", "parquet")},
                novel,
            )
            if task.get("update_index", True):
                append_to_index(ctx.spark, index, novel_fps)
        finally:
            novel.unpersist()
            novel_fps.unpersist()
    else:
        n_out = _observed_write(
            ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, surv
        )
    ctx.log(f"task {task.get('name')}: {n_out} novel rows out (winnowing)")


def _run_dedup_semantic(
    ctx: TaskContext, task: dict, df, id_field: str
) -> None:
    """The dedup task's SEMANTIC arm (SemDeDup — operators/dedup
    semantic_dedup_survivors): cluster ``vec_field`` embeddings with
    the exact lattice k-means (``k``, ``iterations``, optional
    ``fit_fraction`` for the sampled 100 TB fit), drop docs within
    ``threshold`` cosine of a lower-id cluster-mate (component min-id
    survivor). Kept docs go to ``target``; set ``quarantine`` to also
    write the dropped docs with their ``survivor`` audit column.
    Pairwise work is cluster-bounded and a cluster above
    ``max_cluster`` raises loudly (re-fit with larger k)."""
    from pyspark.sql import functions as F

    from dasladen_spark.operators.clustering import kmeans_fit
    from dasladen_spark.operators.dedup import semantic_dedup_survivors

    vec_field = task.get("vec_field", "embedding")
    assigned = kmeans_fit(
        df,
        vec_field,
        id_field,
        k=int(task.get("k", 8)),
        iterations=int(task.get("iterations", 2)),
        fit_fraction=task.get("fit_fraction"),
    )
    surv = semantic_dedup_survivors(
        df,
        assigned,
        id_col=id_field,
        vec_col=vec_field,
        threshold=float(task.get("threshold", 0.9)),
        max_cluster=int(task.get("max_cluster", 100_000)),
    )
    from pyspark.sql import Observation

    marked = df.join(
        surv.select(
            F.col("id").alias(id_field), "survivor", "kept"
        ),
        id_field,
    )
    q = task.get("quarantine")
    # persist ONLY when the quarantine sink adds a second consumer;
    # the (n_in, n_kept) audit rides the kept-write as a CollectMetrics
    # observation placed BELOW the kept filter (it sees every marked
    # row), replacing the two count() jobs the old spelling ran
    if q:
        marked = marked.persist()
    tgt = task["target"]
    try:
        obs = Observation()
        observed = marked.observe(
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.sum("kept").alias("n_kept"),
        )
        kept = observed.filter(F.col("kept") == 1).drop("survivor", "kept")
        _write_sink(
            ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, kept
        )
        n_in = int(obs.get["n_in"])
        n_kept = int(obs.get["n_kept"] or 0)
        if q:
            dropped = marked.filter(F.col("kept") == 0).drop("kept")
            _write_sink(
                ctx,
                {
                    **task,
                    "type": "x-" + q.get("kind", "parquet"),
                    "target": q,
                },
                dropped,
            )
    finally:
        if q:
            marked.unpersist()
    ctx.log(
        f"task {task.get('name')}: semantic dedup kept {n_kept}/{n_in}"
    )


def _run_dedup_spans(
    ctx: TaskContext, task: dict, df, text_field: str, id_field: str
) -> None:
    """The dedup task's SPAN-level arm (Lee et al.-style exact
    substring dedup, operators/dedup duplicated_spans): instead of
    dropping whole near-dup documents, cut every LATER occurrence of
    a duplicated token run and keep each doc's unique remainder.

    ``mode: "cut"`` (default) writes the corpus with ``text_field``
    rewritten plus an ``n_cut_tokens`` audit column; ``mode:
    "report"`` writes the span table itself (doc_a, doc_b, a_start,
    b_start, span_tokens, span_md5) — the input a human review or a
    downstream masking job consumes. Knobs: ``seed_n`` (seed k-gram
    width), ``min_span`` (minimal cut length, tokens), ``max_df``
    (seed hub cap). ``mode: "drop"`` keeps whole docs whose
    duplicated-span COVERAGE stays ≤ ``max_coverage`` (default 0.5,
    shingle width ``span`` default 8) — the corpus_clean_funnel s4
    gate as a task stage. No history-index support — span cutting is
    a within-corpus operation; run it before the exact/winnowing
    incremental arms."""
    from dasladen_spark.operators.dedup import (
        SPAN_MAX_DF,
        SPAN_MIN_TOKENS,
        SPAN_SEED_N,
        cut_duplicate_spans,
        duplicated_spans,
    )

    kw = dict(
        id_col=id_field,
        text_col=text_field,
        seed_n=int(task.get("seed_n", SPAN_SEED_N)),
        min_span=int(task.get("min_span", SPAN_MIN_TOKENS)),
        max_df=int(task.get("max_df", SPAN_MAX_DF)),
    )
    mode = task.get("mode", "cut")
    if mode == "report":
        out = duplicated_spans(df, **kw)
    elif mode == "cut":
        out = cut_duplicate_spans(df, **kw)
    elif mode == "drop":
        # funnel-parity arm: compute each doc's duplicated-span
        # coverage over THIS batch and keep docs at or under the
        # ceiling. Imported lazily from the plans layer (the single
        # spelling corpus_clean_funnel audits) so task runs and the
        # registered report can never disagree on the metric.
        from pyspark.sql import functions as F

        from dasladen_spark.plans.llm4 import duplicated_span_coverage

        cov = duplicated_span_coverage(
            df.select(id_field, text_field),
            id_field,
            text_field,
            span=int(task.get("span", 8)),
        )
        out = (
            df.join(
                cov.select(id_field, "dup_coverage"), id_field, "left"
            )
            .filter(
                F.coalesce(F.col("dup_coverage"), F.lit(0.0))
                <= float(task.get("max_coverage", 0.5))
            )
            .drop("dup_coverage")
        )
    else:
        raise ValueError(f"unknown dedup spans mode {mode!r}")
    tgt = task["target"]
    n_out = _observed_write(
        ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, out
    )
    ctx.log(f"task {task.get('name')}: {n_out} rows out (spans/{mode})")


def run_er(ctx: TaskContext, task: dict) -> None:
    """Entity-resolution task (beyond the reference): blocked
    candidate pairs over ``name_field`` (``block_expr`` SQL
    expression, default all-but-last-2-characters — the device that
    caps block size by construction), edit-distance match edges
    (``max_distance``, default 1), TRANSITIVE closure via per-block
    union-find (operators/graph partitioned_components — every edge
    lies inside one block, so no iteration is needed), and a full
    member → cluster mapping written to ``target``: (member, member_name,
    cluster_id, rep_name), singletons mapped to themselves — the
    task-file spelling of er_customer_clusters, producing the merge
    map a downstream golden-record join applies.

    Scale shape: the candidate join is block-keyed (never all-pairs),
    and since every edge lies inside one block, closure is
    partitioned_components — one shuffle + union-find per block in an
    Arrow batch, no iterative jobs."""
    from pyspark.sql import functions as F

    from dasladen_spark.operators.graph import partitioned_components

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    name_field = task.get("name_field", "name")
    key_field = task.get("key_field") or task.get("id_field", df.columns[0])
    max_distance = int(task.get("max_distance", 1))
    block = F.expr(
        task.get(
            "block_expr",
            f"substring({name_field}, 1, length({name_field}) - 2)",
        )
    )
    # spread the stream side of the broadcast candidate join: a
    # dimension-sized source scans as one task, and the pair
    # expansion × levenshtein would otherwise run on a single core
    a = df.repartition(ctx.spark.sparkContext.defaultParallelism).select(
        F.col(key_field).alias("ka"),
        F.col(name_field).alias("name_a"),
        block.alias("blk"),
    )
    b = df.select(
        F.col(key_field).alias("kb"),
        F.col(name_field).alias("name_b"),
        block.alias("blk"),
    )
    edges = (
        a.join(b, on=[a.blk == b.blk, F.col("ka") < F.col("kb")])
        .filter(F.levenshtein("name_a", "name_b") <= max_distance)
        .select("ka", "kb", a.blk)
    )
    labels = partitioned_components(edges, "blk", src="ka", dst="kb")
    mapping = (
        df.select(
            F.col(key_field).alias("member"),
            F.col(name_field).alias("member_name"),
        )
        .join(
            labels.select(
                F.col("id").alias("member"),
                F.col("component").alias("cluster_id"),
            ),
            "member",
            "left",
        )
        # a key in no match edge is its own (singleton) cluster
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("member")))
    )
    reps = df.select(
        F.col(key_field).alias("cluster_id"),
        F.col(name_field).alias("rep_name"),
    )
    out = mapping.join(reps, "cluster_id", "left").select(
        "member", "member_name", "cluster_id", "rep_name"
    )
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, out)
    ctx.log(f"task {task.get('name')}: er merge map written")


def run_classify(ctx: TaskContext, task: dict) -> None:
    """Classify task (beyond the reference): train the distributed
    Naive-Bayes classifier (operators/classify) on the ``train``
    source's (text, label) rows, score the ``source`` rows, and write
    (id, pred, score) to ``target`` — the task-file spelling of the
    quality-filter stage, so a scheduled task file becomes a corpus
    curation run. ``min_score`` optionally drops rows whose winning
    log-score is below the bar (an absolute-likelihood floor)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dasladen_spark.operators.classify import nb_score, nb_train

    text_field = task.get("text_field", "text")
    label_field = task.get("label_field", "label")
    train_src = task["train"]
    train = _read_source(
        ctx, {**task, "source": train_src,
              "type": train_src.get("kind", "parquet") + "-x"}
    )
    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    id_field = task.get("id_field", df.columns[0])
    counts, stats = nb_train(
        train, id_col=task.get("train_id_field", id_field),
        text_col=text_field, label_col=label_field,
    )
    scores = nb_score(
        df, counts, stats, id_col=id_field, text_col=text_field,
        label_col=label_field,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("log_score").desc(), F.col(label_field).asc()
    )
    pred = (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("doc_id").alias(id_field),
            F.col(label_field).alias("pred"),
            F.col("log_score").alias("score"),
        )
    )
    if "min_score" in task:
        pred = pred.filter(F.col("score") >= float(task["min_score"]))
    tgt = task["target"]
    n_out = _observed_write(
        ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, pred
    )
    ctx.log(f"task {task.get('name')}: {n_out} rows classified")


def run_sample(ctx: TaskContext, task: dict) -> None:
    """Sample task (beyond the reference): read any supported source,
    keep a deterministic id-hash sample, write it to ``target`` — the
    task-file spelling of the sampling operators, so a scheduled task
    becomes a repeatable downsized extract (same rows on every run
    and on any cluster size; operators/sampling).

    - ``method: deterministic`` (default) — ``fraction`` of rows by
      id hash
    - ``method: stratified`` — per-stratum ``fractions`` map over
      ``strata_field`` (unlisted strata get ``default_fraction``)
    - ``method: dsir`` — importance-resampling selection: score each
      source row by the DSIR target-vs-raw unigram log-likelihood
      ratio against the ``train`` source's exemplar docs
      (operators/sampling.dsir_weights) and keep the top
      ``keep_fraction`` by per-token weight (exact-percentile
      threshold, ties kept) — the task-file spelling of
      quality-targeted corpus selection
    - ``method: coreset`` — greedy k-center over ``vec_field``
      embeddings (operators/sampling.kcenter_coreset): the ``k``
      source rows that COVER the embedding space, each stamped with
      its pick_order and squared distance to the prior centers —
      the task-file spelling of diversity-first selection
    """
    from dasladen_spark.operators.sampling import (
        deterministic_sample,
        dsir_weights,
        stratified_sample,
    )

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    id_field = task.get("id_field", df.columns[0])
    method = task.get("method", "deterministic")
    if method == "dsir":
        from pyspark.sql import functions as F

        text_field = task.get("text_field", "text")
        train_src = task["train"]
        train = _read_source(
            ctx, {**task, "source": train_src,
                  "type": train_src.get("kind", "parquet") + "-x"}
        )
        tagged = df.select(
            F.col(id_field).alias("_did"),
            F.col(text_field).alias("_txt"),
            F.lit(False).alias("_t"),
        ).unionByName(
            train.select(
                F.lit(None).cast(df.schema[id_field].dataType).alias("_did"),
                F.col(text_field).alias("_txt"),
                F.lit(True).alias("_t"),
            )
        )
        # w feeds TWO consumers (the percentile threshold and the keep
        # filter) — persisted so the whole DSIR scoring pipeline runs
        # once instead of once per consumer; w is doc-count-sized
        # (id + two numbers)
        w = dsir_weights(tagged, "_t", id_col="_did", text_col="_txt").persist()
        try:
            keep_fraction = float(task.get("keep_fraction", 0.25))
            thr = w.agg(
                F.percentile(
                    "weight_per_token", F.lit(1.0 - keep_fraction)
                ).alias("thr")
            )
            keep = (
                w.crossJoin(F.broadcast(thr))
                .filter(F.col("weight_per_token") >= F.col("thr"))
                .select(F.col("_did").alias(id_field), "weight_per_token")
            )
            out = df.join(keep, id_field)
            tgt = task["target"]
            _write_sink(
                ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, out
            )
        finally:
            w.unpersist()
        ctx.log(f"task {task.get('name')}: sample written (dsir)")
        return
    if method == "coreset":
        from pyspark.sql import functions as F

        from dasladen_spark.operators.sampling import kcenter_coreset

        for reserved in ("pick_order", "d2"):
            if reserved in df.columns:
                raise ValueError(
                    f"sample task (coreset): source column {reserved!r}"
                    " collides with an audit column — rename it upstream"
                )
        # loud id guard (the decontaminate task's invariant): a NULL
        # id seeds the greedy pick then vanishes from the equi-join;
        # duplicate ids fan the broadcast join out into >k rows with
        # d2 stamped on rows it was never computed for
        stats = df.agg(
            F.count(id_field).alias("n_ids"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(id_field).alias("n_distinct"),
        ).collect()[0]
        if stats.n_ids != stats.n_rows or stats.n_distinct != stats.n_rows:
            raise ValueError(
                f"sample task (coreset): id_field {id_field!r} must be"
                f" non-null and unique ({stats.n_rows} rows,"
                f" {stats.n_ids} non-null, {stats.n_distinct} distinct)"
            )
        # the greedy loop scans the source k times — persist so those
        # scans hit memory, not the source parser (the operator's
        # at-scale contract)
        df = df.persist()
        try:
            picks = kcenter_coreset(
                df,
                vec_col=task.get("vec_field", "embedding"),
                id_col=id_field,
                k=int(task.get("k", 8)),
            )
            # picks is k rows — broadcast it back onto the source so
            # the output carries every source column plus the audit
            # pair
            out = df.join(F.broadcast(picks), id_field).orderBy(
                "pick_order"
            )
            tgt = task["target"]
            _write_sink(
                ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, out
            )
        finally:
            df.unpersist()
        ctx.log(f"task {task.get('name')}: sample written (coreset)")
        return
    if method == "deterministic":
        out = deterministic_sample(
            df, float(task.get("fraction", 0.1)), id_field,
            salt=int(task.get("salt", 42)),
        )
    elif method == "stratified":
        out = stratified_sample(
            df,
            task["strata_field"],
            {k: float(v) for k, v in task.get("fractions", {}).items()},
            id_field,
            default_fraction=float(task.get("default_fraction", 0.0)),
            salt=int(task.get("salt", 42)),
        )
    else:
        raise ValueError(f"unknown sample method {method!r}")
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, out)
    ctx.log(f"task {task.get('name')}: sample written ({method})")


def _semantic_prefilter(task: dict) -> str:
    """Map the decontaminate task's ``prefilter`` knob to a
    semantic_contamination method, rejecting unknown values."""
    pf = task.get("prefilter")
    if pf in (None, "exact"):
        return "exact"
    if pf == "ann":
        return "ann"
    raise ValueError(
        f"decontaminate task: unknown prefilter {pf!r}"
        " (expected 'ann' or 'exact'/absent)"
    )


def run_pack(ctx: TaskContext, task: dict) -> None:
    """Pack task (beyond the reference): stamp every source row with
    ``n_tokens`` (whitespace token count of ``text_field``) and a
    ``pack_id`` assigning documents — in ``id_field`` order — to
    fixed-budget training sequences by exclusive running token count
    (``seq_tokens``, default 2048). The task-file spelling of the
    pack_sequences plan: the running total is
    operators/ranking.global_prefix_sum (range-partition + partition
    offsets), never a single-partition global window, so the same
    task packs a trillion tokens."""
    from pyspark.sql import functions as F

    from dasladen_spark.functions.text import token_count
    from dasladen_spark.operators.ranking import global_prefix_sum

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    text_field = task.get("text_field", "text")
    id_field = task.get("id_field", df.columns[0])
    seq_tokens = int(task.get("seq_tokens", 2048))
    for reserved in ("n_tokens", "pack_id", "__prior"):
        if reserved in df.columns:
            raise ValueError(
                f"pack task: source column {reserved!r} collides with an"
                " output name — rename it upstream"
            )
    toks = df.withColumn(
        "n_tokens", token_count(F.col(text_field)).cast("long")
    )
    ps = global_prefix_sum(
        toks, [F.col(id_field)], "n_tokens", out_col="__prior",
        exclusive=True,
    )
    out = ps.withColumn(
        "pack_id",
        F.floor(F.col("__prior") / F.lit(seq_tokens)).cast("bigint"),
    ).drop("__prior")
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, out)
    ctx.log(
        f"task {task.get('name')}: packed into {seq_tokens}-token"
        " sequences"
    )


def run_decontaminate(ctx: TaskContext, task: dict) -> None:
    """Decontaminate task (beyond the reference): drop source docs
    that share at least ``min_hits`` distinct word n-grams (width
    ``ngram``, default 8) with a benchmark corpus read from the
    ``bench`` source — the task-file spelling of the
    decontaminate_ngrams query family, so eval-set leakage removal
    becomes a schedulable pipeline stage. Clean docs go to
    ``target``; set ``quarantine`` to also write the dropped docs
    with their hit counts (the audit trail reviewers ask for).
    ``method: "semantic"`` switches to embedding-space matching: a
    doc drops when its ``vec_field`` vector sits within ``threshold``
    cosine of some benchmark vector — the paraphrase-robust
    complement (a reworded eval question shares no 8-gram but sits
    next to the original in embedding space); quarantined docs carry
    (nearest_bench_id, max_cosine) instead of the gram count.

    ``id_field`` values must be non-null and unique — a NULL id would
    silently pass a contaminated doc into the clean output (anti-join
    NULL semantics) and duplicate ids would merge gram sets across
    docs before the min_hits threshold, so both fail loudly up front.

    Scale shape: see operators/decontaminate (the gram pipeline is
    SHARED with the streaming intake gate, so batch and stream drop
    exactly the same docs): the benchmark's distinct gram set
    broadcasts; the corpus side joins that broadcast BEFORE any
    distinct, so the only corpus-keyed exchange is benchmark-bounded,
    never the full gram stream."""
    from pyspark.sql import functions as F

    from dasladen_spark.operators.decontaminate import (
        bench_gram_set,
        contamination_hits,
        semantic_hits,
    )

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    bench_src = task["bench"]
    bench_df = _read_source(
        ctx, {**task, "source": bench_src,
              "type": bench_src.get("kind", "parquet") + "-x"}
    )
    method = task.get("method", "ngrams")
    if method not in ("ngrams", "semantic"):
        raise ValueError(
            f"decontaminate task: unknown method {method!r}"
            " (expected 'ngrams' or 'semantic')"
        )
    text_field = task.get("text_field", "text")
    bench_text = task.get("bench_text_field", text_field)
    id_field = task.get("id_field", df.columns[0])
    n = int(task.get("ngram", 8))
    min_hits = int(task.get("min_hits", 1))
    reserved_cols = ("_did", "n_contaminated_grams") if method == "ngrams" \
        else ("_did", "nearest_bench_id", "max_cosine")
    for reserved in reserved_cols:
        if reserved in df.columns:
            raise ValueError(
                f"decontaminate task: source column {reserved!r} collides"
                " with an internal name — rename it upstream"
            )
    stats = df.agg(
        F.count(id_field).alias("n_ids"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(id_field).alias("n_distinct"),
    ).collect()[0]
    if stats.n_ids != stats.n_rows or stats.n_distinct != stats.n_rows:
        raise ValueError(
            f"decontaminate task: id_field {id_field!r} must be non-null"
            f" and unique ({stats.n_rows} rows, {stats.n_ids} non-null,"
            f" {stats.n_distinct} distinct) — a NULL or duplicated id"
            " would silently leak or over-drop documents"
        )
    if method == "semantic":
        # paraphrase-robust variant: both sides carry an embedding
        # column; a doc drops when its vector sits within `threshold`
        # cosine of SOME benchmark vector (operators/decontaminate
        # semantic_hits — bench broadcast, one corpus scan)
        vec_field = task.get("vec_field", "embedding")
        bench_vec = task.get("bench_vec_field", vec_field)
        hits = semantic_hits(
            df,
            bench_df.select(
                F.col(task.get("bench_id_field", id_field)).alias(id_field),
                F.col(bench_vec).alias(vec_field),
            ),
            vec_col=vec_field,
            id_col=id_field,
            threshold=float(task.get("threshold", 0.35)),
            # prefilter: "ann" bounds the rescore to hyperplane-bucket
            # collisions — the shape for eval suites too large for the
            # exact |corpus|×|bench| broadcast scan; anything else
            # (typo, wrong case) fails loudly rather than silently
            # running the 2000×-slower exact scan
            method=_semantic_prefilter(task),
            num_tables=int(task.get("num_tables", 16)),
            bits_per_table=int(task.get("bits_per_table", 4)),
            dim=int(task.get("dim", 64)),
        )
    else:
        bench_grams = bench_gram_set(bench_df, text_col=bench_text, n=n)
        hits = contamination_hits(
            df,
            bench_grams,
            text_col=text_field,
            id_col=id_field,
            n=n,
            min_hits=min_hits,
        )
    if task.get("quarantine"):
        # doc-id-sized; two consumers (anti-join + quarantine join)
        # must not re-run the gram pipeline
        hits = hits.persist()
    clean = df.join(
        hits, df[id_field] == hits["_did"], "left_anti"
    )
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, clean)
    if task.get("quarantine"):
        dropped = df.join(
            hits, df[id_field] == hits["_did"]
        ).drop("_did")
        q = task["quarantine"]
        _write_sink(
            ctx, {**task, "type": "x-" + q.get("kind", "parquet"),
                  "target": q}, dropped
        )
        hits.unpersist()
    knobs = (
        f"method=semantic, threshold={float(task.get('threshold', 0.35))}"
        if method == "semantic"
        else f"ngram={n}, min_hits={min_hits}"
    )
    ctx.log(f"task {task.get('name')}: decontaminated ({knobs})")


def run_intake(ctx: TaskContext, task: dict) -> None:
    """Intake task (beyond the reference): run one of the STREAMING
    ingestion gates (streaming/intake.py) from a task file, so the
    reference's control plane — watcher, scheduler, repeat-N, CLI —
    can drive continuous document intake without bespoke driver code.
    Each run drains whatever landed in the source folder since the
    last run (``availableNow`` + a persistent checkpoint under the
    output area), routing to ``target`` (accept) and ``quarantine``
    folders exactly once; a scheduled task file thereby becomes an
    incremental intake pipeline with per-run cost O(new files).

    ``gate: "quality"`` (default) scores with the batch pipeline's
    Column scorer (``min_quality`` / ``min_tokens`` knobs); ``gate:
    "decontaminate"`` quarantines docs sharing ≥ ``min_hits`` word
    ``ngram``-grams with the ``bench`` source — both gates are the
    SAME code the batch tasks run, so ingestion and backfill can
    never disagree. ``schema`` defaults to the documents layout."""
    from dasladen_spark.streaming.intake import (
        run_decontaminate_gate,
        run_quality_gate,
        stream_document_folder,
    )

    src = task["source"]
    folder = src.get("folder", src.get("path", ctx.input_path))
    schema = src.get(
        "schema", "doc_id long, text string, lang string, source string"
    )
    docs = stream_document_folder(ctx.spark, folder, schema)
    tgt = task["target"]
    accept = os.path.join(
        tgt.get("folder", tgt.get("path", ctx.output_path)), tgt["file"]
    )
    q = task.get("quarantine", {})
    quarantine = os.path.join(
        q.get("folder", q.get("path", ctx.output_path)),
        q.get("file", tgt["file"] + ".quarantine"),
    )
    gate = task.get("gate", "quality")
    # keyed on (name, gate, target): two intake tasks sharing an
    # output area must not share a streaming checkpoint — the second
    # would inherit the first's seen-files log and silently process
    # nothing
    checkpoint = task.get(
        "checkpoint",
        os.path.join(
            ctx.output_path,
            f"_ck_{task.get('name', 'intake')}_{gate}_{tgt['file']}",
        ),
    )
    scratch: list = []
    if gate == "quality":
        query = run_quality_gate(
            docs,
            accept,
            quarantine,
            checkpoint,
            min_quality=float(task.get("min_quality", 0.3)),
            min_tokens=int(task.get("min_tokens", 5)),
            text_col=task.get("text_field", "text"),
        )
    elif gate == "decontaminate":
        bench_src = task["bench"]
        bench_df = _read_source(
            ctx,
            {**task, "source": bench_src,
             "type": bench_src.get("kind", "parquet") + "-x"},
        )
        query = run_decontaminate_gate(
            docs,
            bench_df,
            accept,
            quarantine,
            checkpoint,
            text_col=task.get("text_field", "text"),
            id_col=task.get("id_field", "doc_id"),
            ngram=int(task.get("ngram", 8)),
            min_hits=int(task.get("min_hits", 1)),
            scratch=scratch,
            # method: "semantic" needs a `schema` with the vector
            # column (the documents default has none)
            method=task.get("method", "ngrams"),
            vec_col=task.get("vec_field", "embedding"),
            threshold=float(task.get("threshold", 0.35)),
            bench_id_col=task.get("bench_id_field"),
            bench_vec_col=task.get("bench_vec_field"),
        )
    else:
        raise ValueError(f"unknown intake gate {gate!r}")
    try:
        query.awaitTermination()
    finally:
        for c in scratch:
            c.unpersist()
    ctx.log(f"task {task.get('name')}: intake drained ({gate} gate)")


def run_cluster(ctx: TaskContext, task: dict) -> None:
    """Cluster task (beyond the reference): read any supported
    source, run the lattice k-means over its embedding column
    (operators/clustering.kmeans_fit — md5-hash seeds, quantized-
    integer Lloyd rounds), and write the (id, cluster) assignment to
    ``target``; ``report`` optionally names a second sink for the
    per-cluster size rollup. Fully deterministic, so a scheduled
    re-run over the same corpus writes identical assignments — the
    task-file spelling of corpus-structure discovery (mix audits,
    per-cluster sampling quotas).

    Options: ``k`` (default 8), ``iterations`` (default 4),
    ``id_field`` (default vec_id), ``vector_field`` (default
    embedding), ``fit_fraction`` (fit the centroids on a
    deterministic id-hash sample — the 100 TB shape; the final
    assignment still covers every row)."""
    from pyspark.sql import functions as F

    from dasladen_spark.operators.clustering import kmeans_fit

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    id_field = task.get("id_field", "vec_id")
    vec_field = task.get("vector_field", "embedding")
    k = int(task.get("k", 8))
    fit_fraction = task.get("fit_fraction")
    assigned = kmeans_fit(
        df,
        vec_field,
        id_field,
        k=k,
        iterations=int(task.get("iterations", 4)),
        fit_fraction=(
            float(fit_fraction) if fit_fraction is not None else None
        ),
    ).withColumnRenamed("id", id_field)
    tgt = task["target"]
    _write_sink(
        ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, assigned
    )
    report = task.get("report")
    if report:
        sizes = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy("cluster")
        )
        _write_sink(
            ctx,
            {**task, "target": report,
             "type": "x-" + report.get("kind", "csv")},
            sizes,
        )
    ctx.log(f"task {task.get('name')}: clustered into {k} cells")


def run_score(ctx: TaskContext, task: dict) -> None:
    """Score task (beyond the reference): stamp every source row with
    the heuristic quality score (functions/text.quality_score — the
    same Column the registered queries and the streaming intake gate
    use) and, when ``normalize_by`` names a group column, a
    ``quality_normalized`` column mapping the score to the GLOBAL
    score at the same within-group CDF position
    (operators/scoring.quantile_normalize_map). The task-file
    spelling of make-scores-comparable curation: score once, then
    filter/sample downstream on a column that means the same thing
    in every source.

    Scale shape: scoring is a pure JVM projection; the normalization
    mapping is built from ONE extra pass over the scored frame
    (bounded at distinct (group, score) pairs — scores are rounded
    to 4 decimals) and broadcast back, so the corpus never shuffles.
    """
    from pyspark.sql import functions as F

    from dasladen_spark.functions.text import quality_score

    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    text_field = task.get("text_field", "text")
    scored = df.withColumn("quality", quality_score(F.col(text_field)))
    grp = task.get("normalize_by")
    if grp:
        if grp == "quality":
            raise ValueError(
                "score task: normalize_by must name a GROUP column, not"
                " the score itself"
            )
        from dasladen_spark.operators.scoring import quantile_normalize_map

        # rows with NULL text (→ NULL quality) or a NULL group never
        # enter the CDFs (the operator drops them) and keep a NULL
        # quality_normalized here — identifiable, never distorting
        m = quantile_normalize_map(
            scored.select(grp, "quality"), grp, "quality"
        )
        scored = scored.join(
            F.broadcast(
                m.select(grp, "quality", F.col("nq").alias("quality_normalized"))
            ),
            [grp, "quality"],
            "left",
        )
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, scored)
    ctx.log(
        f"task {task.get('name')}: scores written"
        f" ({'normalized by ' + grp if grp else 'raw'})"
    )


def run_ann_index(ctx: TaskContext, task: dict) -> None:
    """ANN-index task (beyond the reference): the full index
    lifecycle from task files, the same way the dedup task covers the
    fingerprint index —

    - ``action: build``   materialize the bucketed index from the
      ``source`` rows (LSH or IVF probe keys, optional PQ postings)
    - ``action: append``  encode ONLY the ``source`` rows with the
      stored parameters/codebooks and add them (no rebuild)
    - ``action: compact`` rewrite to one posting file per bucket
      after many appends (schedule it like any table maintenance)
    - ``action: search``  probe with the ``queries`` source, write
      the per-query top-k to ``target``"""
    from dasladen_spark.operators.ann_index import (
        append_to_ann_index,
        compact_ann_index,
        ensure_ann_index,
        search_ann_index,
    )

    index = task["index"]
    id_field = task.get("id_field", "vec_id")
    vec_field = task.get("vector_field", "embedding")
    action = task.get("action", "build")
    if action == "append":
        src = task["source"]
        df = _read_source(
            ctx, {**task, "type": src.get("kind", "parquet") + "-x"}
        )
        append_to_ann_index(
            ctx.spark, index, df, id_col=id_field, vec_col=vec_field
        )
        ctx.log(f"task {task.get('name')}: appended to index {index}")
        return
    if action == "compact":
        compact_ann_index(ctx.spark, index)
        ctx.log(f"task {task.get('name')}: compacted index {index}")
        return
    if action == "build":
        src = task["source"]
        df = _read_source(
            ctx, {**task, "type": src.get("kind", "parquet") + "-x"}
        )
        ensure_ann_index(
            df,
            index,
            # default tag = the resolved source FILE path, so pointing
            # the same index at a different corpus file rebuilds it
            tag=str(task.get("tag", _src_path(ctx, src))),
            method=task.get("method", "lsh"),
            id_col=id_field,
            vec_col=vec_field,
            dim=int(task.get("dim", 64)),
            compress=task.get("compress", "none"),
            # every geometry knob is reachable from the task surface
            # (defaults match ann_index._GEOMETRY_DEFAULTS — a task
            # that sets any of them gets a matching index, not the
            # stale default-geometry one)
            num_tables=int(task.get("num_tables", 16)),
            bits_per_table=int(task.get("bits_per_table", 4)),
            n_centroids=int(task.get("n_centroids", 16)),
            lloyd_iters=int(task.get("lloyd_iters", 1)),
            n_buckets=int(task.get("n_buckets", 16)),
            pq_m=int(task.get("pq_m", 16)),
            pq_ksub=int(task.get("pq_ksub", 32)),
            pq_iters=int(task.get("pq_iters", 2)),
        )
        ctx.log(f"task {task.get('name')}: index {index} ready")
        return
    if action != "search":
        raise ValueError(f"unknown ann-index action {action!r}")
    q_src = task["queries"]
    queries = _read_source(
        ctx, {**task, "source": q_src,
              "type": q_src.get("kind", "parquet") + "-x"}
    )
    corpus = None
    if "source" in task:
        src = task["source"]
        corpus = _read_source(
            ctx, {**task, "type": src.get("kind", "parquet") + "-x"}
        )
    res = search_ann_index(
        ctx.spark,
        index,
        queries,
        k=int(task.get("k", 5)),
        query_id=id_field,
        query_vec=vec_field,
        n_probe=int(task.get("n_probe", 4)),
        rerank_mult=int(task.get("rerank_mult", 8)),
        corpus=corpus,
    )
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, res)
    ctx.log(f"task {task.get('name')}: search results written")


def run_sketch(ctx: TaskContext, task: dict) -> None:
    """Sketch task (beyond the reference): maintain mergeable
    distinct-count / overlap sketch TABLES from task files — the
    persisted form of operators/sketches, so a daily pipeline ships
    m (or k) longs per key per period instead of raw value sets.

    - ``action: build``    source rows → sketch rows → target (run
      daily with an append-mode target to accumulate the daily
      sketch table; streaming/sketchsync maintains the same shape)
    - ``action: merge``    source SKETCH table → coarser ``keys``
      (daily → monthly) → target
    - ``action: estimate`` source SKETCH table → per-``keys``
      distinct-count estimates → target
    - ``action: overlap``  (kmv only) source SKETCH table keyed by
      ``keys[0]`` → intersection/union estimates for ``pair`` →
      target

    ``method: hll`` (default; m buckets) or ``kmv`` (k minimum
    values); ``value`` names the counted column for ``build``."""
    from dasladen_spark.operators import sketches as sk

    method = task.get("method", "hll")
    action = task.get("action", "build")
    keys = list(task.get("keys", []))
    src = task["source"]
    df = _read_source(ctx, {**task, "type": src.get("kind", "parquet") + "-x"})
    df = _transformed(ctx, task, df)
    if method == "hll":
        m = int(task.get("m", 16))
        if action == "build":
            out = sk.hll_sketch(df, keys, task["value"], m=m)
        elif action == "merge":
            out = sk.hll_merge(df, keys)
        elif action == "estimate":
            # merge-first: estimating a finer-keyed sketch table
            # directly would sum duplicate buckets (garbage
            # estimates); merging to the table's own keys is a no-op
            out = sk.hll_estimate(sk.hll_merge(df, keys), keys, m=m)
        else:
            raise ValueError(f"unknown hll sketch action {action!r}")
    elif method == "kmv":
        k = int(task.get("k", 256))
        if action == "build":
            out = sk.kmv_sketch(df, keys, task["value"], k=k)
        elif action == "merge":
            out = sk.kmv_merge(df, keys, k=k)
        elif action == "estimate":
            # merge-first, same reason as the hll branch (re-ranking
            # an already-k-min sketch at its own keys is a no-op)
            out = sk.kmv_estimate_distinct(
                sk.kmv_merge(df, keys, k=k), keys, k=k
            )
        elif action == "overlap":
            pair = task["pair"]
            cached = df.persist()  # feeds four branches, ≤ 2k rows
            try:
                out = sk.kmv_overlap_pair(
                    cached, keys[0], pair[0], pair[1], k=k
                )
                tgt = task["target"]
                _write_sink(
                    ctx,
                    {**task, "type": "x-" + tgt.get("kind", "parquet")},
                    out,
                )
            finally:
                cached.unpersist()
            ctx.log(f"task {task.get('name')}: kmv overlap written")
            return
        else:
            raise ValueError(f"unknown kmv sketch action {action!r}")
    else:
        raise ValueError(f"unknown sketch method {method!r}")
    tgt = task["target"]
    _write_sink(ctx, {**task, "type": "x-" + tgt.get("kind", "parquet")}, out)
    ctx.log(
        f"task {task.get('name')}: sketch {method}/{action} written"
    )


TASK_TYPES: dict[str, Callable[[TaskContext, dict], None]] = {
    "csv-db": run_etl,
    "db-csv": run_etl,
    "db-db": run_etl,
    "csv-csv": run_etl,
    "xls-csv": run_etl,
    "xml-csv": run_etl,
    "xml-db": run_etl,
    "sql-exec": run_sql_exec,
    "zip": run_zip,
    "unzip": run_unzip,
    "download": run_download,
    "ftp-upload": run_ftp_upload,
    "py-exec": run_py_exec,
    "custom": run_custom,
    "nop": run_nop,
    "profile": run_profile,
    "validate": run_validate,
    "dedup": run_dedup,
    "er": run_er,
    "classify": run_classify,
    "ann-index": run_ann_index,
    "cluster": run_cluster,
    "sample": run_sample,
    "score": run_score,
    "decontaminate": run_decontaminate,
    "intake": run_intake,
    "sketch": run_sketch,
    "pack": run_pack,
}

# Beyond the reference's seven ETL shapes: the full source×sink matrix
# over the Spark-native formats (JSON-lines, parquet, and ORC are what
# a lakehouse pipeline actually moves; all splittable and columnar/
# row-streamed at any scale).
for _s in ("csv", "db", "xml", "xls", "json", "parquet", "orc"):
    for _t in ("csv", "db", "json", "parquet", "orc", "tar"):
        TASK_TYPES.setdefault(f"{_s}-{_t}", run_etl)
