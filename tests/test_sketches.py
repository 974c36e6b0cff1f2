"""Mergeable sketch operators (operators/sketches), the ``sketch``
task kind, and the streaming HLL maintainer (streaming/sketchsync).

The load-bearing properties are EXACT (not statistical): merging a
finer sketch equals building the coarser one directly (max / k-min
associativity), and a not-full sketch falls back to the exact regime
(its estimate equals the true count). Estimator ACCURACY at fixture
scale is covered by the exact-oracle queries q_hll_portable_rollup /
text_kmv_gram_overlap (plans/llm12)."""

import pytest
from pyspark.sql import functions as F

from dasladen_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_sketch,
    kmv_estimate_distinct,
    kmv_merge,
    kmv_overlap_pair,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from dasladen_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        "user_id",
    )


def test_hll_merge_equals_direct_build(spark, events):
    """Monthly sketch rolled up from daily == monthly sketch built
    straight from the rows — max is associative, so the mergeable
    representation loses nothing. Exact row-set equality."""
    daily = hll_sketch(events, ["day", "month"], "user_id", m=16)
    rolled = hll_merge(daily, ["month"])
    direct = hll_sketch(events, ["month"], "user_id", m=16)
    got = {(r["month"], r["bucket"]): r["m_j"] for r in rolled.collect()}
    want = {(r["month"], r["bucket"]): r["m_j"] for r in direct.collect()}
    assert got == want and got


def test_hll_estimate_from_merge_equals_direct(spark, events):
    daily = hll_sketch(events, ["day", "month"], "user_id", m=16)
    a = {
        r["month"]: r["est_distinct"]
        for r in hll_estimate(hll_merge(daily, ["month"]), ["month"]).collect()
    }
    b = {
        r["month"]: r["est_distinct"]
        for r in hll_estimate(
            hll_sketch(events, ["month"], "user_id", m=16), ["month"]
        ).collect()
    }
    assert a == b  # bit-identical, not approximately equal
    # sanity: the estimate is in the right ballpark of the exact count
    exact = {
        r["month"]: r["n"]
        for r in events.groupBy("month")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for mth, est in a.items():
        assert 0.4 * exact[mth] <= est <= 2.5 * exact[mth]


def test_kmv_merge_equals_direct_build(spark, events):
    """The merged k-min set over groups == the k-min set of the
    union: every retained hash of an input sketch is below its θ, so
    re-ranking the union of sketches reproduces the direct build."""
    by_day = kmv_sketch(events, ["day"], "user_id", k=8)
    merged = sorted(
        r["hv"] for r in kmv_merge(by_day, [], k=8).collect()
    )
    direct = sorted(
        r["hv"] for r in kmv_sketch(events, [], "user_id", k=8).collect()
    )
    # the sf0.001 fixture has 15 distinct users, so k=8 sketches FILL
    assert merged == direct and len(direct) == 8


def test_kmv_not_full_estimate_is_exact(spark):
    df = spark.createDataFrame(
        [("a", f"v{i}") for i in range(7)], "g string, v string"
    )
    est = kmv_estimate_distinct(
        kmv_sketch(df, ["g"], "v", k=64), ["g"], k=64
    ).collect()
    assert est[0]["est_distinct"] == 7.0


def test_kmv_overlap_exact_when_sketch_holds_everything(spark):
    """With k ≥ |union| both sides are wholly known (θ = full hash
    space), so the intersection estimate is exactly D and the union
    estimate exactly the merged count — the not-full fallbacks."""
    rows = [("a", f"x{i}") for i in range(20)] + [
        ("b", f"x{i}") for i in range(12, 40)
    ]
    df = spark.createDataFrame(rows, "src string, v string")
    sk = kmv_sketch(df, ["src"], "v", k=256).persist()
    try:
        got = kmv_overlap_pair(sk, "src", "a", "b", k=256).collect()[0]
    finally:
        sk.unpersist()
    assert got["pair"] == "a|b"
    assert got["est_intersection"] == 8.0  # x12..x19
    assert got["est_union"] == 40.0


def test_sketch_task_build_merge_estimate(spark, tmp_path):
    """Task-surface e2e: build a daily HLL sketch table from parquet,
    roll it up to months, estimate — each step a task file; the final
    estimates equal the operator pipeline bit-for-bit."""
    from dasladen_spark.session import load_table
    from tests.test_tasks import run_tasks

    for d in ("input", "output", "module"):
        (tmp_path / d).mkdir()
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        "user_id",
    )
    ev.write.parquet(str(tmp_path / "input" / "events.parquet"))
    run_tasks(
        spark,
        tmp_path,
        {
            "tasks": [
                {
                    "name": "build",
                    "type": "sketch",
                    "method": "hll",
                    "action": "build",
                    "keys": ["day", "month"],
                    "value": "user_id",
                    "m": 16,
                    "source": {"kind": "parquet", "file": "events.parquet"},
                    "target": {"kind": "parquet", "file": "daily.parquet"},
                },
                {
                    "name": "rollup",
                    "type": "sketch",
                    "method": "hll",
                    "action": "merge",
                    "keys": ["month"],
                    "source": {
                        "kind": "parquet",
                        "file": "../output/daily.parquet",
                    },
                    "target": {"kind": "parquet", "file": "monthly.parquet"},
                },
                {
                    "name": "estimate",
                    "type": "sketch",
                    "method": "hll",
                    "action": "estimate",
                    "keys": ["month"],
                    "m": 16,
                    "source": {
                        "kind": "parquet",
                        "file": "../output/monthly.parquet",
                    },
                    "target": {"kind": "parquet", "file": "est.parquet"},
                },
            ]
        },
    )
    got = {
        r["month"]: r["est_distinct"]
        for r in spark.read.parquet(
            str(tmp_path / "output" / "est.parquet")
        ).collect()
    }
    want = {
        r["month"]: r["est_distinct"]
        for r in hll_estimate(
            hll_sketch(ev, ["month"], "user_id", m=16), ["month"]
        ).collect()
    }
    assert got == want and got


def test_streaming_hll_sketch_equals_batch_build(spark, tmp_path):
    """Two micro-batches folded through the streaming maintainer
    must equal the batch sketch over all rows (max-mergeable), and
    the read-side estimates must match the batch estimates exactly."""
    from dasladen_spark.streaming.sketchsync import (
        read_sketch_estimates,
        run_streaming_hll_sketch,
    )

    src = tmp_path / "stream"
    src.mkdir()
    (src / "b1.csv").write_text(
        "day;uid\n2024-01-01;u1\n2024-01-01;u2\n2024-01-02;u3\n"
    )
    schema = "day STRING, uid STRING"

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("sep", ";")
            .option("header", True)
            .option("maxFilesPerTrigger", 1)
            .csv(str(src))
        )

    snap = str(tmp_path / "snap")
    ck = str(tmp_path / "ck")
    run_streaming_hll_sketch(stream(), snap, ck, ["day"], "uid", m=16)
    (src / "b2.csv").write_text(
        "day;uid\n2024-01-01;u2\n2024-01-01;u9\n2024-01-03;u1\n"
    )
    run_streaming_hll_sketch(stream(), snap, ck, ["day"], "uid", m=16)

    batch = (
        spark.read.schema(schema)
        .option("sep", ";")
        .option("header", True)
        .csv(str(src))
    )
    got = {
        (r["day"], r["bucket"]): r["m_j"]
        for r in spark.read.parquet(snap).collect()
    }
    want = {
        (r["day"], r["bucket"]): r["m_j"]
        for r in hll_sketch(batch, ["day"], "uid", m=16).collect()
    }
    assert got == want and got
    est = {
        r["day"]: r["est_distinct"]
        for r in read_sketch_estimates(spark, snap, ["day"]).collect()
    }
    west = {
        r["day"]: r["est_distinct"]
        for r in hll_estimate(
            hll_sketch(batch, ["day"], "uid", m=16), ["day"]
        ).collect()
    }
    assert est == west
