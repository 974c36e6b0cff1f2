"""Z-order clustered layout: prove the data-skipping property with
parquet footer stats — per-file (custkey, orderdate) bounding boxes
must be materially tighter than a single-column sort's, because
min/max pruning is exactly as good as those boxes are small."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from dasladen_spark.sinks.zorder import write_zordered


def _file_bboxes(path: str, xcol: str, ycol: str):
    """Per-file (min, max) of both columns from parquet footers —
    the same stats a scan's min/max pruning consults."""
    boxes = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo_x = hi_x = lo_y = hi_y = None
        for rg in range(md.num_row_groups):
            sx = md.row_group(rg).column(idx[xcol]).statistics
            sy = md.row_group(rg).column(idx[ycol]).statistics
            lo_x = sx.min if lo_x is None else min(lo_x, sx.min)
            hi_x = sx.max if hi_x is None else max(hi_x, sx.max)
            lo_y = sy.min if lo_y is None else min(lo_y, sy.min)
            hi_y = sy.max if hi_y is None else max(hi_y, sy.max)
        boxes.append((lo_x, hi_x, lo_y, hi_y))
    return boxes


def _skip_score(boxes, span_x, span_y):
    """Mean per-axis normalized span, averaged over the two axes —
    the expected fraction of files a random single-column point
    predicate fails to prune (min/max pruning reads a file iff the
    point falls inside its span). A single-column sort scores ~0.5
    (one axis tight, the other ~1.0); z-order splits both."""
    return sum(
        ((hx - lx) / span_x + (hy - ly).total_seconds() / span_y) / 2.0
        for lx, hx, ly, hy in boxes
    ) / len(boxes)


def test_zorder_tightens_both_column_ranges(spark, sf_dir, tmp_path):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "singlesort")
    write_zordered(o, z_path, ("o_custkey", "o_orderdate"), n_files=16)
    (
        o.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    z_boxes = _file_bboxes(z_path, "o_custkey", "o_orderdate")
    s_boxes = _file_bboxes(s_path, "o_custkey", "o_orderdate")
    assert len(z_boxes) >= 8 and len(s_boxes) >= 8
    both = z_boxes + s_boxes
    span_x = float(max(b[1] for b in both) - min(b[0] for b in both))
    span_y = (
        max(b[3] for b in both) - min(b[2] for b in both)
    ).total_seconds()

    z_score = _skip_score(z_boxes, span_x, span_y)
    s_score = _skip_score(s_boxes, span_x, span_y)
    # single-column sort: custkey tight (≈1/16) but dates span
    # everything (≈1.0) → score ≈ 0.5. Z-order at 16 files covers a
    # 64×64 bucket square per file → both axes ≈ 0.25 → score ≈
    # 0.25. Require a clear win, with slack for skew.
    assert z_score < 0.75 * s_score, (z_score, s_score)

    # layout must not change the data
    assert (
        spark.read.parquet(z_path).count() == o.count()
    )


def test_zorder_roundtrips_rows(spark, sf_dir, tmp_path):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    path = str(tmp_path / "z2")
    write_zordered(o, path, ("o_custkey", "o_totalprice"), n_files=4)
    back = spark.read.parquet(path)
    assert sorted(back.columns) == sorted(o.columns)
    assert (
        back.selectExpr("sum(o_orderkey)").first()[0]
        == o.selectExpr("sum(o_orderkey)").first()[0]
    )


@pytest.mark.parametrize("n_files", [1])
def test_zorder_single_file_degenerate(spark, sf_dir, tmp_path, n_files):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(10)
    path = str(tmp_path / "z1")
    write_zordered(o, path, ("o_custkey", "o_orderdate"), n_files=n_files)
    assert spark.read.parquet(path).count() == 10
