"""Vector math over ``array<float|double>`` columns.

Pure Column expressions (``zip_with`` + ``aggregate``) — executed by
the JVM inside whole-stage codegen, so a 100 TB embedding scan never
crosses into Python. ``aggregate`` folds left-to-right, which makes
the double accumulation order deterministic — required for the exact
hash-match against the DuckDB oracle, and for reproducible results
regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (double, sequential fold)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero vectors (no NaN poisoning)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_sim_carried(
    a: Column, b: Column, norm_a: Column, norm_b: Column
) -> Column:
    """cosine_sim with the norms CARRIED as columns — bit-identical
    output (``norm_x`` must be ``l2_norm(x)``: same fold, same sqrt,
    so ``norm_a * norm_b`` and the zero guard see the same doubles),
    but the per-PAIR work drops from three interpreted folds to one.
    Norms are per-ROW quantities: every pair-scoring stage (ANN
    candidate scoring, brute-force top-k) folds each row's norm once
    in a projection before the join instead of once per pair — the
    win (a) the note below prescribes."""
    denom = norm_a * norm_b
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def bounded_window_key(col: Column) -> Column:
    """A non-foldable always-zero partition key for windows whose
    input is BOUNDED by construction (a preceding ``limit``, a
    per-partition shortlist, one row per calendar day/month...).

    ``Window.partitionBy(lit(0))`` gets constant-folded back to an
    empty partition spec, so WindowExec still logs "No Partition
    Defined" — a warning we want to stay meaningful for genuinely
    unbounded global windows. ``col % 1`` references a real column,
    survives optimization and always evaluates to 0 — including for
    null inputs (coalesced), so a nullable key can never silently
    split the window into a second partition and restart running
    sums/ranks. The single partition becomes an explicit, greppable
    plan choice rather than an accident. Cast goes through long:
    works for any numeric input."""
    return F.coalesce(col.cast("long") % 1, F.lit(0))


# NOTE: a "dot_fixed" unrolled 64-term element_at chain was tried as
# a codegen'd replacement for the fold above and measured ~4× SLOWER
# on a corpus×bench pair stream: the generated method is too large
# for the JIT, so the whole stage runs as interpreted bytecode, while
# Catalyst's lambda interpreter over primitive double arrays is
# comparatively fast. If a pair-scoring stage needs more speed, the
# wins that actually work are (a) fold each norm once per ROW and
# carry it as a column (cosine_sim_carried — applied across the ANN
# scorers and stored as the index's build-time ``cnorm`` in round 9;
# operators/decontaminate does the same), and (b) filter on the
# score BEFORE any non-hash aggregate.
