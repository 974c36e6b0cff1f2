"""Micro-benchmark: per-partition Misra-Gries throughput, row-loop vs
vectorized (round-11 verdict ask 1).

Both variants implement the same candidate-superset contract used by
operators/frequency.heavy_hitters_exact (survival bound n_p/(k2+1) <=
certificate threshold n_p/k2). The old variant is the per-row Python
loop shipped through round 10; the new one is the batch-granular
mergeable-summaries fold now in the operator. Pure driver-side pandas
— no Spark — so the number IS the per-partition kernel cost.

Usage: python tools/mg_microbench.py [out_json]
Prints one JSON line {"rows": N, "old_rows_per_s": ..,
"new_rows_per_s": .., "speedup": ..}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

K2 = 160  # k=20, slack=8 — the text_heavy_hitter_terms geometry
BATCH_ROWS = 10_000  # Arrow default maxRecordsPerBatch
N_BATCHES = 200


def synth_batches(seed: int = 42):
    """Zipf-ish token stream: what a tokenized documents column looks
    like (few heavy terms, long tail)."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i}" for i in range(50_000)])
    for _ in range(N_BATCHES):
        idx = np.minimum(
            rng.zipf(1.3, size=BATCH_ROWS) - 1, len(vocab) - 1
        )
        yield pd.DataFrame({"v": vocab[idx]})


def mg_old(batches, k2: int = K2):
    counters: dict = {}
    n_rows = 0
    evicted = False
    for pdf in batches:
        for v in pdf["v"]:
            if v is None:
                continue
            n_rows += 1
            if v in counters:
                counters[v] += 1
            elif len(counters) < k2:
                counters[v] = 1
            else:
                evicted = True
                dead = [key for key in counters if counters[key] == 1]
                for key in counters:
                    counters[key] -= 1
                for key in dead:
                    del counters[key]
    return counters, n_rows, evicted


FLUSH_ROWS = 1 << 19  # buffered-merge granularity (memory bound)


def mg_new(batches, k2: int = K2):
    counters = pd.Series(dtype="int64")
    n_rows = 0
    evicted = False
    pending: list = []
    pending_rows = 0

    def flush():
        nonlocal counters, n_rows, evicted, pending, pending_rows
        if not pending:
            return
        vc = pd.concat(pending, ignore_index=True).value_counts()
        pending, pending_rows = [], 0
        n_rows += int(vc.sum())
        counters = (
            vc
            if counters.empty
            else counters.add(vc, fill_value=0).astype("int64")
        )
        if len(counters) > k2:
            evicted = True
            cut = counters.nlargest(k2 + 1).iloc[-1]
            counters = counters[counters > cut] - cut

    for pdf in batches:
        pending.append(pdf["v"])
        pending_rows += len(pdf)
        if pending_rows >= FLUSH_ROWS:
            flush()
    flush()
    return dict(counters.items()), n_rows, evicted


def mg_arrow(arrow_batches, k2: int = K2):
    """The shipped variant (operators/frequency): mapInArrow batches,
    value_counts on Arrow string arrays (no object-dtype
    materialization at all), buffered flushes, mergeable-summaries
    eviction."""
    import pyarrow as pa
    import pyarrow.compute as pc

    counters = pd.Series(dtype="int64")
    n_rows = 0
    evicted = False
    pending: list = []
    pending_rows = 0

    def flush():
        nonlocal counters, n_rows, evicted, pending, pending_rows
        if not pending:
            return
        ca = pa.chunked_array(pending)  # zero-copy over the batches
        pending, pending_rows = [], 0
        vc = pc.value_counts(ca)
        n_rows += len(ca) - ca.null_count
        vals, cnts = vc.field("values"), vc.field("counts")
        if vals.null_count:  # nulls never count as a value
            keep = pc.is_valid(vals)
            vals, cnts = vals.filter(keep), cnts.filter(keep)
        ser = pd.Series(cnts.to_numpy(), index=vals.to_pandas())
        counters = (
            ser
            if counters.empty
            else counters.add(ser, fill_value=0).astype("int64")
        )
        if len(counters) > k2:
            evicted = True
            cut = counters.nlargest(k2 + 1).iloc[-1]
            counters = counters[counters > cut] - cut

    for batch in arrow_batches:
        arr = batch.column(0)
        pending.append(arr)
        pending_rows += len(arr)
        if pending_rows >= FLUSH_ROWS:
            flush()
    flush()
    return dict(counters.items()), n_rows, evicted


def main() -> dict:
    import pyarrow as pa

    # the stream as Spark hands it to a python UDF: Arrow batches.
    # mapInPandas (the old path) pays arrow->pandas object conversion
    # BEFORE the UDF body; mapInArrow doesn't — charge it fairly.
    arrow_batches = [
        pa.RecordBatch.from_pandas(b) for b in synth_batches()
    ]
    n = sum(b.num_rows for b in arrow_batches)
    truth = pd.concat(
        b.column(0).to_pandas() for b in arrow_batches
    ).value_counts()
    frequent = set(truth[truth > n / K2].index)

    def timed(fn, make_input, reps=3):
        """median-of-reps wall (this VM's CPU phase swings 2-5x)."""
        walls, out = [], None
        for _ in range(reps):
            inp = make_input()
            t0 = time.time()
            out = fn(inp)
            walls.append(time.time() - t0)
        return sorted(walls)[len(walls) // 2], out

    wall_old, (c_old, n_old, _) = timed(
        mg_old, lambda: (b.to_pandas() for b in arrow_batches)
    )
    wall_new, (c_new, n_new, _) = timed(
        mg_new, lambda: (b.to_pandas() for b in arrow_batches)
    )
    wall_arr, (c_arr, n_arr, _) = timed(
        mg_arrow, lambda: iter(arrow_batches)
    )

    assert n_old == n_new == n_arr == n
    assert frequent <= set(c_old), "old variant lost a frequent value"
    assert frequent <= set(c_new), "pandas variant lost a frequent value"
    assert frequent <= set(c_arr), "arrow variant lost a frequent value"

    rec = {
        "rows": n,
        "batches": N_BATCHES,
        "k2": K2,
        "old_rowloop_wall_s": round(wall_old, 3),
        "pandas_buffered_wall_s": round(wall_new, 3),
        "arrow_buffered_wall_s": round(wall_arr, 3),
        "old_rows_per_s": round(n / wall_old),
        "arrow_rows_per_s": round(n / wall_arr),
        "speedup_arrow_vs_old": round(wall_old / wall_arr, 1),
        "speedup_pandas_vs_old": round(wall_old / wall_new, 1),
        "frequent_values": len(frequent),
    }
    print(json.dumps(rec))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(rec, fh, indent=1)
    return rec


if __name__ == "__main__":
    main()
