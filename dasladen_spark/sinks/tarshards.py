"""WebDataset-style tar-shard export — the sample-sequential layout
multimodal training loaders stream (one ``.tar`` per shard, each
sample a ``{key}.{ext}`` member, metadata as a sidecar ``.json``
member).

Parquet is the right ANALYTICS layout; a training dataloader wants
the opposite trade: large sequential reads of interleaved
payload+metadata with no column reassembly. This sink bridges the
two: repartition rows into deterministically-assigned shards, then
each executor partition streams ITS shard to one tar file —
payload bytes never visit the driver, shard membership is a pure
function of the key (md5, the same engine-portable hashing
sampling.portable_sample_filter documents), and re-runs produce
byte-stable member ordering (rows sorted by key inside each shard).

Beyond-reference operator (the reference moves CSV/XLS/XML rows into
an RDBMS, /root/reference/dasladen/task.py; payload-bearing exports
have no counterpart there).
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tar_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "key",
    payload_col: str = "payload",
    ext: str = "bin",
    meta_cols: list[str] | None = None,
) -> list[str]:
    """Write (key, payload, *metadata) rows as ``shard-NNNNN.tar``
    files under ``path``. Each sample contributes ``{key}.{ext}``
    (the raw payload bytes) and, when ``meta_cols`` is given,
    ``{key}.json`` (the metadata dict) — the member-name pairing
    WebDataset loaders group by. Returns the shard file paths.

    Scale shape: one md5-keyed repartition (shard = hash(key) mod n,
    so assignment is stable across runs and cluster sizes), then a
    single ``foreachPartition`` pass where each task streams its
    rows into its own tar — O(partition) memory, no driver
    collection. ``n_shards`` sizes the files: pick payload-bytes /
    ~1 GB like any shard layout.

    ``path`` must be a filesystem shared between executors and the
    driver (local disk only on single-node; NFS/FUSE-mounted object
    store on a cluster — tarfile needs a real file handle, so a raw
    s3:// URI won't do). Each shard writes to a ``.tmp`` name and
    atomically renames, so a retried or speculative task can never
    leave a truncated tar; stale ``shard-*.tar`` from a previous
    export under the same path are removed first so the directory
    always holds exactly this export. Keys must be non-null (the
    task fails with a pointed error otherwise); duplicate keys write
    duplicate member names, which WebDataset loaders treat as one
    sample — dedupe upstream."""
    os.makedirs(path, exist_ok=True)
    # a re-export with fewer shards (or different data) must not leave
    # last run's files mixed into the directory
    for f in os.listdir(path):
        if f.startswith("shard-") and (
            f.endswith(".tar") or f.endswith(".tar.tmp")
        ):
            os.remove(os.path.join(path, f))
    meta_cols = list(meta_cols or [])
    shard = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % n_shards
    ).cast("int")
    cols = [
        F.col(key_col).cast("string").alias("_key"),
        F.col(payload_col).alias("_payload"),
        shard.alias("_shard"),
        *[F.col(c) for c in meta_cols],
    ]
    rows = df.select(*cols).repartition(n_shards, "_shard")

    def write_partition(it):
        # hash-repartitioning on the shard id does NOT guarantee one
        # shard per partition (two ids can hash to the same task), so
        # group within the partition; members sort by key for
        # byte-stable output
        by_shard: dict[int, list] = {}
        for r in it:
            if r["_shard"] is None:
                raise ValueError(
                    "tar-shard export requires non-null keys; got a "
                    f"null {key_col!r} (payload row dropped nowhere — "
                    "filter or fix upstream)"
                )
            by_shard.setdefault(r["_shard"], []).append(r)
        for shard_id, buf in by_shard.items():
            buf.sort(key=lambda r: r["_key"])
            final = os.path.join(path, f"shard-{shard_id:05d}.tar")
            tmp = final + ".tmp"
            with tarfile.open(tmp, "w") as tf:
                for r in buf:
                    raw = r["_payload"]
                    # accept a STRING payload column too (text corpora)
                    payload = (
                        raw.encode("utf-8")
                        if isinstance(raw, str)
                        else bytes(raw or b"")
                    )
                    info = tarfile.TarInfo(name=f"{r['_key']}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0  # fixed time → byte-identical re-runs
                    tf.addfile(info, io.BytesIO(payload))
                    if meta_cols:
                        meta = json.dumps(
                            {c: r[c] for c in meta_cols},
                            sort_keys=True,
                            default=str,
                        ).encode("utf-8")
                        mi = tarfile.TarInfo(name=f"{r['_key']}.json")
                        mi.size = len(meta)
                        mi.mtime = 0
                        tf.addfile(mi, io.BytesIO(meta))
            # atomic publish: a retried/speculative attempt replaces,
            # never interleaves with, a half-written file
            os.replace(tmp, final)

    rows.foreachPartition(write_partition)
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("shard-") and f.endswith(".tar")
    )
