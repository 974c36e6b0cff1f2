"""Sink-side tests: tar-shard export (WebDataset layout)."""

from pyspark.sql import functions as F

def test_tar_shards_roundtrip_and_determinism(spark, sf_dir, tmp_path):
    """Every document lands in exactly one shard with payload bytes
    and metadata intact; member order inside a shard is key-sorted;
    a second export produces byte-identical tar files (fixed mtimes,
    stable shard assignment)."""
    import hashlib
    import tarfile

    from dasladen_spark.operators.multimodal import with_payload
    from dasladen_spark.session import load_table
    from dasladen_spark.sinks.tarshards import write_tar_shards

    docs = with_payload(
        load_table(spark, sf_dir, "documents").limit(60)
    ).select(
        F.col("doc_id").alias("key"), "payload", "source", "n_chars"
    )
    want = {
        str(r["key"]): (bytes(r["payload"]), r["source"], r["n_chars"])
        for r in docs.collect()
    }

    out1 = tmp_path / "shards1"
    files = write_tar_shards(
        docs, str(out1), n_shards=4, ext="txt",
        meta_cols=["source", "n_chars"],
    )
    assert files and len(files) <= 4

    import json as _json

    got = {}
    for f in files:
        with tarfile.open(f) as tf:
            names = tf.getnames()
            # key-sorted samples, payload member before its sidecar
            keys = [n.rsplit(".", 1)[0] for n in names[::2]]
            assert keys == sorted(keys)
            assert names == [
                k + ext for k in keys for ext in (".txt", ".json")
            ]
            for m in tf.getmembers():
                key, kind = m.name.rsplit(".", 1)
                payload = tf.extractfile(m).read()
                if kind == "txt":
                    got.setdefault(key, {})["payload"] = payload
                else:
                    got.setdefault(key, {})["meta"] = _json.loads(payload)
    assert set(got) == set(want)
    for key, (payload, source, n_chars) in want.items():
        assert got[key]["payload"] == payload
        assert got[key]["meta"] == {"source": source, "n_chars": n_chars}

    out2 = tmp_path / "shards2"
    files2 = write_tar_shards(
        docs, str(out2), n_shards=4, ext="txt",
        meta_cols=["source", "n_chars"],
    )
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()  # noqa: E731
    assert [h(f) for f in files] == [h(f) for f in files2]
