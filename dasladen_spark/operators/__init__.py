"""Custom operators Spark lacks as built-ins, expressed Spark-first:

- asof     — as-of (backward) join via union + running window; one
             shuffle on the key, no cross product, scales to 100 TB
- dedup    — exact, fingerprint, MinHash-LSH, SimHash, n-gram Jaccard,
             embedding-cosine near-dup
- similarity — brute-force cosine top-k (broadcast queries) and an
             LSH-bucketed approximate variant
- multimodal — opaque binary payload columns with typed metadata and
             a mapInPandas decode/feature plumbing (decoder stubbed:
             image/audio libs are not in this container)
"""

from dasladen_spark.operators.asof import asof_join  # noqa: F401
from dasladen_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
    ngram_jaccard_pairs,
    embedding_near_dup_pairs,
)
from dasladen_spark.operators.similarity import cosine_topk, lsh_cosine_topk  # noqa: F401
