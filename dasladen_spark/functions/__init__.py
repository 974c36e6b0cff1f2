"""Scalar/array expression library (all JVM-side Column expressions).

The reference's only scalar surface is petl ``convert`` method-name
specs plus two bundled utils (/root/reference/dasladen/util/*.py);
here the full pyspark.sql.functions library is exposed, plus text
analysis and vector math built from JVM expressions so the 100 TB hot
path never drops into row-at-a-time Python.
"""

from dasladen_spark.functions.vectors import cosine_sim, dot, l2_norm  # noqa: F401
from dasladen_spark.functions.text import (  # noqa: F401
    fingerprint,
    lang_scores,
    normalize_text,
    quality_score,
    token_count,
)
