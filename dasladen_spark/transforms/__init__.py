"""Declarative transform compiler (reference parity, SURVEY §2.3-2.4).

Compiles the JSON ``transform``/``transforms`` blocks of a task into
Column expressions / DataFrame ops, preserving the reference's fixed
application order: module transforms → convert → filter → remove →
rename (/root/reference/dasladen/task.py:142-171).
"""

from dasladen_spark.transforms.compiler import (  # noqa: F401
    apply_transforms,
    compile_convert_spec,
    compile_filter_expr,
)
from dasladen_spark.transforms.builtin import empty_as_null, sanitize_string  # noqa: F401
