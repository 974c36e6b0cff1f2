"""Compile the reference's declarative transform blocks to Spark.

Reference semantics being reproduced (citations into /root/reference):

- fixed order regardless of JSON key order: module transforms first
  (dasladen/task.py:168-171), then convert → filter → remove → rename
  (dasladen/task.py:142-166). Consequences kept: `filter` sees
  *converted* values; `filter`/`remove` use pre-`rename` names.
- convert specs (task.py:146-149): a string is a method name on the
  value ("lower", "strip", ...), a list is method + args
  (["replace", "a", "b"]). Compiled to native JVM functions from the
  spec table below; unknown specs fall back to an Arrow-batched
  per-value method call (exact petl parity, slow path by design).
- filter strings (task.py:151-152): petl `select` expressions like
  "{price} > 2" — `{field}` refs substituted, then evaluated. Here
  the expression is translated to a Spark SQL predicate for F.expr
  (Catalyst can push it down); no Python eval.
- a bare petl-style `transform` block (no "module" key) CRASHES the
  reference (task.py:119-127). We fix it: such a block is treated as
  declarative ops — while still honoring the reference's working
  shapes ("transforms" list of modules + "transform" dict of ops).
"""

from __future__ import annotations

import importlib
import re
import sys
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------- convert specs

def _zfill(c: Column, width: int) -> Column:
    return F.lpad(c.cast("string"), int(width), "0")


def _capitalize(c: Column) -> Column:
    s = c.cast("string")
    return F.concat(
        F.upper(F.substring(s, 1, 1)), F.lower(F.substring(s, 2, 2147483647))
    )


#: method-name → Column builder. Mirrors str-method semantics the
#: reference reaches via getattr(value, name)() (petl convert).
_CONVERT_TABLE: dict[str, Any] = {
    "lower": lambda c: F.lower(c),
    "upper": lambda c: F.upper(c),
    "strip": lambda c: F.trim(c),
    "lstrip": lambda c: F.ltrim(c),
    "rstrip": lambda c: F.rtrim(c),
    # "title" deliberately falls back: Python str.title() uppercases
    # after ANY non-alpha ("a1b" -> "A1B") while JVM initcap only
    # breaks on whitespace — parity beats speed for reference specs.
    "title": None,
    "initcap": lambda c: F.initcap(c),  # engine extension: the fast JVM one
    "capitalize": _capitalize,
    "swapcase": None,  # no JVM equivalent → fallback
    "replace": lambda c, a, b: F.replace(c, F.lit(a), F.lit(b)),
    "zfill": _zfill,
    # engine extensions (the reference has no typing step at all —
    # CSV values stay strings unless converted; these make the
    # explicit cast declarative):
    "int": lambda c: c.cast("long"),
    "float": lambda c: c.cast("double"),
    "str": lambda c: c.cast("string"),
    "bool": lambda c: c.cast("boolean"),
    "date": lambda c, fmt="yyyy-MM-dd": F.to_date(c, fmt),
    "timestamp": lambda c, fmt="yyyy-MM-dd HH:mm:ss": F.to_timestamp(c, fmt),
}


def compile_convert_spec(col: Column, spec: str | list) -> Column:
    """Compile one convert spec to a Column expression; raise KeyError
    for specs with no JVM mapping (caller decides on fallback)."""
    if isinstance(spec, str):
        name, args = spec, []
    else:
        name, args = spec[0], list(spec[1:])
    builder = _CONVERT_TABLE.get(name)
    if builder is None:
        raise KeyError(name)
    return builder(col, *args)


def _python_method_fallback(df: DataFrame, field: str, spec: str | list) -> DataFrame:
    """Exact petl parity for unmapped specs: call the method on each
    value, Arrow-batched (pandas UDF), never row-at-a-time pickle."""
    from pyspark.sql.functions import pandas_udf

    if isinstance(spec, str):
        name, args = spec, []
    else:
        name, args = spec[0], list(spec[1:])

    @pandas_udf("string")
    def apply_method(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else getattr(v, name)(*args))

    return df.withColumn(field, apply_method(F.col(field).cast("string")))


# ------------------------------------------------------- filter exprs

_FIELD_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")

#: python-operator → SQL spellings (word-boundary safe)
_PY2SQL = [
    (re.compile(r"\bAnd\b|\band\b"), "AND"),
    (re.compile(r"\bOr\b|\bor\b"), "OR"),
    (re.compile(r"\bnot\s+in\b"), "NOT IN"),
    (re.compile(r"(?<![<>!=])==(?!=)"), "="),
    (re.compile(r"\bis\s+not\s+None\b"), "IS NOT NULL"),
    (re.compile(r"\bis\s+None\b"), "IS NULL"),
    (re.compile(r"!=\s*None\b"), "IS NOT NULL"),
    (re.compile(r"\bNone\b"), "NULL"),
    (re.compile(r"\bTrue\b"), "true"),
    (re.compile(r"\bFalse\b"), "false"),
]


#: a single- or double-quoted string literal (with backslash escapes)
_STR_LIT_RE = re.compile(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"")


def compile_filter_expr(expr: str) -> str:
    """Translate a petl-style filter string ("{qty} > 2 and {flag} ==
    'R'") to a Spark SQL predicate. `not` is handled by SQL's own NOT
    (same spelling).

    String literals are tokenized out before the operator rewrite and
    spliced back after, so `{company} == 'Smith and Sons'` keeps its
    literal intact — rewriting inside quotes would corrupt any value
    containing `and`/`or`/`None`/`True`/`==` (petl evaluates the whole
    expression in Python where quoting already protects literals;
    this reproduces that boundary)."""
    literals: list[str] = []

    def _stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    masked = _STR_LIT_RE.sub(_stash, expr)
    sql = _FIELD_RE.sub(lambda m: f"`{m.group(1)}`", masked)
    for pat, repl in _PY2SQL:
        sql = pat.sub(repl, sql)
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], sql)


# ---------------------------------------------------- module transforms

def load_user_transform(
    module: str,
    package: str | None = None,
    search_path: str | None = None,
    reload: bool = True,
):
    """Import (and hot-reload, matching task.py:129-132) a user
    transform module from the module search path."""
    if search_path and search_path not in sys.path:
        sys.path.append(search_path)
    name = f"{package}.{module}" if package else module
    mod = importlib.import_module(name)
    if reload:
        mod = importlib.reload(mod)
    return mod


def apply_module_transform(
    df: DataFrame, spec: dict, search_path: str | None = None
) -> DataFrame:
    """Run one module/class transform: the plugin receives and returns
    a DataFrame (the reference's petl-table contract, task.py:125-140,
    lifted to DataFrames)."""
    mod = load_user_transform(spec["module"], spec.get("package"), search_path)
    fields = spec.get("fields", [])
    args = spec.get("args", {}) or {}
    if "class" in spec:
        inst = getattr(mod, spec["class"])(**args)
        return inst.transform(df, *fields)
    return mod.transform(df, *fields, **args)


# ------------------------------------------------------------ pipeline

def apply_declarative(df: DataFrame, block: dict) -> DataFrame:
    """convert → filter → remove → rename, in the reference's fixed
    order (task.py:142-166)."""
    for field, spec in block.get("convert", []) or []:
        try:
            df = df.withColumn(field, compile_convert_spec(F.col(field), spec))
        except KeyError:
            df = _python_method_fallback(df, field, spec)

    flt = block.get("filter")
    if flt:
        df = df.filter(F.expr(compile_filter_expr(flt)))

    remove = block.get("remove")
    if remove:
        df = df.drop(*remove)

    rename = block.get("rename")
    if rename:
        df = df.withColumnsRenamed({old: new for old, new in rename})
    return df


def apply_transforms(
    df: DataFrame,
    transform: dict | None = None,
    transforms: list[dict] | None = None,
    module_path: str | None = None,
) -> DataFrame:
    """Full transform stage for one task.

    `transforms` (plural) is the module-transform list; `transform`
    (singular) is either a module spec (has "module") or a
    declarative block — both reference shapes work, plus the fixed
    bare-declarative shape (see module docstring).
    """
    for spec in transforms or []:
        df = apply_module_transform(df, spec, module_path)
    if transform:
        if "module" in transform:
            df = apply_module_transform(df, transform, module_path)
        else:
            df = apply_declarative(df, transform)
    return df
