"""Transform compiler: convert specs, filter translation, ordering,
module escape hatch (reference semantics, SURVEY §2.3-2.4)."""

import pytest
from pyspark.sql import functions as F

from dasladen_spark.transforms.compiler import (
    apply_transforms,
    compile_filter_expr,
)
from dasladen_spark.transforms.builtin import empty_as_null, sanitize_string


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [("  Alpha  ", "X1", "10"), ("beta", "Y2", "3"), ("", "Z3", "50")],
        ["name", "code", "qty"],
    )


def test_convert_specs(spark, df):
    out = apply_transforms(
        df,
        transform={
            "convert": [
                ["name", "strip"],
                ["name", "lower"],
                ["code", ["replace", "1", "9"]],
                ["qty", "int"],
            ]
        },
    )
    rows = {r["code"]: r for r in out.collect()}
    assert rows["X9"]["name"] == "alpha"
    assert rows["X9"]["qty"] == 10
    assert out.schema["qty"].dataType.simpleString() == "bigint"


def test_convert_fallback_python_method(spark, df):
    # 'swapcase' has no JVM mapping → Arrow fallback via getattr
    out = apply_transforms(df, transform={"convert": [["name", "swapcase"]]})
    vals = {r["code"]: r["name"] for r in out.collect()}
    assert vals["Y2"] == "BETA"
    assert vals["X1"] == "  aLPHA  "


def test_filter_expr_translation():
    assert compile_filter_expr("{qty} > 2") == "`qty` > 2"
    assert (
        compile_filter_expr("{a} == 'x' and {b} != 3")
        == "`a` = 'x' AND `b` != 3"
    )
    assert compile_filter_expr("{a} is None or {b} in ('p', 'q')") == (
        "`a` IS NULL OR `b` in ('p', 'q')"
    )
    assert compile_filter_expr("not {done} == True") == "not `done` = true"


def test_filter_expr_keywords_inside_string_literals_untouched():
    """Operator rewriting must never reach inside quoted literals
    (ref task.py:151-152 evaluates petl selects in Python, where
    quoting protects them)."""
    assert (
        compile_filter_expr("{company} == 'Smith and Sons'")
        == "`company` = 'Smith and Sons'"
    )
    assert (
        compile_filter_expr("{v} == 'None' or {w} == 'True or False'")
        == "`v` = 'None' OR `w` = 'True or False'"
    )
    assert (
        compile_filter_expr('{v} == "a == b and c"') == '`v` = "a == b and c"'
    )
    # escaped quote inside the literal stays a literal
    assert (
        compile_filter_expr(r"{v} == 'it\'s None and True'")
        == r"`v` = 'it\'s None and True'"
    )


def test_filter_expr_literal_roundtrip_hypothesis():
    """Any literal body (keywords, operators, spaces) survives the
    compile untouched, while the surrounding expression still
    rewrites."""
    from hypothesis import given
    from hypothesis import strategies as st

    body = st.text(
        alphabet="abc AndOrNoneTrueFalse=!<>()_0123456789.",
        min_size=0,
        max_size=40,
    )

    @given(body)
    def check(s):
        got = compile_filter_expr(f"{{f}} == '{s}' and {{g}} is None")
        assert got == f"`f` = '{s}' AND `g` IS NULL"

    check()


def test_transform_order_filter_sees_converted_prerename(spark, df):
    """The reference applies convert before filter, and filter uses
    pre-rename names (task.py:142-166)."""
    out = apply_transforms(
        df,
        transform={
            "convert": [["qty", "int"], ["name", "strip"]],
            "filter": "{qty} > 5",
            "remove": ["code"],
            "rename": [["qty", "quantity"]],
        },
    )
    assert out.columns == ["name", "quantity"]
    assert {r["quantity"] for r in out.collect()} == {10, 50}


def test_bare_declarative_transform_block_fixed(spark, df):
    """A petl-style bare `transform` block crashes the reference
    (task.py:119-127); here it must work."""
    out = apply_transforms(df, transform={"remove": ["qty"]})
    assert out.columns == ["name", "code"]


def test_module_transform(spark, df, tmp_path):
    (tmp_path / "mytrans.py").write_text(
        "from pyspark.sql import functions as F\n"
        "def transform(df, *fields, suffix='_t', **kw):\n"
        "    for f in fields:\n"
        "        df = df.withColumn(f, F.concat(F.col(f), F.lit(suffix)))\n"
        "    return df\n"
    )
    out = apply_transforms(
        df,
        transforms=[{"module": "mytrans", "fields": ["code"], "args": {"suffix": "!"}}],
        module_path=str(tmp_path),
    )
    assert {r["code"] for r in out.collect()} == {"X1!", "Y2!", "Z3!"}


def test_class_transform(spark, df, tmp_path):
    (tmp_path / "mycls.py").write_text(
        "from pyspark.sql import functions as F\n"
        "class Upper:\n"
        "    def __init__(self, **kw): pass\n"
        "    def transform(self, df, *fields):\n"
        "        for f in fields:\n"
        "            df = df.withColumn(f, F.upper(F.col(f)))\n"
        "        return df\n"
    )
    out = apply_transforms(
        df,
        transform={"module": "mycls", "class": "Upper", "fields": ["name"]},
        module_path=str(tmp_path),
    )
    assert "BETA" in {r["name"] for r in out.collect()}


def test_empty_as_null_and_sanitize(spark):
    df = spark.createDataFrame([("", "a\x01b"), ("x", "ok")], ["a", "b"])
    out = empty_as_null(sanitize_string(df), "a")
    rows = sorted(out.collect(), key=lambda r: (r["b"]))
    assert rows[0]["a"] is None and rows[0]["b"] == "a b"
    assert rows[1]["a"] == "x"
