"""Property-based parity tests for the transform compiler: the
compiled Spark behavior must match straight Python string-method /
eval semantics (what the reference gets from petl) on arbitrary
inputs — not just the examples in test_transforms.py."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dasladen_spark.transforms.compiler import apply_declarative

# printable-but-tame text: no control chars (sanitize_string territory),
# no Spark-CSV-significant chars needed since we build frames directly
TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " _-.",
    min_size=0,
    max_size=24,
)

STR_METHODS = ["lower", "upper", "strip", "lstrip", "rstrip", "title"]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(TEXT, min_size=1, max_size=6), method=st.sampled_from(STR_METHODS))
def test_convert_string_methods_match_python(spark, values, method):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    out = apply_declarative(df, {"convert": [["x", method]]})
    got = [r["x"] for r in out.collect()]
    # includes "title": exact str.title() parity via the Arrow fallback
    assert got == [getattr(v, method)() for v in values]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
        min_size=1,
        max_size=8,
    ),
    threshold=st.integers(-50, 50),
)
def test_filter_expression_matches_python_eval(spark, rows, threshold):
    df = spark.createDataFrame(rows, ["a", "b"])
    out = apply_declarative(
        df,
        {
            "convert": [["a", "int"], ["b", "int"]],
            "filter": f"{{a}} > {threshold} and {{b}} <= {{a}}",
        },
    )
    got = sorted((r["a"], r["b"]) for r in out.collect())
    want = sorted((a, b) for a, b in rows if a > threshold and b <= a)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(TEXT, min_size=1, max_size=5),
    old=st.text(alphabet="ab _", min_size=1, max_size=3),
    new=st.text(alphabet="xy", min_size=0, max_size=3),
)
def test_convert_replace_matches_python(spark, values, old, new):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    out = apply_declarative(df, {"convert": [["x", ["replace", old, new]]]})
    got = [r["x"] for r in out.collect()]
    assert got == [v.replace(old, new) for v in values]
