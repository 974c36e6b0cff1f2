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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=10,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
        min_size=1,
        max_size=10,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """Randomized differential test of the union+window as-of join
    against pandas merge_asof (backward, inclusive) — keys, ties, and
    no-match cases all drawn by hypothesis. Right-side duplicate
    (key, ts) pairs are deduped to the max payload so both engines
    face a deterministic winner."""
    import pandas as pd

    from dasladen_spark.operators.asof import asof_join

    best = {}
    for k, ts, payload in right:
        best[(k, ts)] = max(best.get((k, ts), -1), payload)
    right_rows = [(k, ts, p) for (k, ts), p in sorted(best.items())]

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], ["k", "t", "lid"]
    )
    rdf = spark.createDataFrame(right_rows, ["k", "t", "payload"])
    out = asof_join(
        ldf, rdf, on="k", left_ts="t", right_ts="t",
        right_cols={"payload": "pv"}, right_tiebreak="payload",
    )
    got = {r["lid"]: r["pv"] for r in out.collect()}

    lpdf = pd.DataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)],
        columns=["k", "t", "lid"],
    ).sort_values(["t", "lid"])
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "payload"]).sort_values("t")
    want_df = pd.merge_asof(
        lpdf, rpdf, on="t", by="k", direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in want_df.itertuples()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.tuples(st.integers(0, 8), st.text(alphabet="ab", max_size=2),
                  st.integers(1, 5)),
        min_size=0,
        max_size=8,
    ),
    updates=st.lists(
        st.tuples(st.integers(0, 8), st.text(alphabet="cd", max_size=2),
                  st.integers(1, 5)),
        min_size=0,
        max_size=8,
    ),
)
def test_merge_upsert_properties(spark, base, updates):
    """Invariants for any base/updates batch: (1) result keys =
    union of input keys, exactly once each; (2) each key's surviving
    row is the max-version one, updates winning ties; (3) replaying
    the same updates is a no-op (idempotence)."""
    from dasladen_spark.operators.merge import merge_upsert

    def dedupe(rows, prefer_last):
        out = {}
        for k, s, v in rows:
            cur = out.get(k)
            if cur is None or v > cur[1] or (prefer_last and v == cur[1]):
                out[k] = (s, v)
        return out

    b = dedupe(base, prefer_last=True)
    u = dedupe(updates, prefer_last=True)
    schema = "k int, s string, v int"
    bdf = spark.createDataFrame([(k, s, v) for k, (s, v) in b.items()], schema)
    udf = spark.createDataFrame([(k, s, v) for k, (s, v) in u.items()], schema)

    merged = merge_upsert(bdf, udf, "k", version_col="v")
    got = {r["k"]: (r["s"], r["v"]) for r in merged.collect()}
    assert set(got) == set(b) | set(u)

    want = {}
    for k in set(b) | set(u):
        bb, uu = b.get(k), u.get(k)
        if bb is None or (uu is not None and uu[1] >= bb[1]):
            want[k] = uu
        else:
            want[k] = bb
    assert got == want

    again = merge_upsert(merged, udf, "k", version_col="v")
    assert {r["k"]: (r["s"], r["v"]) for r in again.collect()} == got


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    intervals=st.lists(
        st.tuples(
            st.integers(0, 1),      # key
            st.integers(0, 40),     # start
            st.integers(0, 15),     # duration
        ),
        min_size=1,
        max_size=12,
    )
)
def test_merge_intervals_matches_python_reference(spark, intervals):
    """Randomized differential test of the cumulative-max interval
    union against a straightforward sort-and-sweep Python merger —
    overlaps, touching endpoints, containment, duplicates, and
    zero-length intervals all drawn by hypothesis."""
    from dasladen_spark.operators.intervals import merge_intervals

    rows = [(k, s, s + d) for k, s, d in intervals]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    got = {
        (r["k"], r["s"], r["e"]) for r in merge_intervals(df, "k", "s", "e").collect()
    }

    want = set()
    by_key = {}
    for k, s, e in sorted(rows):
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:                 # strict gap -> close group
                want.add((k, cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        want.add((k, cur_s, cur_e))
    assert got == want


# ------------------------------- duplicated_spans differential parity

TOK = st.sampled_from(["aa", "bb", "cc", "dd"])  # tiny alphabet → many repeats


def _brute_spans(texts: dict, seed_n: int, min_span: int) -> set:
    """All maximal equal-token runs ≥ max(seed_n, min_span) per doc
    pair per alignment — the quadratic reference for the seed-chain
    operator."""
    out = set()
    ids = sorted(texts)
    floor_len = max(seed_n, min_span)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = texts[ids[x]].split(" "), texts[ids[y]].split(" ")
            for d in range(-(len(b) - 1), len(a)):
                run, start = 0, None
                for i in range(max(0, d), len(a) + 1):
                    j = i - d
                    ok = i < len(a) and 0 <= j < len(b) and a[i] == b[j]
                    if ok:
                        if run == 0:
                            start = i
                        run += 1
                    else:
                        if run >= floor_len:
                            out.add(
                                (ids[x], ids[y], start + 1, start - d + 1, run)
                            )
                        run = 0
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(TOK, min_size=1, max_size=24), min_size=2, max_size=4
    )
)
def test_duplicated_spans_match_quadratic_reference(spark, docs):
    """The seed-hash diagonal-chaining operator must report EXACTLY
    the maximal shared token runs a brute-force all-alignments scan
    finds — same pairs, same 1-based positions, same lengths — on
    adversarial inputs (tiny alphabet → heavy repeats, runs that
    touch document edges, multiple diagonals per pair)."""
    from dasladen_spark.operators.dedup import duplicated_spans

    texts = {i: " ".join(toks) for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id int, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["a_start"], r["b_start"], r["span_tokens"])
        for r in duplicated_spans(
            df, seed_n=3, min_span=4, max_df=10_000
        ).collect()
    }
    assert got == _brute_spans(texts, seed_n=3, min_span=4)
