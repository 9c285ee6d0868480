"""Property-based tests for the extension-batch math (SURVEY §5.4).

Batched like tests/test_properties.py: hypothesis generates case lists,
Spark evaluates each list in ONE DataFrame pass.
"""

import math
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

import glue_etl_nyc_yellow_taxi_analysis_spark.queries  # noqa: F401  (completes the registry import cycle)
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext9 import _EWMA_EXPR

_SPARK = None


def setup_module(module):
    global _SPARK
    from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark

    _SPARK = get_spark(app_name="engine-tests", cpus=8, shuffle_partitions=8)


def _ewma_python(window):
    """Reference EWMA over up to 5 trailing values (newest first)."""
    weights = [1.0, 0.5, 0.25, 0.125, 0.0625]
    num = sum(w * v for w, v in zip(weights, window))
    den = sum(w for w, _ in zip(weights, window))
    return num / den


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
def test_ewma_expression_matches_python(series):
    rows = [(i, v) for i, v in enumerate(series)]
    df = _SPARK.createDataFrame(rows, "i long, value double")
    from pyspark.sql import Window

    w = Window.orderBy("i")
    lagged = df.select(
        "i",
        F.col("value").alias("v0"),
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("value", 2).over(w).alias("v2"),
        F.lag("value", 3).over(w).alias("v3"),
        F.lag("value", 4).over(w).alias("v4"),
    )
    got = {
        r.i: r.e for r in lagged.select("i", F.expr(_EWMA_EXPR).alias("e")).collect()
    }
    for i in range(len(series)):
        window = series[max(0, i - 4): i + 1][::-1]  # newest first
        assert math.isclose(got[i], _ewma_python(window), rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=1.0, max_value=1e9, allow_nan=False),
        min_size=1,
        max_size=50,
    )
)
def test_benford_first_digit_matches_python(values):
    """String-derived first significant digit (the log10/pow form fails
    within an ulp of powers of 10 — why q_benford avoids it)."""
    from decimal import ROUND_HALF_UP, Decimal

    rows = [(i, v) for i, v in enumerate(values)]
    df = _SPARK.createDataFrame(rows, "i long, x double")
    digit = (
        F.substring(
            F.regexp_replace(
                F.col("x").cast("decimal(18,2)").cast("string"), "[^1-9]", ""
            ),
            1,
            1,
        )
        .cast("long")
    )
    got = {r.i: r.d for r in df.select("i", digit.alias("d")).collect()}
    for i, v in enumerate(values):
        # Spark casts double→decimal through the shortest decimal repr
        dec = Decimal(repr(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        expect = int(next(c for c in str(dec) if c in "123456789"))
        assert got[i] == expect
        assert 1 <= got[i] <= 9


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="cepsv", min_size=0, max_size=60),
        min_size=1,
        max_size=30,
    )
)
def test_pattern_count_matches_python_re(seqs):
    rows = [(i, s) for i, s in enumerate(seqs)]
    df = _SPARK.createDataFrame(rows, "i long, seq string")
    got = {
        r.i: r.n
        for r in df.select(
            "i", F.regexp_count("seq", F.lit("v[ces]*p")).alias("n")
        ).collect()
    }
    for i, s in enumerate(seqs):
        assert got[i] == len(re.findall(r"v[ces]*p", s))


# ---------------------------------------------------------------------------
# URL canonicalization properties (ext30)
# ---------------------------------------------------------------------------

_HOSTCHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-.",
    min_size=1,
    max_size=20,
).filter(lambda s: not s.startswith(".") and not s.endswith("."))
_PATHSEG = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-.",
    max_size=8,
)
_PARAM = st.tuples(
    st.sampled_from(["a", "b", "z", "utm_source", "utm_campaign", "q"]),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=6),
)


@st.composite
def _urls(draw):
    host = draw(_HOSTCHARS)
    port = draw(st.sampled_from(["", ":443"]))
    segs = draw(st.lists(_PATHSEG, max_size=3))
    path = "".join("/" + s for s in segs)
    trail = draw(st.sampled_from(["", "/"]))
    params = draw(st.lists(_PARAM, max_size=4))
    qs = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#top", "#sec-2"]))
    return f"https://{host}{port}{path}{trail}" + (f"?{qs}" if qs else "") + frag


@settings(max_examples=10, deadline=None)
@given(st.lists(_urls(), min_size=1, max_size=40))
def test_url_canonicalize_idempotent_and_clean(urls):
    """canon(canon(u)) == canon(u), and no canonical form retains a
    fragment, default port, utm_* param, or non-root trailing slash."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext30 import canonical_url

    spark = _SPARK
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    once = df.select("i", canonical_url("url").alias("c1"))
    twice = once.select("i", "c1", canonical_url("c1").alias("c2"))
    for r in twice.collect():
        assert r["c2"] == r["c1"], (r["c1"], r["c2"])
        assert "#" not in r["c1"]
        assert ":443" not in r["c1"]
        assert "utm_" not in r["c1"]
        if len(r["c1"]) > len("https://x"):
            assert not r["c1"].endswith("//")
