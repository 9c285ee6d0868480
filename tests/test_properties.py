"""Property-based tests (hypothesis) for the contract math (SURVEY §5.4).

Batched: hypothesis generates the case lists, Spark evaluates them in ONE
DataFrame pass per test (per-example Spark jobs would be prohibitively slow).
"""

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.functions import minutes_between, peak_band_id
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.transforms import quality_filters

_SPARK = None


def _get(spark_fixture=None):
    return _SPARK


def setup_module(module):
    global _SPARK
    from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark

    _SPARK = get_spark(app_name="engine-tests", cpus=8, shuffle_partitions=8)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.datetimes(
                min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2022, 1, 1)
            ),
            st.integers(min_value=0, max_value=200_000),  # seconds of duration
        ),
        min_size=1,
        max_size=50,
    )
)
def test_duration_matches_python_reference(cases):
    spark = _get()
    rows = [
        (i, p.replace(microsecond=0), p.replace(microsecond=0) + dt.timedelta(seconds=s))
        for i, (p, s) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, pickup timestamp, dropoff timestamp")
    got = {
        r.i: r.mins
        for r in df.select("i", minutes_between("pickup", "dropoff").alias("mins")).collect()
    }
    for i, (p, s) in enumerate(cases):
        assert got[i] == math.floor(s / 60)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1, max_value=8),
            st.floats(min_value=0.0, max_value=600.0, allow_nan=False),
            st.floats(min_value=-10.0, max_value=100.0, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_quality_filters_match_python_reference(cases):
    spark = _get()
    rows = [(i, p, d, f) for i, (p, d, f) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "i long, passenger_count int, trip_distance double, fare_amount double"
    )
    kept = {r.i for r in quality_filters(df).collect()}
    expected = {
        i
        for i, (p, d, f) in enumerate(cases)
        if 1 <= p <= 6 and 5.0 <= d <= 500.0 and f > 0
    }
    assert kept == expected


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=23), min_size=1, max_size=24))
def test_peak_band_matches_python_reference(hours):
    spark = _get()
    df = spark.createDataFrame([(i, h) for i, h in enumerate(hours)], "i long, h int")
    got = {r.i: r.band for r in df.select("i", peak_band_id(F.col("h")).alias("band")).collect()}
    for i, h in enumerate(hours):
        if 0 <= h <= 5 or 20 <= h <= 23:
            exp = "101"
        elif 6 <= h <= 9 or 16 <= h <= 19:
            exp = "102"
        else:
            exp = "103"
        assert got[i] == exp


# --------------------------------------------------------------------------
# Two-phase operators vs a pure-Python reference (batched: one Spark job
# evaluates every generated group at once)
# --------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # group
            st.integers(min_value=-50, max_value=50),     # order key
            st.integers(min_value=-5, max_value=9),       # value
        ),
        min_size=1,
        max_size=60,
    )
)
def test_running_sum_property(rows):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators.prefix import running_sum

    spark = _get()
    # de-duplicate order keys per group: prefix sums are only well-defined
    # under a total order (same contract as the naive window)
    seen, uniq = set(), []
    for g, o, v in rows:
        if (g, o) not in seen:
            seen.add((g, o))
            uniq.append((g, o, v))
    df = spark.createDataFrame(uniq, "g long, o long, v long")
    got = {
        (r.g, r.o): r.running
        for r in running_sum(df, "g", "o", "v", n_chunks=4).collect()
    }
    expect = {}
    for g in {g for g, _, _ in uniq}:
        acc = 0
        for _, o, v in sorted((r for r in uniq if r[0] == g), key=lambda r: r[1]):
            acc += v
            expect[(g, o)] = acc
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),                  # group
            st.floats(min_value=-100, max_value=100, allow_nan=False,
                      allow_infinity=False, width=32),               # value
            st.integers(min_value=1, max_value=9),                   # weight
        ),
        min_size=1,
        max_size=50,
    )
)
def test_weighted_median_property(rows):
    from decimal import Decimal

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators.quantiles import (
        weighted_median,
    )

    spark = _get()
    df = spark.createDataFrame(
        [(g, float(v), w) for g, v, w in rows], "g long, v double, w long"
    ).select("g", "v", F.col("w").cast("decimal(18,4)").alias("w"))
    got = {
        r.g: r.m for r in weighted_median(df, "g", "v", "w", out_col="m").collect()
    }
    by_g = {}
    for g, v, w in rows:
        by_g.setdefault(g, []).append((float(v), w))
    for g, pairs in by_g.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if cum * 2 >= total:
                assert got[g] == v, (g, pairs, got[g])
                break


# ---------------------------------------------------------------------------
# Codec roundtrips (pure parsers — no Spark in the loop)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.binary(min_size=36, max_size=36), min_size=1, max_size=8
    ),
    st.sets(st.integers(min_value=0, max_value=7)),
)
@settings(max_examples=60, deadline=None)
def test_y4m_container_parse_roundtrip(frames, param_frames):
    """parse_y4m ∘ y4m_container is the identity on frame payloads, for
    ANY frame bytes and ANY subset of frames carrying FRAME-line
    parameters (the parser must never confuse payload bytes — including
    ones spelling 'FRAME' or '\\n' — with stream structure)."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import multimodal

    params = tuple(
        (i, b" Xp") for i in sorted(param_frames) if i < len(frames)
    )
    payload = multimodal.y4m_container(frames, 6, 4, frame_params=params)
    w, h, got = multimodal.parse_y4m(payload)
    assert (w, h) == (6, 4)
    assert [y + u + v for y, u, v in got] == frames


@given(st.lists(st.integers(min_value=-32768, max_value=32767), max_size=64))
@settings(max_examples=60, deadline=None)
def test_wav_container_parse_roundtrip(samples):
    """parse_wav ∘ wav_container is the identity on int16 samples."""
    import struct

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import multimodal

    pcm = struct.pack(f"<{len(samples)}h", *samples)
    rate, nch, got = multimodal.parse_wav(multimodal.wav_container(pcm))
    assert got == samples
