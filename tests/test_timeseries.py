"""Temporal operators (operators/timeseries.py): as-of join, bucketed
interval join, single-scan multi-grain rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bootleg_spark.operators.timeseries import (
    asof_join,
    interval_join,
    rollup_time_grains,
)


def test_asof_join_basic_and_ties(spark):
    """≤ semantics (equal timestamps match), per-key isolation, null
    for rows before any right row, deterministic pick under duplicate
    right timestamps (max payload struct wins)."""
    left = spark.createDataFrame(
        [(1, 5, "l-a"), (1, 10, "l-b"), (1, 20, "l-c"), (2, 7, "l-d")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r-x"), (1, 15, "r-y"), (1, 15, "r-z"), (3, 1, "r-other")],
        "k long, ts long, rv string",
    )
    got = {
        r["lv"]: (r["r_ts"], r["r_rv"])
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert got == {
        "l-a": (None, None),        # before any right row for k=1
        "l-b": (10, "r-x"),         # equal ts matches (≤, not <)
        "l-c": (15, "r-z"),         # duplicate right ts=15 → max struct
        "l-d": (None, None),        # k=2 never sees k=3's rows
    }


def test_asof_join_matches_bruteforce_random(spark):
    """Differential vs a per-row python scan on random data."""
    import random

    rng = random.Random(11)
    L = [(rng.randrange(4), rng.randrange(100), i) for i in range(80)]
    R = [(rng.randrange(4), rng.randrange(100), 1000 + i) for i in range(60)]
    left = spark.createDataFrame(L, "k long, ts long, lid long")
    right = spark.createDataFrame(R, "k long, ts long, rid long")

    def brute(k, ts):
        cands = [(rts, rid) for rk, rts, rid in R if rk == k and rts <= ts]
        return max(cands) if cands else (None, None)

    got = {
        r["lid"]: (r["r_ts"], r["r_rid"])
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert got == {lid: brute(k, ts) for k, ts, lid in L}


def test_interval_join_buckets_and_boundaries(spark):
    """Inclusive boundaries, multi-bucket intervals counted once,
    key isolation, non-overlap excluded."""
    pts = spark.createDataFrame(
        [(1, 0, "p0"), (1, 100, "p1"), (1, 250, "p2"), (2, 100, "p-k2")],
        "k long, t long, pid string",
    )
    ivs = spark.createDataFrame(
        [(1, 0, 100, "iv-a"), (1, 90, 260, "iv-b"), (2, 101, 200, "iv-c")],
        "k long, s long, e long, iid string",
    )
    for width in (7, 50, 1000):  # bucket width must not change results
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pts, ivs, "t", "s", "e", keys=["k"], bucket_seconds=width
            ).collect()
        )
        assert got == [
            ("p0", "iv-a"),
            ("p1", "iv-a"),  # end boundary inclusive
            ("p1", "iv-b"),
            ("p2", "iv-b"),  # interval spanning many buckets: once
        ], f"width={width}"


def test_rollup_time_grains_one_scan(spark):
    """Hour + day grains from one GROUPING SETS pass equal per-grain
    manual aggregation; the plan contains a single Expand, not two
    scans."""
    events = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "a", 1.0),
            ("2024-01-01 00:50:00", "a", 2.0),
            ("2024-01-01 01:10:00", "b", 4.0),
            ("2024-01-02 00:00:00", "a", 8.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    out = rollup_time_grains(events, group_cols=["event_type"])
    rows = {
        (r["grain"], r["bucket_epoch"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }
    def ep(s):
        import datetime

        return int(
            datetime.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=datetime.timezone.utc)
            .timestamp()
        )

    # session tz is UTC in conftest; buckets align to calendar grains
    assert rows[("hour", ep("2024-01-01 00:00:00"), "a")] == (2, 3.0)
    assert rows[("hour", ep("2024-01-01 01:00:00"), "b")] == (1, 4.0)
    assert rows[("day", ep("2024-01-01 00:00:00"), "a")] == (2, 3.0)
    assert rows[("day", ep("2024-01-01 00:00:00"), "b")] == (1, 4.0)
    assert rows[("day", ep("2024-01-02 00:00:00"), "a")] == (1, 8.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1 and plan.count("Scan") <= 1
