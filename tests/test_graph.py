"""Graph-consumer ops (operators/graph.py): k-hop BFS + degrees."""

from __future__ import annotations

import pytest

from bootleg_spark.operators.graph import degree_stats, khop_neighborhood

# a -> b -> c -> a  (cycle), b -> d, e isolated-ish (d -> e), f unreachable
EDGES = [
    ("a", "r", "b"),
    ("b", "r", "c"),
    ("c", "r", "a"),
    ("b", "r", "d"),
    ("d", "r", "e"),
    ("f", "r", "a"),
]


@pytest.fixture()
def kg(spark):
    return spark.createDataFrame(EDGES, "subj_qid string, rel string, obj_qid string")


def _hops(df):
    return {r["qid"]: r["hop"] for r in df.collect()}


def test_khop_min_distance_with_cycle(spark, kg):
    seeds = spark.createDataFrame([("a",)], "qid string")
    assert _hops(khop_neighborhood(kg, seeds, k=0)) == {"a": 0}
    assert _hops(khop_neighborhood(kg, seeds, k=1)) == {"a": 0, "b": 1}
    # the cycle must NOT relabel a at hop 3; d arrives at 2 not via
    # longer walks; f is never reached (edges are directed)
    got = _hops(khop_neighborhood(kg, seeds, k=4))
    assert got == {"a": 0, "b": 1, "c": 2, "d": 2, "e": 3}
    # multi-seed: min over seeds
    seeds2 = spark.createDataFrame([("a",), ("d",)], "qid string")
    got2 = _hops(khop_neighborhood(kg, seeds2, k=2))
    assert got2 == {"a": 0, "d": 0, "b": 1, "e": 1, "c": 2}
    with pytest.raises(ValueError):
        khop_neighborhood(kg, seeds, k=-1)


def test_degree_stats(spark, kg):
    got = {
        r["qid"]: (r["out_deg"], r["in_deg"], r["total_deg"])
        for r in degree_stats(kg).collect()
    }
    assert got == {
        "a": (1, 2, 3),
        "b": (2, 1, 3),
        "c": (1, 1, 2),
        "d": (1, 1, 2),
        "e": (0, 1, 1),
        "f": (1, 0, 1),
    }
