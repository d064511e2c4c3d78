"""Entity canonicalization: redirect-chain resolution + triple rewrite."""

from __future__ import annotations

import pytest

from bootleg_spark.operators.canonical import (
    canonicalize_triples,
    resolve_redirects,
)


def _resolved_map(df):
    return {r["qid"]: r["canonical"] for r in df.collect()}


def test_resolve_follows_deep_chains(spark):
    # chain of length 5: A→B→C→D→E→F, plus an unrelated single hop
    edges = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("E", "F"), ("X", "Y")]
    r = spark.createDataFrame(edges, "src_qid string, dst_qid string")
    m = _resolved_map(resolve_redirects(r))
    assert m == {"A": "F", "B": "F", "C": "F", "D": "F", "E": "F", "X": "Y"}


def test_resolve_drops_self_redirects_and_dedups(spark):
    edges = [("A", "A"), ("A", "B"), ("A", "B")]
    r = spark.createDataFrame(edges, "src_qid string, dst_qid string")
    assert _resolved_map(resolve_redirects(r)) == {"A": "B"}


def test_resolve_cycle_raises(spark):
    edges = [("A", "B"), ("B", "C"), ("C", "A")]
    r = spark.createDataFrame(edges, "src_qid string, dst_qid string")
    with pytest.raises(ValueError, match="converge"):
        resolve_redirects(r, max_iter=5)


def test_canonicalize_rewrites_and_drops_collapsed_loops(spark):
    triples = spark.createDataFrame(
        [
            ("A", "works_with", "Z"),   # subj rewritten A→F
            ("Z", "located_in", "B"),   # obj rewritten B→F
            ("A", "part_of", "C"),      # both rewritten to F → self-loop, dropped
            ("Z", "works_with", "W"),   # untouched
            ("F", "works_with", "Z"),   # duplicate of rewritten row 1 → dedup
        ],
        "subj_qid string, rel string, obj_qid string",
    )
    r = spark.createDataFrame(
        [("A", "B"), ("B", "F"), ("C", "F")], "src_qid string, dst_qid string"
    )
    out = canonicalize_triples(triples, resolve_redirects(r))
    got = {(x["subj_qid"], x["rel"], x["obj_qid"]) for x in out.collect()}
    assert got == {
        ("F", "works_with", "Z"),
        ("Z", "located_in", "F"),
        ("Z", "works_with", "W"),
    }
    assert out.count() == 3  # dedup collapsed the duplicate rewritten row


def test_log_rounds_convergence(spark):
    # chain of length 8 resolves within ceil(log2(8)) + 1 = 4 rounds —
    # pointer jumping, not one-hop-per-round walking
    edges = [(chr(65 + i), chr(66 + i)) for i in range(8)]
    r = spark.createDataFrame(edges, "src_qid string, dst_qid string")
    m = _resolved_map(resolve_redirects(r, max_iter=4))
    assert set(m.values()) == {chr(65 + 8)}
