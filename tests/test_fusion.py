"""Knowledge-fusion operators (fusion.py) on hand-built fixtures."""

import pytest
from pyspark.sql import Row

from bootleg_spark.operators.fusion import (
    functional_conflicts,
    relation_signatures,
    resolve_functional,
    type_violations,
)


@pytest.fixture()
def kg(spark):
    # born_in: 3 person->place edges + 1 corrupt person->person edge
    # knows:   2 person->person edges
    rows = [
        ("Q1", "born_in", "Q10"),
        ("Q2", "born_in", "Q10"),
        ("Q3", "born_in", "Q11"),
        ("Q1", "born_in", "Q2"),  # corrupt: object is a person
        ("Q1", "knows", "Q2"),
        ("Q2", "knows", "Q3"),
    ]
    return spark.createDataFrame(rows, "subj_qid string, rel string, obj_qid string")


@pytest.fixture()
def types(spark):
    rows = [("Q1", "person"), ("Q2", "person"), ("Q3", "person"),
            ("Q10", "place"), ("Q11", "place")]
    return spark.createDataFrame(rows, "qid string, type_name string")


def test_relation_signatures(kg, types):
    sig = {(r.rel, r.subj_type, r.obj_type): (r.support, r.frac)
           for r in relation_signatures(kg, types).collect()}
    assert sig[("born_in", "person", "place")] == (3, 0.75)
    assert sig[("born_in", "person", "person")] == (1, 0.25)
    assert sig[("knows", "person", "person")] == (2, 1.0)


def test_relation_signatures_skips_untyped(kg, types, spark):
    # an edge to an untyped node contributes to neither side of the frac
    extra = kg.unionByName(
        spark.createDataFrame([("Q9", "born_in", "Q10")], kg.schema)
    )
    sig = {(r.rel, r.subj_type, r.obj_type): r.support
           for r in relation_signatures(extra, types).collect()}
    assert sig[("born_in", "person", "place")] == 3


def test_type_violations_flags_rare_pair(kg, types):
    out = type_violations(kg, types, min_frac=0.5).collect()
    assert [(r.subj_qid, r.rel, r.obj_qid) for r in out] == [("Q1", "born_in", "Q2")]
    assert out[0].sig_frac == 0.25


def test_type_violations_threshold_inclusive_below_only(kg, types):
    # frac == min_frac is NOT a violation (strict <)
    assert type_violations(kg, types, min_frac=0.25).count() == 0


def test_functional_conflicts(kg):
    out = {(r.subj_qid, r.rel): (r.n_objects, list(r.objects))
           for r in functional_conflicts(kg, ["born_in"]).collect()}
    # only Q1 asserts two born_in objects; list sorted
    assert out == {("Q1", "born_in"): (2, ["Q10", "Q2"])}


def test_resolve_functional_argmax_and_passthrough(kg, spark):
    ev = spark.createDataFrame(
        [("Q1", "born_in", "Q10", 5.0), ("Q1", "born_in", "Q2", 1.0)],
        "subj_qid string, rel string, obj_qid string, weight double",
    )
    out = resolve_functional(kg, ev, ["born_in"]).collect()
    born = {(r.subj_qid, r.obj_qid): r.weight for r in out if r.rel == "born_in"}
    # Q1 resolved to max-evidence Q10; Q2/Q3 keep their single objects
    assert born == {("Q1", "Q10"): 5.0, ("Q2", "Q10"): 0.0, ("Q3", "Q11"): 0.0}
    # non-functional rows pass through untouched
    assert sorted((r.subj_qid, r.obj_qid) for r in out if r.rel == "knows") == [
        ("Q1", "Q2"), ("Q2", "Q3")]


def test_resolve_functional_tie_breaks_to_smallest_obj(kg, spark):
    ev = spark.createDataFrame(
        [("Q1", "born_in", "Q10", 2.0), ("Q1", "born_in", "Q2", 2.0)],
        "subj_qid string, rel string, obj_qid string, weight double",
    )
    out = {r.subj_qid: r.obj_qid
           for r in resolve_functional(kg, ev, ["born_in"]).collect()
           if r.rel == "born_in"}
    assert out["Q1"] == "Q10"  # 'Q10' < 'Q2' lexicographically


def test_source_trust_hand_computed(spark):
    from bootleg_spark.operators.fusion import source_trust

    # s1 asserts {A, B}; s2 asserts {A}; one iteration by hand:
    #   raw conf: A=2, B=1 -> max 2 -> conf A=1.0, B=0.5
    #   raw trust: s1=1.5, s2=1.0 -> max 1.5 -> s1=1.0, s2=2/3
    claims = spark.createDataFrame(
        [("s1", "Q1", "r", "Q2"), ("s1", "Q3", "r", "Q4"), ("s2", "Q1", "r", "Q2")],
        "source string, subj_qid string, rel string, obj_qid string",
    )
    trust, conf = source_trust(claims, iters=1)
    t = {r.source: r.trust for r in trust.collect()}
    assert t["s1"] == pytest.approx(1.0)
    assert t["s2"] == pytest.approx(2 / 3)
    c = {(r.subj_qid, r.obj_qid): r.conf for r in conf.collect()}
    assert c[("Q1", "Q2")] == pytest.approx(1.0)
    assert c[("Q3", "Q4")] == pytest.approx(0.5)


def test_source_trust_matches_numpy_iteration(spark):
    import numpy as np

    from bootleg_spark.operators.fusion import source_trust

    sources = [f"s{i}" for i in range(5)]
    claim_ids = [(f"Q{j}", "r", f"Q{j+100}") for j in range(8)]
    rows = [
        (s, *claim_ids[j])
        for i, s in enumerate(sources)
        for j in range(8)
        if (i * 3 + j) % 4 != 0  # deterministic sparse bipartite graph
    ]
    claims = spark.createDataFrame(
        rows, "source string, subj_qid string, rel string, obj_qid string"
    )
    # dense reference
    A = np.zeros((5, 8))
    for i in range(5):
        for j in range(8):
            if (i * 3 + j) % 4 != 0:
                A[i, j] = 1.0
    t = np.ones(5)
    for _ in range(3):
        c = A.T @ t
        c = c / c.max()
        t = A @ c
        t = t / t.max()
    got = {r.source: r.trust for r in source_trust(claims, iters=3)[0].collect()}
    for i, s in enumerate(sources):
        assert got[s] == pytest.approx(t[i], abs=1e-9)


def test_observation_spans(spark):
    from bootleg_spark.operators.fusion import observation_spans

    att = spark.createDataFrame(
        [(1, "Q1", "r", "Q2"), (3, "Q1", "r", "Q2"), (2, "Q3", "r", "Q4"),
         (1, "Q1", "r", "Q2")],  # duplicate page attestation collapses
        "doc_id long, subj string, pred string, obj string",
    )
    pages = spark.createDataFrame(
        [(1, "2020-01-01 00:00:01"), (2, "2020-01-01 00:00:02"),
         (3, "2020-01-01 00:00:03")],
        "doc_id long, warc_ts string",
    ).selectExpr("doc_id", "CAST(warc_ts AS TIMESTAMP) AS warc_ts")
    out = {(r.subj, r.obj): (str(r.first_seen), str(r.last_seen), r.n_pages)
           for r in observation_spans(att, pages).collect()}
    assert out[("Q1", "Q2")] == ("2020-01-01 00:00:01", "2020-01-01 00:00:03", 2)
    assert out[("Q3", "Q4")] == ("2020-01-01 00:00:02", "2020-01-01 00:00:02", 1)
