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
