"""AMIE-style rule mining (rules.py) on a hand-built family graph."""

import pytest

from bootleg_spark.operators.rules import apply_rules, mine_rules


@pytest.fixture()
def kg(spark):
    rows = [
        # a -parent-> b -parent-> c, with the grandparent edge present
        ("a", "parent", "b"),
        ("b", "parent", "c"),
        ("a", "grandparent", "c"),
        # second mediator for the same (a, c) binding: must count once
        ("a", "parent", "b2"),
        ("b2", "parent", "c"),
        # d -parent-> e -parent-> f, grandparent edge MISSING
        ("d", "parent", "e"),
        ("e", "parent", "f"),
    ]
    return spark.createDataFrame(rows, "subj_qid string, rel string, obj_qid string")


def test_mine_rules_support_and_confidence(kg):
    mined = {(r.r1, r.r2, r.r3): (r.support, r.n_body, r.confidence)
             for r in mine_rules(kg, min_support=1).collect()}
    # (parent, parent) bindings: (a,c) [deduped across both mediators], (d,f)
    assert mined[("parent", "parent", "grandparent")] == (1, 2, 0.5)


def test_mine_rules_min_support_prunes(kg):
    assert ("parent", "parent", "grandparent") not in {
        (r.r1, r.r2, r.r3) for r in mine_rules(kg, min_support=2).collect()
    }


def test_apply_rules_proposes_missing_head(kg):
    mined = mine_rules(kg, min_support=1)
    out = [(r.subj_qid, r.rel, r.obj_qid, r.n_rules, r.confidence)
           for r in apply_rules(kg, mined, min_confidence=0.4).collect()]
    assert out == [("d", "grandparent", "f", 1, 0.5)]


def test_apply_rules_never_proposes_known_facts(kg):
    mined = mine_rules(kg, min_support=1)
    proposed = {(r.subj_qid, r.rel, r.obj_qid)
                for r in apply_rules(kg, mined, min_confidence=0.0).collect()}
    assert ("a", "grandparent", "c") not in proposed
