"""Entity-profile JSONL ingestion tests.

Golden values mirror the reference's
tests/test_entity/test_entity_profile.py:46-120 (test_profile_load_simple)
— same 4-entity fixture, same expected alias2qids ordering
((score desc, qid desc)), type-system backfill, and relation grouping —
plus a load of the reference's full 1,523-line sample profile
(data/sample_raw_entity_data/raw_profile.jsonl).
"""

from __future__ import annotations

import json
import os

import pytest

from bootleg_spark.sources.profile import (
    assert_valid_profile,
    profile_alias_candidates,
    profile_entities,
    profile_entity_types,
    profile_kg_relations,
    read_profile_jsonl,
    validate_profile,
)

SIMPLE = [
    {
        "entity_id": "Q123",
        "mentions": [["dog", 10.0], ["dogg", 7.0], ["animal", 4.0]],
        "title": "Dog",
        "description": "Dog",
        "types": {"hyena": ["animal"], "wiki": ["dog"]},
        "relations": [
            {"relation": "sibling", "object": "Q345"},
            {"relation": "sibling", "object": "Q567"},
        ],
    },
    {
        "entity_id": "Q345",
        "mentions": [["cat", 10.0], ["catt", 7.0], ["animal", 3.0]],
        "title": "Cat",
        "description": "Cat",
        "types": {"hyena": ["animal"], "wiki": ["cat"]},
        "relations": [{"relation": "sibling", "object": "Q123"}],
    },
    {
        "entity_id": "Q567",
        "mentions": [["catt", 6.5], ["animal", 3.3]],
        "title": "Catt",
        "description": "Catt",
        "types": {"hyena": ["animal", "animall"]},
        "relations": [{"relation": "sibling", "object": "Q123"}],
    },
    {"entity_id": "Q789", "mentions": [["animal", 12.2]], "title": "Dogg"},
]

REF_SAMPLE = "/root/reference/data/sample_raw_entity_data/raw_profile.jsonl"


@pytest.fixture(scope="module")
def simple_profile(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("profile") / "profile.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in SIMPLE) + "\n")
    return read_profile_jsonl(spark, str(p))


def test_read_defaults(simple_profile):
    rows = {r["entity_id"]: r for r in simple_profile.collect()}
    assert rows["Q789"]["description"] == ""  # default description
    assert rows["Q789"]["title"] == "Dogg"
    assert rows["Q789"]["types"] == {}
    assert list(rows["Q789"]["relations"]) == []
    assert_valid_profile(simple_profile)  # no violations


def test_entities_dense_eids(simple_profile):
    ents = {r["qid"]: r for r in profile_entities(simple_profile).collect()}
    assert {q: r["title"] for q, r in ents.items()} == {
        "Q123": "Dog", "Q345": "Cat", "Q567": "Catt", "Q789": "Dogg",
    }
    assert ents["Q789"]["descr"] == ""
    # dense 1-based ids by sorted qid; 0 stays reserved for NC
    assert sorted(r["eid"] for r in ents.values()) == [1, 2, 3, 4]
    assert ents["Q123"]["eid"] == 1 and ents["Q789"]["eid"] == 4


def test_alias2qids_order(simple_profile):
    """Gold from the reference test: candidates sorted (score desc,
    qid desc) per alias."""
    cands = profile_alias_candidates(simple_profile)
    by_alias: dict[str, list] = {}
    for r in cands.orderBy("alias", "rank").collect():
        by_alias.setdefault(r["alias"], []).append([r["qid"], r["score"]])
    assert by_alias == {
        "dog": [["Q123", 10.0]],
        "dogg": [["Q123", 7.0]],
        "cat": [["Q345", 10.0]],
        "catt": [["Q345", 7.0], ["Q567", 6.5]],
        "animal": [["Q789", 12.2], ["Q123", 4.0], ["Q567", 3.3], ["Q345", 3.0]],
    }


def test_max_candidates_truncation(simple_profile):
    cands = profile_alias_candidates(simple_profile, max_candidates=2)
    animal = cands.where("alias = 'animal'").orderBy("rank").collect()
    assert [r["qid"] for r in animal] == ["Q789", "Q123"]


def test_type_systems_backfilled(simple_profile):
    types = profile_entity_types(simple_profile)
    got = {
        (r["qid"], r["type_system"]): list(r["typenames"]) for r in types.collect()
    }
    assert got == {
        ("Q123", "hyena"): ["animal"], ("Q123", "wiki"): ["dog"],
        ("Q345", "hyena"): ["animal"], ("Q345", "wiki"): ["cat"],
        ("Q567", "hyena"): ["animal", "animall"], ("Q567", "wiki"): [],
        ("Q789", "hyena"): [], ("Q789", "wiki"): [],
    }


def test_max_types_truncation(simple_profile):
    types = profile_entity_types(simple_profile, max_types=1)
    got = {(r["qid"], r["type_system"]): list(r["typenames"]) for r in types.collect()}
    assert got[("Q567", "hyena")] == ["animal"]


def test_kg_relations(simple_profile):
    rels = profile_kg_relations(simple_profile)
    got = sorted(tuple(r) for r in rels.collect())
    assert got == [
        ("Q123", "sibling", "Q345"),
        ("Q123", "sibling", "Q567"),
        ("Q345", "sibling", "Q123"),
        ("Q567", "sibling", "Q123"),
    ]
    # order-of-appearance truncation: Q123 keeps its FIRST object
    trunc = profile_kg_relations(simple_profile, max_connections=1)
    q123 = [r["obj_qid"] for r in trunc.where("subj_qid = 'Q123'").collect()]
    assert q123 == ["Q345"]


def test_lnrm_applied_to_mentions(spark, tmp_path):
    p = tmp_path / "p.jsonl"
    p.write_text(
        json.dumps(
            {"entity_id": "Q1", "mentions": [["Crème  Brûlée!", 3.0]], "title": "T"}
        )
        + "\n"
    )
    prof = read_profile_jsonl(spark, str(p))
    rows = profile_alias_candidates(prof).collect()
    assert [r["alias"] for r in rows] == ["creme brulee"]


def test_validation_errors(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    lines = [
        json.dumps({"entity_id": "Q1", "mentions": [["a", 1.0]]}),
        json.dumps({"entity_id": "Q1", "mentions": [["b", 1.0]]}),  # dup
        json.dumps({"entity_id": "Q2"}),  # missing mentions
        "{not json",  # corrupt
    ]
    p.write_text("\n".join(lines) + "\n")
    prof = read_profile_jsonl(spark, str(p))
    errs = {r["error"] for r in validate_profile(prof).collect()}
    assert errs == {
        "duplicate entity_id",
        "missing required key (entity_id/mentions)",
        "malformed json line",
    }
    with pytest.raises(ValueError, match="invalid entity profile"):
        assert_valid_profile(prof)


@pytest.mark.skipif(not os.path.exists(REF_SAMPLE), reason="reference sample absent")
def test_reference_sample_roundtrip(spark):
    """Load the reference's real 1,523-entity sample profile and check
    invariants + spot values from the file itself."""
    prof = read_profile_jsonl(spark, REF_SAMPLE)
    assert_valid_profile(prof)
    assert prof.count() == 1523

    ents = profile_entities(prof)
    assert ents.count() == 1523
    assert ents.where("qid = 'NQ1'").first()["title"] == "Some New Entity"

    cands = profile_alias_candidates(prof, max_candidates=30)
    # every alias list respects max_candidates and has contiguous ranks
    from pyspark.sql import functions as F

    agg = cands.groupBy("alias").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    assert agg.where("n > 30 OR mx != n").count() == 0
    # 'gabon' maps to Q1000 (line 2 of the sample)
    assert cands.where("alias = 'gabon'").first()["qid"] == "Q1000"

    types = profile_entity_types(prof, max_types=10)
    sys_names = {r["type_system"] for r in types.select("type_system").distinct().collect()}
    assert sys_names == {"wiki", "relations", "hyena"}
    # max_types truncation bites on the 'relations' system (Q1000 has 40)
    q1000 = {
        r["type_system"]: list(r["typenames"])
        for r in types.where("qid = 'Q1000'").collect()
    }
    assert len(q1000["relations"]) == 10
    assert q1000["wiki"] == ["sovereign state", "country", "French colonial empire"]

    rels = profile_kg_relations(prof, max_connections=100)
    q1000_rels = sorted(
        tuple(r) for r in rels.where("subj_qid = 'Q1000' AND rel = 'P47'").collect()
    )
    assert [t[2] for t in q1000_rels] == sorted(
        ["Q1009", "Q971", "Q983", "Q1039", "Q916"]
    )


def test_file_order_eids_match_reference_enumeration(spark, tmp_path):
    """order='file' must reproduce the reference's insertion-order eid
    enumeration (entity_symbols.py:43-47) exactly — entities deliberately
    NOT in sorted-qid order, so the two numberings differ."""
    from bootleg_spark.sources.profile import read_profile_jsonl_ordered

    rows = [
        {"entity_id": "Q9", "mentions": [["z", 1.0]], "title": "Z"},
        {"entity_id": "Q1", "mentions": [["a", 1.0]], "title": "A"},
        {"entity_id": "Q5", "mentions": [["m", 1.0]], "title": "M"},
    ]
    p = tmp_path / "ordered.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    prof = read_profile_jsonl_ordered(spark, str(p))
    assert_valid_profile(prof.drop("_line_no"))
    by_file = {
        r["qid"]: r["eid"] for r in profile_entities(prof, order="file").collect()
    }
    # file order: Q9=1, Q1=2, Q5=3 (the reference's enumeration)
    assert by_file == {"Q9": 1, "Q1": 2, "Q5": 3}
    # sorted-qid default disagrees on this fixture (documents the deviation)
    by_qid = {r["qid"]: r["eid"] for r in profile_entities(prof).collect()}
    assert by_qid == {"Q1": 1, "Q5": 2, "Q9": 3}
    # order='file' without the ordered reader is a loud error
    with pytest.raises(ValueError, match="_line_no"):
        profile_entities(prof.drop("_line_no"), order="file")


def test_ordered_reader_multi_file_sorted_path_order(spark, tmp_path):
    """Regression (round-3 advice): across a multi-file glob the line
    numbering must follow sorted file-path order, not Hadoop's
    filesystem-dependent listStatus order. Files are created in
    reverse-sorted order to catch any creation-order dependence."""
    from bootleg_spark.sources.profile import read_profile_jsonl_ordered

    d = tmp_path / "profile_dir"
    d.mkdir()
    # created b-first: a sequential reader over sorted paths sees a's
    # rows (Q20, Q21) before b's (Q10)
    (d / "part-b.jsonl").write_text(
        json.dumps({"entity_id": "Q10", "mentions": [["x", 1.0]]}) + "\n"
    )
    (d / "part-a.jsonl").write_text(
        "\n".join(
            json.dumps({"entity_id": q, "mentions": [["y", 1.0]]})
            for q in ("Q20", "Q21")
        )
        + "\n"
    )
    prof = read_profile_jsonl_ordered(spark, str(d))
    got = {r["entity_id"]: r["_line_no"] for r in prof.collect()}
    assert got == {"Q20": 0, "Q21": 1, "Q10": 2}
    # eids (1-based, file order) follow the same concatenation
    eids = {r["qid"]: r["eid"] for r in profile_entities(prof, order="file").collect()}
    assert eids == {"Q20": 1, "Q21": 2, "Q10": 3}


def test_ordered_reader_matches_default_on_reference_sample(spark):
    """The ordered reader's parsed columns must agree with the default
    reader row-for-row on the reference's full 1,523-line sample; line
    numbers must be exactly 0..n-1 (split order == file order)."""
    if not os.path.exists(REF_SAMPLE):
        pytest.skip("reference sample not present")
    from bootleg_spark.sources.profile import read_profile_jsonl_ordered

    ordered = read_profile_jsonl_ordered(spark, REF_SAMPLE)
    default = read_profile_jsonl(spark, REF_SAMPLE)
    n = default.count()
    lns = [r["_line_no"] for r in ordered.select("_line_no").collect()]
    assert sorted(lns) == list(range(n))
    a = {r["entity_id"]: (r["title"], r["description"]) for r in ordered.collect()}
    b = {r["entity_id"]: (r["title"], r["description"]) for r in default.collect()}
    assert a == b


def test_profile_jsonl_write_roundtrip(spark, tmp_path):
    """save_to_jsonl parity (entity_profile.py:286-319): write the
    parsed reference sample back out, re-read it, and compare frames;
    a second write of the re-read profile must be byte-identical
    (serialization is a fixed point)."""
    if not os.path.exists(REF_SAMPLE):
        pytest.skip("reference sample not present")
    import json as _json

    from pyspark.sql import functions as F

    from bootleg_spark.sources.profile import write_profile_jsonl

    prof = read_profile_jsonl(spark, REF_SAMPLE)
    out1 = str(tmp_path / "roundtrip.jsonl")
    write_profile_jsonl(prof, out1)
    back = read_profile_jsonl(spark, out1)
    assert back.where(F.col("_corrupt").isNotNull()).count() == 0
    assert back.count() == prof.count()

    def canon(df):
        rows = {}
        for r in df.collect():
            ms = sorted([(m[0], float(m[1])) for m in r["mentions"]])
            ty = {k: list(v) for k, v in (r["types"] or {}).items() if len(v) > 0}
            rel = sorted((x["relation"], x["object"]) for x in (r["relations"] or []))
            rows[r["entity_id"]] = (ms, r["title"], r["description"], ty, rel)
        return rows

    assert canon(prof) == canon(back)
    # reference emit-order + score-sort invariants on the written file
    with open(out1) as f:
        lines = [_json.loads(l) for l in f]
    assert [l["entity_id"] for l in lines] == sorted(l["entity_id"] for l in lines)
    for l in lines:
        scores = [m[1] for m in l["mentions"]]
        assert scores == sorted(scores, reverse=True)
        assert "description" not in l or l["description"] != ""
        keys = list(l.keys())
        assert keys[:3] == ["entity_id", "mentions", "title"]
    # fixed point: write(read(write(x))) == write(x)
    out2 = str(tmp_path / "roundtrip2.jsonl")
    write_profile_jsonl(back, out2)
    assert open(out1, "rb").read() == open(out2, "rb").read()
