"""Sentence-JSONL ingestion tests — including the reference's own
end2end fixture file as input (dataset.py:495-545 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bootleg_spark.sources import sentences

REF_JSONL = "/root/reference/tests/data/data_loader/end2end_train.jsonl"


def test_reads_reference_fixture(spark):
    df = sentences.read_sentences_jsonl(spark, REF_JSONL)
    assert sentences.validate_sentences(df).count() == 0
    m = sentences.sentences_to_mentions(df)
    rows = m.where(F.col("sent_idx") == 0).orderBy("alias_idx").collect()
    assert [(r["alias"], r["qid"], r["char_start"], r["char_end"]) for r in rows] == [
        ("alias1", "Q1", 0, 6),
        ("multi word alias2", "Q4", 10, 27),
    ]
    assert all(r["gold"] for r in rows)


def test_corrupt_and_invalid_lines_flagged(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"sent_idx_unq": 1, "sentence": "a b", "aliases": ["a"], '
                '"qids": ["Q1", "Q2"], "char_spans": [[0, 1]], "gold": [true]}\n')  # len mismatch
        f.write("not json at all\n")
        f.write('{"sent_idx_unq": 3, "sentence": "ab", "aliases": ["a"], '
                '"qids": ["Q1"], "char_spans": [[0, 99]], "gold": [true]}\n')  # span past end
        f.write('{"sent_idx_unq": 4, "sentence": "ok go", "aliases": ["ok"], '
                '"qids": ["Q1"], "char_spans": [[0, 2]], "gold": [true]}\n')  # valid
        # null elements must be flagged, not silently dropped by
        # null-propagating predicates
        f.write('{"sent_idx_unq": 5, "sentence": "a b", "aliases": ["a"], '
                '"qids": ["Q1"], "char_spans": [null], "gold": [true]}\n')
        f.write('{"sent_idx_unq": 6, "sentence": "a b", "aliases": ["a"], '
                '"qids": ["Q1"], "char_spans": [[null, 2]], "gold": [true]}\n')
    df = sentences.read_sentences_jsonl(spark, p)
    errs = {r["error"] for r in sentences.validate_sentences(df).collect()}
    assert errs == {
        "malformed json line",
        "lengths of alias-related values not equal",
        "span not a valid [start, end) within sentence",
        "null element in alias-related arrays",
    }
    flagged = {r["sent_idx_unq"] for r in sentences.validate_sentences(df).collect()}
    assert {5, 6} <= flagged


def test_unvalidated_ragged_input_emits_no_null_padded_mentions(spark, tmp_path):
    """Regression (round-3 advice): arrays_zip null-pads ragged arrays,
    so a length-mismatched line flowing into sentences_to_mentions
    WITHOUT assert_valid_sentences must be excluded, not expanded into
    mention rows with null qid/span."""
    p = str(tmp_path / "ragged.jsonl")
    with open(p, "w") as f:
        # qids longer than aliases: would null-pad alias on the 2nd row
        f.write('{"sent_idx_unq": 1, "sentence": "a b", "aliases": ["a"], '
                '"qids": ["Q1", "Q2"], "char_spans": [[0, 1]], "gold": [true]}\n')
        # missing gold entirely
        f.write('{"sent_idx_unq": 2, "sentence": "c d", "aliases": ["c"], '
                '"qids": ["Q3"], "char_spans": [[0, 1]]}\n')
        # valid line: the only one that may survive
        f.write('{"sent_idx_unq": 3, "sentence": "ok go", "aliases": ["ok"], '
                '"qids": ["Q4"], "char_spans": [[0, 2]], "gold": [true]}\n')
    out = sentences.sentences_to_mentions(sentences.read_sentences_jsonl(spark, p)).collect()
    assert {r["sent_idx"] for r in out} == {3}
    assert all(r["qid"] is not None and r["char_start"] is not None for r in out)


def test_weak_label_filter_reindexes(spark):
    df = spark.createDataFrame(
        [
            (
                7,
                "x y z",
                ["X", "y", "z"],
                ["Q1", "Q2", "Q3"],
                [[0, 1], [2, 3], [4, 5]],
                [True, False, True],
            )
        ],
        "sent_idx_unq long, sentence string, aliases array<string>, qids array<string>, "
        "char_spans array<array<long>>, gold array<boolean>",
    ).withColumn("_corrupt", F.lit(None).cast("string"))
    weak = sentences.sentences_to_mentions(df, use_weak_label=True).collect()
    assert len(weak) == 3
    assert weak[0]["alias"] == "x"  # lowercased
    strict = sentences.sentences_to_mentions(df, use_weak_label=False).orderBy("alias_idx").collect()
    assert [(r["alias_idx"], r["qid"]) for r in strict] == [(0, "Q1"), (1, "Q3")]


def test_user_journey_profile_plus_sentences_jsonl(spark, tmp_path):
    """The complete reference-user path with the reference's own public
    file formats: an entity-profile JSONL (EntityProfile.load_from_jsonl
    interchange) plus the end2end sentence JSONL fixture in, per-mention
    linked predictions out — no reference code, all relational."""
    import json

    from bootleg_spark.operators.candidates import attach_candidates
    from bootleg_spark.operators.linking import link_popularity
    from bootleg_spark.sources.profile import (
        assert_valid_profile,
        profile_alias_candidates,
        profile_entities,
        read_profile_jsonl,
    )

    profile = [
        {"entity_id": "Q1", "title": "One", "mentions": [["alias1", 10.0], ["word alias3", 8.0]]},
        {"entity_id": "Q2", "title": "Two", "mentions": [["multi word alias2", 3.0]]},
        {"entity_id": "Q3", "title": "Three", "mentions": [["word alias3", 9.0]]},
        {"entity_id": "Q4", "title": "Four", "mentions": [["multi word alias2", 8.0], ["alias1", 2.0]]},
    ]
    prof_path = str(tmp_path / "profile.jsonl")
    with open(prof_path, "w") as f:
        for line in profile:
            f.write(json.dumps(line) + "\n")

    prof = read_profile_jsonl(spark, prof_path)
    assert_valid_profile(prof)
    alias_cands = profile_alias_candidates(prof).join(
        profile_entities(prof).select("qid", "eid"), "qid"
    )
    mentions = sentences.sentences_to_mentions(
        sentences.read_sentences_jsonl(spark, REF_JSONL)
    )
    linked = link_popularity(attach_candidates(mentions, alias_cands))
    got = {
        (r["alias"], r["qid_pred"])
        for r in linked.where(F.col("sent_idx") == 0).collect()
    }
    # popularity scorer picks each alias's top-scored profile candidate
    assert got == {("alias1", "Q1"), ("multi word alias2", "Q4")}
