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


def test_slices_threading_reference_dev_fixture(spark, tmp_path):
    """The round-3 verdict's missing seam: `slices` maps from sentence
    JSONL must reach slice incidence. Fixture and expected arrays are
    the reference's own test_non_gold_aliases Test 1 (dev split,
    use_weak_label=True — tests/test_data/test_slice_data.py:376-449):
    3 aliases, only the 3rd gold, so non-gold slots score 0 / -1.0 but
    keep their positions."""
    import json

    from bootleg_spark.operators.slices import (
        build_slice_incidence,
        slice_feature_arrays,
    )

    line = {
        "aliases": ["alias3", "alias4", "alias3"],
        "qids": ["Q1", "Q4", "Q1"],
        "sent_idx_unq": 0,
        "sentence": "alias3 alias4 alias3",
        "char_spans": [[0, 6], [7, 13], [14, 20]],
        "slices": {
            "slice1": {"0": 0.9, "1": 0.3, "2": 0.5},
            "slice2": {"0": 0.0, "1": 0.0, "2": 1.0},
        },
        "gold": [False, False, True],
    }
    p = str(tmp_path / "dev.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps(line) + "\n")
    sents = sentences.read_sentences_jsonl(spark, p)
    assert sentences.validate_sentences(sents).count() == 0
    probs = sentences.sentences_to_slice_probs(sents)
    assert {
        (r["alias_idx"], r["slice_name"], r["prob"]) for r in probs.collect()
    } == {
        (0, "slice1", 0.9), (1, "slice1", 0.3), (2, "slice1", 0.5),
        (0, "slice2", 0.0), (1, "slice2", 0.0), (2, "slice2", 1.0),
    }
    mentions = sents.select(
        F.col("sent_idx_unq").alias("sent_idx"),
        F.posexplode("gold").alias("alias_idx", "gold"),
    )
    inc = build_slice_incidence(
        mentions, probs, use_weak_label=True, split="dev"
    )
    rows = {(r["slice_name"], r["alias_new_idx"], r["prob"], r["in_slice"])
            for r in inc.collect()}
    # only the gold mention (position 2) carries membership
    assert rows == {
        ("final_loss", 2, 1.0, True),
        ("slice1", 2, 0.5, False),
        ("slice2", 2, 1.0, True),
    }
    # array layout == the reference's gold_data record arrays
    arrays = {
        r["slice_name"]: (r["incidence"], r["probs"])
        for r in slice_feature_arrays(inc, max_alias2pred=3).collect()
    }
    assert arrays["final_loss"] == ([0, 0, 1], [-1.0, -1.0, 1.0])
    assert arrays["slice1"] == ([0, 0, 0], [-1.0, -1.0, 0.5])
    assert arrays["slice2"] == ([0, 0, 1], [-1.0, -1.0, 1.0])


def test_slices_threading_train_weak_keeps_all(spark, tmp_path):
    """Same fixture, train split + weak labels: every mention counts
    (slice_dataset.py:309, FINAL_LOSS over all aliases)."""
    import json

    from bootleg_spark.operators.slices import build_slice_incidence

    line = {
        "aliases": ["alias3", "alias4"],
        "qids": ["Q1", "Q4"],
        "sent_idx_unq": 7,
        "sentence": "alias3 alias4",
        "char_spans": [[0, 6], [7, 13]],
        "slices": {"slice1": {"0": 0.9, "1": 0.3}},
        "gold": [False, True],
    }
    p = str(tmp_path / "train.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps(line) + "\n")
    sents = sentences.read_sentences_jsonl(spark, p)
    probs = sentences.sentences_to_slice_probs(sents)
    mentions = sents.select(
        F.col("sent_idx_unq").alias("sent_idx"),
        F.posexplode("gold").alias("alias_idx", "gold"),
    )
    inc = build_slice_incidence(mentions, probs, use_weak_label=True, split="train")
    rows = {(r["slice_name"], r["alias_new_idx"], r["prob"]) for r in inc.collect()}
    assert rows == {
        ("final_loss", 0, 1.0), ("final_loss", 1, 1.0),
        ("slice1", 0, 0.9), ("slice1", 1, 0.3),
    }
