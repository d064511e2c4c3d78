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
    df = sentences.read_sentences_jsonl(spark, p)
    errs = {r["error"] for r in sentences.validate_sentences(df).collect()}
    assert errs == {
        "malformed json line",
        "lengths of alias-related values not equal",
        "span not a valid [start, end) within sentence",
    }


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
