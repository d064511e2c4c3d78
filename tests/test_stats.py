"""Aggregation operator goldens (scorer.py / compute_statistics semantics)."""

from bootleg_spark.operators import stats


def test_slice_eval(spark):
    rows = [
        ("s1", "Q1", "Q1"),
        ("s1", "Q2", "Q3"),
        ("s2", "Q1", "Q1"),
        ("s2", "Q1", "Q1"),
    ]
    df = spark.createDataFrame(rows, ["slice_name", "qid_gold", "qid_pred"])
    out = {r["slice_name"]: r for r in stats.slice_eval(df).collect()}
    assert out["s1"]["total"] == 2 and out["s1"]["correct"] == 1
    assert abs(out["s1"]["accuracy"] - 0.5) < 1e-9
    assert out["s2"]["accuracy"] == 1.0


def test_recall_at_k(spark):
    rows = [
        ("Q1", ["Q1", "Q2", "Q3"]),
        ("Q2", ["Q1", "Q2", "Q3"]),
        ("Q9", ["Q1", "Q2", "Q3"]),  # gold not in candidates
    ]
    df = spark.createDataFrame(rows, ["qid_gold", "cand_qids"])
    out = {r["k"]: r["recall"] for r in stats.recall_at_k(df).collect()}
    assert abs(out[1] - 1 / 3) < 1e-6
    assert abs(out[2] - 2 / 3) < 1e-6
    assert abs(out[3] - 2 / 3) < 1e-6


def test_qid_count_buckets(spark):
    df = spark.createDataFrame(
        [("Q1",)] * 10 + [("Q2",)] * 5 + [("Q3",)], ["qid"]
    )
    counts = stats.qid_counts(df)
    out = {r["qid"]: r for r in stats.qid_count_buckets(counts).collect()}
    assert out["Q3"]["bucket"] == 0  # minimum count → below no quantile
    assert out["Q1"]["bucket"] == 20  # maximum count → above all but the 1.0 quantile
    assert 0 < out["Q2"]["bucket"] < 20


def test_histograms(spark):
    m = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], ["doc_id", "alias"]
    )
    ac = {r["alias"]: r["cnt"] for r in stats.alias_counts(m).collect()}
    assert ac == {"a": 2, "b": 1}
    h = {r["n_mentions"]: r["n_docs"] for r in stats.mentions_per_doc_hist(m).collect()}
    assert h == {2: 1, 1: 1}
