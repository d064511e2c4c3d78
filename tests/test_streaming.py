"""Streaming ingest: incremental triples == batch triples, idempotent."""

import os

import pyspark.sql.functions as F

from bootleg_spark.sources import synth
from bootleg_spark.streaming.ingest import start_triple_stream, triples_for_batch
from tests.conftest import SF_SMOKE


def test_stream_matches_batch_and_is_idempotent(spark, tmp_path):
    dims = synth.build_dims(spark, SF_SMOKE)
    docs = dims["documents"].select("doc_id", "text")

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    # two "crawl arrivals"
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(src + "/part1")
    docs.where(F.col("doc_id") % 2 == 1).write.parquet(src + "/part2")

    q = start_triple_stream(spark, src + "/*", out, dims, docs.schema)
    q.awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "triples"))
        .select("subj", "pred", "obj")
        .collect()
    }
    expected = {tuple(r) for r in triples_for_batch(docs, dims).collect()}
    assert got == expected and len(got) > 0

    # restart over the same source: availableNow + checkpoint → no new
    # files to process, and the anti-join merge keeps the store exact
    q2 = start_triple_stream(spark, src + "/*", out, dims, docs.schema)
    q2.awaitTermination(120)
    got2 = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "triples"))
        .select("subj", "pred", "obj")
        .collect()
    }
    assert got2 == expected


def test_merge_prunes_to_touched_buckets(spark, tmp_path):
    """The anti-join reads ONLY the store partitions whose bucket
    appears in the batch — per-batch read volume tracks the batch, not
    the store (exact-once preserved across 3 merges)."""
    from bootleg_spark.streaming.ingest import merge_new_triples

    store = str(tmp_path / "triples")
    mk = lambda rows: spark.createDataFrame(rows, ["subj", "pred", "obj"])

    b1 = [(f"Q{i}", "rel", f"Q{i+1}") for i in range(40)]
    touched1 = merge_new_triples(spark, mk(b1), store, n_buckets=64)
    # batch 2: one duplicate + one new triple -> touches few buckets
    b2 = [("Q0", "rel", "Q1"), ("X", "rel", "Y")]
    touched2 = merge_new_triples(spark, mk(b2), store, n_buckets=64)
    assert len(touched2) <= 2 < len(touched1)  # pruned read set
    # batch 3: pure replay of batch 2 -> nothing appended
    touched3 = merge_new_triples(spark, mk(b2), store, n_buckets=64)

    got = {
        tuple(r)
        for r in spark.read.parquet(store).select("subj", "pred", "obj").collect()
    }
    assert got == set(b1) | set(b2)
    # store stays partitioned by bucket on disk (pruning is real)
    assert any(p.startswith("bucket=") for p in os.listdir(store))
