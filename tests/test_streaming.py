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
