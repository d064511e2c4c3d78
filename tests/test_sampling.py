"""Mixture sampling + sequence packing invariants (operators/sampling.py)."""

from pyspark.sql import functions as F

from bootleg_spark.operators.sampling import mix_corpus, pack_token_spans
from bootleg_spark.sources.synth import read_documents
from tests.conftest import SF_SMOKE


def test_mixture_weights_and_determinism(spark):
    docs = read_documents(spark, SF_SMOKE).select("doc_id", "lang")
    weights = {"en": 2.4, "de": 0.5, "zh": 1.0}
    out = mix_corpus(docs, weights, seed=7)
    rows = out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in rows}
    assert set(got) == set(weights)  # fr/es dropped entirely
    for lang, w in weights.items():
        # realized rate within ±0.35 of the weight on the small corpus
        assert abs(got[lang] / base[lang] - w) < 0.35, (lang, got[lang], base[lang])
    # copies are indexed 0..k-1 per kept row
    en = out.where("lang = 'en'").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("_copy")).alias("cs"), F.count(F.lit(1)).alias("k")
    )
    assert en.where(F.col("cs") != F.sequence(F.lit(0), F.col("k") - 1)).count() == 0
    # deterministic: identical second run
    again = {tuple(r) for r in mix_corpus(docs, weights, seed=7).collect()}
    assert again == {tuple(r) for r in out.collect()}
    # different seed ⇒ different draw set for the fractional strata
    other = {tuple(r) for r in mix_corpus(docs, weights, seed=8).collect()}
    assert other != again


def test_pack_spans_cover_every_token_exactly_once(spark):
    docs = read_documents(spark, SF_SMOKE)
    budget = 128
    out = pack_token_spans(docs, budget=budget, n_buckets=8).collect()
    n_by_doc = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in docs.select("doc_id", "text").collect()
        if len(r["text"].split(" ")) > 0
    }
    # per doc: sub-spans are disjoint, contiguous, and cover [0, n)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_by_doc)
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r["doc_tok_start"])
        assert spans[0]["doc_tok_start"] == 0
        assert spans[-1]["doc_tok_end"] == n_by_doc[doc_id]
        for a, b in zip(spans, spans[1:]):
            assert a["doc_tok_end"] == b["doc_tok_start"]
            assert b["pack_id"] == a["pack_id"] + 1  # consecutive packs
    # per pack: spans tile [0, budget) exactly (except each bucket's last pack)
    by_pack = {}
    for r in out:
        by_pack.setdefault((r["bucket"], r["pack_id"]), []).append(r)
    last_pack = {}
    for (bucket, pid) in by_pack:
        last_pack[bucket] = max(last_pack.get(bucket, -1), pid)
    for (bucket, pid), spans in by_pack.items():
        spans.sort(key=lambda r: r["pack_tok_start"])
        assert spans[0]["pack_tok_start"] == 0
        total = sum(r["doc_tok_end"] - r["doc_tok_start"] for r in spans)
        pos = 0
        for r in spans:
            assert r["pack_tok_start"] == pos
            pos += r["doc_tok_end"] - r["doc_tok_start"]
        if pid < last_pack[bucket]:
            assert total == budget
        else:
            assert 0 < total <= budget


def test_chunk_windows_cover_and_overlap(spark):
    from bootleg_spark.operators.sampling import chunk_token_windows

    docs = read_documents(spark, SF_SMOKE)
    size, stride = 32, 24
    out = chunk_token_windows(docs, size=size, stride=stride).collect()
    n_by_doc = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in docs.select("doc_id", "text").collect()
        if r["text"]
    }
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    assert set(by_doc) == set(n_by_doc)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = n_by_doc[doc_id]
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["tok_start"] == i * stride
            assert c["tok_end"] == min(n, i * stride + size)
            assert len(c["chunk"].split(" ")) == c["tok_end"] - c["tok_start"]
        # every token position covered; consecutive windows overlap by
        # size - stride (until the tail)
        assert chunks[-1]["tok_end"] == n
        assert chunks[0]["tok_start"] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b["tok_start"] - a["tok_start"] == stride
            assert a["tok_end"] > b["tok_start"]  # genuine overlap
