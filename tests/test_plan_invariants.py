"""Physical-plan regression guards — the PLANS.md audit as pytest.

The scale discipline this repo commits to (COVERAGE.md, PLANS.md
header) is checkable mechanically: dim joins must broadcast (never
sort-merge), Python must appear only where semantics require it, and
no row-data exchange may funnel to a single partition. These tests pin
those properties for the headline plans so a regression (a dropped
broadcast hint, an accidental UDF, a stats change flipping a join)
fails CI instead of waiting for a human to re-read PLANS.md."""

import contextlib
import io
import re

import pytest

from bootleg_spark.plans.pipeline import KgPipeline
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, name: str) -> int:
    """Count physical nodes by their detail headers — formatted explain
    prints every node twice (tree line + '(N) Name' detail block)."""
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.M))


@pytest.fixture(scope="module")
def pipe(spark):
    return KgPipeline(spark, SF_SMOKE)


def test_fused_pipeline_is_one_python_pass(spark, pipe):
    p = plan_of(pipe.triples())
    assert n_nodes(p, "MapInPandas") == 1  # extract+mention+score+emit fused
    assert "ArrowEvalPython" not in p  # no stray row/batch UDF nodes
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_relational_linking_has_zero_python(spark, pipe):
    """The all-JVM fact path (extract → match → score) must introduce
    no Python nodes. The candidate-embedding DIM build legitimately
    runs the encoder UDF once (and is cached in the pipeline); here
    the dim is pre-materialized into a literal frame so the plan under
    test is exactly the per-page fact path."""
    from pyspark.sql import functions as F

    from bootleg_spark.operators import jvm_link
    from bootleg_spark.operators.mentions import extract_mentions_ngram_relational

    flat = pipe._cand_embs()
    flat_local = spark.createDataFrame(flat.collect(), flat.schema)
    pages = pipe.pages().select(
        "url", "doc_id", jvm_link.html_text_expr(F.col("html")).alias("te")
    )
    mentions = extract_mentions_ngram_relational(
        pages, pipe.dims["aliases"], text_col="te", keep_arr=True
    )
    scored = jvm_link.score_mentions_relational(mentions, flat_local)
    p = plan_of(scored)
    assert "MapInPandas" not in p
    assert "ArrowEvalPython" not in p
    assert "BatchEvalPython" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p  # dict + candidate dims broadcast


def test_staged_popularity_triples_broadcast_dims(spark, pipe):
    p = plan_of(pipe.triples(extractor="word", scorer="popularity", fused=False))
    assert "BroadcastHashJoin" in p  # alias dict + relations stay broadcast
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_no_single_partition_row_funnel(spark, pipe):
    """SinglePartition exchanges may only merge global scalar
    aggregates (one partial row per upstream partition), never row
    data. Every headline plan's SinglePartition must sit directly
    above a partial aggregate."""
    for df in (
        pipe.triples(),
        pipe.linked_relational(),
        pipe.triples(extractor="word", scorer="popularity", fused=False),
    ):
        p = plan_of(df)
        # formatted explain lists arguments per node; find exchanges
        for block in p.split("\n\n"):
            if "Arguments: SinglePartition" in block:
                # the only producer feeding a SinglePartition exchange
                # in these plans is a partial count aggregation
                assert "count" in p.lower(), block


def test_hygiene_ops_are_codegen_projections(spark):
    from bootleg_spark.operators import textclean
    from bootleg_spark.sources.synth import read_documents

    docs = read_documents(spark, SF_SMOKE)
    # the source itself may carry the r07 scan fan-out exchange (a
    # deliberate, scale-guarded repartition of tiny single-row-group
    # inputs — session.fan_scan); the invariant is that the OP adds none
    base_exchanges = n_nodes(plan_of(docs), "Exchange")
    for df in (textclean.scrub_pii(docs),):
        p = plan_of(df)
        assert "MapInPandas" not in p and "ArrowEvalPython" not in p
        assert n_nodes(p, "Exchange") == base_exchanges  # scan→project, no own shuffle


def test_curation_plan_shapes(spark):
    """The r05 curation ops keep their promised shapes: no Python
    anywhere, no sort-merge joins, exchange counts matching the
    docstring plan descriptions."""
    from pyspark.sql import functions as F

    from bootleg_spark.operators.curation import (
        cap_per_domain,
        quality_percentile_filter,
        tfidf_top_terms,
    )
    from bootleg_spark.sources.synth import read_documents

    docs = read_documents(spark, SF_SMOKE)
    # discount the r07 scan fan-out exchange (see
    # test_hygiene_ops_are_codegen_projections): each op's documented
    # exchange count is what it ADDS over its input
    base_exchanges = n_nodes(plan_of(docs), "Exchange")
    with_url = docs.select(
        "doc_id",
        F.concat(F.lit("https://s"), (F.col("doc_id") % 7).cast("string"), F.lit(".org/p")).alias("url"),
        F.length("text").cast("double").alias("quality"),
        "text",
        "lang",
    )
    # domain cap: ONE hash exchange (on domain) + the window sort
    p = plan_of(cap_per_domain(with_url, 3, quality_col="quality"))
    assert n_nodes(p, "Exchange") == base_exchanges + 1
    assert "MapInPandas" not in p and "ArrowEvalPython" not in p
    assert "SortMergeJoin" not in p
    # percentile filter: ONE hash exchange (on stratum) + window
    p = plan_of(quality_percentile_filter(docs, 0.5))
    assert n_nodes(p, "Exchange") == base_exchanges + 1
    assert "MapInPandas" not in p and "ArrowEvalPython" not in p
    # tfidf: pair-count agg + df-dim agg + join + per-doc window; the
    # corpus-N scalar must come in via a broadcast, the term join must
    # not sort-merge, and partial aggregation must be present
    df = tfidf_top_terms(docs, k=3)
    p = plan_of(df)
    assert "SortMergeJoin" not in p
    assert n_nodes(p, "BroadcastExchange") >= 1  # the N scalar (+ maybe dim)
    assert "partial_count" in p or "HashAggregate" in p
    assert "MapInPandas" not in p and "ArrowEvalPython" not in p
