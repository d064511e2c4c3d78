"""The end-to-end KG-construction pipeline (SURVEY.md §7.1):

pages → ① extract_text → ② mentions → ③ candidates → ④ link → ⑤ triples

plus the checkpoint-manifest materializer (north_rule: per-partition
lineage + throughput metrics, idempotent resume).

Equivalent reference flow: bootleg/run.py --mode dump_preds
(SURVEY.md §3.2) followed by relation joins; all of the reference's
multiprocessing harnesses collapse into this one declarative plan.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from bootleg_spark import synthspec as S
from bootleg_spark.functions.textproc import extract_html_text
from bootleg_spark.operators.candidates import attach_candidates
from bootleg_spark.operators.linking import (
    broadcast_entity_matrix,
    build_entity_embeddings,
    entity_strings,
    link_neural,
    link_popularity,
)
from bootleg_spark.operators.mentions import extract_mentions_ngram, extract_mentions_word
from bootleg_spark.operators.triples import doc_entities, triples_from_doc_entities
from bootleg_spark.sources.synth import build_dims, pages_table


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched boilerplate strip (deterministic per url)."""
    return html.map(extract_html_text)


def extract_text(pages: DataFrame) -> DataFrame:
    """① html → text_extracted. Column-pruned: downstream stages never
    touch ``html`` again, so the scan drops it after this projection."""
    return pages.withColumn("text_extracted", extract_text_udf(F.col("html")))


class KgPipeline:
    """Holds the broadcast artifacts (alias set, entity matrix) that the
    reference builds in BootlegAnnotator.__init__ (SURVEY.md §3.1 step 1)."""

    def __init__(self, spark: SparkSession, sf_dir: str, dim: int = S.EMB_DIM):
        self.spark = spark
        self.sf_dir = sf_dir
        self.dims = build_dims(spark, sf_dir)
        alias_rows = [r["alias"] for r in self.dims["aliases"].select("alias").collect()]
        self.alias_set_bc = spark.sparkContext.broadcast(frozenset(alias_rows))
        self.ent_strs = entity_strings(self.dims["entities"], self.dims["kg_relations"])
        self.emb_df = build_entity_embeddings(self.ent_strs, dim)
        self.ent_matrix_bc = broadcast_entity_matrix(spark, self.emb_df)

    def pages(self) -> DataFrame:
        return pages_table(self.spark, self.sf_dir)

    def linked(self, pages: DataFrame | None = None, extractor: str = "ngram", scorer: str = "neural") -> DataFrame:
        """② + ③ + ④ on an extracted-text pages frame.

        Column hygiene for the Python stages: after ① the plan carries
        only (url, doc_id, text_extracted) — html/text/warc_ts must never
        ride through Arrow into the mention/scoring UDFs (at 100 TB the
        html column alone is the table)."""
        p = extract_text(pages if pages is not None else self.pages()).select(
            "url", "doc_id", "text_extracted"
        )
        if extractor == "ngram":
            mentions = extract_mentions_ngram(p, self.alias_set_bc, text_col="text_extracted")
        elif extractor == "word":
            mentions = extract_mentions_word(p, self.dims["aliases"], text_col="text_extracted")
        else:
            raise ValueError(extractor)
        mc = attach_candidates(mentions, self.dims["alias_cands"])
        if scorer == "neural":
            if extractor == "word":
                raise ValueError("neural scorer needs char spans (ngram extractor)")
            return link_neural(mc, self.ent_matrix_bc, text_col="text_extracted")
        return link_popularity(mc)

    def triples(self, pages: DataFrame | None = None, extractor: str = "ngram", scorer: str = "neural") -> DataFrame:
        """⑤ co-occurrence pairs ⋈ relations → dedup'd (subj, pred, obj)."""
        linked = self.linked(pages, extractor, scorer)
        ents = doc_entities(linked, id_col="doc_id", qid_col="qid_pred")
        return triples_from_doc_entities(ents, self.dims["kg_relations"])


def materialize_triples(
    pipe: KgPipeline,
    out_dir: str,
    n_buckets: int = 4,
    resume: bool = True,
    extractor: str = "ngram",
    scorer: str = "neural",
) -> list[dict]:
    """Write triples bucketed by url-hash with a checkpoint manifest.

    Each bucket writes ``triples/bucket=<b>/`` (idempotent overwrite) and
    appends one manifest line (lineage + rows + pages/sec) to
    ``_manifest.jsonl``. On resume, completed buckets are skipped — the
    Spark-native version of the reference's skip-if-exists prep caching
    (bootleg/utils/data_utils.py:57-104). At cluster scale ``n_buckets``
    grows with the input so each bucket is one recoverable unit of work.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_manifest.jsonl")
    done = set()
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = {json.loads(line)["bucket"] for line in f if line.strip()}
    pages_all = pipe.pages().withColumn(
        "_bucket", F.pmod(F.hash("url"), F.lit(n_buckets))
    )
    records = []
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        bucket_pages = pages_all.where(F.col("_bucket") == b).drop("_bucket")
        n_pages = bucket_pages.count()
        tri = pipe.triples(bucket_pages, extractor, scorer)
        path = os.path.join(out_dir, "triples", f"bucket={b}")
        tri.write.mode("overwrite").parquet(path)
        n_rows = pipe.spark.read.parquet(path).count()
        dt = time.time() - t0
        rec = {
            "bucket": b,
            "pages": n_pages,
            "triples": n_rows,
            "seconds": round(dt, 3),
            "pages_per_sec": round(n_pages / dt, 2) if dt > 0 else None,
            "sf_dir": pipe.sf_dir,
            "extractor": extractor,
            "scorer": scorer,
        }
        with open(manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        records.append(rec)
    return records
