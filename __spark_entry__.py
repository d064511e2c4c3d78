"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions) as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-runnable ANSI-SQL equivalent for every
relationally-expressible one. Non-SQL-expressible stages (the n-gram
mention UDF, the neural scorer, SimHash) ship without an oracle and are
covered by pytest goldens instead (tests/).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bootleg_spark import oracle as O
from bootleg_spark import synthspec as S
from bootleg_spark.operators import dedup, similarity, stats, textstats
from bootleg_spark.operators.candidates import attach_candidates
from bootleg_spark.operators.linking import link_popularity
from bootleg_spark.operators.mentions import extract_mentions_word
from bootleg_spark.operators.triples import doc_entities, triples_from_doc_entities
from bootleg_spark.plans.pipeline import KgPipeline, extract_text
from bootleg_spark.sources import synth

_PIPE_CACHE: dict[tuple[str, str], KgPipeline] = {}


def _pipe(spark: SparkSession, sf_dir: str) -> KgPipeline:
    key = (str(id(spark)), sf_dir)
    if key not in _PIPE_CACHE:
        _PIPE_CACHE[key] = KgPipeline(spark, sf_dir)
    return _PIPE_CACHE[key]


def _docs(spark, sf_dir):
    return synth.read_documents(spark, sf_dir)


def _dims(spark, sf_dir):
    return synth.build_dims(spark, sf_dir)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline (pages → ngram mentions → candidates →
    neural disambiguation → co-occurrence ⋈ relations → dedup'd triples)
    at sf0.001."""
    return _pipe(spark, "/root/testdata/sf0.001").triples()


# --------------------------------------------------------------------------
# Spark queries
# --------------------------------------------------------------------------

def _q_pages_extract_text(spark, sf_dir):
    p = extract_text(synth.pages_table(spark, sf_dir))
    return p.select("url", F.col("text_extracted").alias("extracted"))


def _q_alias_vocab(spark, sf_dir):
    return synth.alias_vocab(_docs(spark, sf_dir))


def _q_entities_dim(spark, sf_dir):
    return _dims(spark, sf_dir)["entities"].select(
        "qid", "qnum", "alias", "alias_id", "variant", "score", "type_name", "title", "descr"
    )


def _q_alias_cands_topk(spark, sf_dir):
    return _dims(spark, sf_dir)["alias_cands"].select("alias", "qid", "score", "rank")


def _q_kg_relations_dim(spark, sf_dir):
    return _dims(spark, sf_dir)["kg_relations"].select("subj_qid", "rel", "obj_qid")


def _word_mentions(spark, sf_dir):
    d = _dims(spark, sf_dir)
    m = extract_mentions_word(d["documents"].select("doc_id", "text"), d["aliases"])
    return m.select("doc_id", F.col("mention_pos").cast("long").alias("mention_pos"), "alias"), d


def _q_mentions_word(spark, sf_dir):
    m, _ = _word_mentions(spark, sf_dir)
    return m


def _linked_pop(spark, sf_dir):
    m, d = _word_mentions(spark, sf_dir)
    mc = attach_candidates(m, d["alias_cands"])
    return link_popularity(mc).select("doc_id", "mention_pos", "alias", F.col("qid_pred").alias("qid")), d


def _q_linked_popularity(spark, sf_dir):
    linked, _ = _linked_pop(spark, sf_dir)
    return linked


def _q_triples_popularity(spark, sf_dir):
    linked, d = _linked_pop(spark, sf_dir)
    ents = doc_entities(linked, id_col="doc_id", qid_col="qid")
    return triples_from_doc_entities(ents, d["kg_relations"])


def _q_qid_counts(spark, sf_dir):
    linked, _ = _linked_pop(spark, sf_dir)
    return stats.qid_counts(linked, qid_col="qid")


def _q_alias_histogram(spark, sf_dir):
    m, _ = _word_mentions(spark, sf_dir)
    return stats.alias_counts(m)


def _q_mentions_per_doc_hist(spark, sf_dir):
    m, _ = _word_mentions(spark, sf_dir)
    return stats.mentions_per_doc_hist(m)


def _q_cand_count_hist(spark, sf_dir):
    return stats.cand_count_hist(_dims(spark, sf_dir)["alias_cands"])


def _q_qid_count_buckets(spark, sf_dir):
    linked, _ = _linked_pop(spark, sf_dir)
    return stats.qid_count_buckets(stats.qid_counts(linked, qid_col="qid"))


def _gold_qid():
    return F.concat(F.lit("Q"), (F.col("alias_id") * S.N_VARIANTS).cast("string"))


def _q_slice_eval(spark, sf_dir):
    linked, d = _linked_pop(spark, sf_dir)
    with_gold = linked.join(F.broadcast(d["aliases"]), "alias").withColumn(
        "qid_gold", _gold_qid()
    )
    with_slice = with_gold.join(
        d["documents"].select("doc_id", F.col("lang").alias("slice_name")), "doc_id"
    )
    return stats.slice_eval(with_slice, gold_col="qid_gold", pred_col="qid", slice_col="slice_name")


def _q_recall_at_k(spark, sf_dir):
    m, d = _word_mentions(spark, sf_dir)
    mc = attach_candidates(m, d["alias_cands"])
    with_gold = mc.join(F.broadcast(d["aliases"]), "alias").withColumn("qid_gold", _gold_qid())
    return stats.recall_at_k(with_gold)


def _q_entity_strings(spark, sf_dir):
    return _pipe(spark, sf_dir).ent_strs.select("qid", "ent_str")


def _q_entity_strings_multi(spark, sf_dir):
    """Entity strings over a NAMED multi-type system: the 'hyena' system
    of the synthetic profile carries 3 typenames per entity and the
    4-word [ent_type] budget keeps exactly 2 — pinning both the
    multi-type composition and structural_entity_str truncation
    (dataset.py:227-337) in SQL."""
    from bootleg_spark import synthspec as S2
    from bootleg_spark.functions.textproc import EntityStringConstants
    from bootleg_spark.operators.linking import entity_strings
    from bootleg_spark.sources.profile import profile_entity_types

    d = _dims(spark, sf_dir)
    etypes = profile_entity_types(_profile(spark, sf_dir), max_types=10)
    consts = EntityStringConstants(max_ent_kg_len=S2.MAX_ENT_KG_LEN, max_ent_type_len=4)
    return entity_strings(
        d["entities"], d["kg_relations"], entity_types=etypes,
        type_system="hyena", constants=consts,
    ).select("qid", "ent_str")


def _q_mentions_ngram(spark, sf_dir):
    pipe = _pipe(spark, sf_dir)
    p = extract_text(pipe.pages())
    from bootleg_spark.operators.mentions import extract_mentions_ngram

    m = extract_mentions_ngram(p, pipe.alias_set_bc, text_col="text_extracted")
    return m.select(
        "url",
        F.col("mention_pos").cast("long").alias("mention_pos"),
        "alias",
        F.col("char_start").cast("long").alias("char_start"),
        F.col("char_end").cast("long").alias("char_end"),
    )


def _q_linked_neural(spark, sf_dir):
    pipe = _pipe(spark, sf_dir)
    linked = pipe.linked(extractor="ngram", scorer="neural")
    return linked.select(
        "url",
        F.col("mention_pos").cast("long").alias("mention_pos"),
        "alias",
        F.col("qid_pred").alias("qid"),
        F.round("prob", 6).alias("prob"),
    )


def _q_triples_neural(spark, sf_dir):
    return _pipe(spark, sf_dir).triples()


def _q_context_windows(spark, sf_dir):
    """Context-window extraction (dataset.py:173-224) over word mentions,
    with char spans derived relationally — the oracle re-implements the
    window arithmetic independently in SQL list ops, pinning the UDF."""
    from pyspark.sql.types import StringType

    from bootleg_spark.functions.textproc import extract_context

    m, d = _word_mentions(spark, sf_dir)
    joined = m.join(d["documents"].select("doc_id", "text"), "doc_id")
    words = F.split(F.col("text"), " ")
    p = F.col("mention_pos").cast("int")
    char_start = F.when(p == 0, F.lit(0)).otherwise(
        F.length(F.concat_ws(" ", F.slice(words, F.lit(1), p))) + 1
    )
    char_end = char_start + F.length(F.element_at(words, p + 1))

    @F.pandas_udf(StringType())
    def _ctx(text: pd.Series, cs: pd.Series, ce: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_context((int(a), int(b)), t, 64) for t, a, b in zip(text, cs, ce)]
        )

    return joined.select(
        "doc_id",
        "mention_pos",
        _ctx(F.col("text"), char_start, char_end).alias("context"),
    )


def _q_relations_between(spark, sf_dir):
    # '|'-joined rel list: driver-canonicalizable scalar (the operator's
    # native array shape is kept for API users; see stats.relations_between)
    return stats.relations_between(_dims(spark, sf_dir)["kg_relations"]).select(
        "subj_qid", "obj_qid", F.concat_ws("|", "rels").alias("rels")
    )


def _q_uniqueness_check(spark, sf_dir):
    m, _ = _word_mentions(spark, sf_dir)
    return stats.duplicate_key_count(m, ["doc_id", "mention_pos"])


def _q_slice_sampling(spark, sf_dir):
    linked, d = _linked_pop(spark, sf_dir)
    with_slice = linked.join(
        d["documents"].select("doc_id", F.col("lang").alias("slice_name")), "doc_id"
    )
    return stats.slice_sampling_stats(with_slice)


def _q_ann_ivf_topk(spark, sf_dir):
    return similarity.ivf_topk(_emb(spark, sf_dir))


def _q_candidates_with_nc(spark, sf_dir):
    """Padded candidate arrays with the NC (not-in-candidates) slot
    prepended — the train_in_candidates=False shape
    (eval_utils.py:59-114: NC→eid 0, "-1" pad→eid 1)."""
    from bootleg_spark.operators.candidates import grouped_candidates

    d = _dims(spark, sf_dir)
    g = grouped_candidates(d["alias_cands"])
    nc = g.select(
        "alias",
        F.concat(F.array(F.lit("NC")), "cand_qids").alias("cand_qids"),
        F.concat(F.array(F.lit(0).cast("long")), "cand_eids").alias("cand_eids"),
    )
    # stringify arrays so the driver canonicalizer can hash them
    return nc.select(
        "alias",
        F.concat_ws("|", "cand_qids").alias("cand_qids"),
        F.concat_ws("|", F.transform("cand_eids", lambda x: x.cast("string"))).alias("cand_eids"),
    )


def _q_predictions_writeback(spark, sf_dir):
    from bootleg_spark.operators.predictions import merge_predictions

    linked, _ = _linked_pop(spark, sf_dir)
    merged = merge_predictions(linked, qid_col="qid")
    # stringify the per-doc arrays for the driver canonicalizer
    return merged.select(
        "doc_id",
        F.concat_ws("|", "aliases").alias("aliases"),
        F.concat_ws("|", "qids").alias("qids"),
    )


def _q_prune_to_entities(spark, sf_dir):
    from bootleg_spark.operators.predictions import prune_to_entities

    linked, d = _linked_pop(spark, sf_dir)
    keep = linked.select("qid").distinct()
    return prune_to_entities(d["entities"], keep).select("qid", "new_eid")


def _q_mentions_gold_filter(spark, sf_dir):
    from bootleg_spark.operators.predictions import filter_weak_labels

    m, _ = _word_mentions(spark, sf_dir)
    with_gold = m.withColumn("gold", F.col("mention_pos") % 2 == 0)
    return filter_weak_labels(with_gold).select("doc_id", "mention_pos", "alias")


def _q_media_metadata(spark, sf_dir):
    from bootleg_spark.operators.multimodal import media_metadata

    return media_metadata(synth.pages_table(spark, sf_dir), bin_col="html", id_col="url")


def _q_media_features(spark, sf_dir):
    from bootleg_spark.operators.multimodal import extract_media_features

    feats = extract_media_features(synth.pages_table(spark, sf_dir))
    # explode the feature vector to (id, bucket, feat_val) scalar rows so
    # the driver canonicalizer can sort/hash them
    return feats.select("id", F.posexplode("feat").alias("bucket", "feat_val")).select(
        "id", F.col("bucket").cast("long").alias("bucket"), F.round("feat_val", 6).alias("feat_val")
    )


def _profile(spark, sf_dir):
    return synth.synthetic_profile(spark, sf_dir)


def _q_profile_entities_dim(spark, sf_dir):
    from bootleg_spark.sources.profile import profile_entities

    return profile_entities(_profile(spark, sf_dir)).select("qid", "eid", "title", "descr")


def _q_profile_alias_cands(spark, sf_dir):
    from bootleg_spark.sources.profile import profile_alias_candidates

    return profile_alias_candidates(_profile(spark, sf_dir)).select(
        "alias", "qid", "score", "rank"
    )


def _q_profile_entity_types(spark, sf_dir):
    from bootleg_spark.sources.profile import profile_entity_types

    t = profile_entity_types(_profile(spark, sf_dir), max_types=2)
    return t.select("qid", "type_system", F.posexplode("typenames").alias("type_pos", "type_name")).select(
        "qid", "type_system", F.col("type_pos").cast("long").alias("type_pos"), "type_name"
    )


def _q_profile_kg_relations(spark, sf_dir):
    from bootleg_spark.sources.profile import profile_kg_relations

    # max_connections=1 so the per-(qid, rel) truncation actually drops
    # rows on this corpus (246 of 261 groups carry 2 objects)
    return profile_kg_relations(_profile(spark, sf_dir), max_connections=1)


def _q_dedup_exact(spark, sf_dir):
    return dedup.dedup_exact(_docs(spark, sf_dir))


def _q_minhash_bands(spark, sf_dir):
    return dedup.minhash_band_buckets(_docs(spark, sf_dir)).select(
        F.col("id").cast("long").alias("id"), F.col("band").cast("long").alias("band"), "min_hash"
    )


def _q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir)).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )


def _q_ngram_jaccard_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.2).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "n_inter", "n_a", "n_b", "jaccard"
    )


def _q_minhash_verified_pairs(spark, sf_dir):
    return dedup.minhash_verified_pairs(_docs(spark, sf_dir), threshold=0.2).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard"
    )


def _q_simhash_near_pairs(spark, sf_dir):
    return dedup.simhash_near_pairs(_docs(spark, sf_dir)).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )


def _q_ann_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk_bruteforce(_emb(spark, sf_dir))


def _q_ann_signbit_lsh(spark, sf_dir):
    return similarity.signbit_lsh_topk(_emb(spark, sf_dir))


def _q_events_sessions(spark, sf_dir):
    from bootleg_spark.operators.sessions import sessionize

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(events)


def _q_lang_id(spark, sf_dir):
    return textstats.lang_id_heuristic(_docs(spark, sf_dir))


def _q_token_counts(spark, sf_dir):
    return textstats.token_counts(_docs(spark, sf_dir))


def _q_quality_scores(spark, sf_dir):
    return textstats.quality_scores(_docs(spark, sf_dir))


def _q_doc_fingerprints(spark, sf_dir):
    return textstats.doc_fingerprints(_docs(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # ① text extraction (byte-identical per url)
        "pages_extract_text": _q_pages_extract_text,
        # dim-table build (entity profile → alias/entity/candidate/KG dims)
        "alias_vocab": _q_alias_vocab,
        "entities_dim": _q_entities_dim,
        "alias_cands_topk": _q_alias_cands_topk,
        "kg_relations_dim": _q_kg_relations_dim,
        # ② mention extraction
        "mentions_word": _q_mentions_word,
        "mentions_ngram": _q_mentions_ngram,
        # ③/④ linking
        "linked_popularity": _q_linked_popularity,
        "linked_neural": _q_linked_neural,  # no oracle: neural scorer
        # ⑤ triples
        "triples_popularity": _q_triples_popularity,
        "triples_neural": _q_triples_neural,  # no oracle
        # entity strings (feature construction)
        "entity_strings": _q_entity_strings,
        "entity_strings_multi": _q_entity_strings_multi,
        # aggregations (SURVEY §2.4)
        "qid_counts": _q_qid_counts,
        "alias_histogram": _q_alias_histogram,
        "mentions_per_doc_hist": _q_mentions_per_doc_hist,
        "cand_count_hist": _q_cand_count_hist,
        "qid_count_buckets": _q_qid_count_buckets,
        "slice_eval": _q_slice_eval,
        "recall_at_k": _q_recall_at_k,
        # feature construction: context windows (oracle-pinned UDF)
        "context_windows": _q_context_windows,
        # KG lookups / verification / sampling
        "relations_between": _q_relations_between,
        "uniqueness_check": _q_uniqueness_check,
        "slice_sampling": _q_slice_sampling,
        # candidate arrays with NC slot (train_in_candidates=False shape)
        "candidates_with_nc": _q_candidates_with_nc,
        # prediction assembly / write-back + filters + pruning
        "predictions_writeback": _q_predictions_writeback,
        "prune_to_entities": _q_prune_to_entities,
        "mentions_gold_filter": _q_mentions_gold_filter,
        # entity-profile JSONL ingestion path (profile → dim tables;
        # entity_profile.py:146-204 re-expressed relationally)
        "profile_entities_dim": _q_profile_entities_dim,
        "profile_alias_cands": _q_profile_alias_cands,
        "profile_entity_types": _q_profile_entity_types,
        "profile_kg_relations": _q_profile_kg_relations,
        # multimodal binary-column plumbing
        "media_metadata": _q_media_metadata,
        "media_features": _q_media_features,
        # dedup suite
        "dedup_exact": _q_dedup_exact,
        "minhash_bands": _q_minhash_bands,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "minhash_verified_pairs": _q_minhash_verified_pairs,
        "simhash_near_pairs": _q_simhash_near_pairs,
        # similarity search
        "ann_cosine_topk": _q_ann_cosine_topk,
        "ann_signbit_lsh": _q_ann_signbit_lsh,
        "ann_ivf_topk": _q_ann_ivf_topk,
        # event-time sessionization (window functions over the stream table)
        "events_sessions": _q_events_sessions,
        # text analysis
        "lang_id": _q_lang_id,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality_scores,
        "doc_fingerprints": _q_doc_fingerprints,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    gold_expr = f"'Q' || CAST(alias_id * {S.N_VARIANTS} AS BIGINT)"
    qs = ",".join(str(i / 20) for i in range(21))
    return {
        "pages_extract_text": (
            f"SELECT '{S.URL_PREFIX}' || lang || '/' || CAST(doc_id AS VARCHAR) AS url, "
            "text AS extracted FROM documents"
        ),
        "alias_vocab": O.with_ctes(O.WORDS, O.ALIASES, final="SELECT alias, alias_id FROM aliases"),
        "entities_dim": O.with_ctes(
            *O.BASE[:3],
            final="SELECT qid, qnum, alias, alias_id, variant, score, type_name, title, descr FROM entities",
        ),
        "alias_cands_topk": O.with_ctes(
            *O.BASE[:4], final="SELECT alias, qid, score, rank FROM alias_cands"
        ),
        "kg_relations_dim": O.with_ctes(
            *O.BASE, final="SELECT subj_qid, rel, obj_qid FROM kg_relations"
        ),
        "mentions_word": O.with_ctes(
            O.WORDS, O.ALIASES, O.MENTIONS, final="SELECT doc_id, mention_pos, alias FROM mentions"
        ),
        # Independent relational model of the n-gram extractor, valid for
        # this corpus (single-token lowercase aliases, no punctuation):
        # a token is a mention iff it is noun-ish (non-stopword,
        # non-numeric), NOT split-noun-suppressed (no noun-ish neighbor),
        # not a stopword boundary, and in the alias dict. Multi-token
        # n-gram passes can never match a 1-token dictionary (the
        # possessive-merge exception needs apostrophes, absent here).
        "mentions_ngram": O.with_ctes(
            O.WORDS, O.ALIASES,
            f"""
keepflags AS (
  SELECT doc_id, mention_pos AS p, word,
         (word NOT IN ({O._STOPLIST_SQL})
          AND NOT regexp_matches(word, '^[0-9]+$')
          AND len(word) > 0) AS nounish
  FROM words
),
kept AS (
  SELECT k.doc_id, k.p, k.word
  FROM keepflags k
  LEFT JOIN keepflags l ON l.doc_id = k.doc_id AND l.p = k.p - 1
  LEFT JOIN keepflags r ON r.doc_id = k.doc_id AND r.p = k.p + 1
  WHERE k.nounish
    AND NOT coalesce(l.nounish, FALSE)
    AND NOT coalesce(r.nounish, FALSE)
    AND k.word NOT IN ({O._STOPLIST_SQL})
    AND k.word IN (SELECT alias FROM aliases)
),
spans AS (
  SELECT k.doc_id, k.p, k.word,
         CAST(CASE WHEN k.p = 0 THEN 0
              ELSE strlen(array_to_string(list_slice(string_split(d.text, ' '), 1, k.p), ' ')) + 1
         END AS BIGINT) AS char_start
  FROM kept k JOIN documents d ON k.doc_id = d.doc_id
)
""",
            final=f"""SELECT '{S.URL_PREFIX}' || d.lang || '/' || CAST(s.doc_id AS VARCHAR) AS url,
       CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY s.char_start) - 1 AS BIGINT) AS mention_pos,
       s.word AS alias,
       s.char_start,
       s.char_start + strlen(s.word) AS char_end
FROM spans s JOIN documents d ON s.doc_id = d.doc_id""",
        ),
        "linked_popularity": O.with_ctes(
            *O.BASE[:4], O.MENTIONS, O.LINKED,
            final="SELECT doc_id, mention_pos, alias, qid FROM linked",
        ),
        "triples_popularity": O.with_ctes(
            *O.PIPELINE, final="SELECT subj, pred, obj FROM triples"
        ),
        "qid_counts": O.with_ctes(
            *O.BASE[:4], O.MENTIONS, O.LINKED,
            final="SELECT qid, CAST(count(*) AS BIGINT) AS cnt FROM linked GROUP BY qid",
        ),
        "alias_histogram": O.with_ctes(
            O.WORDS, O.ALIASES, O.MENTIONS,
            final="SELECT alias, CAST(count(*) AS BIGINT) AS cnt FROM mentions GROUP BY alias",
        ),
        "mentions_per_doc_hist": O.with_ctes(
            O.WORDS, O.ALIASES, O.MENTIONS,
            final=(
                "SELECT CAST(n_mentions AS BIGINT) AS n_mentions, CAST(count(*) AS BIGINT) AS n_docs FROM "
                "(SELECT doc_id, count(*) AS n_mentions FROM mentions GROUP BY doc_id) GROUP BY n_mentions"
            ),
        ),
        "cand_count_hist": O.with_ctes(
            *O.BASE[:4],
            final=(
                "SELECT CAST(n_cands AS BIGINT) AS n_cands, CAST(count(*) AS BIGINT) AS n_aliases FROM "
                "(SELECT alias, count(*) AS n_cands FROM alias_cands GROUP BY alias) GROUP BY n_cands"
            ),
        ),
        "qid_count_buckets": O.with_ctes(
            *O.BASE[:4], O.MENTIONS, O.LINKED,
            final=f"""SELECT qid, cnt, CAST(len(list_filter(qv, v -> v < cnt)) AS BIGINT) AS bucket
FROM (SELECT qid, CAST(count(*) AS BIGINT) AS cnt FROM linked GROUP BY qid) c
CROSS JOIN (SELECT quantile_cont(cnt, [{qs}]) AS qv FROM
            (SELECT CAST(count(*) AS BIGINT) AS cnt FROM linked GROUP BY qid)) q""",
        ),
        "slice_eval": O.with_ctes(
            *O.BASE[:4], O.MENTIONS, O.LINKED,
            final=f"""SELECT d.lang AS slice_name,
       CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN l.qid = {gold_expr} THEN 1 ELSE 0 END) AS BIGINT) AS correct,
       round(sum(CASE WHEN l.qid = {gold_expr} THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS accuracy
FROM linked l JOIN aliases a ON l.alias = a.alias JOIN documents d ON l.doc_id = d.doc_id
GROUP BY d.lang""",
        ),
        "recall_at_k": O.with_ctes(
            *O.BASE[:4], O.MENTIONS,
            f"""
ranked AS (
  SELECT m.doc_id, m.mention_pos, c.rank
  FROM mentions m
  JOIN aliases a ON m.alias = a.alias
  LEFT JOIN alias_cands c ON m.alias = c.alias AND c.qid = {gold_expr}
)""",
            final="""SELECT CAST(k.k AS BIGINT) AS k,
       round(avg(CASE WHEN rank IS NOT NULL AND rank <= k.k THEN 1.0 ELSE 0.0 END), 6) AS recall
FROM ranked CROSS JOIN (VALUES (1), (2), (3)) k(k) GROUP BY k.k""",
        ),
        "entity_strings": O.with_ctes(
            *O.BASE,
            final="""SELECT e.qid,
  trim(regexp_replace(
    trim(regexp_replace(e.title, '\\(.*\\)', '')) ||
    ' [ent_type] ' || e.type_name ||
    ' [ent_kg] ' || coalesce(kg.items, '') ||
    ' [ent_desc] ' || e.descr,
    ' +', ' ', 'g')) AS ent_str
FROM entities e
LEFT JOIN (
  SELECT k.subj_qid AS qid,
         string_agg(k.rel || ' ' || t.title, ' [ent_kg] ' ORDER BY k.rel, k.obj_qnum) AS items
  FROM kg_relations k JOIN entities t ON k.obj_qid = t.qid
  GROUP BY k.subj_qid
) kg ON e.qid = kg.qid""",
        ),
        # hyena types = [type_name, 'generic', 'thing']; 4-word budget
        # keeps the first 2 -> ' [ent_type] t [ent_type] generic'
        "entity_strings_multi": O.with_ctes(
            *O.BASE,
            final="""SELECT e.qid,
  trim(regexp_replace(
    trim(regexp_replace(e.title, '\\(.*\\)', '')) ||
    ' [ent_type] ' || e.type_name || ' [ent_type] generic' ||
    ' [ent_kg] ' || coalesce(kg.items, '') ||
    ' [ent_desc] ' || e.descr,
    ' +', ' ', 'g')) AS ent_str
FROM entities e
LEFT JOIN (
  SELECT k.subj_qid AS qid,
         string_agg(k.rel || ' ' || t.title, ' [ent_kg] ' ORDER BY k.rel, k.obj_qnum) AS items
  FROM kg_relations k JOIN entities t ON k.obj_qid = t.qid
  GROUP BY k.subj_qid
) kg ON e.qid = kg.qid""",
        ),
        "context_windows": O.with_ctes(
            O.WORDS, O.ALIASES, O.MENTIONS,
            """
ctx AS (
  SELECT m.doc_id, m.mention_pos,
         string_split(d.text, ' ') AS ws,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n,
         m.mention_pos AS p
  FROM mentions m JOIN documents d ON m.doc_id = d.doc_id
),
toks AS (
  SELECT doc_id, mention_pos, n, p,
         list_slice(ws, 1, p) || ['[ent_start]', ws[p + 1], '[ent_end]']
           || list_slice(ws, p + 2, n) AS t
  FROM ctx
),
win AS (
  SELECT doc_id, mention_pos,
    CASE WHEN p < n - 1 - p THEN
      array_to_string(
        list_slice(t, greatest(p - 32, 0) + 1, p)
        || list_slice(t, p + 1, least(p + 3 + 64 - (p - greatest(p - 32, 0)), n + 2)),
        ' ')
    ELSE
      array_to_string(
        list_slice(t, greatest(p - (64 - (least(p + 3 + 32, n + 2) - (p + 3))), 0) + 1, p + 3)
        || list_slice(t, p + 4, least(p + 3 + 32, n + 2)),
        ' ')
    END AS context
  FROM toks
)""",
            final="SELECT doc_id, mention_pos, context FROM win",
        ),
        "relations_between": O.with_ctes(
            *O.BASE,
            final="""SELECT subj_qid, obj_qid, string_agg(rel, '|' ORDER BY rel) AS rels
FROM kg_relations GROUP BY subj_qid, obj_qid""",
        ),
        "uniqueness_check": O.with_ctes(
            O.WORDS, O.ALIASES, O.MENTIONS,
            final="""SELECT CAST(count(*) AS BIGINT) AS n_dupes FROM (
  SELECT doc_id, mention_pos FROM mentions GROUP BY doc_id, mention_pos HAVING count(*) > 1
)""",
        ),
        "slice_sampling": O.with_ctes(
            *O.BASE[:4], O.MENTIONS, O.LINKED,
            final="""SELECT d.lang AS slice_name,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT l.doc_id) AS BIGINT) AS n_docs
FROM linked l JOIN documents d ON l.doc_id = d.doc_id GROUP BY d.lang""",
        ),
        "ann_ivf_topk": """
WITH cents AS (
  SELECT vec_id AS cell, embedding AS cv FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.embedding::DOUBLE[], c.cv::DOUBLE[]) /
                      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                       sqrt(list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[]))), 6) DESC,
                      c.cell ASC) AS rnk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rnk = 1
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos_sim
  FROM assigned q JOIN assigned c ON q.cell = c.cell AND q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank,
       cos_sim
FROM scored QUALIFY rank <= 5""",
        "candidates_with_nc": O.with_ctes(
            *O.BASE[:4],
            f"""
grouped AS (
  SELECT alias,
         list(qid ORDER BY rank) AS qids,
         list(qnum ORDER BY rank) AS eids,
         count(*) AS n
  FROM alias_cands GROUP BY alias
)""",
            final=f"""SELECT alias,
       array_to_string(
         ['NC'] || qids || (CASE WHEN n < {S.MAX_CANDIDATES}
             THEN list_transform(range(1, {S.MAX_CANDIDATES} - CAST(n AS INTEGER) + 1), x -> '-1')
             ELSE [] END), '|') AS cand_qids,
       array_to_string(list_transform(
         [CAST(0 AS BIGINT)] || eids || (CASE WHEN n < {S.MAX_CANDIDATES}
             THEN list_transform(range(1, {S.MAX_CANDIDATES} - CAST(n AS INTEGER) + 1), x -> CAST(1 AS BIGINT))
             ELSE [] END), x -> CAST(x AS VARCHAR)), '|') AS cand_eids
FROM grouped""",
        ),
        "predictions_writeback": O.with_ctes(
            *O.BASE[:4], O.MENTIONS, O.LINKED,
            final="""SELECT doc_id,
       string_agg(alias, '|' ORDER BY mention_pos) AS aliases,
       string_agg(qid, '|' ORDER BY mention_pos) AS qids
FROM linked GROUP BY doc_id""",
        ),
        "prune_to_entities": O.with_ctes(
            *O.BASE[:4], O.MENTIONS, O.LINKED,
            final="""SELECT e.qid,
       CAST(row_number() OVER (ORDER BY e.qnum) + 1 AS BIGINT) AS new_eid
FROM entities e WHERE e.qid IN (SELECT DISTINCT qid FROM linked)""",
        ),
        "mentions_gold_filter": O.with_ctes(
            O.WORDS, O.ALIASES, O.MENTIONS,
            final="SELECT doc_id, mention_pos, alias FROM mentions WHERE mention_pos % 2 = 0",
        ),
        # profile ingestion: the synthetic profile repackages the dim
        # CTEs 1:1, so the oracles pin the profile->dims transformation
        # (lnrm alias keys, (score desc, qid desc) candidate sort,
        # max_types / max_connections order-preserving truncation)
        "profile_entities_dim": O.with_ctes(
            *O.BASE[:3],
            final="""SELECT qid, CAST(row_number() OVER (ORDER BY qid) AS BIGINT) AS eid, title, descr
FROM entities""",
        ),
        "profile_alias_cands": O.with_ctes(
            *O.BASE[:3],
            final=f"""SELECT alias, qid, score,
       CAST(row_number() OVER (PARTITION BY alias ORDER BY score DESC, qid DESC) AS INTEGER) AS rank
FROM entities
QUALIFY rank <= {S.MAX_CANDIDATES}""",
        ),
        "profile_entity_types": O.with_ctes(
            *O.BASE[:3],
            final="""SELECT qid, type_system, CAST(type_pos AS BIGINT) AS type_pos, type_name FROM (
  SELECT qid, 'wiki' AS type_system, 0 AS type_pos, type_name FROM entities
  UNION ALL SELECT qid, 'hyena', 0, type_name FROM entities
  UNION ALL SELECT qid, 'hyena', 1, 'generic' FROM entities
)""",
        ),
        "profile_kg_relations": O.with_ctes(
            *O.BASE,
            final="""SELECT subj_qid, rel, obj_qid FROM (
  SELECT subj_qid, rel, obj_qid,
         row_number() OVER (PARTITION BY subj_qid, rel ORDER BY obj_qnum) AS rk
  FROM kg_relations
) WHERE rk <= 1""",
        ),
        "media_metadata": f"""
SELECT '{S.URL_PREFIX}' || lang || '/' || CAST(doc_id AS VARCHAR) AS id,
       CAST(strlen(
         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
         '</title><style>p{{margin:0}}</style></head><body><nav>home | about</nav><p>' ||
         text ||
         '</p><script>var v=' || CAST(doc_id AS VARCHAR) ||
         ';</script><footer>copyright example.org</footer></body></html>'
       ) AS BIGINT) AS n_bytes,
       'html' AS kind
FROM documents""",
        # byte-histogram features: valid oracle because the synthetic html
        # is pure ASCII (byte value == ascii(char))
        "media_features": f"""
WITH h AS (
  SELECT doc_id, lang,
         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
         '</title><style>p{{margin:0}}</style></head><body><nav>home | about</nav><p>' ||
         text ||
         '</p><script>var v=' || CAST(doc_id AS VARCHAR) ||
         ';</script><footer>copyright example.org</footer></body></html>' AS s
  FROM documents
),
bytes AS (
  SELECT doc_id, ascii(substring(s, CAST(t.i AS INTEGER) + 1, 1)) % 8 AS b, strlen(s) AS total
  FROM h, LATERAL (SELECT unnest(range(0, strlen(s))) AS i) t
),
hist AS (
  SELECT d.doc_id, d.total, j.j AS bucket, coalesce(c.cnt, 0) AS cnt
  FROM (SELECT DISTINCT doc_id, total FROM bytes) d
  CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
  LEFT JOIN (SELECT doc_id, b, count(*) AS cnt FROM bytes GROUP BY doc_id, b) c
    ON c.doc_id = d.doc_id AND c.b = j.j
)
SELECT '{S.URL_PREFIX}' || h.lang || '/' || CAST(h.doc_id AS VARCHAR) AS id,
       CAST(hist.bucket AS BIGINT) AS bucket,
       round(hist.cnt * 1.0 / hist.total, 6) AS feat_val
FROM hist JOIN h ON h.doc_id = hist.doc_id""",
        "dedup_exact": (
            "SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keep_id, "
            "CAST(count(*) AS BIGINT) AS dup_count FROM documents GROUP BY md5(text)"
        ),
        "minhash_bands": f"""
WITH sh AS (
  SELECT DISTINCT doc_id AS id, s.shingle
  FROM documents,
  LATERAL (
    SELECT array_to_string(list_slice(string_split(text,' '), i + 1, i + 3), ' ') AS shingle
    FROM unnest(range(0, greatest(len(string_split(text,' ')) - 2, 0))) AS t(i)
  ) s
  WHERE len(s.shingle) > 0
)
SELECT id, CAST(b.band AS BIGINT) AS band, min(md5(CAST(b.band AS VARCHAR) || ':' || shingle)) AS min_hash
FROM sh CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) b(band)
GROUP BY id, b.band""",
        "minhash_lsh_pairs": f"""
WITH sh AS (
  SELECT DISTINCT doc_id AS id, s.shingle
  FROM documents,
  LATERAL (
    SELECT array_to_string(list_slice(string_split(text,' '), i + 1, i + 3), ' ') AS shingle
    FROM unnest(range(0, greatest(len(string_split(text,' ')) - 2, 0))) AS t(i)
  ) s
  WHERE len(s.shingle) > 0
),
buckets AS (
  SELECT id, b.band AS band, min(md5(CAST(b.band AS VARCHAR) || ':' || shingle)) AS min_hash
  FROM sh CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) b(band)
  GROUP BY id, b.band
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM buckets a JOIN buckets b ON a.band = b.band AND a.min_hash = b.min_hash AND a.id < b.id""",
        "ngram_jaccard_pairs": """
WITH sh AS (
  SELECT DISTINCT doc_id AS id, s.shingle
  FROM documents,
  LATERAL (
    SELECT array_to_string(list_slice(string_split(text,' '), i + 1, i + 3), ' ') AS shingle
    FROM unnest(range(0, greatest(len(string_split(text,' ')) - 2, 0))) AS t(i)
  ) s
  WHERE len(s.shingle) > 0
),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b,
       round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter JOIN sizes sa ON inter.id_a = sa.id JOIN sizes sb ON inter.id_b = sb.id
WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= 0.2""",
        "minhash_verified_pairs": """
WITH sh AS (
  SELECT DISTINCT doc_id AS id, s.shingle
  FROM documents,
  LATERAL (
    SELECT array_to_string(list_slice(string_split(text,' '), i + 1, i + 3), ' ') AS shingle
    FROM unnest(range(0, greatest(len(string_split(text,' ')) - 2, 0))) AS t(i)
  ) s
  WHERE len(s.shingle) > 0
),
buckets AS (
  SELECT id, b.band AS band, min(md5(CAST(b.band AS VARCHAR) || ':' || shingle)) AS min_hash
  FROM sh CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) b(band)
  GROUP BY id, b.band
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.min_hash = b.min_hash AND a.id < b.id
),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY id),
inter AS (
  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= 0.2""",
        # SimHash reconstructed bit-by-bit from md5 hex nibbles (HUGEINT
        # shifts keep 64-bit precision); band trick identical to Spark's
        # shiftrightunsigned on the unsigned representation
        "simhash_near_pairs": """
WITH toks AS (
  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w FROM documents
),
md AS (SELECT id, md5(w) AS m FROM toks),
bits AS (
  SELECT id, b.i AS i,
         CASE WHEN ((strpos('0123456789abcdef', substring(m, 16 - (b.i // 4), 1)) - 1) >> (b.i % 4)) % 2 = 1
              THEN 1 ELSE -1 END AS vote
  FROM md CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b
),
votes AS (SELECT id, i, sum(vote) AS v FROM bits GROUP BY id, i),
sig AS (
  SELECT id, sum(CASE WHEN v > 0 THEN (1::HUGEINT << CAST(i AS INTEGER)) ELSE 0::HUGEINT END) AS u
  FROM votes GROUP BY id
),
bands AS (
  SELECT id, b.band AS band, CAST((u >> (CAST(b.band AS INTEGER) * 16)) % 65536 AS BIGINT) AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id""",
        "ann_cosine_topk": """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank,
       cos_sim
FROM scored QUALIFY rank <= 5""",
        "ann_signbit_lsh": """
WITH wb AS (
  SELECT vec_id, embedding,
         CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos_sim
  FROM wb q JOIN wb c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank,
       cos_sim
FROM scored QUALIFY rank <= 5""",
        "events_sessions": """
WITH marked AS (
  SELECT user_id, event_id, floor(epoch(ts)) AS e, value,
         CASE WHEN lag(floor(epoch(ts))) OVER w IS NULL
                OR floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, e, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY e, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(e) AS BIGINT) AS start_epoch,
       CAST(max(e) AS BIGINT) AS end_epoch,
       round(sum(value), 6) AS total_value
FROM sessions GROUP BY user_id, session_id""",
        "lang_id": """
WITH c AS (
  SELECT doc_id AS id,
         CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','is','to'))) AS BIGINT) AS n_en,
         CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS n_de,
         CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','los','que','es'))) AS BIGINT) AS n_es,
         CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est'))) AS BIGINT) AS n_fr
  FROM documents
)
SELECT id, n_en, n_de, n_es, n_fr,
       CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr AND n_en > 0 THEN 'en'
            WHEN n_de >= n_es AND n_de >= n_fr AND n_de > 0 THEN 'de'
            WHEN n_es >= n_fr AND n_es > 0 THEN 'es'
            WHEN n_fr > 0 THEN 'fr'
            ELSE 'und' END AS pred_lang
FROM c""",
        "token_counts": """
SELECT doc_id AS id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
       CAST(len(text) AS BIGINT) AS n_chars
FROM documents""",
        "quality_scores": """
SELECT doc_id AS id,
       CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
       round((len(text) - (len(string_split(text,' ')) - 1)) * 1.0 / len(string_split(text,' ')), 6) AS mean_word_len,
       round(len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','is','to'))) * 1.0
             / len(string_split(text,' ')), 6) AS stopword_ratio,
       round(CASE WHEN len(string_split(text,' ')) >= 5
                   AND (len(text) - (len(string_split(text,' ')) - 1)) * 1.0 / len(string_split(text,' ')) >= 2.0
                   AND (len(text) - (len(string_split(text,' ')) - 1)) * 1.0 / len(string_split(text,' ')) <= 12.0
             THEN 1.0 - abs(round(len(list_filter(string_split(text,' '), w -> w IN ('the','and','of','is','to'))) * 1.0
                            / len(string_split(text,' ')), 6) - 0.05)
             ELSE 0.0 END, 6) AS quality
FROM documents""",
        "doc_fingerprints": """
WITH sh AS (
  SELECT doc_id AS id, md5(s.shingle) AS h
  FROM documents,
  LATERAL (
    SELECT array_to_string(list_slice(string_split(text,' '), i + 1, i + 3), ' ') AS shingle
    FROM unnest(range(0, greatest(len(string_split(text,' ')) - 2, 0))) AS t(i)
  ) s
  WHERE len(s.shingle) > 0
)
SELECT id, min(h) AS fp_min, max(h) AS fp_max FROM sh GROUP BY id""",
    }
