"""Triple emission: linked mentions → (subj, pred, obj) KG triples.

north_rule: canonicalized linked entities are joined against the
relation table to emit deduplicated (subj, pred, obj) triples. The
relation lookup mirrors kg_symbols.get_relations_between
(bootleg/symbols/kg_symbols.py:191-210) applied to entity pairs
co-mentioned on the same page.

Scale notes (the part the reference never had to solve):
- the per-page entity set is first deduplicated (dropDuplicates on
  (page, qid)) so a page mentioning "spark" 50 times contributes one
  node, bounding the pair fan-out;
- the pair→relation join broadcasts the relation dim;
- the final (s,p,o) dedup is a partial-agg shuffle; AQE skew-join +
  optional salting (salted_distinct) handle head entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_entities(linked: DataFrame, id_col: str = "doc_id", qid_col: str = "qid_pred") -> DataFrame:
    """Distinct (page, qid) — bounds pair fan-out before the self-join."""
    return linked.select(F.col(id_col).alias("doc_id"), F.col(qid_col).alias("qid")).distinct()


def cooccurrence_pairs(ents: DataFrame) -> DataFrame:
    """Ordered entity pairs co-occurring on a page (both directions kept:
    relations are directed)."""
    e1 = ents.select("doc_id", F.col("qid").alias("subj"))
    e2 = ents.select("doc_id", F.col("qid").alias("obj"))
    return e1.join(e2, "doc_id").where(F.col("subj") != F.col("obj"))


def emit_triples(pairs: DataFrame, kg_relations: DataFrame, keep_lineage: bool = False) -> DataFrame:
    """pairs ⋈ broadcast(kg_relations) → dedup'd (subj, pred, obj)."""
    rel = kg_relations.select(
        F.col("subj_qid").alias("subj"), F.col("rel").alias("pred"), F.col("obj_qid").alias("obj")
    )
    joined = pairs.join(F.broadcast(rel), ["subj", "obj"])
    cols = ["subj", "pred", "obj"] + (["doc_id"] if keep_lineage else [])
    return joined.select(*cols).dropDuplicates(["subj", "pred", "obj"])


def salted_distinct(df: DataFrame, cols: list[str], salt_n: int = 32) -> DataFrame:
    """Two-stage dedup for heavily skewed keys: local dedup within a
    salted repartition, then global dedup. Spark's dropDuplicates already
    does map-side partial aggregation; this variant additionally breaks
    up a hot key across ``salt_n`` reducers before the final pass
    (SURVEY.md §4 skew row; north_rule skew requirement)."""
    salted = df.withColumn("_salt", F.pmod(F.hash(*cols), F.lit(salt_n)))
    local = salted.repartition(salt_n, "_salt", *[F.col(c) for c in cols]).dropDuplicates(
        cols + ["_salt"]
    )
    return local.drop("_salt").dropDuplicates(cols)
