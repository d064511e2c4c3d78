"""Candidate generation: the alias → ≤K (QID, score) broadcast lookup.

The reference's central "join" (entity_symbols.get_qid_cands,
bootleg/symbols/entity_symbols.py:434-491; eval_utils.py:59-114): per
extracted alias, fetch the top-K candidate list sorted (score desc, id
desc), pad to K with "-1" (eid 1), optionally prepend the "NC"
not-in-candidates slot (eid 0) when train_in_candidates=False.

Spark-first shape: the candidate lists are pre-grouped once into a tiny
dimension DataFrame (alias → ordered array<struct>), then attached to
the mention stream with an explicit ``broadcast()`` hash join — no
shuffle of the big side, which is what survives 10^12 pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bootleg_spark import synthspec as S
from bootleg_spark.functions.embedding import NC_EID, PAD_EID


def grouped_candidates(
    alias_cands: DataFrame, max_candidates: int = S.MAX_CANDIDATES
) -> DataFrame:
    """alias → ordered, padded candidate arrays.

    Input: (alias, qid, qnum/eid, score, rank) with rank ≤ K.
    Output: (alias, cand_qids array<string>[K], cand_eids array<long>[K],
    cand_scores array<double>[K]) — ordered by rank, padded with
    "-1"/PAD_EID/0.0 (eval_utils.py:59-114 padding semantics).
    """
    k = max_candidates
    eid_col = "eid" if "eid" in alias_cands.columns else "qnum"
    g = alias_cands.groupBy("alias").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rank"), F.col("qid"), F.col(eid_col).alias("eid"), F.col("score")))
        ).alias("c")
    )
    pad = F.expr(f"array_repeat(named_struct('rank', 0, 'qid', '-1', 'eid', CAST({PAD_EID} AS BIGINT), 'score', CAST(0.0 AS DOUBLE)), {k})")
    padded = F.slice(F.concat(F.col("c"), pad), 1, k)
    return g.select(
        "alias",
        F.transform(padded, lambda x: x["qid"]).alias("cand_qids"),
        F.transform(padded, lambda x: x["eid"].cast("long")).alias("cand_eids"),
        F.transform(padded, lambda x: x["score"]).alias("cand_scores"),
    )


def attach_candidates_salted(
    mentions: DataFrame,
    alias_cands: DataFrame,
    salt_n: int = 16,
    fact_keys: tuple[str, ...] = ("doc_id", "mention_pos"),
    max_candidates: int = S.MAX_CANDIDATES,
    grouped: DataFrame | None = None,
) -> DataFrame:
    """Shuffle-join variant of :func:`attach_candidates` for alias
    dictionaries beyond broadcast budget, salted against head-alias
    skew (SURVEY §4; north_rule "skew from head entities handled with
    salted repartitioning").

    A plain shuffle join partitions both sides by ``alias``, so a head
    alias covering half the corpus lands its half on ONE reducer. Here
    the fact side derives a deterministic salt from its row keys and
    the (small-per-alias) dim side replicates each alias ``salt_n``
    times; the equi-join on (alias, salt) spreads the hot alias across
    ``salt_n`` reducers at the cost of a ``salt_n``× dim blow-up —
    cheap, the dim is one array row per alias. Output rows identical
    to the broadcast form (pytest-pinned); scripts/skew_bench.py
    measures the skew behavior."""
    cands = grouped if grouped is not None else grouped_candidates(alias_cands, max_candidates)
    salt = F.pmod(F.hash(*[F.col(k) for k in fact_keys]), F.lit(salt_n))
    fact = mentions.withColumn("_salt", salt)
    dim = cands.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return fact.hint("shuffle_hash").join(dim, ["alias", "_salt"]).drop("_salt")


def attach_candidates(
    mentions: DataFrame,
    alias_cands: DataFrame,
    max_candidates: int = S.MAX_CANDIDATES,
    train_in_candidates: bool = True,
    keep_unmatched: bool = False,
    grouped: DataFrame | None = None,
) -> DataFrame:
    """Broadcast-join candidate arrays onto the mention stream.

    ``train_in_candidates=False`` prepends the NC slot (qid "NC", eid 0)
    exactly like map_aliases_to_candidates (eval_utils.py:59-87).
    Unmatched aliases get all-pad lists when ``keep_unmatched``.
    Pass ``grouped`` (a cached grouped_candidates frame) to skip
    rebuilding the aggregation on every query.
    """
    cands = grouped if grouped is not None else grouped_candidates(alias_cands, max_candidates)
    how = "left" if keep_unmatched else "inner"
    out = mentions.join(F.broadcast(cands), "alias", how)
    if keep_unmatched:
        k = max_candidates
        out = (
            out.withColumn(
                "cand_qids",
                F.coalesce("cand_qids", F.expr(f"array_repeat('-1', {k})")),
            )
            .withColumn(
                "cand_eids",
                F.coalesce("cand_eids", F.expr(f"array_repeat(CAST({PAD_EID} AS BIGINT), {k})")),
            )
            .withColumn(
                "cand_scores",
                F.coalesce("cand_scores", F.expr(f"array_repeat(CAST(0.0 AS DOUBLE), {k})")),
            )
        )
    if not train_in_candidates:
        out = (
            out.withColumn("cand_qids", F.concat(F.array(F.lit("NC")), "cand_qids"))
            .withColumn("cand_eids", F.concat(F.array(F.lit(NC_EID).cast("long")), "cand_eids"))
            .withColumn("cand_scores", F.concat(F.array(F.lit(0.0)), "cand_scores"))
        )
    return out
