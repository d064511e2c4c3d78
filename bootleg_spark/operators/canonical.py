"""Entity canonicalization — collapse redirect/sameAs chains and
rewrite the emitted triples onto canonical QIDs.

The reference links mentions to whatever QID its candidate map holds;
production Wikidata additionally carries REDIRECTS (merged duplicates:
Q42_dup → Q42, possibly chained through several historical merges).
The north-star contract says triples are "canonicalized to Wikidata
QIDs", so the construction pipeline must resolve every chain to its
terminal entity before materializing the graph — otherwise the same
fact lands under two ids and dedup cannot see it.

Scale shape:
- :func:`resolve_redirects` is POINTER JUMPING over the redirect map
  (qid → target): each round substitutes ``m[m[qid]]`` for ``m[qid]``,
  doubling the resolved chain depth, so a maximum chain of length L
  needs ceil(log2 L) rounds — at Wikidata scale (~10M redirects,
  chains almost always ≤ 3) that is 2 rounds of an O(|redirects|)
  self-join, never a driver-side walk. Each round is one self-join +
  one lazy ``localCheckpoint`` whose materializing count doubles as
  the convergence check (one Spark job per round — the k-hop lesson).
- :func:`canonicalize_triples` is two LEFT joins against the resolved
  map (a dim ≪ the triple set — broadcastable) + self-loop filter +
  one distinct shuffle on the rewritten triple key.

A cycle in the redirect map (data corruption — real Wikidata forbids
it) would never converge; the loop raises after ``max_iter`` rounds
instead of silently looping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src_qid",
    dst_col: str = "dst_qid",
    max_iter: int = 20,
) -> DataFrame:
    """(qid, canonical): terminal target for every redirect SOURCE —
    chains followed to the first qid that is not itself redirected.
    Self-redirects (src == dst) are dropped as no-ops. Raises
    ``ValueError`` if the map has not converged after ``max_iter``
    pointer-jumping rounds (chain longer than 2^max_iter, or a cycle).
    """
    m = (
        redirects.select(F.col(src_col).alias("qid"), F.col(dst_col).alias("canonical"))
        .where(F.col(src_col) != F.col(dst_col))
        .distinct()
    )
    for _ in range(max_iter):
        hop = m.select(
            F.col("qid").alias("canonical"), F.col("canonical").alias("_next")
        )
        cp = (
            m.join(hop, "canonical", "left")
            .select("qid", "canonical", "_next")
            # lazy checkpoint: the count below is the single action that
            # materializes the round (plan stays O(1) per round) AND
            # answers convergence
            .localCheckpoint(eager=False)
        )
        unresolved = cp.where(F.col("_next").isNotNull()).count()
        m = cp.select(
            "qid", F.coalesce("_next", "canonical").alias("canonical")
        )
        if unresolved == 0:
            return m
    raise ValueError(
        f"redirect map did not converge after {max_iter} pointer-jumping "
        "rounds — cycle or pathological chain depth"
    )


def canonicalize_triples(
    triples: DataFrame,
    resolved: DataFrame,
    subj_col: str = "subj_qid",
    pred_col: str = "rel",
    obj_col: str = "obj_qid",
) -> DataFrame:
    """Rewrite subj/obj through the resolved redirect map (qids absent
    from the map stay themselves), DROP triples that collapse to
    self-loops (both sides merged into one entity — the fact says
    nothing post-merge), and dedup the rewritten set. Output columns
    keep the input names."""
    r_s = resolved.select(
        F.col("qid").alias(subj_col), F.col("canonical").alias("_cs")
    )
    r_o = resolved.select(
        F.col("qid").alias(obj_col), F.col("canonical").alias("_co")
    )
    out = (
        triples.join(F.broadcast(r_s), subj_col, "left")
        .join(F.broadcast(r_o), obj_col, "left")
        .select(
            F.coalesce("_cs", subj_col).alias(subj_col),
            F.col(pred_col),
            F.coalesce("_co", obj_col).alias(obj_col),
        )
        .where(F.col(subj_col) != F.col(obj_col))
        .distinct()
    )
    return out
