"""Document deduplication for training-data pipelines.

Beyond the reference's operator set (Bootleg has only a train-time
in-batch candidate dedup, bootleg/data.py:309-351, and a triple dedup
need from the north_rule); these are the ops a 100 TB web-corpus
pipeline runs before training:

- exact dedup (content-hash groupBy),
- MinHash + LSH banding (shingle → per-band min-hash → bucket join),
- word-n-gram Jaccard verification,
- SimHash near-dup signatures.

Design for scale: shingling stays JVM-side (sequence/transform, no
Python); candidate pairs come from equi-joins on selective keys
(band buckets / shingles), never a cross join; all pair joins are
shuffle joins with AQE skew splitting; md5-based hashes keep Spark and
the DuckDB oracle bit-identical.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: (content_hash, keep_id, dup_count). keep_id = min id."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(
            F.min("id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per doc — pure JVM expressions."""
    w = docs.select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("w"))
    shingled = w.select(
        "id",
        F.explode(
            F.expr(
                f"CASE WHEN size(w) >= {n} THEN transform(sequence(0, size(w) - {n}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {n}))) ELSE array() END"
            )
        ).alias("shingle"),
    )
    return shingled.where(F.length("shingle") > 0).distinct()


def _doc_sizes(shingles: DataFrame) -> DataFrame:
    return shingles.groupBy("id").agg(F.count("*").cast("long").alias("n_shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All doc pairs with word-n-gram Jaccard ≥ threshold.

    shingle equi-join → per-pair intersection count → sizes join →
    |A∩B| / (|A|+|B|-|A∩B|). The shuffle key is the shingle — joined on
    its xxhash64 (8-byte long) rather than the string, cutting shuffle
    bytes severalfold with identical output absent 64-bit collisions;
    frequent shingles are the skew risk (AQE skew-join splits them)."""
    dshf = doc_shingle_arrays(docs, n, text_col, id_col)
    sizes = dshf.select("id", F.size("dsh").cast("long").alias("n_shingles"))
    shh = dshf.select(
        "id", F.explode(F.transform(F.col("dsh"), lambda s: F.xxhash64(s))).alias("sh64")
    )
    a = shh.select(F.col("id").alias("id_a"), "sh64")
    b = shh.select(F.col("id").alias("id_b"), "sh64")
    inter = (
        a.join(b, "sh64")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")


def doc_shingle_arrays(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dsh): each doc's DISTINCT word-n-gram shingles as an in-row
    array — the zero-shuffle form of :func:`word_shingles` (guide §2.4:
    remove shuffles outright). Shingling, the empty-shingle filter and
    the per-doc distinct are strictly per-document, so they compute
    inside the row: ``word_shingles``'s global ``.distinct()`` exchange
    of every (id, shingle) row (2.6 M rows at sf1.0) becomes
    ``array_distinct`` in the scan projection, and every downstream
    per-doc reduction (band minima, set sizes) follows in-row too.

    Row-for-row: ``explode(dsh)`` ≡ ``word_shingles(docs, n)``. The
    filter runs BEFORE the projection on the cheap equivalent predicate
    ``size(split(text)) >= n`` (for n ≥ 2 every shingle contains a
    separator so the length>0 filter is vacuous; the n == 1 branch
    keeps it) — filtering on a derived array column AFTER projecting it
    lets predicate pushdown substitute the whole expression into the
    filter and every row pays it twice (see doc_fingerprints)."""
    w = F.split(F.col(text_col), " ")
    d0 = docs.where(F.size(w) >= n).select(F.col(id_col).alias("id"), w.alias("w"))
    arr = shingle_array_expr(F.col("w"), n)
    if n == 1:
        arr = F.filter(arr, lambda s: F.length(s) > 0)
    out = d0.select("id", F.array_distinct(arr).alias("dsh"))
    if n == 1:
        out = out.where(F.size("dsh") >= 1)
    return out


def shingle_array_expr(wc, n: int):
    """In-row word-n-gram array over a words-array column, as a chain of
    n−1 ``zip_with`` concats over shifted slices. Equivalent to
    ``transform(sequence(0, size-n), i -> concat_ws(' ', slice(w, i+1, n)))``
    but 2.6× faster measured at sf1.0 (1.54 s → 0.58 s for the distinct
    shingle projection): the per-element lambda allocates no slice array
    and runs one binary concat per step instead of index arithmetic +
    O(n) slice + concat_ws."""
    m = F.size(wc) - (n - 1)
    arr = F.slice(wc, 1, m)
    for j in range(1, n):
        arr = F.zip_with(
            arr, F.slice(wc, j + 1, m), lambda acc, x: F.concat(acc, F.lit(" "), x)
        )
    return arr


def _band_minima_arrays(dshf: DataFrame, n_bands: int) -> DataFrame:
    """(id, band, min_hash) from a (id, dsh) shingle-array frame.

    Same md5-hex order statistic as :func:`_band_minima`, but each
    band's minimum is an ``array_min(transform(...))`` computed inside
    the row: the r06 form still paid one groupBy(id) exchange over
    every (id, shingle) row; this pays none — the scan projection emits
    the finished n_bands-wide row per doc, and only the n_bands-row
    unpivot leaves the row."""
    aggs = [
        F.array_min(
            F.transform(F.col("dsh"), lambda s: F.md5(F.concat(F.lit(f"{b}:"), s)))
        ).alias(f"_h{b}")
        for b in range(n_bands)
    ]
    per_doc = dshf.select("id", *aggs)
    stack_args = ", ".join(f"{b}, _h{b}" for b in range(n_bands))
    return per_doc.select(
        "id", F.expr(f"stack({n_bands}, {stack_args}) AS (band, min_hash)")
    ).select("id", F.col("band").cast("int").alias("band"), "min_hash")


def minhash_band_buckets(
    docs: DataFrame,
    n_bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, band) MinHash bucket keys.

    Each band b hashes every shingle with md5(b || ':' || shingle) and
    keeps the minimum — b independent min-hashes. Docs sharing a
    (band, min_hash) bucket are near-dup candidates with probability
    rising in their Jaccard similarity (standard LSH banding). md5-hex
    min is an order statistic on strings → identical in any engine.

    r07: computed fully in-row (:func:`doc_shingle_arrays` +
    :func:`_band_minima_arrays`) — zero exchanges before the bucket
    rows exist, where the r06 plan paid the shingle ``distinct`` and
    the groupBy(id) shuffles first.
    """
    return _band_minima_arrays(
        doc_shingle_arrays(docs, shingle_n, text_col, id_col), n_bands
    )


def _band_minima(sh: DataFrame, n_bands: int) -> DataFrame:
    """(id, band, min_hash) from a (id, shingle) frame.

    Single-pass plan: ONE groupBy(id) computing all n_bands minima as
    separate aggregate expressions, then an n_bands-wide unpivot of the
    per-doc row. The md5 count is unchanged (n_bands per shingle) but
    nothing is exploded: the pre-aggregation row count stays at
    |shingles| instead of n_bands × |shingles|, and the shuffle carries
    one n_bands-wide row per doc per partition. Measured 1.2× over the
    explode → groupBy(id, band) formulation at sf0.1 (1.86→1.58 s),
    where fixed stage overhead dominates; the 8× pre-agg row saving is
    the part that grows with corpus size."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{b}:"), F.col("shingle")))).alias(f"_h{b}")
        for b in range(n_bands)
    ]
    per_doc = sh.groupBy("id").agg(*aggs)
    stack_args = ", ".join(f"{b}, _h{b}" for b in range(n_bands))
    return per_doc.select(
        "id", F.expr(f"stack({n_bands}, {stack_args}) AS (band, min_hash)")
    ).select("id", F.col("band").cast("int").alias("band"), "min_hash")


def _bucket_pairs(
    buckets: DataFrame,
    key_cols: tuple = ("band", "min_hash"),
    distinct: bool = True,
) -> DataFrame:
    """Distinct (id_a < id_b) doc pairs sharing a (band, min_hash) bucket.

    r06 formed these with a bucket self-join, which (a) executed the
    whole band-minima subplan TWICE — one evaluation per join side, the
    dominant cost of the candidate stage once the minima were in-row —
    and (b) materialized every n² ordered bucket combination before the
    ``id_a < id_b`` filter. One groupBy instead: collect each bucket's
    (distinct — one row per (id, band)) ids, sort in-row, and emit only
    the i < j combinations. The subplan runs once, the shuffle carries
    one row per bucket member (same bytes as ONE side of the old join),
    and nothing bigger than the final pair set is ever produced.

    Skew note: a pathological bucket (n docs sharing a band minimum)
    emits its n·(n-1)/2 pairs from one row, where the join form spread
    them across the build side's AQE splits; bucket width is the LSH
    design parameter (more bands / wider band hashes), not something to
    salt after the fact — the r06 join form had the same n² output."""
    grouped = (
        buckets.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    # two-level explode, NOT an in-row flatten of all n·(n-1)/2 pair
    # structs: a single flatten would materialize a hot bucket's whole
    # quadratic pair array in one allocation (GBs for a 10^5-doc bucket
    # at production scale), while Generate streams. ids is sorted
    # ascending and distinct (one row per (id, bucket)), so taking
    # partners strictly after position i yields exactly the id_a < id_b
    # combinations.
    step1 = grouped.select("ids", F.posexplode("ids").alias("_i", "id_a"))
    out = step1.select(
        "id_a",
        F.explode(
            F.slice("ids", F.col("_i") + F.lit(2), F.size("ids"))
        ).alias("id_b"),
    )
    # distinct=False lets a caller that deduplicates LATER (on a much
    # smaller post-filter set) skip this full-width exchange; the raw
    # stream repeats a pair once per shared bucket (dup factor 1.045
    # measured at sf1.0)
    return out.distinct() if distinct else out


def minhash_lsh_pairs(
    docs: DataFrame,
    n_bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket."""
    buckets = minhash_band_buckets(docs, n_bands, shingle_n, text_col, id_col)
    return _bucket_pairs(buckets)


def minhash_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    reuse_shingles: bool = True,
) -> DataFrame:
    """The standard two-stage near-dup pipeline: cheap LSH banding
    proposes candidate pairs, exact Jaccard over shingle sets verifies
    them. At corpus scale the verify join touches only candidate pairs,
    never all O(N²).

    r07 verify plan (guide §8: decide with small rows, attach payloads
    once): the r06 form verified by re-exploding both docs of every
    candidate pair to shingle grain — cand ⋈ shingles(id_a) ⋈
    shingles(id_b) — which materialized 490 M rows for 8.1 M candidate
    pairs at sf1.0 and then paid a pair-grain groupBy over them (34-47 s,
    the most expensive query in the bench). Each doc's distinct shingle
    set is small (~52 at sf1.0; bounded by doc length), so the set
    travels as ONE in-row array of xxhash64 longs: two equi-joins attach
    the packed arrays to the pair rows (the optimizer broadcasts the
    doc-set dim when its estimate allows — at corpus scale the same
    plan degrades gracefully to a shuffle join on id), and
    ``size(array_intersect(...))`` computes n_inter inside the row.
    Shuffled rows: the candidate distinct only. Same output: n_inter
    counts distinct shared shingles exactly as the oracle's join-count
    over distinct (id, shingle) rows, still modulo the documented
    ~2⁻⁶⁴ xxhash64 collision tolerance the r06 verify join had.

    ``reuse_shingles`` is retained for API compatibility; the packed
    plan derives bands, sizes and sets in one in-row projection chain,
    so there is no shingle frame left to persist."""
    del reuse_shingles  # no exploded shingle frame left to persist
    # lazy localCheckpoint: the shingle-array frame feeds BOTH the
    # band-minima/bucket branch and the packed-set attach branch, and a
    # DAG-as-tree would evaluate the scan + shingling once per branch.
    # Checkpoint blocks are GC-cleaned (ContextCleaner), unlike a
    # persist leak — the same idiom as rel_pattern_apply/bootstrap.
    dshf = doc_shingle_arrays(docs, shingle_n, text_col, id_col).localCheckpoint(
        eager=False
    )
    buckets = _band_minima_arrays(dshf, n_bands)
    # distinct deferred: the raw bucket-pair stream repeats a pair only
    # once per extra shared band (×1.045 measured), so verifying the raw
    # stream and deduplicating the ~3% of pairs that survive the
    # threshold replaces a full 8M-row exchange with a tiny one
    cand = _bucket_pairs(buckets, distinct=False)
    sets = dshf.select(
        "id",
        F.transform(F.col("dsh"), lambda s: F.xxhash64(s)).alias("sh64s"),
        F.size("dsh").cast("long").alias("n"),
    )
    joined = cand.join(
        sets.select(
            F.col("id").alias("id_a"), F.col("sh64s").alias("_sa"), F.col("n").alias("n_a")
        ),
        "id_a",
    ).join(
        sets.select(
            F.col("id").alias("id_b"), F.col("sh64s").alias("_sb"), F.col("n").alias("n_b")
        ),
        "id_b",
    )
    # explode(array(..)) is a one-row Generate whose output attribute the
    # threshold filter cannot be pushed through: without it, predicate
    # pushdown folds the filter into the second join's condition and the
    # array_intersect runs up to 3× per pair (twice in the condition,
    # once in the projection — read the r06 plan); with it, once.
    scored = joined.select(
        "id_a",
        "id_b",
        "n_a",
        "n_b",
        F.explode(F.array(F.size(F.array_intersect("_sa", "_sb")).cast("long"))).alias(
            "n_inter"
        ),
    )
    out = scored.withColumn(
        "jaccard",
        F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
    ).where(F.col("jaccard") >= threshold)
    return out.select("id_a", "id_b", "jaccard").distinct()


def simhash_signatures(
    docs: DataFrame, bits: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc (Charikar): sign of the weighted sum of
    token-hash bit vectors. md5-based bits; Arrow-batched UDF (the
    bit-vote accumulation has no good built-in expression)."""

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        # vectorized over the batch: md5 only the batch's UNIQUE tokens
        # (Zipfian input -> small vocab), expand every hash to a ±1 bit
        # matrix with one numpy shift, then per-doc vote = one fancy-index
        # row-sum. Replaces the round-1 per-token x per-bit Python loop
        # (~10x on this corpus).
        import numpy as np

        tok_lists = [(t or "").split() for t in texts]
        vocab: dict[str, int] = {}
        for toks in tok_lists:
            for tok in toks:
                if tok not in vocab:
                    vocab[tok] = len(vocab)
        shifts = np.arange(bits, dtype=np.uint64)
        if vocab:
            hs = np.empty(len(vocab), dtype=np.uint64)
            for tok, i in vocab.items():
                hs[i] = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            bitmat = (((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2) - 1
        else:
            bitmat = np.zeros((0, bits), dtype=np.int32)
        out = np.zeros(len(texts), dtype=np.int64)
        powers = np.uint64(1) << shifts
        for j, toks in enumerate(tok_lists):
            if not toks:
                continue
            idx = np.fromiter((vocab[t] for t in toks), dtype=np.int64, count=len(toks))
            votes = bitmat[idx].sum(axis=0)
            sig = int(powers[votes > 0].sum(dtype=np.uint64))
            out[j] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out, dtype="int64")

    return docs.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, band_bits: int = 16, **kw) -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash band (standard 4-band
    trick ⇒ catches all pairs within Hamming distance 3)."""
    sig = simhash_signatures(docs, **kw)
    bands = sig.select(
        "id",
        F.explode(F.array(*[F.lit(i) for i in range(64 // band_bits)])).alias("band"),
        "simhash",
    ).withColumn(
        "band_key",
        F.expr(f"shiftrightunsigned(simhash, band * {band_bits})").bitwiseAND(
            F.lit((1 << band_bits) - 1)
        ),
    )
    # groupBy-collect pair generation (see _bucket_pairs): the r06
    # self-join evaluated the SimHash pandas-UDF subplan once per join
    # side — the whole signature pass ran twice
    return _bucket_pairs(bands, key_cols=("band", "band_key"))


def dup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(id, cluster_id): connected components over near-dup pairs —
    cluster_id = the smallest doc id reachable through the pair graph.
    The keep-one-per-cluster step every dedup pipeline ends with
    (keep = rows where id == cluster_id; singletons are their own
    cluster after a left join back to the corpus).

    Iterative min-label propagation WITH pointer jumping: each round
    (a) takes the per-node min of neighbor labels across the undirected
    edges, then (b) compresses label chains by replacing each label
    with its own label (labels only ever decrease, so label[label] is
    defined and ≤ label). The compression step turns the O(diameter)
    propagation into O(log n) rounds — the same doubling idea as the
    large-star/small-star contraction. Each round is two shuffle joins
    + one groupBy over the LABEL table (O(V) rows, not O(E)); each
    round's labels are ``localCheckpoint``-ed — caching alone is NOT
    enough for iterative plans, because the logical plan still embeds
    the whole lineage and driver-side analysis time grows ~4× per
    round (measured); the checkpoint truncates the plan to the
    materialized blocks. (``localCheckpoint`` trades executor-loss
    resilience for speed — on a long cluster run with preemptible
    executors, set a checkpoint dir and use ``.checkpoint()`` instead.)
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).persist()
    labels.count()
    for _ in range(max_iter):
        # (a) per-node min of neighbors' labels
        prop = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        merged = labels.join(prop, "id", "left").select(
            "id", F.least("label", F.coalesce("nbr_label", "label")).alias("label")
        )
        # (b) pointer jump: label <- label[label]
        lookup = merged.select(F.col("id").alias("label"), F.col("label").alias("_ll"))
        new_labels = (
            merged.join(lookup, "label", "left")
            .select("id", F.least("label", F.coalesce("_ll", "label")).alias("label"))
            .localCheckpoint()  # truncate lineage: see docstring
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_keep(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, cluster_id, keep): every corpus doc labeled with its near-dup
    cluster and a keep flag — the "keep one representative per cluster"
    step every dedup pipeline ends with. Singletons (docs in no pair)
    are their own cluster; the representative is the smallest id.

    One left join of the corpus against the cluster table, which holds
    only ids that appear in a pair (O(duplicates) rows, typically a
    small fraction of the corpus) — the corpus side never shuffles more
    than the join requires, and AQE turns the join into a broadcast when
    the cluster table fits."""
    clusters = dup_clusters(pairs)
    labeled = docs.select(F.col(id_col).cast("long").alias("id")).join(
        clusters, "id", "left"
    )
    return labeled.select(
        "id",
        F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
    ).withColumn("keep", (F.col("id") == F.col("cluster_id")).cast("int"))
