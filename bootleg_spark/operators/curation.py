"""Corpus curation beyond per-document filters: per-domain caps,
per-language quality percentiles, and TF-IDF document keywords.

Engine extensions (task brief: "operations a large-scale training-data
pipeline would need") composing with `textclean.select_training_corpus`
— that op filters documents one at a time; these three are the
CROSS-document curation rules every Common-Crawl recipe adds:

- :func:`cap_per_domain` — "at most N pages per registered domain",
  the standard anti-SEO-farm rule (a handful of domains dominate raw
  crawls).
- :func:`quality_percentile_filter` — "keep the best p% per language"
  (absolute quality thresholds are incomparable across languages, so
  the cut must be per-stratum).
- :func:`tfidf_top_terms` — per-document top-k keywords by TF-IDF, the
  classic relational form (explode → two counted aggregations → join →
  per-doc top-k); feeds doc-level topic tagging / mixture labeling.

All three have exact DuckDB mirrors (oracles ``domain_caps``,
``quality_percentile``, ``tfidf_terms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def registered_domain_expr(url_col: str = "url") -> F.Column:
    """Registered domain of a URL: hostname lowercased, ``www.``
    stripped, then the last TWO labels (``example.org``,
    ``shop.example.co`` → ``example.co``). A faithful public-suffix
    list is a data file, not logic — at that point swap the final
    regex for a broadcast-joined suffix dim; the two-label fallback is
    the standard approximation and is what the oracle mirrors."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", host).otherwise(two)


def cap_per_domain(
    docs: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per registered domain,
    preferring higher ``quality_col`` (ties and the no-quality case
    break by ascending id — fully deterministic). Returns
    ``(id, domain, domain_rank)`` for the survivors.

    Plan: one hash exchange on ``domain`` + an in-partition sort for
    the ``row_number`` window. Mega-domain hot keys are ALREADY
    bounded here on Spark ≥ 3.5: Catalyst plans the ``rank ≤ N``
    filter as ``WindowGroupLimit`` in partial mode BEFORE the exchange
    (verified in the physical plan — PLANS.md "domain cap"), i.e. each
    map partition ships at most N rows per domain, so the hot domain's
    reduce partition holds ≤ N·(map partitions) rows no matter how
    many rows the domain has. That is exactly the "bounded
    per-partition top-N pre-aggregation" an engine without the rule
    would need by hand — see :func:`cap_per_domain_salted` for the
    explicit two-phase form (parity-pinned; measured SLOWER here
    because it duplicates what the optimizer already does, BENCH.md
    "domain-cap skew"). The cap itself is what removes the skew for
    every downstream op."""
    order = (
        [F.col("_q").desc(), F.col("id").asc()]
        if quality_col is not None
        else [F.col("id").asc()]
    )
    d = docs.select(
        F.col(id_col).alias("id"),
        registered_domain_expr(url_col).alias("domain"),
        *([F.col(quality_col).alias("_q")] if quality_col is not None else []),
    )
    w = Window.partitionBy("domain").orderBy(*order)
    return (
        d.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .where(F.col("domain_rank") <= max_per_domain)
        .select("id", "domain", "domain_rank")
    )


def cap_per_domain_salted(
    docs: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """Row-identical to :func:`cap_per_domain`, executed as an
    EXPLICIT two-phase exact top-N (VERDICT r05 ask #6).

    Finding (BENCH.md "domain-cap skew"): on Spark ≥ 3.5 this form is
    redundant — Catalyst's ``WindowGroupLimit`` rule already runs a
    map-side partial top-N before the one-window form's exchange, so
    the hot domain's reduce partition is bounded at N·(map partitions)
    and the one-window plan measured FASTER (7.2 s vs 8.3–9.2 s on a
    24M-row, 96%-one-domain corpus). Keep this variant for engines /
    plan shapes where the rule doesn't fire (it requires a top-level
    ``row_number ≤ k`` filter directly over the window) or when
    N·(map partitions) itself is too large for one reducer — the salt
    splits even that residual. Mechanics:

    1. **Phase 1** ranks within ``(domain, salt)`` where
       ``salt = pmod(hash(id), S)`` — the exchange key carries the
       salt, so the hot domain spreads over ``S`` reducers, each
       ranking ~1/S of it. Keeping per-salt rank ≤ N leaves at most
       ``S·N`` survivors per domain (the global top-N is a subset of
       the per-salt top-Ns — same deterministic order both phases).
    2. **Phase 2** re-ranks the ≤ ``S·N``-row survivors per domain —
       a bounded partition no matter how hot the key was — and keeps
       rank ≤ N. Ranks equal the one-phase form's exactly (parity
       pytest + the shared driver oracle pin it).

    Cost: one extra (tiny, survivor-grain) exchange. Use this form
    when the corpus is URL-keyed but NOT crawl-politeness-bounded
    (link aggregators, wikis); the one-window form stays the cheaper
    default for crawls, whose per-domain row counts are bounded by
    the crawler's own politeness caps."""
    order = (
        [F.col("_q").desc(), F.col("id").asc()]
        if quality_col is not None
        else [F.col("id").asc()]
    )
    d = docs.select(
        F.col(id_col).alias("id"),
        registered_domain_expr(url_col).alias("domain"),
        *([F.col(quality_col).alias("_q")] if quality_col is not None else []),
    ).withColumn("_salt", F.pmod(F.hash(F.col("id")), F.lit(salt)))
    w1 = Window.partitionBy("domain", "_salt").orderBy(*order)
    survivors = (
        d.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= max_per_domain)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("domain").orderBy(*order)
    return (
        survivors.withColumn("domain_rank", F.row_number().over(w2).cast("long"))
        .where(F.col("domain_rank") <= max_per_domain)
        .select("id", "domain", "domain_rank")
    )


def quality_percentile_filter(
    docs: DataFrame,
    keep_frac: float,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the best ``keep_frac`` of documents PER STRATUM (language)
    by the textstats quality score. Exact rule: rank documents within
    each stratum by (quality desc, id asc) and keep rows with
    ``percent_rank ≤ keep_frac`` — deterministic, engine-identical
    (DuckDB's percent_rank is the same (rank−1)/(n−1)). Returns
    ``(id, stratum, quality, pr)`` with quality and pr rounded to 6.

    Scale note: percent_rank needs a full per-stratum sort — fine when
    strata are languages (dozens of partitions, each sortable), wrong
    when strata are fine-grained. The 100-TB variant computes each
    stratum's quality THRESHOLD with ``percentile_approx`` in one
    aggregation (a rows-per-stratum dim), broadcasts it, and filters
    with a scan-level comparison — no global sort; this exact form is
    the oracle-checkable twin."""
    from bootleg_spark.operators.textstats import quality_exprs

    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    q = quality_exprs(text_col)
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).alias("stratum"),
        q["quality"].alias("_q"),
    )
    w = Window.partitionBy("stratum").orderBy(F.col("_q").desc(), F.col("id").asc())
    return (
        d.withColumn("pr", F.percent_rank().over(w))
        .where(F.col("pr") <= keep_frac)
        .select(
            "id",
            "stratum",
            F.round("_q", 6).alias("quality"),
            F.round("pr", 6).alias("pr"),
        )
    )


def quality_threshold_filter(
    docs: DataFrame,
    keep_frac: float,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    accuracy: int = 10000,
) -> DataFrame:
    """The 100-TB execution of :func:`quality_percentile_filter`: keep
    documents whose quality clears their stratum's approximate
    ``(1 − keep_frac)`` quantile. ONE aggregation computes a
    per-stratum threshold dim (rows = number of strata), which
    broadcast-joins back for a scan-level ``>=`` comparison — no
    per-stratum sort anywhere, so the plan survives strata of any
    size.

    Semantics versus the exact twin: a threshold cut keeps EVERY row
    tied at the boundary (the exact percent_rank form truncates ties
    at the fraction), and ``percentile_approx`` carries bounded rank
    error (1/accuracy) — so the keep-set is a SUPERSET of the exact
    form's, with all dropped rows dominated by every kept row
    (pytest-pinned, tests/test_curation.py). Approximate by design →
    no DuckDB oracle; the exact twin carries the driver row."""
    from bootleg_spark.operators.textstats import quality_exprs

    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    q = quality_exprs(text_col)
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).alias("stratum"),
        q["quality"].alias("_q"),
    )
    thr = d.groupBy("stratum").agg(
        F.percentile_approx("_q", 1.0 - keep_frac, accuracy).alias("_thr")
    )
    return (
        d.join(F.broadcast(thr), "stratum")
        .where(F.col("_q") >= F.col("_thr"))
        .select("id", "stratum", F.round("_q", 6).alias("quality"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``, sklearn's smooth_idf formula).
    Terms are lowercased whitespace tokens; ties break by term asc.
    Returns ``(id, term, tf, df, score, rank)``, score rounded to 6.

    Plan: explode → (doc, term) counts (map-side partial agg) → term
    document-frequency dim (second agg over the distinct pairs) → join
    term stats back at pair grain → per-doc top-k window. The df dim
    is vocabulary-sized: broadcast below ~a few GB, else the join
    shuffles on ``term`` with AQE handling the Zipf head — and the
    pair-grain rows carry only (id, term, tf), never the text. The
    corpus size N rides in via one broadcast scalar row. Catalyst
    additionally plans the ``rank ≤ k`` filter as ``WindowGroupLimit``
    on BOTH sides of the final exchange (PLANS.md "TF-IDF keywords") —
    a map-side partial top-k, so the doc-grain shuffle moves at most
    k·(rows per upstream partition), not every (doc, term) pair."""
    pairs = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_dim = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_dim = df_dim.where(F.col("df") >= min_df)
    n_docs = docs.select(
        F.countDistinct(F.col(id_col)).alias("_n")
    )
    scored = (
        pairs.join(df_dim, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "id",
            "term",
            F.col("tf").cast("long"),
            F.col("df").cast("long"),
            F.round("score", 6).alias("score"),
            "rank",
        )
    )
