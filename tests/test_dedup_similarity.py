"""Dedup + similarity operator goldens on crafted micro-data."""

import numpy as np
import pyspark.sql.functions as F

from bootleg_spark.operators import dedup, similarity


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_dedup_exact(spark):
    d = _docs(spark, ["a b c", "a b c", "x y z"])
    rows = {r["content_hash"]: r for r in dedup.dedup_exact(d).collect()}
    assert len(rows) == 2
    dup = [r for r in rows.values() if r["dup_count"] == 2][0]
    assert dup["keep_id"] == 0


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base.replace("dog", "cat")
    far = "completely different words in this sentence about spark plans"
    d = _docs(spark, [base, near, far])
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(d).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_jaccard_golden(spark):
    d = _docs(spark, ["a b c d", "a b c e", "p q r s"])
    # 3-shingles: doc0 {abc, bcd}, doc1 {abc, bce} → inter 1, union 3
    rows = dedup.ngram_jaccard_pairs(d, threshold=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["n_inter"]) == (0, 1, 1)
    assert abs(r["jaccard"] - 1 / 3) < 1e-6


def test_simhash_identical_docs_pair(spark):
    d = _docs(spark, ["spark join filter window", "spark join filter window", "zzz yyy xxx www"])
    sigs = {r["id"]: r["simhash"] for r in dedup.simhash_signatures(d).collect()}
    assert sigs[0] == sigs[1] != sigs[2]
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.simhash_near_pairs(d).collect()}
    assert (0, 1) in pairs


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)], ["vec_id", "embedding"]
    )
    got = similarity.cosine_topk_bruteforce(df, n_queries=3, k=4).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(3):
        expected = sorted(
            ((round(float(sims[q, j]), 6), j) for j in range(20) if j != q),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        mine = sorted(
            [(r["cos_sim"], r["neighbor_id"]) for r in got if r["query_id"] == q],
            key=lambda t: (-t[0], t[1]),
        )
        assert [(round(s, 5), j) for s, j in mine] == [(round(s, 5), j) for s, j in expected]


def test_dup_clusters_chain_and_components(spark):
    """Pointer-jumping converges on a long chain (the O(diameter)
    killer for plain propagation) and keeps components separate."""
    from bootleg_spark.operators.dedup import dup_clusters

    chain = [(i, i + 1) for i in range(1, 30)]  # path 1-2-...-30
    other = [(100, 101), (101, 102), (100, 102)]  # triangle
    pairs = spark.createDataFrame(chain + other, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs, max_iter=10).collect()}
    assert all(got[i] == 1 for i in range(1, 31))
    assert all(got[i] == 100 for i in (100, 101, 102))
    assert len(got) == 33


def test_dedup_keep_singletons_and_clusters(spark):
    """Keep-one-per-cluster: singletons keep themselves; within a
    near-dup cluster only the smallest id survives."""
    from bootleg_spark.operators.dedup import dedup_keep

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4)], ["id_a", "id_b"]
    )
    got = {r["id"]: (r["cluster_id"], r["keep"]) for r in dedup_keep(docs, pairs).collect()}
    assert got == {
        0: (0, 1),  # singleton
        1: (1, 1),  # cluster {1,3,5} representative
        2: (2, 1),  # cluster {2,4} representative
        3: (1, 0),
        4: (2, 0),
        5: (1, 0),
    }


def _emb_df(spark, n=60, d=8, seed=11):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d).astype("float32")
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)], ["vec_id", "embedding"]
    )


def test_ivf_full_probe_equals_bruteforce(spark):
    # n_probe = n_cells scans every cell: identical result set, scores,
    # ranks, and tie order as the exact path
    df = _emb_df(spark)
    exact = sorted(map(tuple, similarity.cosine_topk_bruteforce(df, n_queries=4, k=5).collect()))
    ivf = sorted(
        map(tuple, similarity.ivf_topk(df, n_queries=4, k=5, n_cells=4, n_probe=4).collect())
    )
    assert ivf == exact


def test_ivf_recall_improves_with_probes(spark):
    df = _emb_df(spark)
    exact = similarity.cosine_topk_bruteforce(df, n_queries=6, k=5).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}

    def recall(n_probe):
        got = similarity.ivf_topk(df, n_queries=6, k=5, n_cells=4, n_probe=n_probe).collect()
        hits = {(r["query_id"], r["neighbor_id"]) for r in got} & truth
        return len(hits) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1  # more probes never hurt
    assert r2 >= 0.5  # and reach useful recall on this fixture


def test_winnowing_guarantee_and_short_doc_fallback(spark):
    from bootleg_spark.operators import textstats

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = w + n - 1 (w=4, n=3)
    docs = _docs(
        spark,
        [
            f"one two {shared} three four",
            f"nine eight seven {shared} six",
            "tiny doc here",  # 1 shingle < w -> whole-doc fallback window
        ],
    )
    fps = textstats.winnow_fingerprints(docs, w=4, shingle_n=3).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    # winnowing guarantee: a shared run of w+n-1 words yields a common fp
    assert by_doc[0] & by_doc[1]
    # short doc still fingerprints (global-min fallback), exactly one fp
    assert len(by_doc[2]) == 1


def test_ivf_table_layout_prunes_and_matches(spark, tmp_path):
    """The IVF index-as-table-layout: full probe reproduces the exact
    brute-force rows through the table; 1-probe opens a strict subset
    of data files (manifest stats pruning on the cell column) and only
    returns neighbors from probed cells."""
    from bootleg_spark.sources import snaptable as st

    df = _emb_df(spark)
    table = str(tmp_path / "vecs")
    snap = similarity.build_ivf_table(spark, df, table, n_cells=4)
    assert snap["ivf"]["n_cells"] == 4 and len(snap["ivf"]["centroids"]) <= 4
    n_files = len(snap["files"])
    assert n_files >= 2  # range partitioning really split the cells

    exact = sorted(
        map(tuple, similarity.cosine_topk_bruteforce(df, n_queries=4, k=5).collect())
    )
    full = sorted(
        map(
            tuple,
            similarity.ivf_table_topk(spark, table, n_queries=4, k=5, n_probe=4).collect(),
        )
    )
    assert full == exact

    # 1-probe: fewer files opened than the table holds
    one = similarity.ivf_table_topk(spark, table, n_queries=4, k=5, n_probe=1)
    rows = one.collect()
    assert len(rows) > 0
    # every neighbor's cell must be a probed cell for its query
    cell_of = {
        r["vec_id"]: r["cell"]
        for r in st.read_table(spark, table).select("vec_id", "cell").collect()
    }
    # probe cells per query = the query vector's own cell at n_probe=1
    for r in rows:
        assert cell_of[r["neighbor_id"]] == cell_of[r["query_id"]]
    # pruning evidence: a single cell's file set is smaller than all
    some_cell = cell_of[0]
    _, pruned = st.plan_files(table, prune=("cell", "in", [some_cell]))
    assert len(pruned) < n_files


def test_ivf_table_topk_no_queries_returns_empty(spark, tmp_path):
    """ADVICE r05 low: with no row satisfying id < n_queries the probe
    set is empty — must return an empty typed frame, not crash on
    spark.read.parquet() with zero paths."""
    df = _emb_df(spark)
    table = str(tmp_path / "vecs")
    similarity.build_ivf_table(spark, df, table, n_cells=4)
    out = similarity.ivf_table_topk(spark, table, n_queries=0, k=5, n_probe=1)
    assert out.columns == ["query_id", "neighbor_id", "rank", "cos_sim"]
    assert out.count() == 0
