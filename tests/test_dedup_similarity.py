"""Dedup + similarity operators on small in-memory corpora."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from easyocr_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "completely different text about spark shuffles and partitions"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "unrelated words here nothing shared with others at all"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dup_groups(docs):
    out = dedup.exact_dup_groups(docs).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["n_docs"] == 2
    assert out.iloc[0]["first_doc_id"] == 0


def test_jaccard_exhaustive_finds_near_dup(docs):
    out = dedup.jaccard_pairs_exhaustive(docs, threshold_milli=800).toPandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (0, 3) in pairs  # identical
    assert (0, 1) in pairs and (1, 3) in pairs  # one appended token
    assert not any(2 in p or 4 in p for p in pairs)


def test_minhash_equals_exhaustive(docs):
    ex = dedup.jaccard_pairs_exhaustive(docs, threshold_milli=800).toPandas()
    mh = dedup.minhash_lsh_pairs(docs, threshold_milli=800).toPandas()
    key = ["doc_a", "doc_b", "jaccard_milli"]
    assert sorted(map(tuple, ex[key].values.tolist())) == sorted(
        map(tuple, mh[key].values.tolist())
    )


def test_simhash_identical_docs_distance_zero(docs):
    out = dedup.simhash_pairs(docs, max_hamming=8).toPandas()
    pairs = {(a, b): h for a, b, h in out.values.tolist()}
    assert pairs.get((0, 3)) == 0
    assert (0, 1) in pairs  # near-dup within hamming budget


def test_simhash_signature_portability(spark, docs):
    """Spark signatures must equal the DuckDB oracle's signatures."""
    import duckdb

    sig = dedup.simhash_signatures(docs).toPandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("pdocs", docs.toPandas())
    sql = dedup.duckdb_simhash_pairs_sql("SELECT * FROM pdocs")
    # extract the sig CTE by running the full pair query and checking
    # hamming-0 for identical docs instead
    out = con.sql(sql).df()
    z = out[(out.doc_a == 0) & (out.doc_b == 3)]
    assert len(z) == 1 and z.iloc[0]["hamming"] == 0


def test_simhash128_identical_docs_and_oracle_parity(spark, docs):
    """The 124-bit production variant: identical docs at hamming 0,
    near-dups within budget, and the banded operator equals the
    exhaustive DuckDB oracle exactly (pigeonhole recall 1.0)."""
    import duckdb

    out = dedup.simhash128_pairs(docs, max_hamming=8).toPandas()
    pairs = {(a, b): h for a, b, h in out.values.tolist()}
    assert pairs.get((0, 3)) == 0
    assert (0, 1) in pairs
    con = duckdb.connect()
    con.register("pdocs", docs.toPandas())
    oracle = con.sql(
        dedup.duckdb_simhash128_pairs_sql("SELECT * FROM pdocs")
    ).df()
    key = ["doc_a", "doc_b", "hamming"]
    assert sorted(map(tuple, out[key].values.tolist())) == sorted(
        map(tuple, oracle[key].values.tolist())
    )


def test_with_mutants_plants(docs):
    m = dedup.with_mutants(docs).toPandas()
    assert len(m) == 5 + 1 + 0  # doc 3 -> mutant; no doc_id%25==7 here
    assert (m.doc_id == 3 + dedup.MUTANT_OFFSET).any()


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    vecs[13] = vecs[7] * 1.5  # exact cosine dup
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [v.tolist() for v in vecs]}
    )
    return spark.createDataFrame(pdf)


def test_brute_topk_matches_numpy(spark, emb):
    out = similarity.brute_force_topk(emb, k=3).toPandas()
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.stack(pdf.embedding.map(np.array))
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(0, 40, similarity.QUERY_MOD):
        s = sims[q].copy()
        s[q] = -2
        order = sorted(range(40), key=lambda i: (-np.floor(s[i] * 1e6), i))[:3]
        got = out[out.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == order, q


def test_neardup_finds_scaled_copy(emb):
    out = similarity.neardup_pairs(emb, micro=990_000).toPandas()
    assert ((out.id_a == 7) & (out.id_b == 13)).any()


def test_brute_topk_combiner_equals_window_twin(emb):
    """The per-partition Arrow-combiner top-k must be row-for-row equal
    to the single-window oracle twin, including under a repartition that
    scatters each query's candidates across many partitions."""
    scattered = emb.repartition(7)
    a = (
        similarity.brute_force_topk(scattered, k=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        similarity.brute_force_topk_window(scattered, k=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_ivf_topk_zero_norm_and_empty_codebook(spark, emb):
    """ADVICE r3: a zero-norm embedding must not produce NaN-cast
    garbage (defined sentinel, deterministic assignment), and an input
    with no vec_id % CENTROID_MOD == 3 centroids must raise clearly."""
    with_zero = emb.unionByName(
        spark.createDataFrame(
            pd.DataFrame({"vec_id": [39 + 1], "embedding": [[0.0] * 8]})
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
    )
    out = similarity.ivf_topk(with_zero, k=3).toPandas()
    assert len(out) > 0  # runs clean; zero vector never NaN-crashes
    # empty codebook: keep only ids whose residue can't be 3
    no_cents = emb.filter(F.col("vec_id") % similarity.CENTROID_MOD != 3)
    with pytest.raises(ValueError, match="no centroids"):
        similarity.ivf_topk(no_cents, k=3)


def test_pq_topk_zero_norm_and_empty_codebook(spark, emb):
    """ADVICE r4: pq_topk gets the same zero-norm discipline ivf_topk
    has — a zero-norm vector in the corpus (and even in the TRAINING
    subset) must neither raise ZeroDivisionError in _py_normalize nor
    NaN-argmin in encode nor DIVIDE_BY_ZERO in the exact re-rank; and
    an input with no training rows must raise clearly."""
    # id 43: % CENTROID_MOD(20) == 3 -> lands IN the training subset,
    # exercising the _py_normalize zero guard too
    with_zero = emb.unionByName(
        spark.createDataFrame(
            pd.DataFrame({"vec_id": [43], "embedding": [[0.0] * 8]})
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
    )
    out = similarity.pq_topk(with_zero, k=3).toPandas()
    assert len(out) > 0  # runs clean end-to-end
    # the ORACLE mirrors the zero-norm discipline (zero pin in nemb,
    # ranks-last sentinel in the re-rank): full engine parity on a
    # corpus containing a zero vector, not just "doesn't crash". The
    # registered oracle is pinned to the driver table's 64-dim schema,
    # so the parity corpus is 64-dim (zero vector at id 43 -> IN the
    # training subset).
    import duckdb

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(44, 64))
    vecs[43] = 0.0
    pdf64 = pd.DataFrame(
        {"vec_id": range(44), "embedding": [v.tolist() for v in vecs]}
    )
    emb64 = spark.createDataFrame(pdf64).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out64 = similarity.pq_topk(emb64, k=3).toPandas()
    con = duckdb.connect()
    con.register("embeddings", emb64.toPandas())
    oracle = con.sql(similarity.duckdb_pq_topk_sql(k=3)).df()
    key = ["query_id", "neighbor_id", "rank", "cos_micro", "adc_micro"]
    assert sorted(map(tuple, out64[key].astype("int64").values.tolist())) == sorted(
        map(tuple, oracle[key].astype("int64").values.tolist())
    )
    # the pure-python normalize guard directly
    assert similarity._py_normalize([0.0, 0.0]) == [0.0, 0.0]
    no_train = emb.filter(F.col("vec_id") % similarity.CENTROID_MOD != 3)
    with pytest.raises(ValueError, match="empty codebook"):
        similarity.pq_topk(no_train, k=3)


def test_ivf_topk_recall_vs_brute(emb):
    """IVF with nprobe=2 over a 40-vector corpus: candidates are a
    corpus subset, so ranks are exact-within-list; recall@3 vs brute
    force should be high but the contract is determinism, not recall."""
    ivf = similarity.ivf_topk(emb, k=3).toPandas()
    brute = similarity.brute_force_topk(emb, k=3).toPandas()
    assert set(ivf.query_id) == set(brute.query_id)
    # every emitted neighbor must carry the exact cosine the brute path
    # computed for the same pair
    merged = ivf.merge(brute, on=["query_id", "neighbor_id"], suffixes=("_i", "_b"))
    assert (merged.cos_micro_i == merged.cos_micro_b).all()
    hits = len(merged)
    assert hits >= len(brute) // 2  # sane recall on random data


def test_dedup_components_clusters_mutant_chains(spark, docs):
    """A doc with both a mutant (doc_id+1e6) and an exact copy
    (doc_id+2e6) forms one 3-member component labeled by the original
    (min) id."""
    import pandas as pd

    pdf = pd.DataFrame({
        "doc_id": [3, 7, 11],
        "text": [
            " ".join(f"tok{i}" for i in range(30)),   # %10==3 -> mutant
            " ".join(f"foo{i}" for i in range(30)),   # %25==7 -> exact copy
            " ".join(f"bar{i}" for i in range(30)),   # 11: no twins planted
        ],
    })
    base = spark.createDataFrame(pdf)
    out = dedup.dedup_components(dedup.with_mutants(base)).toPandas()
    comp3 = out[out.component_id == 3]
    assert set(comp3.doc_id) == {3, 3 + dedup.MUTANT_OFFSET}
    assert (comp3.n_members == 2).all()
    comp7 = out[out.component_id == 7]
    assert set(comp7.doc_id) == {7, 7 + dedup.EXACT_OFFSET}
    assert 11 not in set(out.doc_id)  # no near-dups -> not in any component


def test_df_cap_bounds_hot_shingle_candidates(spark):
    """A boilerplate shingle shared by every doc quadratic-blows the
    shingle-equality join; the df-cap must drop it, bounding candidate
    mass, while true near-dup pairs (shared RARE shingles) survive."""
    boiler = "subscribe to our newsletter today"
    rows = []
    for d in range(40):
        rows.append((d, f"{boiler} unique{d}a unique{d}b unique{d}c"))
    # one true near-dup pair sharing plenty of rare shingles
    rows.append((100, boiler + " alpha beta gamma delta epsilon zeta eta"))
    rows.append((101, boiler + " alpha beta gamma delta epsilon zeta eta x"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    sh = dedup.shingle_sets(docs)
    capped = dedup.df_capped_shingles(sh, df_cap=10)
    join_rows = lambda s: (
        s.select(F.col("doc_id").alias("a"), "shingle")
        .join(s.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .count()
    )
    uncapped_mass = join_rows(sh)
    capped_mass = join_rows(capped)
    assert uncapped_mass > 42 * 41 / 2  # hot shingles touch every pair
    assert capped_mass < 100            # bounded: only rare-shingle pairs

    # capped LSH still finds the real near-dup, loses boilerplate-only J
    pairs = dedup.minhash_lsh_pairs(docs, df_cap=10).toPandas()
    assert (100, 101) in set(zip(pairs.doc_a, pairs.doc_b))
    assert all((a, b) == (100, 101) for a, b in zip(pairs.doc_a, pairs.doc_b))
    # capped exhaustive agrees with capped LSH (same capped contract)
    ex = dedup.jaccard_pairs_exhaustive(docs, df_cap=10).toPandas()
    assert sorted(zip(ex.doc_a, ex.doc_b, ex.jaccard_milli)) == sorted(
        zip(pairs.doc_a, pairs.doc_b, pairs.jaccard_milli)
    )


def test_star_contraction_long_chain_logarithmic(spark):
    """A planted path of diameter 40 — which min-label propagation would
    need 40 rounds for (and the pre-round-4 implementation raised on at
    >12) — must converge via alternating star contraction in O(log n)
    alternations and label every node with the chain minimum."""
    import pandas as pd

    n = 41  # path 0-1-2-...-40, diameter 40
    edges = spark.createDataFrame(
        pd.DataFrame({"u": list(range(n - 1)), "v": list(range(1, n))})
    )
    labels, rounds = dedup._star_contract(edges, max_rounds=12)
    assert rounds <= 7, f"star contraction took {rounds} rounds on a 40-chain"
    out = labels.toPandas()
    assert len(out) == n
    assert set(out.doc_id) == set(range(n))
    assert (out.comp == 0).all()


def test_star_contraction_multiple_components_and_orientation(spark):
    """Components stay separate; input edge orientation is irrelevant;
    duplicate and reversed edges collapse."""
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                # component {0,1,2} (one edge reversed, one duplicated),
                # component {10,11}, and a triangle {20,21,22}
                "u": [1, 2, 1, 11, 20, 21, 22],
                "v": [0, 1, 0, 10, 21, 22, 20],
            }
        )
    )
    labels, _ = dedup._star_contract(edges, max_rounds=12)
    out = labels.toPandas().set_index("doc_id")["comp"].to_dict()
    assert out == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_pq_topk_deterministic_and_reranked(spark, emb):
    """PQ/ADC ANN on the in-memory corpus: candidates come from the
    8-byte codes, output ranks are EXACT cosines (re-ranked), every
    emitted cosine equals the brute-force value for the same pair, and
    the whole thing is deterministic across invocations."""
    pq = similarity.pq_topk(emb, k=3).toPandas()
    brute = similarity.brute_force_topk_window(emb, k=len(emb.toPandas())).toPandas()
    merged = pq.merge(brute, on=["query_id", "neighbor_id"], suffixes=("_p", "_b"))
    assert len(merged) == len(pq)  # every PQ pair exists in the full rank
    assert (merged.cos_micro_p == merged.cos_micro_b).all()
    # within the emitted rows, ranks follow exact cosine
    for q in pq.query_id.unique():
        sub = pq[pq.query_id == q].sort_values("rank")
        assert (sub.cos_micro.diff().dropna() <= 0).all()
    again = similarity.pq_topk(emb, k=3).toPandas()
    assert pq.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_pq_topk_empty_codebook_raises(spark, emb):
    from pyspark.sql import functions as F

    no_train = emb.filter(F.col("vec_id") % similarity.CENTROID_MOD != 3)
    with pytest.raises(ValueError, match="empty codebook"):
        similarity.pq_topk(no_train)


def test_duplicate_spans_exact_boundaries(spark):
    """Planted shared substring mid-document: the merged span must
    cover exactly the shared window positions (start at the first
    window start, end at last window start + n), within-doc-only
    repetition must NOT count, and disjoint shared regions stay
    separate islands."""
    shared = " ".join(f"s{i}" for i in range(12))       # 12 shared tokens
    shared2 = " ".join(f"z{i}" for i in range(10))      # second shared run
    rows = [
        # doc 0: 5 unique tokens, shared(12), 8 unique, shared2(10)
        (0, "a0 a1 a2 a3 a4 " + shared + " b0 b1 b2 b3 b4 b5 b6 b7 " + shared2),
        # doc 1 carries both shared runs at different offsets
        (1, shared + " c0 c1 c2 " + shared2),
        # doc 2: repeats ITS OWN 10-gram twice but shares nothing
        (2, " ".join(f"w{i}" for i in range(10)) + " x " + " ".join(f"w{i}" for i in range(10))),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dedup.duplicate_spans(docs, n=10).toPandas()
    got = {
        (r.doc_id, r.span_start, r.span_end_excl)
        for r in out.itertuples()
    }
    # doc 0: shared(12 tokens) at positions 5..16 -> windows 5,6,7 ->
    # span [5, 17); shared2 at 25..34 -> window 25 -> span [25, 35)
    # doc 1: windows 0,1,2 -> [0, 12); window 15 -> [15, 25)
    assert got == {(0, 5, 17), (0, 25, 35), (1, 0, 12), (1, 15, 25)}
    assert 2 not in set(out.doc_id)  # within-doc repetition excluded


def test_dedup_keeplist_decisions(spark):
    """Keep the min-id canonical per component, drop other members,
    keep unclustered docs with component_id -1."""
    pdf = pd.DataFrame({
        "doc_id": [3, 11],
        "text": [
            " ".join(f"tok{i}" for i in range(30)),   # %10==3 -> mutant twin
            " ".join(f"bar{i}" for i in range(30)),   # no twins
        ],
    })
    out = (
        dedup.dedup_keeplist(dedup.with_mutants(spark.createDataFrame(pdf)))
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[3, "keep"]) and out.loc[3, "component_id"] == 3
    assert not bool(out.loc[3 + dedup.MUTANT_OFFSET, "keep"])
    assert out.loc[3 + dedup.MUTANT_OFFSET, "component_id"] == 3
    assert bool(out.loc[11, "keep"]) and out.loc[11, "component_id"] == -1


def test_pagerank_path_graph_exact(spark):
    """Hand-computed 5-iteration damped integer PageRank on the path
    graph 1-2-3: the middle node accumulates rank; endpoints stay
    symmetric. Values verified by hand per iteration (micro units,
    150000 + (850 * sum(r div deg)) div 1000)."""
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 2, 3], "dst": [2, 1, 3, 2]})
    )
    out = (
        dedup._pagerank(edges).toPandas().set_index("node")["r"].to_dict()
    )
    assert out == {1: 668336, 2: 1663323, 3: 668336}


def test_decontaminate_spans_localizes_leak(spark):
    """The train doc sharing a 12-token run with an eval doc gets ONE
    maximal span at exactly the shared tokens' positions (windows at
    5/6/7 -> span [5, 17)); the eval doc itself and clean train docs
    emit nothing."""
    shared = " ".join(f"s{i}" for i in range(12))
    pdf = pd.DataFrame({
        "doc_id": [7, 3, 11],
        "text": [
            shared + " " + " ".join(f"e{i}" for i in range(8)),   # eval
            " ".join(f"x{i}" for i in range(5)) + " " + shared,   # leaks
            " ".join(f"u{i}" for i in range(15)),                 # clean
        ],
    })
    res = dedup.decontaminate_spans(spark.createDataFrame(pdf), n=10)
    out = res.toPandas()
    res.unpersist()  # caller-owned cache (the decontaminate contract)
    assert list(out["doc_id"]) == [3]
    row = out.iloc[0]
    assert (row["span_start"], row["span_end_excl"], row["n_windows"]) == (
        5, 17, 3,
    )


def test_decontaminate_counts_eval_gram_hits(spark):
    """A train doc sharing a 12-token run with an eval doc (id%100==7)
    is flagged with exactly the 3 fully-contained 10-token windows;
    clean train docs report zero; eval docs never appear."""
    shared = " ".join(f"s{i}" for i in range(12))
    pdf = pd.DataFrame({
        "doc_id": [7, 3, 11],
        "text": [
            shared + " " + " ".join(f"e{i}" for i in range(8)),   # eval
            " ".join(f"x{i}" for i in range(5)) + " " + shared,   # leaks
            " ".join(f"u{i}" for i in range(15)),                 # clean
        ],
    })
    out = (
        dedup.decontaminate(spark.createDataFrame(pdf), n=10)
        .toPandas()
        .set_index("doc_id")
    )
    assert set(out.index) == {3, 11}  # eval doc 7 excluded
    assert out.loc[3, "n_contaminated"] == 3  # windows at pos 5,6,7
    assert out.loc[3, "n_grams"] == 8         # 17 tokens -> 8 windows
    assert out.loc[11, "n_contaminated"] == 0
    assert out.loc[11, "n_grams"] == 6


def test_dedup_keeplist_shuffle_parity(spark):
    """At web scale the component table (30-50% of the corpus) is not
    broadcastable: with broadcast disabled the keeplist left join must
    take a shuffle shape and produce identical decisions."""
    pdf = pd.DataFrame({
        "doc_id": [3, 11, 23],
        "text": [
            " ".join(f"tok{i}" for i in range(30)),
            " ".join(f"bar{i}" for i in range(30)),
            " ".join(f"baz{i}" for i in range(30)),
        ],
    })
    docs = dedup.with_mutants(spark.createDataFrame(pdf))
    base = set(map(tuple, dedup.dedup_keeplist(docs).toPandas().itertuples(index=False)))
    old = docs.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        docs.sparkSession.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        forced_df = dedup.dedup_keeplist(docs)
        plan = forced_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        forced = set(map(tuple, forced_df.toPandas().itertuples(index=False)))
    finally:
        docs.sparkSession.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert forced == base


def test_curation_manifest_reason_ladder(spark):
    """Every rule of the end-product keep/drop ladder fires on a
    crafted corpus, in first-match order: eval_holdout > duplicate >
    contaminated > quality bucket > repetitive > ok."""
    from easyocr_spark.operators import curation

    shared = " ".join(f"s{i}" for i in range(12))
    dup_text = " ".join(f"d{i}" for i in range(30))
    pdf = pd.DataFrame({
        "doc_id": [7, 20, 21, 3, 5, 9, 11, 13],
        "text": [
            shared + " " + " ".join(f"e{i}" for i in range(8)),  # eval
            dup_text,                                            # canonical
            dup_text,                                            # duplicate
            " ".join(f"x{i}" for i in range(5)) + " " + shared,  # contaminated
            "just three tokens",                                 # too_short
            "the a an of to in is and or for the a",             # boilerplate
            " ".join(["rep"] * 25 + [f"y{i}" for i in range(5)]),  # repetitive
            " ".join(f"ok{i}" for i in range(30)),               # ok
        ],
    })
    out = (
        curation.curation_manifest(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[7, "reason"] == "eval_holdout"
    assert out.loc[20, "reason"] == "ok" and bool(out.loc[20, "keep"])
    assert out.loc[21, "reason"] == "duplicate"
    assert out.loc[3, "reason"] == "contaminated"
    assert out.loc[5, "reason"] == "too_short"
    assert out.loc[9, "reason"] == "boilerplate"
    assert out.loc[11, "reason"] == "repetitive"
    assert out.loc[13, "reason"] == "ok" and bool(out.loc[13, "keep"])
    assert not out.drop([20, 13]).keep.any()


def test_dup_source_matrix_semantics_and_parity(spark):
    """Docs 0/3 are near-identical across src_a/src_b -> one off-diag
    cell; doc 3 also spawns a mutant (doc_id%10==3) inheriting src_b ->
    the (src_b, src_b) diagonal cell; sources canonicalize
    least/greatest; DuckDB twin agrees exactly."""
    import duckdb

    t = "the quick brown fox jumps over the lazy dog again and again"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 2, 3, 4],
            "text": [
                t,
                "completely different text about spark shuffles and partitions",
                t,
                "unrelated words here nothing shared with others at all",
            ],
            "source": ["src_a", "src_c", "src_b", "src_c"],
        }
    )
    out = (
        dedup.dup_source_matrix(spark.createDataFrame(pdf), threshold_milli=800)
        .toPandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    cells = {
        (r.source_a, r.source_b): (r.n_pairs, r.mean_jaccard_milli)
        for r in out.itertuples()
    }
    # cross-source near-identical pair: 0 vs 3 AND 0 vs mutant(3)
    assert ("src_a", "src_b") in cells
    # doc 3's mutant inherits src_b: within-source cell exists
    assert ("src_b", "src_b") in cells
    assert cells[("src_b", "src_b")][1] >= 800
    # the unrelated source never appears
    assert not any("src_c" in c for c in cells)
    con = duckdb.connect()
    con.register("documents", pdf)
    d = (
        con.sql(dedup.duckdb_dup_source_matrix_sql(threshold_milli=800))
        .df()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n_pairs": "int64", "mean_jaccard_milli": "int64"}), d
    )


def test_mask_duplicate_spans_end_product(spark):
    """Tokens inside cross-doc duplicate spans are stripped (12-token
    shared run >= the 10-token window), untouched docs keep all tokens,
    and the DuckDB twin reproduces counts AND cleaned-text md5
    bit-for-bit."""
    import duckdb

    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                common + " tail one two",
                "head words here " + common,
                "nothing shared at all in this one document",
            ],
        }
    )
    out = (
        dedup.mask_duplicate_spans(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_toks.tolist() == [15, 15, 8]
    # the shared 12-token run is fully masked in both carriers
    assert out.n_kept.tolist() == [3, 3, 8]
    con = duckdb.connect()
    con.register("documents", pdf)
    d = (
        con.sql(dedup.duckdb_mask_spans_sql("SELECT * FROM documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, d.astype(out.dtypes.to_dict()))


def test_snapshot_dedup_keeps_novel_drops_copies(spark):
    """New-crawl docs: a verbatim copy (J=1000) and a 2-token-suffixed
    near-copy (10 common / 12 union = 833 milli >= 800) are dropped
    with the right best match; a disjoint novel doc is kept."""
    old = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [" ".join(f"w{i}" for i in range(12))]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [100, 101, 102],
            "text": [
                " ".join(f"w{i}" for i in range(12)) + " x y",
                " ".join(f"z{i}" for i in range(12)),
                " ".join(f"w{i}" for i in range(12)),
            ],
        })
    )
    res = dedup.snapshot_dedup(old, new)
    out = res.toPandas().set_index("doc_id")
    res.unpersist()
    assert out.loc[100].tolist() == [False, 1, 833]
    assert out.loc[101].tolist() == [True, -1, 0]
    assert out.loc[102].tolist() == [False, 1, 1000]


# ---------------------------------------------------- hard-negative mining
def test_hard_negatives_numpy_and_semantics(spark):
    """Hand-checkable mining: labels assigned so anchor 0 has one
    strong positive and negatives straddling the semi-hard band."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    vecs[5] = vecs[0] * 2.0          # same-label clone: pos_cos = 1.0
    labels = [i % 3 for i in range(30)]
    labels[5] = 0                    # anchor 0's positive
    pdf = pd.DataFrame(
        {
            "vec_id": range(30),
            "embedding": [v.tolist() for v in vecs],
            "label": labels,
        }
    )
    out = similarity.hard_negatives(spark.createDataFrame(pdf)).toPandas()
    mat = np.stack(pdf.embedding.map(np.array))
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(0, 30, similarity.QUERY_MOD):
        negs = [
            i
            for i in range(30)
            if i != q and labels[i] != labels[q]
        ]
        order = sorted(
            negs, key=lambda i: (-np.floor(sims[q][i] * 1e6), i)
        )[: similarity.HN_K]
        sub = out[out.query_id == q].sort_values("neg_rank")
        assert sub.neighbor_id.tolist() == order, q
        # pos = best same-label cosine (anchor 0's clone gives ~1.0)
        pos = max(
            np.floor(sims[q][i] * 1e6)
            for i in range(30)
            if i != q and labels[i] == labels[q]
        )
        assert (sub.pos_cos_micro == pos).all()
        for _, r in sub.iterrows():
            expect = (
                r.cos_micro < pos
                and r.cos_micro + similarity.HN_MARGIN_MICRO > pos
            )
            assert bool(r.is_semi_hard) == expect


def test_hard_negatives_singleton_label_sentinel(spark):
    """An anchor whose label has no second member gets the HN_NO_POS
    sentinel and is_semi_hard false on every row (never NULL)."""
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(21, 8)).astype("float32")
    labels = [9 if i == 0 else 1 for i in range(21)]  # anchor 0 singleton
    pdf = pd.DataFrame(
        {
            "vec_id": range(21),
            "embedding": [v.tolist() for v in vecs],
            "label": labels,
        }
    )
    out = similarity.hard_negatives(spark.createDataFrame(pdf)).toPandas()
    a0 = out[out.query_id == 0]
    assert len(a0) == similarity.HN_K
    assert (a0.pos_cos_micro == similarity.HN_NO_POS).all()
    assert (~a0.is_semi_hard).all()
    assert out.is_semi_hard.notna().all()


# ----------------------------------------- content-defined chunking (CDC)
def test_cdc_chunks_shift_resistance_and_coverage(spark):
    """The CDC property: prepending text to a doc changes only the
    chunks up to the first shared cut — the suffix chunk md5s realign.
    Also pins full coverage (chunk lens sum to doc len, contiguous
    starts) and the short-doc/empty-doc whole-chunk edges."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [base, "INSERTED PREFIX " + base, "short", ""],
        }
    )
    out = dedup.cdc_chunks(spark.createDataFrame(pdf)).toPandas()
    for did, text in zip(pdf.doc_id, pdf.text):
        sub = out[out.doc_id == did].sort_values("chunk_idx")
        assert sub.chunk_len.sum() == len(text)
        assert list(sub.start) == [
            1 + int(sub.chunk_len[: i].sum()) for i in range(len(sub))
        ]
    # shift resistance: doc 2 = prefix + doc 1; their chunk-md5 SETS
    # must share the aligned suffix chunks (at least the final chunk
    # of doc 1 persists unless a cut never re-synchronizes, which for
    # a 360-char doc with divisor 64 is astronomically unlikely)
    m1 = set(out[out.doc_id == 1].chunk_md5)
    m2 = set(out[out.doc_id == 2].chunk_md5)
    assert m1 & m2, "no shared chunks after prefix insertion"
    # short + empty docs: one whole-doc chunk each
    import hashlib

    s3 = out[out.doc_id == 3]
    assert len(s3) == 1 and int(s3.chunk_len.iloc[0]) == 5
    assert s3.chunk_md5.iloc[0] == hashlib.md5(b"short").hexdigest()
    s4 = out[out.doc_id == 4]
    assert len(s4) == 1 and int(s4.chunk_len.iloc[0]) == 0
    assert s4.chunk_md5.iloc[0] == hashlib.md5(b"").hexdigest()


def test_cdc_chunks_engine_parity(spark):
    import duckdb

    pdf = pd.DataFrame(
        {
            "doc_id": range(12),
            "text": [
                ("spark filter join merge sort batch row %d " % i) * (i + 2)
                for i in range(12)
            ],
        }
    )
    got = (
        dedup.cdc_chunks(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(dedup.duckdb_cdc_chunks_sql())
        .df()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 12
    for col in ["doc_id", "chunk_idx", "start", "chunk_len", "chunk_md5"]:
        assert list(got[col]) == list(exp[col]), col


# --------------------------------------------------- n-gram novelty audit
def test_ngram_novelty_exact_counts(spark):
    """Hand corpus: doc 1 and 2 share one 3-gram window; doc 3 is
    fully unique; a verbatim clone pair has zero novelty."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d",          # grams: (a b c), (b c d)
                "x a b c",          # grams: (x a b), (a b c) <- shared
                "p q r s",          # both grams unique
                "m n o p q",        # clone of 5
                "m n o p q",
            ],
        }
    )
    out = (
        dedup.ngram_novelty(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_distinct_grams"] == 2
    assert out.loc[1, "n_novel_grams"] == 1      # (b c d) only
    assert out.loc[1, "novelty_milli"] == 500
    assert out.loc[2, "n_novel_grams"] == 1      # (x a b) only
    assert out.loc[3, "novelty_milli"] == 1000
    # clones: every gram has df=2 -> novelty 0
    assert out.loc[4, "novelty_milli"] == 0
    assert out.loc[5, "novelty_milli"] == 0
    # engine parity on the same frame
    import duckdb

    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(dedup.duckdb_ngram_novelty_sql("SELECT * FROM documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = out.reset_index().sort_values("doc_id").reset_index(drop=True)
    for col in ["doc_id", "n_distinct_grams", "n_novel_grams", "novelty_milli"]:
        assert list(got[col]) == list(exp[col]), col


# ---------------------------------------------------------------- datacard
def test_datacard_rollup_invariants(spark):
    """The datacard must partition every manifest doc into exactly one
    (source, reason) cell, synthetic ids land on the 'synthetic'
    source, and per-source doc shares sum to ~1000 milli."""
    from easyocr_spark.operators import curation

    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                " ".join(f"w{(i * 7 + j) % 23}" for j in range(30))
                for i in range(40)
            ],
            "lang": ["en"] * 40,
            "source": [f"src{i % 3}" for i in range(40)],
            "n_chars": [0] * 40,
        }
    )
    raw = spark.createDataFrame(pdf)
    aug = dedup.with_mutants(raw)
    n_aug = aug.count()
    out = curation.datacard(aug, raw).toPandas()
    assert int(out.n_docs.sum()) == n_aug
    # synthetic mutant/clone ids exist in this frame and attribute there
    assert "synthetic" in set(out.source)
    for src, grp in out.groupby("source"):
        total = grp.n_docs.sum()
        # floor division: sum of milli shares in (1000 - #cells, 1000]
        assert 1000 - len(grp) < grp.docs_milli.sum() <= 1000, src
        assert (grp.n_tokens > 0).all()
    out2 = curation.datacard(aug, raw)
    out2.unpersist()


def test_simhash_dictionary_shuffle_parity(spark):
    """The SimHash token dictionary is the distinct whitespace tokens
    of a raw web corpus — 10^9+ rows at 100 TB, NOT broadcastable. With
    broadcast disabled the dictionary-encode join must take a shuffle
    shape and the banded pair output must be identical (the
    dedup_keeplist/strip_boilerplate discipline, round-5 verdict #2)."""
    pdf = pd.DataFrame({
        "doc_id": [3, 11, 23],
        "text": [
            " ".join(f"tok{i}" for i in range(30)),
            " ".join(f"bar{i}" for i in range(30)),
            " ".join(f"baz{i}" for i in range(30)),
        ],
    })
    docs = dedup.with_mutants(spark.createDataFrame(pdf))
    base = set(
        map(tuple, dedup.simhash_pairs(docs).toPandas().itertuples(index=False))
    )
    old = docs.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        docs.sparkSession.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sig = dedup.simhash_signatures(docs)
        plan = sig._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        forced = set(
            map(
                tuple,
                dedup.simhash_pairs(docs).toPandas().itertuples(index=False),
            )
        )
    finally:
        docs.sparkSession.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert forced == base
