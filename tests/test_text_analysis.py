"""Training-data text operators on a hand-checkable corpus (the DuckDB
oracles are the primary gate; these pin the semantics on tiny inputs)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from easyocr_spark.operators import text_analysis as ta


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick fox", "en"),
        (1, "the quick fox", "en"),
        (2, "quick fox runs", "en"),
        (3, "der schnelle fuchs", "de"),
        (10, "la zorra", "es"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )


def test_top_ngrams_counts_and_order(docs):
    out = ta.top_ngrams(docs, n=2, k=3).toPandas()
    assert out.values.tolist() == [
        ["quick fox", 3],
        ["the quick", 2],
        ["der schnelle", 1],  # count-1 ties break ngram-ascending
    ]


def test_top_ngrams_short_doc_guard(spark):
    one = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["word"]}))
    # 1 token < n=2: the sequence(1, 0) trap must yield zero n-grams
    assert ta.top_ngrams(one, n=2).count() == 0


def test_doc_frequency(docs):
    out = ta.doc_frequency(docs).toPandas().set_index("token")
    assert out.loc["fox", "df"] == 3
    assert out.loc["the", "df"] == 2
    assert (out["total_docs"] == 5).all()
    assert out.loc["fox", "df_per_mille"] == 600


def test_stratified_sample_deterministic_and_capped(docs):
    out = ta.stratified_sample(docs, target_per_stratum=1).toPandas()
    # rates: en 1/3 -> 333, de 1/1 -> 1000, es 1/1 -> 1000
    rates = dict(zip(out.lang, out.rate_milli))
    assert rates.get("de") == 1000 and rates.get("es") == 1000
    # strata at/below target keep everything
    assert set(out[out.lang == "de"].doc_id) == {3}
    assert set(out[out.lang == "es"].doc_id) == {10}
    # en keeps exactly the docs whose LCG residue clears 333
    kept = {
        d
        for d in (0, 1, 2)
        if ((d * ta.SAMPLE_MULT + ta.SAMPLE_INC) % ta.SAMPLE_MOD) % 1000 < 333
    }
    assert set(out[out.lang == "en"].doc_id) == kept
    # deterministic: same result twice
    again = ta.stratified_sample(docs, target_per_stratum=1).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)


def test_reservoir_sample_exact_k_and_parity(spark):
    import duckdb

    pdf = pd.DataFrame(
        {
            "doc_id": range(50),
            "text": ["x"] * 50,
            "lang": ["en"] * 30 + ["de"] * 15 + ["es"] * 5,
        }
    )
    out = ta.reservoir_sample(spark.createDataFrame(pdf), k=10).toPandas()
    # exactly min(k, n) per stratum, rk contiguous from 1
    sizes = out.groupby("lang").size().to_dict()
    assert sizes == {"en": 10, "de": 10, "es": 5}
    for _, g in out.groupby("lang"):
        assert sorted(g.rk) == list(range(1, len(g) + 1))
    # the k kept docs are exactly the k smallest LCG hashes
    h = (pdf.doc_id * ta.SAMPLE_MULT + ta.SAMPLE_INC) % ta.SAMPLE_MOD
    want = set(
        pdf.assign(h=h)[pdf.lang == "en"].nsmallest(10, ["h", "doc_id"]).doc_id
    )
    assert set(out[out.lang == "en"].doc_id) == want
    # engine parity
    con = duckdb.connect()
    con.register("documents", pdf)
    d = con.sql(ta.duckdb_reservoir_sample_sql(k=10)).df()
    key = ["lang", "rk"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True).astype("object"),
        d.sort_values(key).reset_index(drop=True).astype("object"),
    )


def test_reservoir_sample_window_group_limit_plan(spark):
    """The declarative rank<=k filter must compile to a map-side
    WindowGroupLimit (partial top-k BEFORE the shuffle) — the property
    that makes the window form scale: each input partition forwards at
    most k rows per stratum."""
    pdf = pd.DataFrame(
        {"doc_id": range(20), "text": ["x"] * 20, "lang": ["en"] * 20}
    )
    df = ta.reservoir_sample(spark.createDataFrame(pdf), k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_chunk_overlap_coverage_and_parity(spark):
    """Every token is covered, consecutive chunks overlap by
    size-stride, the trailing chunk is short, and the DuckDB twin
    agrees exactly (including the empty-text one-empty-chunk edge)."""
    import duckdb

    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b c d e f g", "x", ""]}
    )
    out = (
        ta.chunk_overlap(spark.createDataFrame(pdf), size=4, stride=3)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert d0.chunk_text.tolist() == ["a b c d", "d e f g", "g"]
    assert d0.start_tok.tolist() == [0, 3, 6]
    assert out[out.doc_id == 2].chunk_text.tolist() == [""]
    con = duckdb.connect()
    con.register("documents", pdf)
    d = (
        con.sql(ta.duckdb_chunk_overlap_sql(size=4, stride=3))
        .df()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, d)


def test_chunk_overlap_zero_exchange_plan(spark):
    pdf = pd.DataFrame({"doc_id": [0], "text": ["a b c"]})
    df = ta.chunk_overlap(spark.createDataFrame(pdf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bench_previous_round_timings_rolling_min(tmp_path, monkeypatch):
    """bench.py's outlier baseline must unwrap the driver's BENCH_r*.json
    format (our JSON line nested under 'parsed') and take the rolling
    per-query MIN across ALL rounds — a throttle-contaminated newest
    round (r3's extract 6.76s vs the 3.99s idle-box truth) must not
    poison the baseline."""
    import json

    import bench

    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 3.0, "only_r1": 1.5}}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 9.0, "only_r2": 2.5}}})
    )
    (tmp_path / "BENCH_rbad.json").write_text("not json")
    monkeypatch.setattr(
        "os.path.dirname", lambda p: str(tmp_path), raising=True
    )
    assert bench._previous_round_timings() == {
        "q": 3.0,  # min across rounds, NOT the newest round's 9.0
        "only_r1": 1.5,
        "only_r2": 2.5,
    }


def test_bench_is_suspect_flags_inflated_walls():
    """The r4 gap: a FIRST-appearance query measured inside a throttle
    window (no all-rounds record to compare against) must still get
    flagged — by within-round dispersion — and a recorded query's guard
    is 3x, not the old 5x that let knn_ivf's 2.2x-throttled wall pass
    unflagged."""
    import bench

    # record-less + throttle hit mid-measurement: median repeat >1.5x
    # the best -> the environment is unstable, flag
    assert bench.is_suspect([8.0, 9.0, 1.2], None, 3.0) is True
    assert bench.is_suspect([2.0, 2.1, 2.05], None, 3.0) is False  # stable -> trust
    # sub-second walls jitter naturally; never flagged by dispersion
    assert bench.is_suspect([0.2, 0.9, 0.4], None, 3.0) is False
    # with a record: 3x guard fires, 5x-era drift (2.2x) passes
    assert bench.is_suspect([7.0, 8.0], 2.0, 3.0) is True
    assert bench.is_suspect([4.4, 5.0], 2.0, 3.0) is False


def test_sequence_pack_boundaries(spark):
    """Concat-and-chunk invariants, hand-checked: a document crossing a
    sequence boundary is split into adjacent slices, slices tile the
    document exactly, and packing is shard-local (docs in different
    shards never share offsets)."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({
            # one shard (doc_id % 8 == 1 for 1 and 9): 6 + 5 tokens at
            # seq_len 8 -> doc 9 spans sequences 0 and 1
            "doc_id": [1, 9, 2],
            "text": [
                " ".join(f"a{i}" for i in range(6)),
                " ".join(f"b{i}" for i in range(5)),
                " ".join(f"c{i}" for i in range(3)),
            ],
        })
    )
    out = (
        ta.sequence_pack(docs, seq_len=8, n_shards=8)
        .toPandas()
        .sort_values(["shard", "seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    rows = set(
        map(tuple, out[["shard", "seq_id", "doc_id",
                        "doc_tok_start", "doc_tok_end_excl"]].itertuples(index=False))
    )
    assert rows == {
        (1, 0, 1, 0, 6),   # doc 1: tokens 0..6 fill seq 0 positions 0..6
        (1, 0, 9, 0, 2),   # doc 9: first 2 tokens finish seq 0
        (1, 1, 9, 2, 5),   # remaining 3 tokens open seq 1
        (2, 0, 2, 0, 3),   # different shard packs independently
    }
    # tiling invariant: per doc, slices cover [0, n_toks) with no gaps
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("seq_id")
        assert grp.doc_tok_start.iloc[0] == 0
        assert (grp.doc_tok_end_excl.iloc[:-1].values
                == grp.doc_tok_start.iloc[1:].values).all()


def test_repetition_signals(spark):
    rows = [
        (0, "a b a b a b"),          # bigram 'a b' dominates
        (1, "x\nx\ny"),              # duplicate line
        (2, "all distinct tokens here"),
        (3, "w"),                    # single token: no bigrams
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = (
        ta.repetition_signals(docs).toPandas().set_index("doc_id").sort_index()
    )
    # doc 0: 6 tokens, 2 distinct -> dup 666; bigrams: 'a b' x3, 'b a' x2
    assert out.loc[0, "dup_token_milli"] == 666
    assert out.loc[0, "top_bigram_milli"] == 600
    # doc 1: lines [x, x, y] -> dup 333
    assert out.loc[1, "n_lines"] == 3
    assert out.loc[1, "dup_line_milli"] == 333
    assert out.loc[2, "dup_token_milli"] == 0
    assert out.loc[3, "top_bigram_milli"] == 0


def test_lm_cross_entropy_flags_outliers(spark):
    """Corpus-fit bigram cross-entropy: a doc written in characters the
    rest of the corpus rarely uses must score strictly higher
    bits/bigram than in-distribution docs; integer milli-bit sums are
    deterministic across runs."""
    rows = [(d, "the cat sat on the mat and the rat sat pat") for d in range(8)]
    rows.append((100, "zq zq xj xj qz vk wv zz qx jx kv"))  # outlier chars
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = ta.lm_cross_entropy(docs).toPandas().set_index("doc_id")
    common_avg = out.loc[0, "avg_milli_bits"]
    assert out.loc[100, "avg_milli_bits"] > common_avg
    again = ta.lm_cross_entropy(docs).toPandas().set_index("doc_id")
    assert out.sort_index().equals(again.sort_index())


def test_tfidf_top_terms_ranking(spark):
    """Rare terms outrank common ones at equal tf; higher tf wins at
    equal df; ties break on term; k bounds per-doc output."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": [
                "apple apple zebra common common common",
                "common banana",
                "common common",
            ],
        })
    )
    out = ta.tfidf_top_terms(docs, k=2).toPandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    # apple: tf=2, df=1 -> 2e6; zebra: tf=1, df=1 -> 1e6;
    # common: tf=3, df=3 -> 1e6 — tied with zebra, 'common' wins the
    # term-ascending tiebreak
    assert d0.term.tolist() == ["apple", "common"]
    assert d0.score_micro.tolist() == [2_000_000, 1_000_000]
    d1 = out[out.doc_id == 1].sort_values("rank")
    assert d1.term.tolist()[0] == "banana"  # df=1 beats common's df=3
    assert (out.groupby("doc_id").size() <= 2).all()


# ------------------------------------------------- CCNet perplexity buckets
def test_ccnet_buckets_value_ties_and_parity(spark):
    """Identical docs (identical LM scores) straddling the p33 rank
    boundary must land in the SAME bucket (assignment is by value, not
    rank), and the full output must match the DuckDB twin."""
    import duckdb

    # 6 'en' docs: 4 copies of one text (one shared score) + 2 distinct.
    # rank33 = (33*6+99)//100 = 2 -> t33 is a tied value held by 4 docs:
    # value-based bucketing puts all 4 in head even though 4 > 2.
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 10, 11, 12],
            "text": ["aa bb aa bb"] * 4
            + ["zz qq xx yy", "aa zz qq ww"]
            + ["mm nn", "mm mm", "nn oo pp"],
            "lang": ["en"] * 6 + ["de"] * 3,
            "source": ["s"] * 9,
            "n_chars": [11] * 9,
        }
    )
    out = ta.ccnet_buckets(spark.createDataFrame(pdf)).toPandas()
    en = out[out["lang"] == "en"]
    clones = en[en["doc_id"] <= 4]
    assert clones["bucket"].nunique() == 1
    # every lang sees all of its docs bucketed, no nulls
    assert len(out) == 9 and out["bucket"].notna().all()
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = con.sql(ta.duckdb_ccnet_buckets_sql()).df()
    g = out.sort_values("doc_id").reset_index(drop=True)
    e = exp.sort_values("doc_id").reset_index(drop=True)
    for col in ["doc_id", "lang", "avg_milli_bits", "bucket"]:
        assert list(g[col]) == list(e[col]), col


# ------------------------------------------------ packing efficiency
def test_packing_efficiency_waste_bound_and_parity(spark):
    """Waste equals exactly the final partial sequence per shard
    (< seq_len), capacity and token counts reconcile with the
    manifest, and the DuckDB twin agrees row-for-row."""
    import duckdb

    pdf = pd.DataFrame(
        {
            "doc_id": range(24),
            "text": [
                " ".join(f"w{j}" for j in range(5 + (i * 9) % 40))
                for i in range(24)
            ],
            "lang": ["en"] * 24,
            "source": ["s"] * 24,
            "n_chars": [0] * 24,
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = ta.packing_efficiency(sdf).toPandas()
    man = ta.sequence_pack(sdf).toPandas()
    for shard, grp in man.groupby("shard"):
        row = out[out.shard == shard].iloc[0]
        toks = int((grp.doc_tok_end_excl - grp.doc_tok_start).sum())
        assert int(row.n_tokens) == toks
        assert int(row.n_seqs) == grp.seq_id.nunique()
        waste = int(row.capacity) - toks
        assert 0 <= waste < ta.PACK_SEQ_LEN
        assert int(row.waste_ppm) == waste * 1_000_000 // int(row.capacity)
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(ta.duckdb_packing_efficiency_sql())
        .df()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    got = out.sort_values("shard").reset_index(drop=True)
    for col in ["shard", "n_seqs", "n_tokens", "capacity", "waste_ppm"]:
        assert list(got[col]) == list(exp[col]), col


# ------------------------------------------------ max token-run detector
def test_max_token_run_exact_and_parity(spark):
    import duckdb

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b b b c b b",        # best run: b x3
                "spam spam spam spam",  # whole doc one run x4
                "x y z",                # no repeats -> 1
                "k",                    # single token -> 1
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0] * 4,
        }
    )
    out = (
        ta.max_token_run(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "max_run"] == 3
    assert out.loc[2, "max_run"] == 4
    assert out.loc[3, "max_run"] == 1
    assert out.loc[4, "max_run"] == 1
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(ta.duckdb_max_token_run_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = out.reset_index().sort_values("doc_id").reset_index(drop=True)
    for col in ["doc_id", "n_tokens", "max_run"]:
        assert list(got[col]) == list(exp[col]), col


def test_max_token_run_crafted_collision(spark):
    """The detector's documented false-positive mode, pinned: two
    DISTINCT adjacent tokens whose 31-bit poly hashes collide splice
    into one run (the packed accumulator carries the hash, not the
    token — see the operator docstring's collision bound). Both engines
    share the rule, so parity holds on the crafted pair too."""
    import duckdb

    # h("\x01\xc8") = 1*131 + 200 = h("\x02E") = 2*131 + 69 = 331,
    # well under FP_MOD, and the tokens differ.
    t1, t2 = "\x01\xc8", "\x02E"
    assert t1 != t2

    def py_hash(t):
        acc = 0
        for c in t:
            acc = (acc * ta.FP_BASE + ord(c)) % ta.FP_MOD
        return acc

    assert py_hash(t1) == py_hash(t2)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                f"{t1} {t2} {t1}",   # 3 distinct-ish tokens, one hash
                f"{t1} x {t1}",      # control: broken by a real token
            ],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [0] * 2,
        }
    )
    out = (
        ta.max_token_run(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
    )
    # the collision inflates doc 1 to a 3-run of hash-equal tokens
    assert out.loc[1, "max_run"] == 3
    assert out.loc[2, "max_run"] == 1
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(ta.duckdb_max_token_run_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = out.reset_index().sort_values("doc_id").reset_index(drop=True)
    assert (exp["max_run"].astype(int) == got["max_run"].astype(int)).all()
