from __future__ import annotations

import duckdb
import pandas as pd

from easyocr_spark.operators import bpe


def _docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def _duck_con(texts: list[str]):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    return con


# The Sennrich et al. (2016) worked example: low x5, lower x2,
# newest x6, widest x3.
SENNRICH = [" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)]


def test_sennrich_first_merges(spark):
    out = bpe.bpe_train(_docs_df(spark, SENNRICH), merges=4)
    # (e,s) appears in newest(6) + widest(3) = 9 — the classic first
    # merge; then (es,t</w>) 9; then the l-o of low/lower (7) vs others
    assert out[0] == ("e", "s", 9)
    assert out[1] == ("es", "t</w>", 9)
    assert ("l", "o", 7) in out


def test_segment_matches_learned_merges(spark):
    seg = (
        bpe.bpe_segment(_docs_df(spark, SENNRICH), merges=4)
        .toPandas()
        .set_index("word")
    )
    # merges: (e,s), (es,t</w>), (l,o), then the 6-count tie
    # (n,e)/(e,w)/(w,est</w>) breaks lexicographic -> (e,w):
    # newest -> n ew est</w>
    assert seg.loc["newest", "segmentation"] == "n ew est</w>"
    assert seg.loc["newest", "freq"] == 6
    assert seg.loc["newest", "n_syms"] == 3
    # every word's n_syms agrees with its printed split
    assert (
        seg.n_syms == seg.segmentation.str.split(" ").map(len)
    ).all()


def test_greedy_same_symbol_run(spark):
    # 'aaaaa': symbols a a a a a</w>; top pair (a,a) x3 (all adjacent
    # positions count); the merge pass is greedy left-to-right
    # non-overlapping: aa aa a</w>
    docs = _docs_df(spark, ["aaaaa aaaaa b"])
    learned = bpe.bpe_train(docs, merges=1)
    assert learned[0] == ("a", "a", 6)
    seg = bpe.bpe_segment(docs, merges=1).toPandas().set_index("word")
    assert seg.loc["aaaaa", "segmentation"] == "aa aa a</w>"


def test_pair_exhaustion_raises(spark):
    # one single-letter word -> one symbol, no pairs at merge 1
    try:
        bpe.bpe_train(_docs_df(spark, ["a a a"]), merges=1)
    except ValueError as e:
        assert "exhausted" in str(e)
    else:
        raise AssertionError("expected ValueError on pair exhaustion")


def _parity(spark, texts: list[str], merges: int):
    docs = _docs_df(spark, texts)
    con = _duck_con(texts)
    sm = (
        bpe.bpe_merges_df(spark, docs, merges=merges)
        .toPandas()
        .sort_values("merge_rank")
        .reset_index(drop=True)
    )
    dm = (
        con.sql(bpe.duckdb_bpe_merges_sql(merges=merges))
        .df()
        .sort_values("merge_rank")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sm.astype({"pair_count": "int64"}), dm)
    ss = (
        bpe.bpe_segment(docs, merges=merges)
        .toPandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    ds = (
        con.sql(bpe.duckdb_bpe_segment_sql(merges=merges))
        .df()
        .sort_values("word")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ss.astype({"freq": "int64", "n_syms": "int64"}), ds
    )


def test_engine_parity_sennrich(spark):
    _parity(spark, SENNRICH, merges=6)


def test_encode_counts_and_parity(spark):
    texts = ["low lower newest", "newest newest widest low"]
    docs = _docs_df(spark, texts)
    enc = (
        bpe.bpe_encode(docs, merges=3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(enc["n_words"]) == [3, 4]
    # every doc's token count equals the sum of its words' n_syms
    seg = bpe.bpe_segment(docs, merges=3).toPandas().set_index("word")
    for i, t in enumerate(texts):
        want = sum(seg.loc[w, "n_syms"] for w in t.split())
        assert enc.loc[i, "n_bpe_tokens"] == want
    con = _duck_con(texts)
    d = (
        con.sql(bpe.duckdb_bpe_encode_sql(merges=3))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        enc.astype({"doc_id": "int64", "n_words": "int64", "n_bpe_tokens": "int64"}),
        d.astype({"doc_id": "int64"}),
    )


def test_engine_parity_ties_and_runs(spark):
    # equal-count pairs force the (count, left, right) tie-break; the
    # aaa run forces the greedy fold's non-overlap branch in both
    # engines; mixed-case + digits exercise the [a-z]+ extraction
    _parity(
        spark,
        ["ab ab cd cd aaab", "Cd AB 42 aaab x-y!"],
        merges=3,
    )


# ------------------------------------------------ character coverage
def test_char_coverage_hand_case(spark):
    """'aaab bc' style corpus: exact ranks, cum ppm, and the cutoff rule
    'include while previous coverage is below 0.9995' — the crossing
    character is in, everything after is out."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            # counts: a=3000, b=2, c=1 (space=0 because 'aaa..' one word)
            "text": ["a" * 3000 + "b" * 2 + "c"],
        }
    )
    out = (
        bpe.char_coverage(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("ch")
    )
    total = 3003
    assert out.loc["a", "rank"] == 1
    assert out.loc["a", "cum_ppm"] == 3000 * 1_000_000 // total
    # 'a' enters at prev=0; 'b' enters at prev=998501... < 999500 -> in;
    # 'c' prev = 3002*1e6//3003 = 999667 >= 999500 -> out
    assert bool(out.loc["a", "in_alphabet"])
    assert bool(out.loc["b", "in_alphabet"])
    assert not bool(out.loc["c", "in_alphabet"])


def test_char_coverage_engine_parity(spark):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(15),
            "text": [f"spark row batch {i} zz" for i in range(15)],
        }
    )
    got = (
        bpe.char_coverage(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.sql(bpe.duckdb_char_coverage_sql())
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    for col in ["ch", "cnt", "rank", "cum_ppm", "in_alphabet"]:
        assert list(got[col]) == list(exp[col]), col
