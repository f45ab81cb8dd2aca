"""Cross-engine consistency of the corpus spec: the Python functions,
the DuckDB oracle SQL, and the actual rendered-pixel pipeline must agree
on every derived quantity. (Hypothesis-style sweeps, deterministic.)"""

import duckdb
import pytest

from easyocr_spark.fixtures import corpus, png
from easyocr_spark.ocr.reader import StandInReader

REFS = [f"m_{a}_{b}" for a in range(0, 97, 5) for b in (0, 1, 2, 5, 9)]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_duckdb_gt_matches_python(con):
    sql = (
        "SELECT ref, "
        + corpus.duckdb_gt_from_ref("ref")
        + " FROM (SELECT UNNEST(?) AS ref)"
    )
    got = dict(con.execute(sql, [REFS]).fetchall())
    for r in REFS:
        assert got[r] == corpus.ground_truth_text(r), r


def test_duckdb_word_count_matches_detection(con):
    sql = (
        "SELECT ref, "
        + corpus.duckdb_word_count_expr("ref")
        + " FROM (SELECT UNNEST(?) AS ref)"
    )
    got = dict(con.execute(sql, [REFS[:40]]).fetchall())
    reader = StandInReader()
    for r in REFS[:40]:
        img = png.decode_gray(corpus.render_media(r))
        h, f = reader.detect(img)
        assert len(h) + len(f) == got[r], r


def test_duckdb_box_geometry_matches_detection(con):
    refs = [r for r in REFS[:40] if not corpus.media_spec(r)["tiny"]]
    sql = corpus.duckdb_box_geometry_sql(
        "SELECT UNNEST(?) AS media_ref"
    )
    rows = con.execute(sql, [refs]).df()
    reader = StandInReader()
    for r in refs:
        img = png.decode_gray(corpus.render_media(r))
        h, _ = reader.detect(img)
        exp = rows[rows.media_ref == r].sort_values("box_idx")
        got = [[b[0], b[1], b[2], b[3]] for b in h]
        want = exp[["x_min", "x_max", "y_min", "y_max"]].values.tolist()
        assert got == want, r


def test_rtl_refs_reverse_lines(con):
    rtl_refs = [r for r in REFS if corpus.media_spec(r)["lang"] == "arabic"]
    assert rtl_refs, "need arabic-routed refs in the sweep"
    multi = [
        r
        for r in rtl_refs
        if not corpus.media_spec(r)["tiny"]
        and any(len(line) > 1 for line in corpus.media_spec(r)["lines"])
    ]
    for r in multi[:10]:
        spec = corpus.media_spec(r)
        ltr = " ".join(w for line in spec["lines"] for w in line)
        assert corpus.ground_truth_text(r) != ltr, r
