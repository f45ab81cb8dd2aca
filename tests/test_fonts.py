import numpy as np

from easyocr_spark.fixtures.fonts import ATLAS, CHARSET, GLYPH_H, GLYPH_W, TEMPLATES


def test_every_glyph_has_full_row_and_column_coverage():
    for ch, g in ATLAS.items():
        assert g.shape == (GLYPH_H, GLYPH_W)
        assert (g.sum(axis=0) > 0).all(), f"{ch} has an empty column"
        assert (g.sum(axis=1) > 0).all(), f"{ch} has an empty row"


def test_pairwise_distance_margin():
    flat = TEMPLATES.reshape(len(CHARSET), -1)
    d = (flat[:, None, :] != flat[None, :, :]).sum(axis=2)
    np.fill_diagonal(d, 99)
    assert d.min() >= 8


def test_deterministic_rebuild():
    from easyocr_spark.fixtures.fonts import _build_atlas

    again = _build_atlas()
    for ch in CHARSET:
        assert np.array_equal(again[ch], ATLAS[ch])
