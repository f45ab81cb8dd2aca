"""Reader API surface parity: decoders, constraints, TTA, paragraph,
pluggable detector."""

import numpy as np

from easyocr_spark.fixtures import corpus, png, render
from easyocr_spark.fixtures.fonts import CHARSET
from easyocr_spark.ocr import detection, detection_projection
from easyocr_spark.ocr.ctc import edit_distance, word_beam_search
from easyocr_spark.ocr.paragraph import get_paragraph
from easyocr_spark.ocr.reader import StandInReader


def test_projection_detector_same_boxes_as_craft():
    for ref in ["m_5_2", "m_11_1", "m_17_4", "m_23_0"]:
        img = png.decode_gray(corpus.render_media(ref))
        a = sorted(b.astype(int).tolist() for b in detection.detect(img))
        p = sorted(b.astype(int).tolist() for b in detection_projection.detect(img))
        assert a == p, ref


def test_projection_detector_end_to_end():
    r = StandInReader(detect_network="projection")
    for ref in ["m_7_1", "m_13_2"]:
        img = png.decode_gray(corpus.render_media(ref))
        assert r.readtext_text(img) == corpus.ground_truth_text(ref)


def test_allowlist_restricts_output():
    img = render.render_text([["HELLO"]], scale=2)
    # allow only the correct letters: unchanged
    r1 = StandInReader(allowlist="HELO")
    assert r1.readtext_text(img) == "HELLO"
    # E not allowed: decode must avoid 'E' entirely
    r2 = StandInReader(allowlist=CHARSET.replace("E", ""))
    out = r2.readtext_text(img)
    assert "E" not in out


def test_blocklist():
    img = render.render_text([["WORLD"]], scale=2)
    r = StandInReader(blocklist="XYZ")
    assert r.readtext_text(img) == "WORLD"


def test_rotation_tta_recovers_rotated_text():
    img = render.render_text([["SPARK"]], scale=2)
    rotated = np.rot90(img, k=1)  # 90° ccw: unreadable without TTA
    r = StandInReader()
    h, w = rotated.shape
    crop_results = r.recognize(
        rotated, [[0, w, 0, h]], [], rotation_info=[90, 180, 270]
    )
    texts = [t for _, t, _ in crop_results]
    assert "SPARK" in texts


def test_word_beam_search_snaps_to_dictionary():
    # probs spelling 'HELO' (one L dropped) should snap to HELLO
    def frame(ch, p=0.9):
        v = np.full(len(CHARSET) + 1, (1 - p) / len(CHARSET))
        v[CHARSET.index(ch) + 1] = p
        return v

    blank = np.zeros(len(CHARSET) + 1)
    blank[0] = 1.0
    seq = []
    for ch in "HELO":
        seq += [frame(ch), blank.copy()]
    probs = np.stack(seq)
    text, _ = word_beam_search(probs, CHARSET, corpus.VOCAB)
    assert text == "HELLO"


def test_edit_distance():
    assert edit_distance("HELO", "HELLO") == 1
    assert edit_distance("", "ABC") == 3
    assert edit_distance("SAME", "SAME") == 0


def test_paragraph_groups_nearby_lines():
    img = render.render_text([["HELLO", "WORLD"], ["SPARK"]], scale=2)
    r = StandInReader()
    out = r.readtext(img, paragraph=True)
    assert len(out) == 1
    box, text = out[0]
    assert text == "HELLO WORLD SPARK"


def test_paragraph_separates_distant_blocks():
    results = [
        ([[0, 0], [50, 0], [50, 10], [0, 10]], "TOP", 0.9),
        ([[0, 500], [50, 500], [50, 510], [0, 510]], "BOTTOM", 0.9),
    ]
    out = get_paragraph(results)
    assert len(out) == 2
