"""DBNet post-processing strategy (reference easyocr/DBNet/DBNet.py
CPU path): geometry kernels + the pluggable-detector contract."""

import numpy as np

from easyocr_spark.fixtures import corpus, png, render
from easyocr_spark.ocr import detection_db
from easyocr_spark.ocr.reader import StandInReader


def test_min_area_rect_axis_aligned():
    pts = np.array([[2, 3], [9, 3], [9, 7], [2, 7], [5, 5]])
    box, sside = detection_db.min_area_rect(pts)
    assert sside == 4.0
    assert sorted(box.tolist()) == [[2, 3], [2, 7], [9, 3], [9, 7]]
    # reference corner order: starts top-left, ends bottom-left
    assert box[0].tolist() == [2, 3]
    assert box[3].tolist() == [2, 7]


def test_min_area_rect_rotated():
    # a 45-degree square of diagonal 10 centered at origin
    pts = np.array([[0, -5], [5, 0], [0, 5], [-5, 0]], dtype=float)
    box, sside = detection_db.min_area_rect(pts)
    side = 10 / np.sqrt(2)
    assert abs(sside - side) < 1e-9
    # area of the oriented rect equals side^2 (axis-aligned would be 100)
    e1 = np.hypot(*(box[1] - box[0]))
    e2 = np.hypot(*(box[3] - box[0]))
    assert abs(e1 * e2 - side * side) < 1e-6


def test_unclip_offsets_by_area_over_perimeter():
    box = np.array([[0, 0], [20, 0], [20, 10], [0, 10]], dtype=float)
    d = 1.5 * 200 / 60  # area * ratio / perimeter
    out = detection_db.unclip(box)
    assert np.allclose(out[0], [-d, -d])
    assert np.allclose(out[2], [20 + d, 10 + d])


def test_box_score_fast_means_inside_quad():
    hmap = np.zeros((10, 20), dtype=np.float32)
    hmap[2:8, 4:16] = 1.0
    inside = np.array([[4, 2], [15, 2], [15, 7], [4, 7]], dtype=float)
    assert detection_db.box_score_fast(hmap, inside) == 1.0
    outside = np.array([[0, 0], [3, 0], [3, 1], [0, 1]], dtype=float)
    assert detection_db.box_score_fast(hmap, outside) == 0.0


def test_shrink_distance_inverts_unclip():
    for w, h in [(58.0, 14.0), (22.0, 14.0), (8.0, 8.0), (100.0, 30.0)]:
        d = detection_db._shrink_distance(w, h)
        assert 0 < 2 * d < min(w, h)
        w2, h2 = w - 2 * d, h - 2 * d
        d_back = 1.5 * (w2 * h2) / (2.0 * (w2 + h2))
        assert abs(d_back - d) < 1e-9, (w, h)


def test_boxes_from_bitmap_restores_kernel():
    """A shrunken kernel must come back ~as the unclipped full box,
    scaled to destination pixels."""
    hmap = np.zeros((50, 100), dtype=np.float32)
    hmap[10:30, 20:80] = 1.0  # a 60x20 hot region
    d = detection_db._shrink_distance(59.0, 19.0)
    k = int(d)
    seg = np.zeros_like(hmap, dtype=bool)
    seg[10 + k : 30 - k, 20 + k : 80 - k] = True
    boxes, scores = detection_db.boxes_from_bitmap(hmap, seg, 200, 100)
    assert len(boxes) == 1 and scores[0] == 1.0
    (box,) = boxes
    xs, ys = box[:, 0], box[:, 1]
    # x2 destination scale, coverage of the original region guaranteed
    assert xs.min() <= 40 and xs.max() >= 158
    assert ys.min() <= 20 and ys.max() >= 58


def test_db_detect_boxes_cover_words():
    img = render.render_text([["HELLO", "WORLD"], ["SPARK"]], scale=2)
    boxes = detection_db.detect(img)
    assert len(boxes) == 3
    ink_ys, ink_xs = np.nonzero(img == 0)
    covered = np.zeros(img.shape, dtype=bool)
    for b in boxes:
        x0, x1 = int(b[:, 0].min()), int(np.ceil(b[:, 0].max()))
        y0, y1 = int(b[:, 1].min()), int(np.ceil(b[:, 1].max()))
        covered[max(0, y0) : y1 + 1, max(0, x0) : x1 + 1] = True
    assert covered[ink_ys, ink_xs].all()


def test_db_detector_end_to_end():
    for ref in ["m_7_1", "m_13_2"]:
        r = StandInReader(
            detect_network="dbnet",
            lang_list=[corpus.media_spec(ref)["lang"]],
        )
        img = png.decode_gray(corpus.render_media(ref))
        assert r.readtext_text(img) == corpus.ground_truth_text(ref)


def test_resize_to_mult32_contract():
    img = np.zeros((100, 300), dtype=np.uint8)
    out, orig = detection_db.resize_to_mult32(img)
    assert orig == (100, 300)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[0] >= 320  # shorter side driven to min size
