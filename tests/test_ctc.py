import numpy as np

from easyocr_spark.ocr.ctc import (
    ctc_beam_search,
    custom_mean,
    decode_greedy,
    greedy_collapse,
)

CS = "AB"


def mat(rows):
    m = np.array(rows, dtype=np.float64)
    return m / m.sum(axis=1, keepdims=True)


def test_collapse_repeats_and_blanks():
    # frames: A A blank A  -> "AA"
    probs = mat([[0.1, 0.8, 0.1], [0.1, 0.8, 0.1], [0.8, 0.1, 0.1], [0.1, 0.8, 0.1]])
    text, conf = decode_greedy(probs, CS)
    assert text == "AA"
    assert conf > 0


def test_all_blank_is_empty():
    probs = mat([[0.9, 0.05, 0.05]] * 4)
    text, conf = decode_greedy(probs, CS)
    assert text == ""
    assert conf == 0.0


def test_custom_mean_formula():
    # prod(p)^(2/sqrt(n)) — reference easyocr/recognition.py:13-14
    x = np.array([0.9, 0.8, 0.7])
    expect = (0.9 * 0.8 * 0.7) ** (2 / np.sqrt(3))
    assert abs(custom_mean(x) - expect) < 1e-12
    assert custom_mean(np.array([])) == 0.0


def test_greedy_collapse_probs():
    probs = mat([[0.1, 0.8, 0.1], [0.8, 0.1, 0.1], [0.1, 0.1, 0.8]])
    labels, confs = greedy_collapse(probs)
    assert labels.tolist() == [1, 2]
    assert len(confs) == 2


def test_beam_matches_greedy_on_peaked():
    probs = mat(
        [[0.05, 0.9, 0.05], [0.9, 0.05, 0.05], [0.05, 0.05, 0.9], [0.05, 0.05, 0.9]]
    )
    g, _ = decode_greedy(probs, CS)
    b, _ = ctc_beam_search(probs, CS, beam_width=5)
    assert g == b == "AB"


def test_beam_sums_paths():
    # beam search should prefer a labeling whose total path mass is
    # higher even when no single frame argmax says so
    probs = np.array(
        [
            [0.0, 0.6, 0.4],
            [0.5, 0.1, 0.4],
        ]
    )
    text, p = ctc_beam_search(probs, CS, beam_width=10)
    # candidates: "A" paths: A·blank(0.3) + A·A(0.06) = 0.36
    #             "B" paths: B·blank(0.2) + B·B(0.16) = 0.36 ... "AB"=0.24
    assert text in ("A", "B")
    assert p > 0.3
