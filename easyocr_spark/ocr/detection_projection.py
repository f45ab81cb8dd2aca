"""Alternative detector: projection-profile strategy.

The reference makes the detect stage pluggable — CRAFT or DBNet behind
one interface (`detect_network` param, easyocr/easyocr.py:235-268;
compatibility wrappers easyocr/detection_db.py:15-220). This module is
our second strategy proving the same plug point: instead of score maps
+ connected components it uses classic projection profiles — row-ink
sums split the page into line bands, column-ink sums inside each band
split words — and returns the SAME output contract as detection.detect:
a list of 4-point float boxes in input pixel coords.

Semantically different engine, identical interface and (on clean
renders) identical boxes — asserted in tests/test_reader_features.py.
"""

from __future__ import annotations

import numpy as np

MIN_GAP_COLS = 6  # min blank columns separating words (base-scale aware
#                   callers pass rendered images where word gaps >= 2*s*4)


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    padded = np.concatenate(([False], mask, [False]))
    diff = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(diff == 1)
    ends = np.flatnonzero(diff == -1)
    return list(zip(starts.tolist(), ends.tolist()))


def detect(gray: np.ndarray, min_gap_frac: float = 0.75) -> list[np.ndarray]:
    """gray uint8[H, W] -> 4-point boxes (word grain, reading order).

    min_gap_frac: a within-line blank gap counts as a word separator
    when wider than min_gap_frac * line height (scale-invariant — word
    gaps in natural text are comparable to the line height, while
    inter-character gaps are far smaller).
    """
    g = gray.astype(np.float32)
    lo, hi = g.min(), g.max()
    ink = (hi - g) / max(hi - lo, 1.0) > 0.5
    boxes: list[np.ndarray] = []
    for y0, y1 in _runs(ink.any(axis=1)):
        band = ink[y0:y1]
        height = y1 - y0
        min_gap = max(2, int(min_gap_frac * height))
        col = band.any(axis=0)
        # merge char runs separated by gaps < min_gap into words
        runs = _runs(col)
        if not runs:
            continue
        words: list[list[int]] = [[runs[0][0], runs[0][1]]]
        for s, e in runs[1:]:
            if s - words[-1][1] < min_gap:
                words[-1][1] = e
            else:
                words.append([s, e])
        for x0, x1 in words:
            sub = band[:, x0:x1]
            ys = np.nonzero(sub.any(axis=1))[0]
            by0, by1 = y0 + int(ys.min()), y0 + int(ys.max()) + 1
            boxes.append(
                np.array(
                    [[x0, by0], [x1, by0], [x1, by1], [x0, by1]],
                    dtype=np.float32,
                )
            )
    return boxes
