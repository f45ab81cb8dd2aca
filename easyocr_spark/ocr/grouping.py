"""Line clustering + box merging — group_text_box semantics.

Mirrors reference easyocr/utils.py:450-555:

- polys split into "horizontal" (|slope| < slope_ths) and "free"
  (rotated) lists; our stand-in detector emits axis-aligned quads only,
  so the free path is exercised by tests with synthetic rotated quads.
- horizontals sorted by y-center, greedily clustered into lines when
  |ycenter - mean(cluster ycenters)| < ycenter_ths * mean(height)
  (reference uses 0.5 via ycenter_ths default);
- within a line, boxes sorted by x and merged while the horizontal gap
  < width_ths * mean(height) (reference easyocr/utils.py:492-537);
- every emitted box is expanded by add_margin * height on all sides
  (reference easyocr/utils.py:518,529,537,549) and output as
  [x_min, x_max, y_min, y_max].

Ordering is part of the answer: lines top-to-bottom, words
left-to-right — the reference's reading-order guarantee that our
span-sequence equality depends on (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np

SLOPE_THS = 0.1
YCENTER_THS = 0.5
HEIGHT_THS = 0.5
WIDTH_THS = 0.5
ADD_MARGIN = 0.1


def group_text_box(
    polys: list[np.ndarray],
    slope_ths: float = SLOPE_THS,
    ycenter_ths: float = YCENTER_THS,
    height_ths: float = HEIGHT_THS,
    width_ths: float = WIDTH_THS,
    add_margin: float = ADD_MARGIN,
    sort_output: bool = True,
) -> tuple[list[list[int]], list[list[list[float]]]]:
    """4-point polys -> (horizontal_list, free_list).

    horizontal_list entries: [x_min, x_max, y_min, y_max] ints.
    free_list entries: 4-point [[x, y] * 4] floats (rotated quads).

    sort_output=False preserves the caller's box priority order
    (reference easyocr/easyocr.py:342 passes optimal_num_chars is None:
    when the detector pre-sorted boxes by char-count fit, reading-order
    line sorting would destroy the ranking).
    """
    horizontal: list[list[float]] = []
    free: list[list[list[float]]] = []
    for poly in polys:
        p = np.asarray(poly, dtype=np.float64)
        # slope of top and bottom edges (reference utils.py:457-460)
        w_top = max(abs(p[1][0] - p[0][0]), 1e-9)
        w_bot = max(abs(p[2][0] - p[3][0]), 1e-9)
        slope_up = (p[1][1] - p[0][1]) / w_top
        slope_down = (p[2][1] - p[3][1]) / w_bot
        if max(abs(slope_up), abs(slope_down)) < slope_ths:
            x_min, x_max = float(p[:, 0].min()), float(p[:, 0].max())
            y_min, y_max = float(p[:, 1].min()), float(p[:, 1].max())
            horizontal.append(
                [x_min, x_max, y_min, y_max, 0.5 * (y_min + y_max), y_max - y_min]
            )
        else:
            # margin expansion along the quad's own axes (reference
            # utils.py:463-481 computes a slanted margin; we expand
            # isotropically by add_margin * height)
            height = np.linalg.norm(p[3] - p[0])
            margin = add_margin * height
            ctr = p.mean(axis=0)
            q = p + np.sign(p - ctr) * margin
            free.append(q.tolist())

    # cluster horizontals into lines by y-center
    if sort_output:
        horizontal.sort(key=lambda b: b[4])
    lines: list[list[list[float]]] = []
    for box in horizontal:
        if lines:
            cur = lines[-1]
            b_height = [b[5] for b in cur]
            b_ycenter = [b[4] for b in cur]
            if abs(float(np.mean(b_ycenter)) - box[4]) < ycenter_ths * float(
                np.mean(b_height)
            ):
                cur.append(box)
                continue
        lines.append([box])

    merged: list[list[int]] = []
    for line in lines:
        line.sort(key=lambda b: b[0])  # left-to-right within the line
        if len(line) == 1:
            box = line[0]
            margin = add_margin * box[5]
            merged.append(_emit(box[0], box[1], box[2], box[3], margin))
            continue
        # merge runs of boxes with similar height and small gaps
        run: list[list[float]] = []
        for box in line:
            if not run:
                run = [box]
                continue
            mean_h = float(np.mean([b[5] for b in run]))
            gap = box[0] - run[-1][1]
            similar_h = abs(mean_h - box[5]) < height_ths * mean_h
            if similar_h and gap < width_ths * mean_h:
                run.append(box)
            else:
                merged.append(_emit_run(run, add_margin))
                run = [box]
        if run:
            merged.append(_emit_run(run, add_margin))
    return merged, free


def _emit(x0: float, x1: float, y0: float, y1: float, margin: float) -> list[int]:
    return [
        int(x0 - margin),
        int(x1 + margin),
        int(y0 - margin),
        int(y1 + margin),
    ]


def _emit_run(run: list[list[float]], add_margin: float) -> list[int]:
    x0 = min(b[0] for b in run)
    x1 = max(b[1] for b in run)
    y0 = min(b[2] for b in run)
    y1 = max(b[3] for b in run)
    margin = add_margin * (y1 - y0)
    return _emit(x0, x1, y0, y1, margin)


def min_size_filter(
    horizontal_list: list[list[int]],
    free_list: list[list[list[float]]],
    min_size: int = 10,
) -> tuple[list[list[int]], list[list[list[float]]]]:
    """Drop boxes whose larger dimension is below min_size (reference
    easyocr/easyocr.py:343-347; reference default 20, ours 10 to match
    the stand-in glyph geometry)."""
    h = [
        b
        for b in horizontal_list
        if max(b[1] - b[0], b[3] - b[2]) > min_size
    ]
    f = []
    for quad in free_list:
        q = np.asarray(quad)
        if max(q[:, 0].max() - q[:, 0].min(), q[:, 1].max() - q[:, 1].min()) > min_size:
            f.append(quad)
    return h, f
