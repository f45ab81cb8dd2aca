"""Paragraph grouping — get_paragraph semantics (reference
easyocr/utils.py:643-709).

Greedy region-growing: seed with the first ungrouped result, repeatedly
absorb any result whose box lies within (x_ths * mean height,
y_ths * mean height) of the group's bounding box, then emit the group's
text in reading order (line bands by y-center, left-to-right within a
band; 'rtl' reverses the within-band order for right-to-left scripts,
the reference's Arabic path).
"""

from __future__ import annotations

import numpy as np


def _box_to_rect(box: list) -> tuple[float, float, float, float]:
    xs = [p[0] for p in box]
    ys = [p[1] for p in box]
    return min(xs), max(xs), min(ys), max(ys)


def get_paragraph(
    results: list[tuple[list, str, float]],
    x_ths: float = 1.0,
    y_ths: float = 0.5,
    mode: str = "ltr",
) -> list[tuple[list, str]]:
    """[(box, text, conf)] -> [(merged_box, paragraph_text)]."""
    items = [(_box_to_rect(b), t) for b, t, _ in results if t]
    if not items:
        return []
    heights = [r[3] - r[2] for r, _ in items]
    mh = float(np.mean(heights))
    unused = list(range(len(items)))
    groups: list[list[int]] = []
    while unused:
        group = [unused.pop(0)]
        grew = True
        while grew:
            grew = False
            gx0 = min(items[i][0][0] for i in group)
            gx1 = max(items[i][0][1] for i in group)
            gy0 = min(items[i][0][2] for i in group)
            gy1 = max(items[i][0][3] for i in group)
            for i in list(unused):
                x0, x1, y0, y1 = items[i][0]
                if (
                    x0 <= gx1 + x_ths * mh
                    and x1 >= gx0 - x_ths * mh
                    and y0 <= gy1 + y_ths * mh
                    and y1 >= gy0 - y_ths * mh
                ):
                    group.append(i)
                    unused.remove(i)
                    grew = True
        groups.append(group)

    out: list[tuple[list, str]] = []
    for group in groups:
        rects = [items[i][0] for i in group]
        gx0 = min(r[0] for r in rects)
        gx1 = max(r[1] for r in rects)
        gy0 = min(r[2] for r in rects)
        gy1 = max(r[3] for r in rects)
        # reading order: band by y-center, then x (reference's row-major
        # concat, easyocr/utils.py:687-705)
        def band_key(i: int):
            x0, x1, y0, y1 = items[i][0]
            yc = 0.5 * (y0 + y1)
            return (round(yc / max(mh, 1e-9)), -x0 if mode == "rtl" else x0)

        ordered = sorted(group, key=band_key)
        text = " ".join(items[i][1] for i in ordered)
        out.append(
            ([[gx0, gy0], [gx1, gy0], [gx1, gy1], [gx0, gy1]], text)
        )
    return out
