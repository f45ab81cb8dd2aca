"""Alternative detector: DBNet post-processing strategy (CPU path).

The reference ships DBNet as the second detector behind the same plug
point as CRAFT (`detect_network`, easyocr/easyocr.py:235-268). Its
torch graph needs the deformable-conv CUDA kernels (skip justified —
GPU-only, easyocr/DBNet/assets/ops/dcn), but the CPU post-processing
that turns a probability heat map into text boxes is pure
numpy-expressible, and THIS is it, re-implemented from the published
semantics (reference easyocr/DBNet/DBNet.py):

- ``binarize`` (:429-446): threshold the heat map.
- ``boxes_from_bitmap`` (:539-621): per connected region of the
  bitmap, min-area rectangle (``get_mini_boxes``, :632-653 — here via
  convex hull + rotating calipers instead of cv2.minAreaRect), short-
  side filter, ``box_score_fast`` (:655-683 — mean heat inside the
  filled box), score filter, ``unclip`` dilation (:623-630 — offset
  outward by area * unclip_ratio / perimeter; pyclipper's rounded
  corners are irrelevant after the second min-area-rect pass, so the
  rectangle offset here is semantically exact), second short-side
  filter, scale to destination pixels.
- ``resize_to_mult32`` (:232-266): the x32 sizing contract of the
  network input (provided for the torch path; the stand-in producer
  works at native resolution).

Heat-map producer (strategy-specific, like the ink-pooling producer of
the CRAFT stand-in): DBNet is trained to emit SHRUNKEN text kernels
(the Vatti-shrunk labels of the DB paper) which unclip re-inflates.
The stand-in producer reproduces exactly that contract: word-level ink
components of the link map, each shrunk by the distance d solving
unclip's inversion (expand(shrink(box, d)) == box, i.e.
14d^2 - 5d(w+h) + 1.5wh = 0 at unclip_ratio 1.5), so the post-process
recovers the word boxes the same way it recovers them from a trained
net's kernels.

Same output contract as detection.detect / detection_projection.detect:
a list of 4-point float boxes in input pixels, pluggable in
ocr/reader.py.
"""

from __future__ import annotations

import numpy as np

from .detection import connected_components

BBOX_MIN_SCORE = 0.2
BBOX_MIN_SIZE = 3
UNCLIP_RATIO = 1.5
BINARIZE_THRESH = 0.5


def binarize(hmap: np.ndarray, threshold: float = BINARIZE_THRESH) -> np.ndarray:
    """Probability map -> boolean segmentation (DBNet.py:429-446)."""
    return hmap > threshold


def resize_to_mult32(
    img: np.ndarray,
    detection_size: int | None = None,
    min_size: int = 320,
    max_size: int = 2560,
) -> tuple[np.ndarray, tuple[int, int]]:
    """Resize so both sides are multiples of 32, shorter side driven to
    detection_size (DBNet.py:232-266 sizing rule), nearest-neighbor.
    Returns (resized, (orig_h, orig_w))."""
    h, w = img.shape[:2]
    if detection_size is None:
        detection_size = max(min_size, min(h, w, max_size))
    if h < w:
        nh = int(np.ceil(detection_size / 32) * 32)
        nw = int(np.ceil(nh / h * w / 32) * 32)
    else:
        nw = int(np.ceil(detection_size / 32) * 32)
        nh = int(np.ceil(nw / w * h / 32) * 32)
    ys = ((np.arange(nh) + 0.5) * h / nh).astype(np.int64).clip(0, h - 1)
    xs = ((np.arange(nw) + 0.5) * w / nw).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs], (h, w)


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain. pts float64[N, 2] -> hull CCW [M, 2]."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically
    if len(pts) <= 2:
        return pts

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while (
                len(out) >= 2
                and np.cross(out[-1] - out[-2], p - out[-2]) <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def min_area_rect(pts: np.ndarray) -> tuple[np.ndarray, float]:
    """Minimum-area oriented bounding rectangle via rotating calipers
    over the convex hull (the cv2.minAreaRect role in
    DBNet.py:632-653). Returns (corners float64[4, 2] ordered
    top-left, top-right, bottom-right, bottom-left by the reference's
    x-sort + y-disambiguation, short_side)."""
    hull = _convex_hull(np.asarray(pts, dtype=np.float64))
    if len(hull) == 1:
        c = np.repeat(hull, 4, axis=0)
        return c, 0.0
    if len(hull) == 2:
        a, b = hull
        return np.array([a, b, b, a], dtype=np.float64), 0.0
    best = None
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    for ex, ey in edges:
        n = np.hypot(ex, ey)
        if n == 0:
            continue
        u = np.array([ex, ey]) / n  # edge direction
        v = np.array([-u[1], u[0]])  # normal
        pu = hull @ u
        pv = hull @ v
        w = pu.max() - pu.min()
        h = pv.max() - pv.min()
        if best is None or w * h < best[0]:
            best = (w * h, u, v, pu.min(), pu.max(), pv.min(), pv.max())
    _, u, v, u0, u1, v0, v1 = best
    corners = np.array(
        [
            u0 * u + v0 * v,
            u1 * u + v0 * v,
            u1 * u + v1 * v,
            u0 * u + v1 * v,
        ]
    )
    short = min(u1 - u0, v1 - v0)
    # reference ordering (get_mini_boxes): sort by x, then pick
    # top/bottom within each x-pair
    p = sorted(corners.tolist(), key=lambda q: (q[0], q[1]))
    i1, i4 = (0, 1) if p[1][1] > p[0][1] else (1, 0)
    i2, i3 = (2, 3) if p[3][1] > p[2][1] else (3, 2)
    ordered = np.array([p[i1], p[i2], p[i3], p[i4]], dtype=np.float64)
    return ordered, float(short)


def unclip(box: np.ndarray, unclip_ratio: float = UNCLIP_RATIO) -> np.ndarray:
    """Offset the rectangle outward by area * ratio / perimeter
    (DBNet.py:623-630). Rectangle-exact: pyclipper's rounded corners
    vanish under the follow-up min-area-rect pass."""
    e1 = box[1] - box[0]
    e2 = box[3] - box[0]
    w = np.hypot(*e1)
    h = np.hypot(*e2)
    if w == 0 or h == 0:
        return box.copy()
    d = (w * h) * unclip_ratio / (2.0 * (w + h))
    u = e1 / w
    v = e2 / h
    grow = d * (u + v)
    return np.array(
        [
            box[0] - grow,
            box[1] + d * (u - v),
            box[2] + grow,
            box[3] + d * (v - u),
        ]
    )


def box_score_fast(hmap: np.ndarray, box: np.ndarray) -> float:
    """Mean heat inside the filled quad (DBNet.py:655-683), clipped to
    the map. Convex-quad rasterization via four half-plane tests."""
    h, w = hmap.shape
    xmin = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
    xs = np.arange(xmin, xmax + 1)[None, :] + 0.0
    ys = np.arange(ymin, ymax + 1)[:, None] + 0.0
    mask = np.ones((ymax - ymin + 1, xmax - xmin + 1), dtype=bool)
    for i in range(4):
        ax, ay = box[i]
        bx, by = box[(i + 1) % 4]
        # CCW-or-CW agnostic: orient by the quad's signed area
        cross = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
        mask &= (cross >= 0) if _signed_area(box) >= 0 else (cross <= 0)
    if not mask.any():
        return 0.0
    return float(hmap[ymin : ymax + 1, xmin : xmax + 1][mask].mean())


def _signed_area(box: np.ndarray) -> float:
    x = box[:, 0]
    y = box[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def boxes_from_bitmap(
    hmap: np.ndarray,
    bitmap: np.ndarray,
    dest_width: int,
    dest_height: int,
    bbox_min_score: float = BBOX_MIN_SCORE,
    bbox_min_size: int = BBOX_MIN_SIZE,
    max_candidates: int = 0,
) -> tuple[list[np.ndarray], list[float]]:
    """Segmentation bitmap -> (boxes, scores) in destination pixels —
    the reference flow of DBNet.py:539-621 with connected components
    standing in for cv2.findContours (equivalent region grain for
    filled text kernels)."""
    height, width = bitmap.shape
    labels, n = connected_components(bitmap.astype(np.uint8))
    boxes: list[np.ndarray] = []
    scores: list[float] = []
    order = range(1, n + 1)
    for idx, lab in enumerate(order):
        if max_candidates > 0 and idx >= max_candidates:
            break
        ys, xs = np.nonzero(labels == lab)
        pts = np.column_stack([xs, ys])
        box, sside = min_area_rect(pts)
        if sside < bbox_min_size:
            continue
        score = box_score_fast(hmap, box)
        if score < bbox_min_score:
            continue
        box = unclip(box)
        box, sside = min_area_rect(box)
        if sside < bbox_min_size + 2:
            continue
        out = box.copy()
        out[:, 0] = np.clip(np.round(out[:, 0] / width * dest_width), 0, dest_width)
        out[:, 1] = np.clip(
            np.round(out[:, 1] / height * dest_height), 0, dest_height
        )
        boxes.append(out)
        scores.append(score)
    return boxes, scores


def _shrink_distance(w: float, h: float, ratio: float = UNCLIP_RATIO) -> float:
    """The inset d whose unclip exactly restores (w, h): setting
    unclip's offset r*A'/L' of the shrunk rect equal to d gives
    (4r + 8)d^2 - 2(r + 1)(w + h)d + r*wh = 0; the smaller root is the
    physical one (the larger collapses the rectangle)."""
    a = 4.0 * ratio + 8.0
    b = -2.0 * (ratio + 1.0) * (w + h)
    c = ratio * w * h
    disc = b * b - 4 * a * c
    if disc <= 0:
        return min(w, h) / 4.0
    return (-b - np.sqrt(disc)) / (2 * a)


def shrunken_kernel_map(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The stand-in heat-map producer: (hmap, segmentation) at FULL
    resolution. Word components (ink dilated horizontally so characters
    merge, as the stand-in CRAFT link map does at half res) are each
    replaced by their unclip-inverting shrunken rectangle — the DB
    training-label contract (shrunken kernels) that the post-process is
    built to re-inflate. Insets use floor(), so the re-inflated box
    strictly COVERS the word ink (unclip of a less-shrunk kernel
    offsets by >= the exact inverse distance); the overshoot is < 2 px
    per side, well under the word/line gaps. hmap is the darkness map
    for scoring."""
    lo, hi = int(gray.min()), int(gray.max())
    inv = 1.0 / max(hi - lo, 1)
    region = (hi - gray.astype(np.float32)) * inv
    # full-res analogue of compute_score_maps' link dilation (its radii
    # are half-res, hence the x2)
    from .detection import LINK_RADIUS_H, LINK_RADIUS_V

    lk = gray.copy()
    for r in range(1, 2 * LINK_RADIUS_H + 1):
        np.minimum(lk[:, r:], gray[:, :-r], out=lk[:, r:])
        np.minimum(lk[:, :-r], gray[:, r:], out=lk[:, :-r])
    tmp = lk.copy()
    for r in range(1, 2 * LINK_RADIUS_V + 1):
        np.minimum(lk[r:, :], tmp[:-r, :], out=lk[r:, :])
        np.minimum(lk[:-r, :], tmp[r:, :], out=lk[:-r, :])
    mask = binarize((hi - lk.astype(np.float32)) * inv)
    labels, n = connected_components(mask.astype(np.uint8))
    seg = np.zeros_like(mask)
    for lab in range(1, n + 1):
        ys, xs = np.nonzero(labels == lab)
        y0, y1 = int(ys.min()), int(ys.max())
        x0, x1 = int(xs.min()), int(xs.max())
        d = _shrink_distance(float(x1 - x0), float(y1 - y0))
        # floor + keep at least a 2px-extent kernel per axis
        dy = min(int(d), (y1 - y0 - 1) // 2)
        dx = min(int(d), (x1 - x0 - 1) // 2)
        seg[y0 + dy : y1 + 1 - dy, x0 + dx : x1 + 1 - dx] = True
    return region, seg


def detect(gray: np.ndarray) -> list[np.ndarray]:
    """gray uint8[H, W] -> 4-point float boxes in input pixels (word
    grain) — the DBNet strategy for the reader's detect_network plug
    point."""
    h, w = gray.shape
    hmap, seg = shrunken_kernel_map(gray)
    boxes, _ = boxes_from_bitmap(hmap, seg, w, h)
    return boxes
