"""Deterministic text-image renderer (PIL stand-in).

Renders a multi-line, multi-word string into a uint8 grayscale bitmap
using the procedural glyph atlas, at an integer scale factor, optionally
low-contrast. Geometry is exact-by-construction:

- every glyph has ink in its first/last row and column (fonts.py), so a
  word's tight bounding box is exactly ``len*CELL_W - 1`` x ``GLYPH_H``
  base pixels — integer rescaling round-trips losslessly, which is what
  makes the stand-in recognizer bit-deterministic (SURVEY.md §5.2.3).
- words on a line are separated by WORD_GAP base px (wider than the
  detector's affinity bridge, narrower line-internal gaps merge), lines
  by LINE_GAP so y-center clustering separates them — mirroring the
  geometry assumptions of group_text_box (reference
  easyocr/utils.py:450-555).
"""

from __future__ import annotations

import numpy as np

from .fonts import ATLAS, CELL_H, CELL_W, GLYPH_H, GLYPH_W

MARGIN = 4  # base px border
WORD_GAP = 8  # base px between words on a line (beyond the cell spacing col)
LINE_GAP = 4  # base px between line boxes
INK = 0
BG = 255
LOW_INK = 180  # low-contrast variant: exercises 2-pass contrast retry
LOW_BG = 220


def word_width(word: str) -> int:
    """Tight ink width of a word in base px (last spacing col excluded)."""
    return len(word) * CELL_W - 1


def line_width(words: list[str]) -> int:
    return sum(word_width(w) for w in words) + (len(words) - 1) * (WORD_GAP + 1)


def curve_off(g: int) -> int:
    """Per-glyph drop of the CURVED staircase class: g + (g+1)//2 base
    px (successive slopes alternate 2 and 1 px — a non-linear, monotone
    staircase). The FIRST step is 2 px so even 2-glyph words clear the
    grouping slope threshold (2/11 > 0.1, the same minimum the linear
    slant class rides); bounded steps keep adjacent glyph cells
    overlapping vertically (max step 2 < GLYPH_H), so a word stays one
    connected component under the detector's link dilation."""
    return g + (g + 1) // 2


def glyph_dy(g: int, slant_dy: int, curve: bool) -> int:
    return curve_off(g) if curve else g * slant_dy


def smooth_drop_quarters(g: int, scale: int) -> int:
    """Drop of glyph cell g in the SMOOTH class, in QUARTER scaled px:
    D(g) = g * (2*scale + 1/2) scaled px — a constant slope with a
    HALF-PIXEL phase on odd cells, rendered with anti-aliased gray-edge
    blends (no longer an integer staircase). Returned x4 so the value
    is always an exact integer."""
    return g * (8 * scale + 2)


def line_height(words: list[str], slant_dy: int, curve: bool = False) -> int:
    """Ink height of a rendered line: GLYPH_H, plus the staircase drop
    of the line's longest word when slanted or curved."""
    if slant_dy == 0 and not curve:
        return GLYPH_H
    longest = max(len(w) for w in words)
    return GLYPH_H + glyph_dy(longest - 1, slant_dy, curve)


def render_text(
    lines: list[list[str]],
    scale: int = 2,
    low_contrast: bool = False,
    slant_dy: int = 0,
    curve: bool = False,
    atlas: dict | None = None,
) -> np.ndarray:
    """Render lines of words -> uint8[H, W] grayscale image.

    ``slant_dy`` > 0 renders SLANTED words: glyph g of each word drops
    g * slant_dy base px below the word's baseline (a glyph-granular
    staircase — each glyph itself stays upright, so the inverse shear
    is pixel-exact). Slope = slant_dy / CELL_W per word, well above the
    grouping slope_ths, so these words route through the free-box
    (rotated-quad) pipeline end to end.

    ``curve`` renders the CURVED staircase (glyph g drops curve_off(g)
    base px — variable slope, same upright-glyph exactness as the
    linear slant). ``atlas`` selects the script's glyph shapes
    (default: the latin atlas) — the render-side half of per-script
    model routing."""
    atlas = atlas or ATLAS
    ink, bg = (LOW_INK, LOW_BG) if low_contrast else (INK, BG)
    w = 2 * MARGIN + max(line_width(ws) for ws in lines)
    h = (
        2 * MARGIN
        + sum(line_height(ws, slant_dy, curve) for ws in lines)
        + (len(lines) - 1) * LINE_GAP
    )
    img = np.full((h, w), bg, dtype=np.uint8)
    y = MARGIN
    for words in lines:
        x = MARGIN
        for word in words:
            for g_idx, ch in enumerate(word):
                g = atlas[ch]
                gy = y + glyph_dy(g_idx, slant_dy, curve)
                img[gy : gy + GLYPH_H, x : x + GLYPH_W][g == 1] = ink
                x += CELL_W
            # x is now one spacing col past the word's last glyph col
            x += WORD_GAP
        y += line_height(words, slant_dy, curve) + LINE_GAP
    if scale != 1:
        img = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    return img


def render_text_smooth(
    lines: list[list[str]],
    scale: int,
    atlas: dict | None = None,
) -> np.ndarray:
    """Render the SMOOTH anti-aliased constant-slope class: the line is
    rendered upright at full scale, then each word's glyph cell g is
    shifted DOWN by D(g) = g*(2*scale + 1/2) scaled px — the integer
    part as a rigid shift, the half-pixel part as a gray-edge blend
    (each vertical ink run's first and last row become gray 128, the
    exact integer midpoint of ink 0 and bg 255). Unlike the staircase
    classes, cell tops no longer sit on integer rows: recovering the
    geometry requires sub-pixel ink weighting (detection reads the
    blend gray as the fractional phase), and recovering the pixels
    requires inverting the blend (reader.deshear_crop's deblend).
    Single-line, full-contrast only (the class gate in corpus.media_spec
    guarantees this)."""
    assert len(lines) == 1, "smooth class is single-line by construction"
    words = lines[0]
    atlas = atlas or ATLAS
    s = scale
    base_h = 2 * MARGIN + GLYPH_H
    upright = render_text(lines, scale=s, low_contrast=False, atlas=atlas)
    assert upright.shape[0] == base_h * s
    extra = max(
        (smooth_drop_quarters(len(w) - 1, s) + 3) // 4 for w in words
    )
    out = np.full((base_h * s + extra, upright.shape[1]), BG, dtype=np.uint8)
    out[: upright.shape[0]] = upright
    y0 = MARGIN * s
    x = MARGIN
    for word in words:
        for g_idx in range(len(word)):
            dq = smooth_drop_quarters(g_idx, s)
            d, half = dq // 4, (dq % 4) != 0
            if d == 0 and not half:
                continue  # cell 0: already in place
            cols = slice((x + g_idx * CELL_W) * s, (x + g_idx * CELL_W + GLYPH_W) * s)
            block = upright[y0 : y0 + GLYPH_H * s, cols].astype(np.int16)
            out[y0 : y0 + GLYPH_H * s, cols] = BG  # clear the upright copy
            if not half:
                out[y0 + d : y0 + d + GLYPH_H * s, cols] = block.astype(np.uint8)
            else:
                # 2-tap half blend: row i of the blended column is the
                # integer midpoint of rows i-1 and i (bg-padded), so a
                # vertical ink run of length L becomes L-1 full-ink rows
                # bracketed by two gray-128 rows — darkness-preserving
                padded = np.full(
                    (GLYPH_H * s + 1, block.shape[1]), BG, dtype=np.int16
                )
                blend = padded.copy()
                padded[:-1] = block
                blend[1:] = block
                mixed = ((padded + blend + 1) // 2).astype(np.uint8)
                out[y0 + d : y0 + d + GLYPH_H * s + 1, cols] = mixed
        x += len(word) * CELL_W - 1 + WORD_GAP + 1
    return out


def render_tiny() -> np.ndarray:
    """A 16x14 image whose only ink is an 8x8 dot: big enough to pass
    the detector's component-area filter (>= 10 half-res px), small
    enough that the min_size box filter drops it (reference
    easyocr/easyocr.py:343-347) -> empty OCR result."""
    img = np.full((14, 16), BG, dtype=np.uint8)
    img[4:12, 4:12] = INK  # even-aligned: half-res box quantizes exactly
    return img
