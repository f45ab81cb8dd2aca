"""CRNN-style recognition stage (deterministic template stand-in).

Pipeline per crop, mirroring the reference's recognition contract:

1. optional contrast adjustment — faithful port of the
   contrast_grey / adjust_contrast_grey semantics (reference
   easyocr/recognition.py:16-28): percentile(90/10) contrast measure,
   linear stretch when below target.
2. normalize + trim to ink (the role of NormalizePAD + aspect resize,
   reference easyocr/recognition.py:30-47, utils.py:557-577).
3. "forward pass": per character cell, frame-level class scores against
   the glyph atlas -> a [T, C] probability matrix with column 0 = CTC
   blank. Each glyph emits two identical frames followed by a blank
   frame (as a stride-based CNN over the cell grid would), so the CTC
   collapse-repeats + drop-blank path does real work.
4. CTC greedy (default) or prefix beam search decode; confidence =
   custom_mean of non-blank step max-probs (reference
   easyocr/recognition.py:13-14,99-151).
5. Two-pass orchestration a la get_text (reference
   easyocr/recognition.py:186-233): pass 1 plain; if conf <
   contrast_ths(0.1), pass 2 contrast-adjusted; keep the higher-conf
   result.

Word gaps >= WORD_GAP base px inside one crop decode as spaces (the
production path keeps words in separate boxes; this covers merged-box
crops from group_text_box's width_ths merging).
"""

from __future__ import annotations

import numpy as np

from ..fixtures.fonts import CHARSET, GLYPH_H, GLYPH_W, MODEL_TEMPLATES, TEMPLATES
from .ctc import (
    ctc_beam_search,
    custom_mean,
    decode_greedy,
    greedy_collapse,
    word_beam_search,
)

CONTRAST_THS = 0.1  # reference easyocr/easyocr.py:353 default
ADJUST_CONTRAST = 0.5  # reference default target passed to pass 2
INK_THRESHOLD = 0.45  # darkness above this is ink
SHARPNESS = 40.0  # score -> prob sharpening exponent
SPACE_GAP = 6  # base px gap that reads as a word separator
N_CLASSES = len(CHARSET) + 1


def contrast_grey(img: np.ndarray) -> tuple[float, float, float]:
    """(contrast, high, low) — reference easyocr/recognition.py:16-20."""
    high = float(np.percentile(img, 90))
    low = float(np.percentile(img, 10))
    return (high - low) / max(10.0, high + low), high, low


def adjust_contrast_grey(img: np.ndarray, target: float = 0.4) -> np.ndarray:
    """Reference easyocr/recognition.py:22-28 verbatim semantics."""
    contrast, high, low = contrast_grey(img)
    if contrast < target:
        img = img.astype(np.int64)
        ratio = 200.0 / max(10.0, high - low)
        img = (img - low + 25) * ratio
        img = np.clip(img, 0, 255).astype(np.uint8)
    return img


def _nearest_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = ((np.arange(h) + 0.5) * img.shape[0] / h).astype(np.int64).clip(
        0, img.shape[0] - 1
    )
    xs = ((np.arange(w) + 0.5) * img.shape[1] / w).astype(np.int64).clip(
        0, img.shape[1] - 1
    )
    return img[ys][:, xs]


# hoisted constants for the frame scorer (computed once per process,
# one set per script model — the executor-resident "weights"):
# match fraction between binary images a, t of P pixels is
# (P - popcount(a XOR t))/P = (2*a.t - sum(a) - sum(t) + P)/P — one
# matvec against the flattened template stack instead of per-char
# equality scans per segment.
_NPIX = GLYPH_H * GLYPH_W


class _ScriptModel:
    def __init__(self, templates: np.ndarray):
        self.tflat = templates.reshape(len(CHARSET), -1)
        self.tsum = self.tflat.sum(axis=1)
        self.blank_scores = np.empty(N_CLASSES)
        self.blank_scores[0] = 1.0
        # blank frame scores vs glyph templates: fraction of pixels
        # matching an empty window = the template's own empty fraction
        self.blank_scores[1:] = 1.0 - self.tsum / _NPIX


_SCRIPT_MODELS: dict[str, _ScriptModel] = {
    name: _ScriptModel(t) for name, t in MODEL_TEMPLATES.items()
}
# back-compat aliases (latin is the default model)
_TFLAT = _SCRIPT_MODELS["latin"].tflat
_TSUM = _SCRIPT_MODELS["latin"].tsum
_BLANK_SCORES = _SCRIPT_MODELS["latin"].blank_scores


def _frames_for_chunk(
    chunk: np.ndarray,
    segments: list[tuple[int, int]],
    model: str = "latin",
) -> np.ndarray:
    """Binary base-res chunk + char segments -> [T, C] prob matrix,
    scored against the given script model's templates."""
    m = _SCRIPT_MODELS[model]
    frames: list[np.ndarray] = []
    for s, e in segments:
        seg = chunk[:, s:e].astype(np.float32)
        if seg.shape != (GLYPH_H, GLYPH_W):
            seg = _nearest_resize(seg, GLYPH_H, GLYPH_W)
        flat = seg.ravel()
        ssum = flat.sum()
        scores = np.empty(N_CLASSES)
        scores[0] = 1.0 - ssum / _NPIX  # blank likes empty windows
        scores[1:] = (2.0 * (m.tflat @ flat) - m.tsum - ssum + _NPIX) / _NPIX
        frames.append(scores)
        frames.append(scores)  # duplicated frame: real collapse work
        frames.append(m.blank_scores)
    if not frames:
        return np.empty((0, N_CLASSES))
    raw = np.stack(frames) ** SHARPNESS
    return raw / raw.sum(axis=1, keepdims=True)


def build_ignore_mask(
    allowlist: str | None = None, blocklist: str | None = None
) -> np.ndarray | None:
    """Character-constraint mask pushed into decoding (the reference
    zeroes softmax columns of ignored chars and renormalizes,
    easyocr/recognition.py:117-122; the ignore set is charset -
    allowlist, or blocklist — easyocr/easyocr.py:363-368). Returns a
    bool[N_CLASSES] with True = ignore (never index 0 = blank)."""
    if allowlist is None and blocklist is None:
        return None
    mask = np.zeros(N_CLASSES, dtype=bool)
    if allowlist is not None:
        for i, ch in enumerate(CHARSET):
            if ch not in allowlist:
                mask[i + 1] = True
    elif blocklist:
        for ch in blocklist:
            if ch in CHARSET:
                mask[CHARSET.index(ch) + 1] = True
    return mask


def _apply_ignore(probs: np.ndarray, ignore: np.ndarray | None) -> np.ndarray:
    if ignore is None or probs.size == 0:
        return probs
    out = probs.copy()
    out[:, ignore] = 0.0
    s = out.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    return out / s


def recognize_crop(
    crop: np.ndarray,
    adjust: bool = False,
    decoder: str = "greedy",
    ignore: np.ndarray | None = None,
    model: str = "latin",
) -> tuple[str, float]:
    """uint8[H, W] crop -> (text, confidence)."""
    img = adjust_contrast_grey(crop, ADJUST_CONTRAST) if adjust else crop
    darkness = (255.0 - img.astype(np.float32)) / 255.0
    binary = darkness > INK_THRESHOLD
    if not binary.any():
        return "", 0.0
    ys, xs = np.nonzero(binary)
    binary = binary[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
    h = binary.shape[0]
    scale = max(1, round(h / GLYPH_H))
    if h != scale * GLYPH_H:
        base = _nearest_resize(
            binary.astype(np.float32), GLYPH_H, max(1, round(binary.shape[1] / (h / GLYPH_H)))
        ) > 0.5
    else:
        base = binary[scale // 2 :: scale, scale // 2 :: scale]
    # char segmentation: runs of non-empty columns
    colink = base.sum(axis=0) > 0
    padded = np.concatenate(([False], colink, [False]))
    diff = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(diff == 1)
    ends = np.flatnonzero(diff == -1)
    # split into word chunks at wide gaps
    chunks: list[list[tuple[int, int]]] = []
    for s, e in zip(starts, ends):
        if chunks and s - chunks[-1][-1][1] < SPACE_GAP:
            chunks[-1].append((int(s), int(e)))
        else:
            chunks.append([(int(s), int(e))])
    words: list[str] = []
    all_confs: list[np.ndarray] = []
    for segs in chunks:
        probs = _apply_ignore(_frames_for_chunk(base, segs, model), ignore)
        if decoder == "beamsearch":
            text, _ = ctc_beam_search(probs, CHARSET)
        elif decoder == "wordbeamsearch":
            from ..fixtures.corpus import VOCAB  # the stand-in word dict

            text, _ = word_beam_search(probs, CHARSET, VOCAB)
        else:
            text, _ = decode_greedy(probs, CHARSET)
        _, confs = greedy_collapse(probs)
        if text:
            words.append(text)
        all_confs.append(confs)
    conf = custom_mean(np.concatenate(all_confs)) if all_confs else 0.0
    return " ".join(words), conf


def recognize_two_pass(
    crop: np.ndarray,
    decoder: str = "greedy",
    contrast_ths: float = CONTRAST_THS,
    ignore: np.ndarray | None = None,
    model: str = "latin",
) -> tuple[str, float]:
    """get_text's two-pass orchestration (reference
    easyocr/recognition.py:186-233): retry low-confidence crops with
    contrast adjustment, keep the better result."""
    text1, conf1 = recognize_crop(
        crop, adjust=False, decoder=decoder, ignore=ignore, model=model
    )
    if conf1 < contrast_ths:
        text2, conf2 = recognize_crop(
            crop, adjust=True, decoder=decoder, ignore=ignore, model=model
        )
        if conf2 > conf1:
            return text2, conf2
    return text1, conf1
