"""Arrow-batched OCR UDFs — the JVM <-> Python boundary.

Design contract from BASELINE.json input_hint: vectorized pandas/Arrow
UDFs ONLY, zero per-row Python at the Spark boundary. One Arrow batch of
(media_ref, content) rows crosses into the Python worker; the whole
decode -> detect -> group -> crop -> recognize -> order -> concat
pipeline runs per image inside the batch (the reference's
readtext_batched unit of work, easyocr/easyocr.py:538-579); one Arrow
batch of (media_ref, text, conf, n_boxes) comes back.

Executor-resident model state: the reader singleton (glyph atlas =
stand-in weights) is a module-level lazy global in the Python worker
process — loaded once per executor, reused across batches and tasks,
exactly the load-once-per-Reader pattern of the reference
(easyocr/easyocr.py:214-233) mapped onto Spark's process model. For
real torch weights this is where `--files`-shipped .pth archives would
be deserialized (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..fixtures.png import decode_gray, decode_image
from .reader import StandInReader

OCR_RESULT_SCHEMA = "media_ref string, text string, conf double, n_boxes int"

_READERS: dict[tuple, object] = {}


def get_reader(
    decoder: str = "greedy", allowlist: str | None = None, lang: str = ""
) -> object:
    """Executor-resident singleton per (decoder, allowlist, lang)
    config (the reference's one-Reader-per-config pattern,
    easyocr/easyocr.py:214-233). ``lang`` routes the recognition model:
    chinese-tagged media must be decoded with the cjk glyph atlas (the
    reference's language decision tree picks the model file the same
    way, easyocr/easyocr.py:106-167).

    Backend selection (EASYOCR_SPARK_BACKEND=torch) happens here, once
    per worker process: the torch path loads the real CRAFT/CRNN
    weights (ocr/backends/) when torch + .pth files are present, and
    falls back to the deterministic stand-in loudly otherwise — the
    sandbox default and the path the oracles verify."""
    key = (decoder, allowlist, lang)
    if key not in _READERS:
        from .backends import make_torch_reader, resolve_backend

        lang_list = [lang] if lang else None
        if resolve_backend() == "torch":
            _READERS[key] = make_torch_reader(
                decoder=decoder, allowlist=allowlist, lang_list=lang_list
            )
        else:
            _READERS[key] = StandInReader(
                decoder=decoder, allowlist=allowlist, lang_list=lang_list
            )
    return _READERS[key]


def make_ocr_batches(decoder: str, allowlist: str | None = None):
    """Kernel factory for non-default decoders (beamsearch /
    wordbeamsearch, reference easyocr/utils.py:181-384) and for
    allowlist-masked recognition (reference easyocr/easyocr.py:363-368:
    allowlist -> ignore set pushed into the softmax columns)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _ocr_batches_impl(it, decoder, allowlist)

    return kernel


def ocr_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    return _ocr_batches_impl(it, "greedy")


def _ocr_batches_impl(
    it: Iterator[pd.DataFrame], decoder: str, allowlist: str | None = None
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_ref, content[, lang]) ->
    OCR_RESULT_SCHEMA. The lang column routes RTL post-processing
    (Arabic word order within lines — the reference's bidi reordering,
    easyocr/easyocr.py:414-418)."""
    for pdf in it:
        texts: list[str] = []
        confs: list[float] = []
        n_boxes: list[int] = []
        langs = pdf["lang"] if "lang" in pdf.columns else [""] * len(pdf)
        for data, lang in zip(pdf["content"], langs):
            reader = get_reader(decoder, allowlist, str(lang))
            img = decode_gray(bytes(data))
            results = reader.readtext(img)
            kept = [(b, t, c) for b, t, c in results if t]
            if lang == "arabic":
                lines: list[list[str]] = []
                last_y = None
                for box, t, _ in kept:
                    y0 = box[0][1]
                    if last_y is None or y0 != last_y:
                        lines.append([])
                        last_y = y0
                    lines[-1].append(t)
                texts.append(
                    " ".join(t for line in lines for t in reversed(line))
                )
            else:
                texts.append(" ".join(t for _, t, _ in kept))
            confs.append(min((c for _, _, c in kept), default=0.0))
            n_boxes.append(len(results))
        yield pd.DataFrame(
            {
                "media_ref": pdf["media_ref"],
                "text": texts,
                "conf": confs,
                "n_boxes": n_boxes,
            }
        )


def detect_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Detect-only stage (the reference's two-phase detect()/recognize()
    split, easyocr/easyocr.py:311-351): (media_ref, content) ->
    per-image box counts + box list as flat ints [x0,x1,y0,y1,...]."""
    reader = get_reader()
    for pdf in it:
        counts: list[int] = []
        boxes_flat: list[list[int]] = []
        for data in pdf["content"]:
            img = decode_gray(bytes(data))
            horizontal, free = reader.detect(img)
            counts.append(len(horizontal) + len(free))
            flat: list[int] = []
            for b in horizontal:
                flat.extend(int(v) for v in b)
            boxes_flat.append(flat)
        yield pd.DataFrame(
            {"media_ref": pdf["media_ref"], "n_boxes": counts, "boxes": boxes_flat}
        )


DETECT_RESULT_SCHEMA = "media_ref string, n_boxes int, boxes array<int>"


def detect_free_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Free-list (rotated quad) detection stage: (media_ref, content) ->
    one row per free quad with its 4 corners in DECI-pixels (x10,
    rounded to int — the grouping margin arithmetic is float; rounded
    deci-pixels make the oracle comparison integer-exact). Quads come
    out in reading order (component raster order)."""
    reader = get_reader()
    for pdf in it:
        rows = []
        for ref, data in zip(pdf["media_ref"], pdf["content"]):
            img = decode_gray(bytes(data))
            _, free = reader.detect(img)
            for i, quad in enumerate(free):
                flat = [int(round(c * 10)) for p in quad for c in p]
                rows.append((ref, i, *flat))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_ref", "box_idx",
                "x0d", "y0d", "x1d", "y1d", "x2d", "y2d", "x3d", "y3d",
            ],
        )


DETECT_FREE_SCHEMA = (
    "media_ref string, box_idx int, x0d long, y0d long, x1d long, y1d long, "
    "x2d long, y2d long, x3d long, y3d long"
)


def detect_smooth_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Free-quad detection for the SMOOTH (anti-aliased constant-slope)
    class in QUARTER-pixels (x4, rounded to int): the smooth drop lives
    on a half-pixel grid, so quarter-px output stays integer-exact
    where deci-px would land on .5 rounding ties. Same reading-order
    contract as detect_free_batches."""
    reader = get_reader()
    for pdf in it:
        rows = []
        for ref, data in zip(pdf["media_ref"], pdf["content"]):
            img = decode_gray(bytes(data))
            _, free = reader.detect(img)
            for i, quad in enumerate(free):
                flat = [int(round(c * 4)) for p in quad for c in p]
                rows.append((ref, i, *flat))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_ref", "box_idx",
                "x0q", "y0q", "x1q", "y1q", "x2q", "y2q", "x3q", "y3q",
            ],
        )


DETECT_SMOOTH_SCHEMA = (
    "media_ref string, box_idx int, x0q long, y0q long, x1q long, y1q long, "
    "x2q long, y2q long, x3q long, y3q long"
)


def detect_smooth_poly_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """poly=True for the smooth class: one row per SUB-PIXEL polygon
    point in quarter-pixels — (media_ref, box_idx, pt_idx, xq, yq)."""
    from .detection import detect_smooth_polys

    for pdf in it:
        rows = []
        for ref, data in zip(pdf["media_ref"], pdf["content"]):
            img = decode_gray(bytes(data))
            for box_idx, poly in enumerate(detect_smooth_polys(img)):
                for pt_idx, (x, y) in enumerate(poly):
                    rows.append(
                        (ref, box_idx, pt_idx,
                         int(round(x * 4)), int(round(y * 4)))
                    )
        yield pd.DataFrame(
            rows, columns=["media_ref", "box_idx", "pt_idx", "xq", "yq"]
        )


DETECT_SMOOTH_POLY_SCHEMA = (
    "media_ref string, box_idx int, pt_idx int, xq long, yq long"
)


def detect_poly_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """poly=True detection stage (the getPoly_core analogue): one row
    per polygon POINT — (media_ref, box_idx, pt_idx, x, y), integer
    pixel coords (the polygon comes straight from the detector, before
    any grouping margin, so coordinates are exact ints)."""
    from .detection import detect_polys

    for pdf in it:
        rows = []
        for ref, data in zip(pdf["media_ref"], pdf["content"]):
            img = decode_gray(bytes(data))
            box_idx = 0
            for poly in detect_polys(img):
                if poly is None:
                    continue
                for pt_idx, (x, y) in enumerate(poly):
                    rows.append((ref, box_idx, pt_idx, int(round(x)), int(round(y))))
                box_idx += 1
        yield pd.DataFrame(
            rows, columns=["media_ref", "box_idx", "pt_idx", "x", "y"]
        )


DETECT_POLY_SCHEMA = (
    "media_ref string, box_idx int, pt_idx int, x int, y int"
)


PARAGRAPH_RESULT_SCHEMA = "media_ref string, n_paragraphs int, text string"


def paragraph_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Paragraph-mode OCR (reference paragraph=True path,
    easyocr/easyocr.py:422-423 + utils.py:643-709): per image, grouped
    paragraphs with reading-order concat; RTL mode for arabic-routed
    media."""
    for pdf in it:
        n_out: list[int] = []
        texts: list[str] = []
        langs = pdf["lang"] if "lang" in pdf.columns else [""] * len(pdf)
        for data, lang in zip(pdf["content"], langs):
            reader = get_reader(lang=str(lang))
            img = decode_gray(bytes(data))
            horizontal, free = reader.detect(img)
            from .paragraph import get_paragraph

            results = reader.recognize(img, horizontal, free)
            paras = get_paragraph(
                results, mode="rtl" if lang == "arabic" else "ltr"
            )
            n_out.append(len(paras))
            texts.append(" ".join(t for _, t in paras))
        yield pd.DataFrame(
            {"media_ref": pdf["media_ref"], "n_paragraphs": n_out, "text": texts}
        )


def dims_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode-only stage: (media_ref, content) -> image dimensions.
    Proves the binary-column decode plumbing (the multimodal-column
    pattern: opaque bytes in, typed metadata out) with zero per-row
    Python at the boundary."""
    for pdf in it:
        ws: list[int] = []
        hs: list[int] = []
        for data in pdf["content"]:
            img = decode_gray(bytes(data))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
        yield pd.DataFrame({"media_ref": pdf["media_ref"], "width": ws, "height": hs})


DIMS_RESULT_SCHEMA = "media_ref string, width int, height int"


def channels_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode-branch probe: (media_ref, content) -> source channel
    count + dims. Verifies the color (truecolor PNG -> BT.601 gray)
    ingest branch against the formula oracle — the reformat_input
    normalization matrix (reference easyocr/utils.py:732-769)."""
    for pdf in it:
        rows = []
        for ref, data in zip(pdf["media_ref"], pdf["content"]):
            img, ch = decode_image(bytes(data))
            rows.append((ref, ch, img.shape[1], img.shape[0]))
        yield pd.DataFrame(
            rows, columns=["media_ref", "channels", "width", "height"]
        )


CHANNELS_RESULT_SCHEMA = "media_ref string, channels int, width int, height int"
