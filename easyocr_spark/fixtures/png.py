"""Minimal pure-Python PNG codec for 8-bit grayscale images.

Mirrors the role of cv2.imencode/imdecode in the reference ingest path
(reference easyocr/utils.py:742-746 decodes raw bytes with
``cv2.imdecode``): our media table stores encoded PNG bytes, and the OCR
UDF decodes them to ``np.uint8[H, W]`` inside the Arrow batch.

Encoder always writes filter type 0 (None) scanlines; decoder implements
all five PNG filter reconstructions so any conformant grayscale-8 PNG
round-trips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8[H, W] -> PNG bytes (grayscale, bit depth 8, no interlace)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray expects uint8[H, W]")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_gray(data: bytes) -> np.ndarray:
    """PNG bytes (grayscale-8) -> uint8[H, W]."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError("only grayscale-8 non-interlaced supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w + 1)
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int32).copy()
    if np.any(filters):
        # general per-scanline reconstruction (filters 1-4 reference the
        # previous column/row, so rows go sequentially)
        prev = np.zeros(w, dtype=np.int32)
        for y in range(h):
            f = filters[y]
            row = out[y]
            if f == 0:
                pass
            elif f == 1:  # Sub
                for x in range(1, w):
                    row[x] = (row[x] + row[x - 1]) & 0xFF
            elif f == 2:  # Up
                row += prev
                row &= 0xFF
            elif f == 3:  # Average
                row[0] = (row[0] + prev[0] // 2) & 0xFF
                for x in range(1, w):
                    row[x] = (row[x] + (row[x - 1] + prev[x]) // 2) & 0xFF
            elif f == 4:  # Paeth
                for x in range(w):
                    a = row[x - 1] if x else 0
                    b = int(prev[x])
                    c = int(prev[x - 1]) if x else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[x] = (row[x] + pred) & 0xFF
            else:
                raise ValueError(f"bad filter {f}")
            prev = row
    return out.astype(np.uint8)
