"""Deterministic media/document fixture generation (no external data).

The sandbox has no PIL, so images are rendered with a numpy bitmap font
and encoded as real 8-bit grayscale PNGs via a pure-Python codec
(zlib from the stdlib). Everything is a pure function of media_ref —
seedless determinism — so the DuckDB oracle can compute expected OCR
output without ever touching the image bytes.
"""
