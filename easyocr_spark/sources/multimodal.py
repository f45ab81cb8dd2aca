"""Multimodal binary-column operators.

Pattern: media lives in opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
kernels over ``mapInPandas``. For IMAGES everything here is real (the
engine's own PNG codec + resizer). For AUDIO/VIDEO the sandbox ships no
codecs, so the decode step is gated: the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and tested with a
deterministic header parser, and the actual sample/frame decode raises
NotImplementedError behind ``STRICT_DECODE`` (clearly-marked stub per
the round brief).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..fixtures.png import decode_gray, encode_gray

STRICT_DECODE = False  # True -> audio/video decode raises instead of stubbing

IMAGE_META_SCHEMA = (
    "media_ref string, width int, height int, mean_luma int, ink_ratio_milli int"
)
RESIZE_SCHEMA = "media_ref string, content binary, width int, height int"
AUDIO_META_SCHEMA = (
    "media_ref string, sample_rate int, n_samples long, duration_ms long"
)
FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame_png binary"


def image_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real image feature extraction: dims, mean luminance, ink ratio."""
    for pdf in it:
        rows = []
        for ref, data in zip(pdf["media_ref"], pdf["content"]):
            img = decode_gray(bytes(data))
            rows.append(
                (
                    ref,
                    img.shape[1],
                    img.shape[0],
                    int(img.mean()),
                    int(((img < 128).mean() * 1000)),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["media_ref", "width", "height", "mean_luma", "ink_ratio_milli"],
        )


def make_image_resizer(max_side: int):
    """Nearest-neighbor resize kernel capped at max_side (the
    resize_aspect_ratio analogue as a standalone multimodal op)."""

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["content"]):
                img = decode_gray(bytes(data))
                h, w = img.shape
                if max(h, w) > max_side:
                    r = max_side / max(h, w)
                    ys = (np.arange(int(h * r)) / r).astype(np.int64).clip(0, h - 1)
                    xs = (np.arange(int(w * r)) / r).astype(np.int64).clip(0, w - 1)
                    img = img[ys][:, xs]
                rows.append((ref, encode_gray(img), img.shape[1], img.shape[0]))
            yield pd.DataFrame(
                rows, columns=["media_ref", "content", "width", "height"]
            )

    return resize


# --------------------------------------------------------- audio (stubbed)
def _fake_wav_header(data: bytes) -> tuple[int, int]:
    """Parse a minimal RIFF/WAVE header (real parsing — only the PCM
    decode is stubbed). Returns (sample_rate, n_samples)."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    sample_rate = struct.unpack("<I", data[24:28])[0]
    byte_rate = struct.unpack("<I", data[28:32])[0]
    data_size = struct.unpack("<I", data[40:44])[0]
    bytes_per_sample = max(1, byte_rate // max(sample_rate, 1))
    return sample_rate, data_size // bytes_per_sample


def audio_metadata(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Header-level audio metadata; PCM decode itself is out of scope in
    this sandbox (no soundfile/ffmpeg) — STRICT_DECODE raises there."""
    for pdf in it:
        rows = []
        for ref, data in zip(pdf["media_ref"], pdf["content"]):
            sr, n = _fake_wav_header(bytes(data))
            if STRICT_DECODE:
                raise NotImplementedError(
                    "PCM decode requires an audio codec (not in sandbox)"
                )
            rows.append((ref, sr, n, int(n * 1000 / max(sr, 1))))
        yield pd.DataFrame(
            rows, columns=["media_ref", "sample_rate", "n_samples", "duration_ms"]
        )


def synth_wav(sample_rate: int = 16000, n_samples: int = 16000) -> bytes:
    """Deterministic WAV container (header + silence) for plumbing tests."""
    data_size = n_samples * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                 sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", data_size)
    return hdr + b"\x00" * data_size


def video_frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling STUB: the sandbox has no video codec. The
    operator contract (schema, partition grain: one output row per
    sampled frame) is declared; calling it raises."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav (not in the sandbox image); "
        f"contract: input (media_ref, content), output {FRAME_SAMPLE_SCHEMA} "
        f"with one row per frame_idx %% {every_n}"
    )
