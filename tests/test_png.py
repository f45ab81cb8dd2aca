import numpy as np
import pytest

from easyocr_spark.fixtures.png import decode_gray, encode_gray


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert np.array_equal(decode_gray(encode_gray(img)), img)


def test_roundtrip_extremes():
    for v in (0, 255):
        img = np.full((5, 7), v, dtype=np.uint8)
        assert np.array_equal(decode_gray(encode_gray(img)), img)


def test_rejects_non_png():
    with pytest.raises(ValueError):
        decode_gray(b"not a png at all")


def test_rejects_bad_dtype():
    with pytest.raises(ValueError):
        encode_gray(np.zeros((3, 3), dtype=np.float32))


def test_decode_sub_and_up_filters():
    # hand-build a PNG with filter types 1 (Sub) and 2 (Up)
    import struct
    import zlib

    from easyocr_spark.fixtures import png as p

    rows = np.array([[10, 20, 30], [15, 25, 35]], dtype=np.uint8)
    # encode row0 with Sub (deltas), row1 with Up (deltas vs row0)
    r0 = bytes([1, 10, 10, 10])
    r1 = bytes([2, 5, 5, 5])
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    data = (
        p._SIG
        + p._chunk(b"IHDR", ihdr)
        + p._chunk(b"IDAT", zlib.compress(r0 + r1))
        + p._chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_gray(data), rows)
