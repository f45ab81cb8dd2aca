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


def test_rgb_roundtrip_and_bt601():
    from easyocr_spark.fixtures.png import decode_image, encode_rgb

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    gray, ch = decode_image(encode_rgb(rgb))
    assert ch == 3
    r32 = rgb.astype(np.uint32)
    want = (77 * r32[:, :, 0] + 150 * r32[:, :, 1] + 29 * r32[:, :, 2] + 128) >> 8
    assert np.array_equal(gray, want.astype(np.uint8))


def test_rgb_pure_gray_is_exact():
    from easyocr_spark.fixtures.png import decode_image, encode_rgb

    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rgb = np.repeat(v[:, :, None], 3, axis=2)
    gray, ch = decode_image(encode_rgb(rgb))
    assert ch == 3
    assert np.array_equal(gray, v)  # weights sum to 256 -> identity


def test_color_media_class_ocr_equivalence():
    """A color render must decode+recognize to the same text as its
    grayscale geometry implies (the class only changes PNG encoding)."""
    from easyocr_spark.fixtures import corpus
    from easyocr_spark.fixtures.png import decode_image
    from easyocr_spark.ocr.reader import StandInReader

    # find a color-class ref deterministically
    ref = next(
        f"m_{a}_{b}"
        for a in range(40)
        for b in range(3)
        if corpus.media_spec(f"m_{a}_{b}")["color"]
    )
    data = corpus.render_media(ref)
    gray, ch = decode_image(data)
    assert ch == 3
    got = StandInReader().readtext_text(
        gray, rtl=corpus.media_spec(ref)["lang"] == "arabic"
    )
    assert got == corpus.ground_truth_text(ref)


def test_rgba_decodes_like_rgb():
    """Opaque RGBA must decode to the same gray as its RGB truecolor
    twin (alpha dropped, reference easyocr/utils.py:758-762), and
    report 4 source channels."""
    from easyocr_spark.fixtures.png import decode_image, encode_rgb, encode_rgba

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    rgba = np.concatenate(
        [rgb, np.full((11, 17, 1), 255, dtype=np.uint8)], axis=2
    )
    g_rgb, ch_rgb = decode_image(encode_rgb(rgb))
    g_rgba, ch_rgba = decode_image(encode_rgba(rgba))
    assert (ch_rgb, ch_rgba) == (3, 4)
    assert np.array_equal(g_rgb, g_rgba)


def test_palette_decodes_like_rgb():
    """Indexed color must expand PLTE to the same gray as the expanded
    truecolor image and report 3 source channels (IMREAD_COLOR role)."""
    from easyocr_spark.fixtures.png import decode_image, encode_palette, encode_rgb

    palette = np.array(
        [[112, 16, 16], [255, 255, 255], [40, 200, 90]], dtype=np.uint8
    )
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 3, size=(9, 13)).astype(np.uint8)
    g_pal, ch_pal = decode_image(encode_palette(idx, palette))
    g_rgb, _ = decode_image(encode_rgb(palette[idx]))
    assert ch_pal == 3
    assert np.array_equal(g_pal, g_rgb)


def test_palette_rejects_out_of_range_index():
    from easyocr_spark.fixtures.png import encode_palette

    with pytest.raises(ValueError):
        encode_palette(
            np.full((2, 2), 7, dtype=np.uint8),
            np.zeros((2, 3), dtype=np.uint8),
        )
