"""Netpbm decoder tests. The binary/ASCII variants cross-check each
other, and P4/P5/P6 fixtures are assembled BY HAND (header bytes +
np.packbits / tobytes), so no round-trip through the module's own
encoder is load-bearing for the binary formats."""

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark import kernels as K
from ai_invoice_ocr_engine_spark.pnm import decode_pnm, encode_pnm


def _gray(h=7, w=11, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


def test_p5_hand_built_and_dispatch():
    g = _gray()
    blob = b"P5\n11 7\n255\n" + g.tobytes()
    np.testing.assert_array_equal(decode_pnm(blob), g)
    np.testing.assert_array_equal(K.decode_image(blob), g)  # magic dispatch


def test_p2_ascii_with_comments_matches_p5():
    g = _gray(5, 6, seed=4)
    np.testing.assert_array_equal(decode_pnm(encode_pnm(g, kind=2)), g)
    blob = b"P2\n# c1\n6 # inline\n# c2\n5\n255\n" + b" ".join(
        b"%d" % v for v in g.reshape(-1)
    )
    np.testing.assert_array_equal(decode_pnm(blob), g)


def test_p4_packed_bits_black_is_zero_gray():
    mask = np.zeros((4, 10), np.uint8)
    mask[1, 2:7] = 1  # PBM 1 = black
    packed = np.packbits(mask, axis=1)
    blob = b"P4\n10 4\n" + packed.tobytes()
    img = decode_pnm(blob)
    np.testing.assert_array_equal(img == 0, mask.astype(bool))


def test_p1_ascii_unseparated_digits():
    blob = b"P1\n# bitmap\n5 2\n01100\n10011\n"
    want = 255 * (
        1 - np.array([[0, 1, 1, 0, 0], [1, 0, 0, 1, 1]], np.uint8)
    )
    np.testing.assert_array_equal(decode_pnm(blob), want)


def test_p6_rgb_uses_shared_luma():
    rgb = np.random.default_rng(5).integers(0, 256, (3, 4, 3), dtype=np.uint8)
    blob = b"P6\n4 3\n255\n" + rgb.tobytes()
    np.testing.assert_array_equal(decode_pnm(blob), K.rgb_to_gray(rgb))


def test_p3_ascii_matches_p6():
    rgb = np.random.default_rng(6).integers(0, 256, (2, 3, 3), dtype=np.uint8)
    p6 = b"P6\n3 2\n255\n" + rgb.tobytes()
    p3 = b"P3\n3 2\n255\n" + b" ".join(b"%d" % v for v in rgb.reshape(-1))
    np.testing.assert_array_equal(decode_pnm(p3), decode_pnm(p6))


def test_p5_16bit_maxval_scales_with_rounding():
    vals = np.array([[0, 1000, 32768, 65535]], np.uint16)
    blob = b"P5\n4 1\n65535\n" + vals.astype(">u2").tobytes()
    want = ((vals.astype(np.int64) * 255 + 65535 // 2) // 65535).astype(np.uint8)
    np.testing.assert_array_equal(decode_pnm(blob), want)


def test_nonstandard_maxval_100():
    blob = b"P5\n3 1\n100\n" + bytes([0, 50, 100])
    np.testing.assert_array_equal(decode_pnm(blob), [[0, 128, 255]])


@pytest.mark.parametrize(
    "blob,msg",
    [
        (b"P5\n4 1\n255\n\x00\x01", "truncated"),
        (b"P5\n4 1\n70000\n" + b"\x00" * 8, "maxval"),
        (b"P2\n2 1\n255\n5 999\n", "maxval"),
        (b"P1\n2 1\n0x\n", "corrupt"),
        (b"P5\n0 3\n255\n", "dimensions"),
        (b"P5\n#nope", "unterminated"),
        (b"P7\n1 1\n255\n\x00", "magic"),
    ],
)
def test_error_contract(blob, msg):
    with pytest.raises(ValueError, match=msg):
        decode_pnm(blob)


def test_sample_exceeding_maxval_is_loud():
    with pytest.raises(ValueError, match="exceeds maxval"):
        decode_pnm(b"P2\n2 1\n10\n5 11\n")


def test_pnm_fuzz_never_raises_bare_exceptions():
    """Same fuzz contract as the other codecs: arbitrary bytes behind a
    PNM magic must raise ValueError, never a bare structural exception."""
    rng = np.random.default_rng(0)
    for _ in range(300):
        body = bytes(rng.integers(0, 256, int(rng.integers(0, 80)), dtype=np.uint8))
        blob = b"P" + bytes([int(rng.integers(0x31, 0x37))]) + body
        try:
            decode_pnm(blob)
        except ValueError:
            pass
