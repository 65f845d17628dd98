"""APNG tests: compositing pinned against independent hand math for every
dispose/blend combination, the default-image-in/out-of-animation layouts,
sequence-number validation, tRNS/bKGD handling, and video routing."""

import struct
import zlib

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark import kernels as K
from ai_invoice_ocr_engine_spark.apng import (
    apng_frames,
    apng_metadata,
    encode_apng,
    is_apng,
)
from ai_invoice_ocr_engine_spark.functions.multimodal import (
    video_frame_payloads,
    video_metadata,
)


def _rgba(h, w, seed, alpha=None):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 4), np.uint8).astype(np.uint8)
    if alpha is not None:
        img[:, :, 3] = alpha
    return img


def _flatten(canvas, bg=(0, 0, 0)):
    """Independent straight-alpha flatten + luma (test-side math)."""
    a = canvas[:, :, 3].astype(np.int64)
    bgv = np.array(bg, np.int64)
    rgb = ((canvas[:, :, :3].astype(np.int64) * a[:, :, None]
            + bgv[None, None, :] * (255 - a)[:, :, None] + 127) // 255)
    return K.rgb_to_gray(rgb.astype(np.uint8))


def _over(dst, src):
    """Independent Porter-Duff OVER (straight alpha, integer-exact)."""
    out = dst.astype(np.int64).copy()
    sa = src[:, :, 3].astype(np.int64)
    oa255 = sa * 255 + out[:, :, 3] * (255 - sa)
    cn = (src[:, :, :3].astype(np.int64) * sa[:, :, None] * 255
          + out[:, :, :3] * out[:, :, 3:4] * (255 - sa)[:, :, None])
    safe = np.maximum(oa255, 1)
    out[:, :, :3] = (cn + safe[:, :, None] // 2) // safe[:, :, None]
    out[:, :, 3] = (oa255 + 127) // 255
    return out.astype(np.uint8)


def test_two_frames_source_then_over():
    f0 = _rgba(10, 12, 1, alpha=255)
    f1 = _rgba(4, 5, 2)  # random alpha
    frames = apng_frames(encode_apng([(f0, 0, 0, 0, 0), (f1, 3, 2, 0, 1)], 12, 10))
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], K.rgb_to_gray(f0[:, :, :3]))
    canvas = f0.copy()
    canvas[2:6, 3:8] = _over(canvas[2:6, 3:8], f1)
    np.testing.assert_array_equal(frames[1], _flatten(canvas))


def test_dispose_background_with_bkgd():
    f0 = _rgba(10, 12, 3, alpha=255)
    f1 = _rgba(4, 5, 4, alpha=255)
    blob = encode_apng([(f0, 0, 0, 1, 0), (f1, 3, 2, 0, 0)], 12, 10,
                       bkgd=(255, 255, 255))
    frames = apng_frames(blob)
    canvas = np.zeros((10, 12, 4), np.uint8)
    canvas[2:6, 3:8] = f1
    np.testing.assert_array_equal(frames[1], _flatten(canvas, (255, 255, 255)))


def test_dispose_previous_reverts_region():
    f0 = _rgba(10, 12, 5, alpha=255)
    f1 = _rgba(4, 5, 6, alpha=255)
    f2 = _rgba(3, 3, 7, alpha=255)
    blob = encode_apng(
        [(f0, 0, 0, 0, 0), (f1, 3, 2, 2, 0), (f2, 0, 0, 0, 0)], 12, 10)
    frames = apng_frames(blob)
    canvas = f0.copy()
    canvas[0:3, 0:3] = f2  # f1's region reverted before f2 renders
    np.testing.assert_array_equal(frames[2], _flatten(canvas))


def test_first_frame_previous_acts_as_background():
    f0 = _rgba(6, 6, 8, alpha=255)
    f1 = _rgba(2, 2, 9, alpha=255)
    blob = encode_apng([(f0, 0, 0, 2, 0), (f1, 1, 1, 0, 1)], 6, 6)
    frames = apng_frames(blob)
    canvas = np.zeros((6, 6, 4), np.uint8)  # f0 disposed to transparent
    canvas[1:3, 1:3] = _over(canvas[1:3, 1:3], f1)
    np.testing.assert_array_equal(frames[1], _flatten(canvas))


def test_default_image_outside_animation():
    f0 = _rgba(8, 8, 10, alpha=255)
    f1 = _rgba(8, 8, 11, alpha=255)
    blob = encode_apng([(f0, 0, 0, 0, 0), (f1, 0, 0, 0, 0)], 8, 8,
                       first_frame_in_anim=False)
    frames = apng_frames(blob)
    assert len(frames) == 1  # only f1 is in the animation
    np.testing.assert_array_equal(frames[0], K.rgb_to_gray(f1[:, :, :3]))


def test_still_png_is_one_frame():
    g = _rgba(7, 9, 12)[:, :, 0]
    still = K.encode_png(g)
    assert not is_apng(still)
    np.testing.assert_array_equal(apng_frames(still)[0], K.decode_png(still))


def test_sequence_gap_raises():
    f0 = _rgba(4, 4, 13, alpha=255)
    f1 = _rgba(4, 4, 14, alpha=255)
    blob = bytearray(encode_apng([(f0, 0, 0, 0, 0), (f1, 0, 0, 0, 0)], 4, 4))
    # bump the fdAT sequence number (last fdAT chunk) to create a gap
    idx = bytes(blob).rfind(b"fdAT")
    seq = struct.unpack(">I", blob[idx + 4 : idx + 8])[0]
    blob[idx + 4 : idx + 8] = struct.pack(">I", seq + 5)
    # fix the chunk CRC so only the gap (not the CRC) trips validation
    (ln,) = struct.unpack(">I", blob[idx - 4 : idx])
    payload = bytes(blob[idx + 4 : idx + 4 + ln])
    blob[idx + 4 + ln : idx + 8 + ln] = struct.pack(
        ">I", zlib.crc32(b"fdAT" + payload))
    with pytest.raises(ValueError, match="sequence"):
        apng_frames(bytes(blob))


def test_actl_frame_count_mismatch_raises():
    f0 = _rgba(4, 4, 15, alpha=255)
    blob = bytearray(encode_apng([(f0, 0, 0, 0, 0)], 4, 4))
    idx = bytes(blob).find(b"acTL")
    blob[idx + 4 : idx + 8] = struct.pack(">I", 3)
    blob[idx + 12 : idx + 16] = struct.pack(
        ">I", zlib.crc32(bytes(blob[idx : idx + 12])))
    with pytest.raises(ValueError, match="declares 3 frames"):
        apng_frames(bytes(blob))


def test_frame_region_outside_canvas_raises():
    f0 = _rgba(4, 4, 16, alpha=255)
    f1 = _rgba(3, 3, 17, alpha=255)
    blob = encode_apng([(f0, 0, 0, 0, 0), (f1, 2, 2, 0, 0)], 4, 4)
    with pytest.raises(ValueError, match="exceeds the canvas"):
        apng_frames(blob)


def test_video_routing_and_metadata():
    f0 = _rgba(10, 12, 18, alpha=255)
    f1 = _rgba(4, 5, 19, alpha=255)
    blob = encode_apng([(f0, 0, 0, 0, 0), (f1, 3, 2, 0, 0)], 12, 10,
                       delays=[(1, 10), (3, 10)])
    payloads = video_frame_payloads(blob)
    assert len(payloads) == 2
    assert all(K.decode_synf(p).shape == (10, 12) for p in payloads)
    m = video_metadata(blob)
    assert m["format"] == "apng" and m["n_frames"] == 2
    assert m["duration_s"] == pytest.approx(0.4)
    # still PNG: 1-frame video, format 'png'
    still = K.encode_png(f0[:, :, 0])
    assert video_metadata(still)["n_frames"] == 1
    assert len(video_frame_payloads(still)) == 1


def test_invalid_color_type_is_loud_not_keyerror():
    """A malformed APNG with an invalid IHDR color type must raise the
    pipeline's NotImplementedError contract (as kernels.decode_png does
    for the still path), never a bare KeyError."""
    f0 = _rgba(4, 4, 21, alpha=255)
    blob = bytearray(encode_apng([(f0, 0, 0, 0, 0)], 4, 4))
    idx = bytes(blob).find(b"IHDR")
    blob[idx + 4 + 9] = 5  # color type byte inside IHDR payload
    blob[idx + 4 + 13 : idx + 4 + 17] = struct.pack(
        ">I", zlib.crc32(bytes(blob[idx : idx + 4 + 13])))
    with pytest.raises(NotImplementedError, match="color type 5"):
        apng_frames(bytes(blob))
