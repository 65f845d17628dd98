"""AVI/RIFF demux tests: MJPG and BI_RGB DIB frames decode end-to-end,
missing-DHT MJPG gets Annex K tables, the PCM soundtrack re-wraps through
the pinned WAV decoder, rec-group movi nesting, palette/32-bit/top-down
DIB layouts, the codec seam, and the multimodal routing layer."""

import struct

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark import kernels as K
from ai_invoice_ocr_engine_spark.avi import (
    avi_audio_bytes,
    avi_frame_payloads,
    avi_metadata,
    encode_avi,
    encode_avi_dib_frame,
    parse_avi,
)
from ai_invoice_ocr_engine_spark.functions.multimodal import (
    audio_metadata,
    decode_audio,
    video_frame_payloads,
    video_metadata,
)
from ai_invoice_ocr_engine_spark.jpeg import decode_jpeg, encode_jpeg


def _imgs(n, h=20, w=31, seed=3):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w), np.uint8).astype(np.uint8) for _ in range(n)]


def test_dib24_frames_roundtrip_exact():
    imgs = _imgs(3)
    blob = encode_avi([encode_avi_dib_frame(im) for im in imgs], b"DIB ", 31, 20)
    payloads = avi_frame_payloads(blob)
    assert len(payloads) == 3
    for im, p in zip(imgs, payloads):
        np.testing.assert_array_equal(K.decode_synf(p), im)


def test_dib_32bit_and_topdown():
    im = _imgs(1, 7, 5)[0]
    # 32-bit BGRX, top-down (negative height)
    px = np.zeros((7, 5, 4), np.uint8)
    px[:, :, :3] = im[:, :, None]
    blob = encode_avi([px.tobytes()], b"DIB ", 5, 7, bits=32)
    # patch biHeight negative for top-down
    idx = blob.find(struct.pack("<Iii", 40, 5, 7))
    assert idx > 0
    blob = blob[: idx + 8] + struct.pack("<i", -7) + blob[idx + 12 :]
    (p,) = avi_frame_payloads(blob)
    np.testing.assert_array_equal(K.decode_synf(p), im)


def test_dib8_palette():
    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (13, 17), np.uint8).astype(np.uint8)
    stride = (17 + 3) & ~3
    rows = np.zeros((13, stride), np.uint8)
    rows[:, :17] = idx
    blob = encode_avi([rows[::-1].tobytes()], b"DIB ", 17, 13, bits=8, palette=pal)
    (p,) = avi_frame_payloads(blob)
    np.testing.assert_array_equal(K.decode_synf(p), K.rgb_to_gray(pal[idx]))


def test_mjpg_frames_decode():
    imgs = _imgs(3)
    blob = encode_avi([encode_jpeg(im, quality=95) for im in imgs], b"MJPG", 31, 20)
    for im, p in zip(imgs, avi_frame_payloads(blob)):
        dec = decode_jpeg(p)
        assert dec.shape == im.shape
        assert np.mean(np.abs(dec.astype(int) - im.astype(int))) < 12


def _strip_dht(b):
    out = bytearray(b[:2])
    pos = 2
    while pos + 4 <= len(b):
        m = b[pos + 1]
        if m == 0xDA:
            out += b[pos:]
            break
        sl = int.from_bytes(b[pos + 2 : pos + 4], "big")
        if m != 0xC4:
            out += b[pos : pos + 2 + sl]
        pos += 2 + sl
    return bytes(out)


def test_mjpg_missing_dht_uses_annex_k():
    """The OpenDML convention: DHT-less MJPG frames decode bit-identically
    to the same frame with its Annex K tables present."""
    imgs = _imgs(2)
    full = [encode_jpeg(im, quality=90) for im in imgs]
    stripped = [_strip_dht(f) for f in full]
    blob = encode_avi(stripped, b"MJPG", 31, 20)
    for f, p in zip(full, avi_frame_payloads(blob)):
        np.testing.assert_array_equal(decode_jpeg(p), decode_jpeg(f))


def test_rec_groups_and_audio_soundtrack():
    imgs = _imgs(2)
    sam = (np.sin(np.arange(800) / 10) * 3000).astype(np.int16)
    blob = encode_avi([encode_jpeg(im) for im in imgs], b"MJPG", 31, 20,
                      audio=(sam, 8000), rec_groups=True)
    assert len(avi_frame_payloads(blob)) == 2
    np.testing.assert_array_equal(decode_audio(blob), sam)
    m = audio_metadata(avi_audio_bytes(blob))
    assert (m["sample_rate"], m["channels"], m["bits"]) == (8000, 1, 16)
    # routed through the polymorphic audio_metadata too
    m2 = audio_metadata(blob)
    assert m2["format"] == "avi" and m2["n_samples"] == len(sam)


def test_metadata_and_multimodal_routing():
    imgs = _imgs(4)
    blob = encode_avi([encode_jpeg(im) for im in imgs], b"MJPG", 31, 20, fps=5)
    m = video_metadata(blob)
    assert m["format"] == "avi" and m["codec"] == "mjpg"
    assert (m["width"], m["height"], m["n_frames"]) == (31, 20, 4)
    assert m["duration_s"] == pytest.approx(0.8)
    assert len(video_frame_payloads(blob)) == 4


def test_dropped_frame_markers_are_skipped():
    """Zero-length '##dc' chunks (the VfW/ffmpeg dropped-frame marker) are
    skipped instead of surfacing as b'' payloads that poison the decode."""
    imgs = _imgs(2)
    blob = encode_avi([encode_avi_dib_frame(imgs[0]), b"",
                       encode_avi_dib_frame(imgs[1])], b"DIB ", 31, 20)
    payloads = avi_frame_payloads(blob)
    assert len(payloads) == 2
    for im, p in zip(imgs, payloads):
        np.testing.assert_array_equal(K.decode_synf(p), im)
    # header n_frames (3, incl. the drop) is what avih claims; the demux
    # metadata still reports the container's claim, not the chunk count
    assert video_metadata(blob)["n_frames"] == 3


def test_nul_padded_handler_falls_back_to_dib():
    """An all-NUL strh handler (legal for BI_RGB video) must report the
    'dib' codec, not an empty/replacement-char string."""
    im = _imgs(1)[0]
    blob = encode_avi([encode_avi_dib_frame(im)], b"DIB ", 31, 20)
    idx = blob.find(b"vidsDIB ")
    assert idx > 0
    blob = blob[: idx + 4] + b"\x00\x00\x00\x00" + blob[idx + 8 :]
    assert video_metadata(blob)["codec"] == "dib"
    (p,) = avi_frame_payloads(blob)
    np.testing.assert_array_equal(K.decode_synf(p), im)


def test_rec_groups_trailing_audio_not_truncated():
    """With fewer video frames than audio chunks, the trailing audio
    chunks still land in movi (each muxed frame carries at most one audio
    chunk; the 2-chunk soundtrack of a 1-frame fixture must survive)."""
    im = _imgs(1)[0]
    sam = (np.cos(np.arange(600) / 7) * 2500).astype(np.int16)
    blob = encode_avi([encode_jpeg(im)], b"MJPG", 31, 20,
                      audio=(sam, 8000), rec_groups=True)
    np.testing.assert_array_equal(decode_audio(blob), sam)


def test_unsupported_codec_is_a_named_seam():
    blob = encode_avi([b"\x00" * 32], b"XVID", 8, 8)
    with pytest.raises(NotImplementedError, match="XVID"):
        avi_frame_payloads(blob)


def test_error_contract():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi(b"nope")
    # truncated chunk inside movi
    imgs = _imgs(1)
    blob = encode_avi([encode_avi_dib_frame(imgs[0])], b"DIB ", 31, 20)
    with pytest.raises(ValueError):
        parse_avi(blob[:-10] + struct.pack("<I", 10 ** 6) + b"x")
    # audio-only AVI: soundtrack decodes, frame query raises loudly
    sam = (np.arange(100) % 71).astype(np.int16)
    blob = encode_avi([], b"DIB ", 0, 0, audio=(sam, 8000))
    np.testing.assert_array_equal(decode_audio(blob), sam)
    with pytest.raises(ValueError, match="no video stream"):
        avi_frame_payloads(blob)
