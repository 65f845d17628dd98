"""Decoder-independent JPEG fixtures (ADVICE r2 #5).

The JPEG decoder was previously pinned only against the module's own
encoder, so a mirrored encode/decode bug (Huffman build, bit conventions)
could pass round-trips yet fail on real scanner output. These fixtures are
assembled BY HAND from ITU-T T.81: Annex K's published Huffman tables,
hand-packed entropy bits, and DC-only blocks whose decoded pixels follow
analytically from the spec (IDCT of a DC-only block is the constant
dequant(DC)/8, level-shifted by +128; with q0 = 8 the pixel value is
exactly DC + 128). No code path of jpeg.py's encoder is involved.
"""

import numpy as np

from ai_invoice_ocr_engine_spark.jpeg import decode_jpeg

# ITU-T T.81 Annex K.3.3.1/2 — the published Huffman table specs
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
# AC tables: only the EOB code is exercised (DC-only blocks), but the DHT
# segments carry the full published tables
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _codes(bits, vals):
    """Canonical Huffman assignment of T.81 Annex C: codes of length L are
    consecutive, starting from 2*(next code after length L-1)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BW:
    """MSB-first bit packer with 0x00 stuffing after 0xFF (T.81 B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def done(self):
        while self.n:  # pad with 1-bits per spec
            self.put(1, 1)
        return bytes(self.out)


def _put_dc(bw, codes, diff):
    """DC coefficient: category code + `category` magnitude bits (F.1.2.1;
    negative values use the one's-complement convention)."""
    cat = 0 if diff == 0 else int(diff if diff > 0 else -diff).bit_length()
    code, ln = codes[cat]
    bw.put(code, ln)
    if cat:
        v = diff if diff > 0 else diff + (1 << cat) - 1
        bw.put(v, cat)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt(tid, table64):
    return _seg(0xDB, bytes([tid]) + bytes(table64))


def _dht(tc, th, bits, vals):
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


# flat quant table q=8 everywhere: dequant(DC)/8 = DC, so pixel = DC + 128
_Q8 = [8] * 64


def _sof0(h, w, comps):
    """comps: list of (cid, hsamp, vsamp, tq)."""
    payload = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    payload += bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        payload += bytes([cid, (hs << 4) | vs, tq])
    return _seg(0xC0, payload)


def _sos(comps):
    """comps: list of (cid, dc_table, ac_table)."""
    payload = bytes([len(comps)])
    for cid, td, ta in comps:
        payload += bytes([cid, (td << 4) | ta])
    payload += bytes([0, 63, 0])
    return _seg(0xDA, payload)


def test_hand_assembled_grayscale_dc_only():
    """16x16 grayscale, 4 DC-only blocks with absolute DC values
    (-100, -20, 30, 90): expected pixels are exactly DC + 128 per the
    DC-only IDCT identity — no repo encoder involved."""
    dc_abs = [-100, -20, 30, 90]
    dcc = _codes(DC_LUM_BITS, DC_LUM_VALS)
    acc = _codes(AC_LUM_BITS, AC_LUM_VALS)
    bw2 = _BW()
    pred = 0
    for a in dc_abs:
        _put_dc(bw2, dcc, a - pred)
        pred = a
        bw2.put(acc[0x00][0], acc[0x00][1])  # EOB ends the block after DC
    stream = (
        b"\xff\xd8"
        + _dqt(0, _Q8)
        + _sof0(16, 16, [(1, 1, 1, 0)])
        + _dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + _sos([(1, 0, 0)])
        + bw2.done()
        + b"\xff\xd9"
    )
    img = decode_jpeg(stream)
    assert img.shape == (16, 16)
    # blocks in raster order: TL, TR, BL, BR
    expect = [v + 128 for v in dc_abs]
    assert int(img[0, 0]) == expect[0] and int(img[0, 15]) == expect[1]
    assert int(img[15, 0]) == expect[2] and int(img[15, 15]) == expect[3]
    for (sy, sx), e in zip([(0, 0), (0, 8), (8, 0), (8, 8)], expect):
        blk = img[sy : sy + 8, sx : sx + 8]
        assert blk.min() == blk.max() == e


def test_hand_assembled_single_block_and_odd_size():
    """8x8 single block, and a 12x10 image (one padded MCU cropped to the
    declared frame size): DC+128 everywhere."""
    dcc = _codes(DC_LUM_BITS, DC_LUM_VALS)
    acc = _codes(AC_LUM_BITS, AC_LUM_VALS)
    for h, w in ((8, 8), (12, 10)):
        bw = _BW()
        blocks_x = (w + 7) // 8
        blocks_y = (h + 7) // 8
        pred = 0
        for _ in range(blocks_x * blocks_y):
            _put_dc(bw, dcc, 55 - pred)
            pred = 55
            bw.put(acc[0x00][0], acc[0x00][1])
        stream = (
            b"\xff\xd8" + _dqt(0, _Q8) + _sof0(h, w, [(1, 1, 1, 0)])
            + _dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
            + _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
            + _sos([(1, 0, 0)]) + bw.done() + b"\xff\xd9"
        )
        img = decode_jpeg(stream)
        assert img.shape == (h, w)
        assert img.min() == img.max() == 55 + 128


def test_hand_assembled_ycbcr_420_neutral_chroma():
    """3-component 4:2:0, one MCU (16x16): four Y blocks with distinct DC
    values, chroma DC = 0 → Cb = Cr = 128 (neutral), so the decoded
    grayscale equals the Y plane exactly under BT.601 (the decoder's own
    documented conversion maps neutral chroma to gray == Y)."""
    y_abs = [-80, -10, 40, 100]
    dly = _codes(DC_LUM_BITS, DC_LUM_VALS)
    aly = _codes(AC_LUM_BITS, AC_LUM_VALS)
    dch = _codes(DC_CHR_BITS, DC_CHR_VALS)
    ach = _codes(AC_CHR_BITS, AC_CHR_VALS)
    bw = _BW()
    pred_y = 0
    for a in y_abs:  # 4 Y blocks of the single interleaved MCU
        _put_dc(bw, dly, a - pred_y)
        pred_y = a
        bw.put(aly[0x00][0], aly[0x00][1])
    for _ in range(2):  # Cb then Cr, DC diff 0
        _put_dc(bw, dch, 0)
        bw.put(ach[0x00][0], ach[0x00][1])
    stream = (
        b"\xff\xd8"
        + _dqt(0, _Q8) + _dqt(1, _Q8)
        + _sof0(16, 16, [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)])
        + _dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + _dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)
        + _dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)
        + _sos([(1, 0, 0), (2, 1, 1), (3, 1, 1)])
        + bw.done()
        + b"\xff\xd9"
    )
    img = decode_jpeg(stream)
    assert img.shape == (16, 16)
    expect = [v + 128 for v in y_abs]
    for (sy, sx), e in zip([(0, 0), (0, 8), (8, 0), (8, 8)], expect):
        blk = img[sy : sy + 8, sx : sx + 8].astype(int)
        # neutral chroma: gray == Y exactly (allow ±1 for the decoder's
        # fixed-point YCbCr→gray rounding)
        assert abs(blk - e).max() <= 1


# -- Adobe 4-component CMYK / YCCK (APP14) -----------------------------------


def _grad_rgb(h=80, w=96):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack([(xx * 2) % 256, (yy * 3) % 256, (xx + yy) % 256], -1)
    return (rgb // 4 * 4).astype(np.uint8)


def test_cmyk_and_ycck_match_rgb_luma():
    from ai_invoice_ocr_engine_spark.jpeg import encode_jpeg_cmyk
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    rgb = _grad_rgb()
    want = rgb_to_gray(rgb).astype(np.int32)
    cmyk = np.concatenate(
        [255 - rgb, np.zeros(rgb.shape[:2] + (1,), np.uint8)], -1
    )
    for transform in (0, 2):
        got = decode_jpeg(encode_jpeg_cmyk(cmyk, 95, transform=transform))
        assert np.abs(got.astype(np.int32) - want).max() <= 2, transform


def test_cmyk_constant_color_exact_composite():
    from ai_invoice_ocr_engine_spark.jpeg import encode_jpeg_cmyk
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    c = np.zeros((32, 32, 4), np.uint8)
    c[..., 0] = 200  # cyan ink
    c[..., 3] = 40  # some black
    inv_c, inv_k = 255 - 200, 255 - 40
    r = (inv_c * inv_k + 127) // 255
    gb = (255 * inv_k + 127) // 255
    exp = rgb_to_gray(np.full((32, 32, 3), [r, gb, gb], np.uint8))[0, 0]
    for transform in (0, 2):
        got = decode_jpeg(encode_jpeg_cmyk(c, 90, transform=transform))
        assert int(got[0, 0]) == int(exp), transform


def test_cmyk_without_app14_reads_noninverted():
    """Stripping the APP14 marker flips the convention: stored planes
    are then taken as non-inverted ink values (documented decision)."""
    from ai_invoice_ocr_engine_spark.jpeg import encode_jpeg_cmyk
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    c = np.zeros((32, 32, 4), np.uint8)
    c[..., 0] = 200
    c[..., 3] = 40
    enc = encode_jpeg_cmyk(c, 90, transform=0)
    i = enc.find(b"\xff\xee")
    seglen = (enc[i + 2] << 8) | enc[i + 3]
    stripped = enc[:i] + enc[i + 2 + seglen :]
    # stored planes are 255-ink; read back non-inverted they ARE the ink,
    # so the effective inverted planes equal the original ink values
    ink = 255 - np.array([200, 0, 0, 40])
    invp = 255 - ink
    r = (invp[0] * invp[3] + 127) // 255
    gb = (invp[1] * invp[3] + 127) // 255
    exp = rgb_to_gray(
        np.full((32, 32, 3), [r, gb, gb], np.uint8)
    )[0, 0]
    got = decode_jpeg(stripped)
    assert int(got[0, 0]) == int(exp)


def test_adobe_rgb_transform0_three_component():
    """APP14 transform 0 with 3 components means plain RGB planes."""
    from ai_invoice_ocr_engine_spark.jpeg import encode_jpeg_cmyk  # noqa: F401
    from ai_invoice_ocr_engine_spark.jpeg import (
        _seg,  # reuse the segment writer to splice an APP14 into a gray file
    )
    # craft: encode YCbCr 444, then add APP14 transform 1 (YCbCr) — decode
    # must be unchanged vs no marker (flag 1 == default interpretation)
    from ai_invoice_ocr_engine_spark.jpeg import encode_jpeg

    rgb = _grad_rgb(40, 48)
    enc = encode_jpeg(rgb, 95, subsampling="444")
    app14 = _seg(0xEE, b"Adobe\x00\x65\x00\x00\x00\x00\x01")
    spliced = enc[:2] + bytes(app14) + enc[2:]
    assert np.array_equal(decode_jpeg(spliced), decode_jpeg(enc))


# -- 12-bit extended sequential (SOF1) ---------------------------------------

# 12-bit streams must carry their own DC tables (Annex K's are 8-bit-only):
# categories 0..14 at 4 bits, 15 at 5 — a valid canonical table.
DC12_BITS = [0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC12_VALS = list(range(16))


def _dqt16(tid, table64):
    """Pq=1: 16-bit big-endian quant entries (12-bit precision streams)."""
    body = bytes([(1 << 4) | tid])
    for v in table64:
        body += int(v).to_bytes(2, "big")
    return _seg(0xDB, body)


def _sof(marker, prec, h, w, comps):
    payload = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    payload += bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        payload += bytes([cid, (hs << 4) | vs, tq])
    return _seg(marker, payload)


def test_hand_assembled_12bit_sof1_dc_only():
    """16-wide 12-bit SOF1, two DC-only blocks, q0 = 300 carried in a
    16-bit DQT. Expected pixels follow analytically: DC-only IDCT is
    dequant(DC)/8, level shift +2048, clamp to 0..4095, then the
    documented rounding rescale (v*255 + 2047) // 4095 — no repo encoder
    involved."""
    q = [300] + [1] * 63
    dc_abs = [4, -8]
    dcc = _codes(DC12_BITS, DC12_VALS)
    acc = _codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BW()
    pred = 0
    for a in dc_abs:
        _put_dc(bw, dcc, a - pred)
        pred = a
        bw.put(acc[0x00][0], acc[0x00][1])  # EOB
    stream = (
        b"\xff\xd8"
        + _dqt16(0, q)
        + _sof(0xC1, 12, 8, 16, [(1, 1, 1, 0)])
        + _dht(0, 0, DC12_BITS, DC12_VALS)
        + _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + _sos([(1, 0, 0)])
        + bw.done()
        + b"\xff\xd9"
    )
    img = decode_jpeg(stream)
    assert img.shape == (8, 16)
    # block1: 2048 + 4*300/8 = 2198 -> (2198*255+2047)//4095 = 137
    # block2: 2048 - 8*300/8 = 1748 -> (1748*255+2047)//4095 = 109
    assert np.all(img[:, :8] == 137)
    assert np.all(img[:, 8:] == 109)


def test_12bit_baseline_sof0_rejected():
    """T.81: baseline SOF0 is 8-bit only — a 12-bit SOF0 is corrupt, not
    a seam."""
    import pytest

    stream = (
        b"\xff\xd8"
        + _dqt(0, _Q8)
        + _sof(0xC0, 12, 8, 8, [(1, 1, 1, 0)])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(stream)


# -- lossless process (SOF3, T.81 Annex H) ------------------------------------
# Fixtures assembled by hand from the spec text: H.1.2.1 predictors,
# H.1.2.2 difference coding (modulo 2^16, SSSS categories with the DC
# one's-complement magnitude convention, SSSS=16 coding a difference of
# exactly 32768 with no appended bits), H.1.1's rule that the 1-D
# horizontal predictor covers the whole first line of the scan and of
# every restart interval.  The packer below shares only the generic
# T.81 Annex C canonical-code / B.1.1.5 byte-stuffing helpers with the
# baseline fixtures above — no jpeg.py encode path is involved.

# Huffman table covering difference categories 0..16 (17 codes of
# length 5; Kraft sum 17/32 < 1, so a canonical table exists)
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def _sof3(prec, h, w, comps):
    """comps: list of (cid, hs, vs)."""
    payload = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    payload += bytes([len(comps)])
    for cid, hs, vs in comps:
        payload += bytes([cid, (hs << 4) | vs, 0])
    return _seg(0xC3, payload)


def _sos_ll(comps, sel, pt):
    """comps: list of (cid, dc_table); Ss = predictor selector,
    Se = 0, Al = point transform (H.2.1)."""
    payload = bytes([len(comps)])
    for cid, td in comps:
        payload += bytes([cid, td << 4])
    payload += bytes([sel, 0, pt])
    return _seg(0xDA, payload)


def _put_diff(bw, codes, diff):
    """H.1.2.2: category + magnitude bits; SSSS=16 is the bare code."""
    if diff == 32768:
        code, ln = codes[16]
        bw.put(code, ln)
        return
    cat = 0 if diff == 0 else abs(int(diff)).bit_length()
    code, ln = codes[cat]
    bw.put(code, ln)
    if cat:
        v = diff if diff > 0 else diff + (1 << cat) - 1
        bw.put(v, cat)


def _predict_ref(plane, x, y, sel, default, reset_at, reset_y, m, w):
    """Spec-side prediction mirror for the fixture encoder (H.1.1/H.1.2.1)."""
    if m == reset_at:
        return default
    if y == reset_y:
        return int(plane[y, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    return {
        1: a,
        2: b,
        3: c,
        4: a + b - c,
        5: a + ((b - c) >> 1),
        6: b + ((a - c) >> 1),
        7: (a + b) >> 1,
    }[sel]


def _encode_ll(planes_by_cid, prec, sel, pt=0, restart=0):
    """Hand-pack one lossless scan over interleaved 1x1 components.
    `planes_by_cid` holds the ORIGINAL samples; point transform divides
    them by 2^pt before coding (H.1, decoder re-multiplies)."""
    codes = _codes(_LL_BITS, _LL_VALS)
    cids = list(planes_by_cid)
    shifted = {cid: (planes_by_cid[cid].astype(np.int64) >> pt)
               for cid in cids}
    h, w = shifted[cids[0]].shape
    default = 1 << (prec - pt - 1)
    chunks = []
    bw = _BW()
    reset_at = 0
    reset_y = 0
    rst = 0
    for m in range(h * w):
        if restart and m and m % restart == 0:
            chunks.append(bw.done())
            chunks.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            bw = _BW()
            reset_at = m
            reset_y = m // w
        y, x = divmod(m, w)
        for cid in cids:
            plane = shifted[cid]
            pred = _predict_ref(plane, x, y, sel, default,
                                reset_at, reset_y, m, w)
            diff = (int(plane[y, x]) - pred) % 65536
            if diff > 32768:
                diff -= 65536
            _put_diff(bw, codes, diff)
    chunks.append(bw.done())
    return b"".join(chunks)


def _ll_stream(planes_by_cid, prec, sel, pt=0, restart=0):
    cids = list(planes_by_cid)
    h, w = planes_by_cid[cids[0]].shape
    head = b"\xff\xd8" + _dht(0, 0, _LL_BITS, _LL_VALS)
    if restart:
        head += _seg(0xDD, restart.to_bytes(2, "big"))
    head += _sof3(prec, h, w, [(cid, 1, 1) for cid in cids])
    head += _sos_ll([(cid, 0) for cid in cids], sel, pt)
    return head + _encode_ll(planes_by_cid, prec, sel, pt, restart) + b"\xff\xd9"


def _grad_img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    base = (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5) % 251
    return ((base + rng.integers(0, 17, (h, w))) % 256).astype(np.uint8)


def test_lossless_gray_all_predictors():
    """8-bit grayscale SOF3 round-trips bit-exactly under every H.1
    predictor selector 1..7."""
    img = _grad_img(13, 16)
    for sel in range(1, 8):
        out = decode_jpeg(_ll_stream({1: img}, 8, sel))
        assert out.dtype == np.uint8
        assert np.array_equal(out, img), f"predictor {sel}"


def test_lossless_point_transform():
    """Al = 2 divides samples by 4 before coding; the decoder shifts the
    reconstruction back up (H.1): output == (img >> 2) << 2."""
    img = _grad_img(9, 11, seed=3)
    out = decode_jpeg(_ll_stream({1: img}, 8, sel=4, pt=2))
    assert np.array_equal(out, (img >> 2) << 2)


def test_lossless_restart_resets_prediction():
    """DRI = one row of samples: every row starts a restart interval, so
    per H.1.1 every row must decode with the 1-D horizontal predictor
    and a default-predicted first sample — using the row above (the
    scan-selected predictor 2) instead would corrupt all rows but the
    first."""
    img = _grad_img(8, 12, seed=11)
    out = decode_jpeg(_ll_stream({1: img}, 8, sel=2, restart=12))
    assert np.array_equal(out, img)


def test_lossless_rgb_interleaved():
    """Three 1x1 components in one interleaved scan; lossless color is
    coded without a color transform, so the engine's grayscale output
    is the shared luma of the exact RGB planes."""
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    r = _grad_img(7, 9, seed=1)
    g = _grad_img(7, 9, seed=2)
    b = _grad_img(7, 9, seed=3)
    out = decode_jpeg(_ll_stream({1: r, 2: g, 3: b}, 8, sel=7))
    assert np.array_equal(out, rgb_to_gray(np.stack([r, g, b], axis=-1)))


def test_lossless_16bit_ssss16_wraparound():
    """16-bit precision: the first sample predicts 2^15; coding sample 0
    requires a difference of -32768 ≡ 32768 (mod 2^16), i.e. the bare
    SSSS=16 code with no appended bits (H.1.2.2).  The 16-bit plane is
    scaled to the engine's 8-bit grayscale."""
    img16 = np.array([[0, 65535, 32768, 12345],
                      [65535, 0, 54321, 1]], dtype=np.uint16)
    out = decode_jpeg(_ll_stream({1: img16}, 16, sel=1))
    exp = np.clip(np.rint(img16.astype(np.float64) * (255.0 / 65535)),
                  0, 255).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_lossless_bad_predictor_rejected():
    """Ss = 0 selects 'no prediction' only in the hierarchical process;
    in a plain lossless scan it is corrupt (H.2.1 allows 1..7)."""
    import pytest

    img = _grad_img(4, 4)
    stream = (
        b"\xff\xd8" + _dht(0, 0, _LL_BITS, _LL_VALS)
        + _sof3(8, 4, 4, [(1, 1, 1)])
        + _sos_ll([(1, 0)], sel=0, pt=0)
        + _encode_ll({1: img}, 8, 1) + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(stream)


def _minimal_tiff_jpeg(strip: bytes, h, w):
    """Hand-built little-endian classic TIFF: one full-height strip,
    compression 7 (new-style JPEG), 8-bit grayscale."""
    import struct

    n = 8
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 7),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, h),
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * (len(entries) + 2) + 4
    strip_off = ifd_off + ifd_len
    entries += [(273, 4, 1, strip_off), (279, 4, 1, len(strip))]
    entries.sort()
    out = struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    assert len(out) == strip_off
    return out + strip


def test_lossless_jpeg_in_tiff_strip():
    """TIFF-EP / DNG-style carrier: compression 7 whose strip is a
    lossless SOF3 stream must round-trip bit-exactly through
    decode_tiff (and the decode_image sniffer)."""
    from ai_invoice_ocr_engine_spark.bmptiff import decode_tiff
    from ai_invoice_ocr_engine_spark.kernels import decode_image

    img = _grad_img(21, 17, seed=5)
    tif = _minimal_tiff_jpeg(_ll_stream({1: img}, 8, sel=4), 21, 17)
    assert np.array_equal(decode_tiff(tif), img)
    assert np.array_equal(decode_image(tif), img)


def test_lossless_jpeg_in_pdf_dct_xobject():
    """PDF DCTDecode image XObject carrying an SOF3 stream decodes
    losslessly through the full pdf_spans → media → decode_image path."""
    from ai_invoice_ocr_engine_spark import kernels as K
    from ai_invoice_ocr_engine_spark.pdf import encode_pdf, pdf_spans

    img = _grad_img(19, 23, seed=9)
    page = [
        ("text", 72, 700, 12, "scan"),
        ("image", 72, 300, 120, 90, _ll_stream({1: img}, 8, sel=1), "jpeg"),
    ]
    spans, media = pdf_spans(encode_pdf([page]))
    ref = next(s["media_ref"] for s in spans if s["kind"] == "image")
    assert np.array_equal(K.decode_image(media[ref]), img)


def test_lossless_subsampled_noninterleaved_is_loud():
    """A SOF3 frame with relatively-subsampled components must hit the
    loud seam even when each component comes in its OWN scan (legal per
    T.81): this decoder walks h*w samples per component, so decoding a
    subsampled component at frame size would desync the Huffman stream
    — NotImplementedError, never silent garbage."""
    img = _grad_img(8, 8)
    # 4:2:0-shaped frame (luma 2x2, chroma 1x1 = subsampled), but the
    # first scan covers only the luma component — the old check
    # (len(scan)>1) missed this non-interleaved shape
    head = b"\xff\xd8" + _dht(0, 0, _LL_BITS, _LL_VALS)
    head += _sof3(8, 8, 8, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
    head += _sos_ll([(1, 0)], 1, 0)
    data = head + _encode_ll({1: img}, 8, 1, 0, 0) + b"\xff\xd9"
    import pytest

    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg(data)
