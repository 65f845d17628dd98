"""JBIG2 generic-region codec + PDF JBIG2Decode integration.

The MQ decoder is pinned INDEPENDENTLY of this repo's encoder by the
ITU-T T.88 Annex H.2 conformance data: decoding the spec encoder's
output (which contains an 0xFF stuffing) must recover the spec input
bit-exactly. The encoder is additionally pinned by the H.2 output
prefix it reproduces byte-identically before the final-flush slack.
"""

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark.jbig2 import (
    _TEMPLATES,
    MQDecoder,
    MQEncoder,
    decode_generic_region,
    decode_jbig2,
    encode_generic_region,
    encode_jbig2,
)

H2_INPUT = bytes.fromhex(
    "00020051000000C00352872AAAAAAAAA82C02000FCD79EF6BF7FED904F46A3BF"
)
H2_OUTPUT = bytes.fromhex(
    "84C73BFCE1A14304022000" "00410DBB86F431" "7FFF88FF37471ADB6ADFFFAC"
)


def _bits(data: bytes) -> list:
    return [(b >> (7 - i)) & 1 for b in data for i in range(8)]


def test_mq_decoder_t88_annex_h2_conformance():
    dec = MQDecoder(H2_OUTPUT)
    cx = [0, 0]
    got = [dec.decode(cx) for _ in range(256)]
    assert got == _bits(H2_INPUT)


def test_mq_encoder_reproduces_h2_prefix():
    enc = MQEncoder()
    cx = [0, 0]
    for b in _bits(H2_INPUT):
        enc.encode(cx, b)
    out = enc.flush()
    # identical up to the final-flush slack bits (both streams decode
    # to the same 256 symbols — checked below)
    assert out[:17] == H2_OUTPUT[:17]
    dec = MQDecoder(out)
    cx = [0, 0]
    assert [dec.decode(cx) for _ in range(256)] == _bits(H2_INPUT)


def test_mq_fuzz_roundtrip():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(1, 500))
        bits = rng.integers(0, 2, n).tolist()
        ncx = int(rng.integers(1, 5))
        which = rng.integers(0, ncx, n).tolist()
        enc = MQEncoder()
        cxs = [[0, 0] for _ in range(ncx)]
        for b, wi in zip(bits, which):
            enc.encode(cxs[wi], b)
        dec = MQDecoder(enc.flush())
        cxs = [[0, 0] for _ in range(ncx)]
        assert [dec.decode(cxs[wi]) for wi in which] == bits


def _strokes(h=60, w=100, seed=7):
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), np.uint8)
    for _ in range(20):
        y, x = int(rng.integers(2, h - 4)), int(rng.integers(2, w - 10))
        bm[y : y + 2, x : x + int(rng.integers(3, 10))] = 1
    return bm


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrip(template, tpgdon):
    bm = _strokes()
    data = encode_generic_region(bm, template=template, tpgdon=tpgdon)
    got = decode_generic_region(
        data, 100, 60, template, list(_TEMPLATES[template][1]), tpgdon
    )
    assert np.array_equal(got, bm)


def test_segment_layer_and_standalone_header():
    bm = _strokes()
    assert np.array_equal(decode_jbig2(encode_jbig2(bm, tpgdon=True)), bm)
    standalone = encode_jbig2(bm, standalone=True)
    assert standalone[:8] == b"\x97JB2\r\n\x1a\n"
    assert np.array_equal(decode_jbig2(standalone), bm)
    # decode_image routes the standalone magic: black (1) → gray 0
    from ai_invoice_ocr_engine_spark.kernels import decode_image

    gray = decode_image(standalone)
    assert np.array_equal(gray, (1 - bm) * 255)


def test_globals_stream_split():
    bm = _strokes(seed=9)
    full = encode_jbig2(bm)
    page_info_len = 11 + 19  # segment header + page info body
    globals_part, rest = full[:page_info_len], full[page_info_len:]
    assert np.array_equal(decode_jbig2(rest, globals_part), bm)


def test_symbol_dictionary_is_loud():
    import struct

    seg = struct.pack(">IB", 0, 0) + b"\x00\x01" + struct.pack(">I", 0)
    with pytest.raises(NotImplementedError, match="symbol dictionary"):
        decode_jbig2(seg)


def test_pdf_jbig2_image_xobject():
    from ai_invoice_ocr_engine_spark.kernels import decode_image
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    bm = _strokes(64, 96, seed=3)
    payload = encode_jbig2(bm)
    img = (
        "<< /Type /XObject /Subtype /Image /Width 96 /Height 64 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray "
        "/Filter /JBIG2Decode "
        f"/Length {len(payload)} >>\nstream\n"
        + payload.decode("latin-1")
        + "\nendstream"
    )
    content = b"q 96 0 0 64 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=img,
                    font="/XObject << /Im0 5 0 R >>")
    spans, media = pdf_spans(blob)
    assert len(media) == 1
    gray = decode_image(next(iter(media.values())))
    assert np.array_equal(gray, (1 - bm).astype(np.uint8) * 255)


def test_pdf_jbig2_with_globals_stream():
    from ai_invoice_ocr_engine_spark.kernels import decode_image
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    bm = _strokes(32, 48, seed=5)
    full = encode_jbig2(bm)
    g, rest = full[:30], full[30:]
    img = (
        "<< /Type /XObject /Subtype /Image /Width 48 /Height 32 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray "
        "/Filter /JBIG2Decode /DecodeParms << /JBIG2Globals 6 0 R >> "
        f"/Length {len(rest)} >>\nstream\n"
        + rest.decode("latin-1")
        + "\nendstream"
    )
    gobj = (
        f"<< /Length {len(g)} >>\nstream\n" + g.decode("latin-1") + "\nendstream"
    )
    content = b"q 48 0 0 32 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=[img, gobj],
                    font="/XObject << /Im0 5 0 R >>")
    spans, media = pdf_spans(blob)
    gray = decode_image(next(iter(media.values())))
    assert np.array_equal(gray, (1 - bm).astype(np.uint8) * 255)


def test_mmr_mode_generic_region():
    """MMR=1 regions route through the repo's T.6/G4 fax decoder."""
    import struct

    from ai_invoice_ocr_engine_spark.fax import encode_g4

    bm = _strokes(40, 64, seed=13)
    payload = encode_g4(bm)
    region = struct.pack(">IIII", 64, 40, 0, 0) + bytes([0]) + bytes([1])
    region += payload

    def seg(num, styp, body):
        return (struct.pack(">IB", num, styp) + b"\x00\x01"
                + struct.pack(">I", len(body)) + body)

    page_info = struct.pack(">IIII", 64, 40, 0, 0) + b"\x01\x00\x00"
    data = seg(0, 48, page_info) + seg(1, 39, region)
    assert np.array_equal(decode_jbig2(data), bm)
