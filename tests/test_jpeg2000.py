"""JPEG 2000 lossless baseline (jpeg2000.py): DWT / tag-tree / T1 unit
pins plus full-codestream round-trips and the PDF JPXDecode integration.

The MQ coder is pinned independently in test_jbig2.py against the ITU
T.88 Annex H.2 conformance data (T.800 Annex C specifies the identical
coder); everything above it is pinned by analytic hand computations and
encoder round-trips over layout/size/option matrices."""

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark.jpeg2000 import (
    TagTree,
    _PktBitReader,
    _PktBitWriter,
    _decode_j2k_components,
    _sd_1d,
    _unbox,
    decode_jpeg2000,
    dwt_53,
    encode_jpeg2000,
    idwt_53,
    t1_decode,
    t1_encode,
)


# -- DWT -----------------------------------------------------------------------


def test_dwt_53_hand_computed_1d():
    """x=[1,2,3,4] on [0,4): high y1=2-floor((1+3)/2)=0,
    y3=4-floor((3+x(4))/2) with mirror x(4)=x(2)=3 -> 1; low
    y0=1+floor((y(-1)+y1+2)/4) with y(-1)=y1 -> 1, y2=3+floor((0+1+2)/4)=3."""
    y = _sd_1d(np.array([1, 2, 3, 4], np.int64), 0, 4)
    assert list(y) == [1, 0, 3, 1]


@pytest.mark.parametrize("region", [(0, 0, 8, 8), (0, 0, 7, 5),
                                    (3, 1, 10, 9), (1, 1, 2, 2),
                                    (0, 0, 1, 7), (5, 5, 6, 6),
                                    (2, 3, 9, 4)])
def test_dwt_53_roundtrip_regions(region):
    """Reversibility over odd sizes and odd grid origins (the parity of
    the tile-component origin changes which samples are low-pass)."""
    x0, y0, x1, y1 = region
    rng = np.random.default_rng(1)
    a = rng.integers(-300, 300, (y1 - y0, x1 - x0)).astype(np.int64)
    for nl in range(4):
        ll, bands = dwt_53(a, nl, x0, y0, x1, y1)
        assert np.array_equal(idwt_53(ll, bands, x0, y0, x1, y1), a)


def test_dwt_53_constant_has_zero_detail():
    ll, bands = dwt_53(np.full((8, 8), 77, np.int64), 2, 0, 0, 8, 8)
    assert all((b == 0).all() for t in bands for b in t)


# -- tag trees + header bit IO -------------------------------------------------


def test_tag_tree_roundtrip_incremental():
    vals = [[0, 2, 1], [3, 0, 2]]
    enc, dec = TagTree(3, 2), TagTree(3, 2)
    for j in range(2):
        for i in range(3):
            enc.set_value(i, j, vals[j][i])
    bw = _PktBitWriter()
    queries = []
    for t in range(1, 5):
        for j in range(2):
            for i in range(3):
                enc.encode(bw, i, j, t)
                queries.append((i, j, t, vals[j][i] < t))
    br = _PktBitReader(bw.align())
    for i, j, t, want in queries:
        assert dec.decode(br, i, j, t) == want, (i, j, t)


def test_header_bit_stuffing():
    """B.10.1: a 0 bit is stuffed after every 0xFF header byte, and a
    header ending in 0xFF is terminated by a stuffed byte the reader
    must consume at align time."""
    bw = _PktBitWriter()
    bw.put(0xFFFF, 16)
    data = bw.align()
    assert data == bytes.fromhex("ff7f80")
    br = _PktBitReader(data)
    assert br.read(16) == 0xFFFF
    bw = _PktBitWriter()
    bw.put(0xFF, 8)
    data = bw.align()
    assert data == b"\xff\x00"
    br = _PktBitReader(data)
    assert br.read(8) == 0xFF
    assert br.align() == 2  # stuffing byte belongs to the header


# -- T1 ------------------------------------------------------------------------


@pytest.mark.parametrize("band", [0, 1, 2, 3])
def test_t1_roundtrip_bands(band):
    """All four context models (LL/HL/LH/HH tables), dense and sparse
    blocks, odd shapes (stripe remainders), sign coding throughout."""
    rng = np.random.default_rng(9 + band)
    for trial in range(6):
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        v = rng.integers(-200, 200, (h, w)).astype(np.int64)
        if trial % 3 == 0:
            v[rng.random((h, w)) < 0.7] = 0
        data, sp, npasses = t1_encode(v, band)
        if npasses == 0:
            assert (v == 0).all()
            continue
        assert np.array_equal(t1_decode(data, w, h, band, sp, npasses), v)


def test_t1_run_mode_exercised():
    """A mostly-zero block must be SMALLER than a bit-identical dense
    encoding path would suggest — and still decode exactly (run mode +
    UNIFORM position coding)."""
    v = np.zeros((16, 16), np.int64)
    v[9, 9] = 5
    data, sp, npasses = t1_encode(v, 0)
    assert np.array_equal(t1_decode(data, 16, 16, 0, sp, npasses), v)
    assert len(data) < 20


# -- full codestream -----------------------------------------------------------


def _exact(img, **kw):
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    comps, _depth = _decode_j2k_components(_unbox(encode_jpeg2000(img, **kw)))
    if img.ndim == 2:
        assert np.array_equal(comps[0], img)
    else:
        for i in range(img.shape[2]):
            assert np.array_equal(comps[i], img[..., i])


@pytest.mark.parametrize("shape", [(37, 29), (8, 8), (1, 17), (64, 33)])
def test_lossless_gray_sizes(shape):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    for nl in (0, 1, 3):
        _exact(img, nl=nl, cb=(4, 4))


def test_lossless_tiled_and_small_codeblocks():
    rng = np.random.default_rng(3)
    _exact(rng.integers(0, 256, (50, 70)).astype(np.uint8),
           nl=2, cb=(4, 5), tile=(32, 24))
    _exact(rng.integers(0, 256, (40, 40)).astype(np.uint8), nl=2, cb=(2, 2))


def test_lossless_rgb_mct_and_luma():
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (33, 21, 3)).astype(np.uint8)
    _exact(rgb, nl=2, cb=(4, 4))
    g = decode_jpeg2000(encode_jpeg2000(rgb, nl=2, cb=(4, 4)))
    assert np.array_equal(g, rgb_to_gray(rgb))


def test_jp2_container_sop_eph_progressions():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (25, 31)).astype(np.uint8)
    _exact(img, nl=2, cb=(4, 4), jp2=True)
    _exact(img, nl=2, cb=(4, 4), sop=True, eph=True)
    for prog in range(5):
        _exact(img, nl=1, cb=(4, 4), prog=prog)


def test_eph_with_codeblockless_precincts():
    """ADVICE r3: a tiny image with deep decomposition yields resolutions
    whose subbands hold NO code-blocks; the stream still carries the spec's
    empty packet header (single 0 bit, T.800 B.10.3) and, with EPH on, its
    EPH marker — previously the decoder demanded an EPH no encoder wrote."""
    img = (np.arange(4, dtype=np.uint8).reshape(2, 2)) * 60
    _exact(img, nl=2, eph=True)
    _exact(img, nl=2, sop=True, eph=True)
    _exact(img, nl=3, cb=(2, 2), eph=True)
    # and without markers the empty-packet byte still round-trips
    _exact(img, nl=2)


def test_truncated_packet_body_is_loud():
    """A stream cut inside a packet body must raise, not pad the MQ coder
    with 0xFF into silently-wrong pixels. (The per-layer slice check also
    covers later-layer chunks of external multi-layer one-codeword streams,
    which the fixture encoder cannot produce — it requires termall.)"""
    import pytest

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    data = bytearray(encode_jpeg2000(img, nl=1, cb=(4, 4)))
    assert bytes(data[-2:]) == b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg2000(bytes(data[:-6]) + b"\xff\xd9")


def test_flat_images():
    _exact(np.full((20, 20), 200, np.uint8), nl=3, cb=(4, 4))
    _exact(np.zeros((16, 16), np.uint8), nl=2, cb=(4, 4))


def test_decode_image_routes_jp2_and_raw_codestream():
    from ai_invoice_ocr_engine_spark.kernels import decode_image

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (19, 23)).astype(np.uint8)
    assert np.array_equal(
        decode_image(encode_jpeg2000(img, nl=1, cb=(4, 4), jp2=True)), img
    )
    assert np.array_equal(
        decode_image(encode_jpeg2000(img, nl=1, cb=(4, 4))), img
    )


def test_unsupported_features_are_loud():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_jpeg2000(img, nl=1, cb=(4, 4)))
    # flip the transform byte (last byte of COD body) to 0 = 9/7
    cod_at = bytes(data).find(b"\xff\x52")
    assert cod_at > 0
    lcod = int.from_bytes(data[cod_at + 2 : cod_at + 4], "big")
    data[cod_at + 2 + lcod - 1] = 0
    # 9/7 with a reversible (no-quantization) QCD is inconsistent
    with pytest.raises(ValueError, match="mismatch"):
        decode_jpeg2000(bytes(data))
    data[cod_at + 2 + lcod - 1] = 1
    data[cod_at + 2 + lcod - 2] = 0x40  # reserved style bit
    with pytest.raises(ValueError, match="reserved"):
        decode_jpeg2000(bytes(data))


def test_fuzz_error_contract():
    """Corrupt bytes raise ValueError/NotImplementedError only — never a
    structural exception, never a hang."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    base = encode_jpeg2000(img, nl=2, cb=(4, 4))
    for _ in range(150):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg2000(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(base), 11):
        try:
            decode_jpeg2000(base[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_pdf_jpx_image_xobject():
    """Full-path integration: a PDF image XObject with /Filter
    /JPXDecode lands in the media table as the JP2 payload and decodes
    through kernels.decode_image."""
    from ai_invoice_ocr_engine_spark.kernels import decode_image
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (30, 40)).astype(np.uint8)
    payload = encode_jpeg2000(img, nl=2, cb=(4, 4), jp2=True)
    obj = (
        "<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
        "/BitsPerComponent 8 /ColorSpace /DeviceGray "
        "/Filter /JPXDecode "
        f"/Length {len(payload)} >>\nstream\n"
        + payload.decode("latin-1")
        + "\nendstream"
    )
    content = b"q 40 0 0 30 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=obj,
                    font="/XObject << /Im0 5 0 R >>")
    _spans, media = pdf_spans(blob)
    assert np.array_equal(decode_image(next(iter(media.values()))), img)


def test_multiple_tile_parts():
    """A.4.2: a tile's packets split across several SOT..SOD tile-parts
    (the Kakadu-style layout real scanner JPX takes) concatenate to the
    identical bitstream — bit-exact through reversible decode, including
    multi-tile streams and tile-parts INTERLEAVED across tiles."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for kw in [dict(split_parts=2), dict(split_parts=5),
               dict(split_parts=3, tile=(24, 24)),
               dict(split_parts=2, layers=3, termall=True),
               dict(split_parts=99)]:  # more parts than packets: clamps
        comps, _ = _decode_j2k_components(_unbox(
            encode_jpeg2000(img, nl=2, cb=(4, 4), **kw)))
        assert np.array_equal(comps[0], img), kw
    # interleave tile-parts ACROSS tiles: reorder the SOT segments of a
    # 4-tile, 2-part stream as t0p0 t1p0 ... t3p0 t0p1 ... t3p1
    data = bytearray(encode_jpeg2000(img, nl=2, cb=(4, 4), tile=(28, 20),
                                     split_parts=2))
    segs = []
    pos = data.index(b"\xff\x90")
    head = bytes(data[:pos])
    while data[pos : pos + 2] == b"\xff\x90":
        psot = int.from_bytes(data[pos + 6 : pos + 10], "big")
        segs.append(bytes(data[pos : pos + psot]))
        pos += psot
    assert bytes(data[pos : pos + 2]) == b"\xff\xd9" and len(segs) == 8
    interleaved = head + b"".join(segs[0::2] + segs[1::2]) + b"\xff\xd9"
    comps, _ = _decode_j2k_components(interleaved)
    assert np.array_equal(comps[0], img)
    # out-of-order tile-parts within a tile must raise
    broken = head + b"".join(segs[1::2] + segs[0::2]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="tile-parts"):
        _decode_j2k_components(broken)


def test_poc_progression_order_changes():
    """A.6.6 POC: the packet sequence is the concatenation of the
    marker's progression volumes (each packet at its first occurrence),
    defensively completed in the COD order for under-covering volumes.
    Resolution/layer/component splits with mixed orders, precincts
    inside a volume, and the completion path all round-trip bit-exact —
    and POC genuinely reorders the stream (byte-compare control)."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (60, 80)).astype(np.uint8)
    rgb = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
    cases = [
        (img, dict(nl=2, poc=[(0, 0, 1, 1, 1, 1), (1, 0, 1, 3, 1, 0)])),
        (img, dict(nl=2, layers=3, termall=True,
                   poc=[(0, 0, 1, 3, 1, 4), (0, 0, 3, 3, 1, 0)])),
        (rgb, dict(nl=2, poc=[(0, 0, 1, 3, 1, 1), (0, 1, 1, 3, 3, 0)])),
        (img, dict(nl=2, precincts=(4, 4),
                   poc=[(0, 0, 1, 2, 1, 3), (0, 0, 1, 3, 1, 0)])),
        (img, dict(nl=2, poc=[(0, 0, 1, 1, 1, 0)])),  # completion path
    ]
    for arr, kw in cases:
        comps, _ = _decode_j2k_components(_unbox(
            encode_jpeg2000(arr, cb=(4, 4), **kw)))
        if arr.ndim == 2:
            assert np.array_equal(comps[0], arr), kw
        else:
            for i in range(3):
                assert np.array_equal(comps[i], arr[..., i]), kw
    # control: the POC layout differs from the plain stream, same length
    plain = _unbox(encode_jpeg2000(img, nl=2, cb=(4, 4)))
    poced = _unbox(encode_jpeg2000(
        img, nl=2, cb=(4, 4), poc=[(0, 0, 1, 1, 1, 1), (1, 0, 1, 3, 1, 0)]))
    assert poced != plain
    with pytest.raises(ValueError, match="empty progression"):
        _decode_j2k_components(_unbox(encode_jpeg2000(
            img, nl=1, cb=(4, 4), poc=[(2, 0, 1, 1, 1, 0)])))


def test_rgn_maxshift_roi():
    """A.6.3 implicit maxshift ROI: coefficients serving the region of
    interest are upshifted by SPrgn (one RGN marker per component, Mb
    grown accordingly); the decoder shifts magnitudes >= 2^SPrgn back
    down. Reversible streams stay bit-exact; stripping the RGN markers
    from the same stream must NOT decode to the same pixels (pinning
    that the shift machinery is real, not a no-op)."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for kw in [dict(roi=(8, 8, 30, 24)), dict(roi=(0, 0, 56, 40)),
               dict(roi=(8, 8, 30, 24), eph=True),
               dict(roi=(8, 8, 30, 24), tile=(28, 20))]:
        raw = _unbox(encode_jpeg2000(img, nl=2, cb=(4, 4), **kw))
        assert b"\xff\x5e" in raw
        comps, _ = _decode_j2k_components(raw)
        assert np.array_equal(comps[0], img), kw
    rgb = rng.integers(0, 256, (21, 29, 3)).astype(np.uint8)
    comps, _ = _decode_j2k_components(_unbox(
        encode_jpeg2000(rgb, nl=2, cb=(4, 4), roi=(4, 4, 20, 16))))
    for i in range(3):
        assert np.array_equal(comps[i], rgb[..., i])
    # lossy ROI stays within the quantizer bound
    comps, _ = _decode_j2k_components(_unbox(
        encode_jpeg2000(img, nl=2, cb=(4, 4), roi=(8, 8, 30, 24),
                        lossy=True)))
    assert np.abs(comps[0] - img.astype(float)).max() <= 1.0
    # strip the RGN marker: the un-deshifted ROI must corrupt the decode
    raw = bytearray(_unbox(encode_jpeg2000(img, nl=1, cb=(4, 4),
                                           roi=(8, 8, 30, 24))))
    i = raw.index(b"\xff\x5e")
    ln = int.from_bytes(raw[i + 2 : i + 4], "big")
    del raw[i : i + 2 + ln]
    try:
        comps, _ = _decode_j2k_components(bytes(raw))
        assert not np.array_equal(comps[0], img)
    except ValueError:
        pass  # zbp now exceeds the unscaled Mb — loud is fine too


def test_ppm_packed_packet_headers():
    """A.7.4: PPM moves every packet header into MAIN-header segments —
    one [Nppm][headers] record per tile-part, consumed by tile-parts in
    codestream order. Composes with EPH, multi-tile, tile-part splits
    (per-part header records), precincts, and multi-layer termall."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, (50, 62)).astype(np.uint8)
    for kw in [dict(), dict(eph=True), dict(tile=(32, 28)),
               dict(split_parts=3), dict(tile=(32, 28), split_parts=2),
               dict(precincts=(4, 4)), dict(layers=2, termall=True)]:
        raw = _unbox(encode_jpeg2000(img, nl=2, cb=(4, 4), ppm=True, **kw))
        assert b"\xff\x60" in raw.split(b"\xff\x90")[0]
        comps, _ = _decode_j2k_components(raw)
        assert np.array_equal(comps[0], img), kw
    with pytest.raises(ValueError, match="exclusive"):
        encode_jpeg2000(img, nl=1, ppm=True, ppt=True)
    # a truncated PPM record is loud
    raw = bytearray(_unbox(encode_jpeg2000(img, nl=1, cb=(4, 4), ppm=True)))
    i = raw.index(b"\xff\x60")
    ln = int.from_bytes(raw[i + 2 : i + 4], "big")
    del raw[i + ln - 8 : i + ln]  # drop the tail of the PPM payload
    raw[i + 2 : i + 4] = (ln - 8).to_bytes(2, "big")
    with pytest.raises(ValueError):
        _decode_j2k_components(bytes(raw))


def test_custom_precincts():
    """B.6 custom precinct partitions: one packet per (layer, res, comp,
    precinct) with per-precinct tag trees, code-block sizes clamped per
    B.7 (halved on the subband grid for r > 0). Composes with EPH/SOP,
    tiling, per-resolution precinct lists, multi-layer termall, PPT,
    tile-part splits, COC overrides, and lossy — all bit-exact (or
    quantizer-bounded) round-trips. A 70x90 image at (4,4) yields ~30
    precincts in the top resolution, so the multi-precinct walk is
    genuinely exercised."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
    for kw in [dict(precincts=(4, 4)), dict(precincts=(3, 4), prog=1),
               dict(precincts=(4, 4), eph=True, sop=True),
               dict(precincts=(4, 4), tile=(48, 40)),
               dict(precincts=[(3, 3), (4, 4), (5, 5)]),
               dict(precincts=(4, 4), layers=2, termall=True),
               dict(precincts=(4, 4), ppt=True, eph=True),
               dict(precincts=(4, 4), split_parts=3),
               dict(precincts=(5, 5), cb=(6, 6))]:  # cb clamps to 4 (B.7)
        data = encode_jpeg2000(img, **{**dict(nl=2, cb=(4, 4)), **kw})
        raw = _unbox(data)
        i = raw.index(b"\xff\x52")
        assert raw[i + 4] & 1, "Scod precinct bit not set"
        comps, _ = _decode_j2k_components(raw)
        assert np.array_equal(comps[0], img), kw
    rgb = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    comps, _ = _decode_j2k_components(_unbox(encode_jpeg2000(
        rgb, nl=2, cb=(4, 4), precincts=(4, 4), overrides={1: {"nl": 1}})))
    for i in range(3):
        assert np.array_equal(comps[i], rgb[..., i])
    comps, _ = _decode_j2k_components(_unbox(encode_jpeg2000(
        img, nl=2, cb=(4, 4), precincts=(4, 4), lossy=True)))
    assert np.abs(comps[0] - img.astype(float)).max() <= 1.0


def test_precinct_position_progressions():
    """Position progressions (B.12.1.3-5): RPCL/PCRL/CPRL order packets
    by the precinct's first in-tile sample projected onto the reference
    grid (then component/resolution per the acronym). Multi-precinct,
    multi-resolution, RGB, and tiled streams round-trip bit-exactly in
    all three, and the orders genuinely differ from LRCP (pinned by
    comparing codestream bytes)."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
    streams = {}
    for prog in (0, 2, 3, 4):
        data = _unbox(encode_jpeg2000(img, nl=2, cb=(4, 4),
                                      precincts=(4, 4), prog=prog))
        comps, _ = _decode_j2k_components(data)
        assert np.array_equal(comps[0], img), prog
        streams[prog] = data
    # the packet orders really differ (same packets, different layout)
    assert len({streams[p] for p in streams}) == len(streams)
    assert all(len(streams[p]) == len(streams[0]) for p in streams)
    rgb = rng.integers(0, 256, (40, 50, 3)).astype(np.uint8)
    for prog in (2, 3, 4):
        comps, _ = _decode_j2k_components(_unbox(encode_jpeg2000(
            rgb, nl=2, cb=(3, 3), precincts=(3, 3), prog=prog,
            tile=(32, 24))))
        for i in range(3):
            assert np.array_equal(comps[i], rgb[..., i]), prog


def test_ppt_packed_packet_headers():
    """A.7.2: PPT moves every packet header (EPH included) into
    Zppt-ordered tile-part-header segments; the bitstream carries packet
    bodies only, read through a split header/body cursor. Exercised with
    EPH, SOP (which stays in the bitstream), tiling, tile-part splits,
    multi-layer termall, lossy, COC overrides, and RGB+MCT."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for kw in [dict(), dict(eph=True), dict(sop=True, eph=True),
               dict(tile=(24, 24)), dict(split_parts=3),
               dict(layers=2, termall=True),
               dict(overrides={0: {"nl": 1, "cb": (3, 3)}})]:
        comps, _ = _decode_j2k_components(_unbox(
            encode_jpeg2000(img, nl=2, cb=(4, 4), ppt=True, **kw)))
        assert np.array_equal(comps[0], img), kw
    rgb = rng.integers(0, 256, (21, 17, 3)).astype(np.uint8)
    comps, _ = _decode_j2k_components(_unbox(
        encode_jpeg2000(rgb, nl=2, cb=(4, 4), ppt=True, eph=True)))
    for i in range(3):
        assert np.array_equal(comps[i], rgb[..., i])
    # a lossy PPT stream stays within its quantizer bound
    comps, _ = _decode_j2k_components(_unbox(
        encode_jpeg2000(img, nl=2, cb=(4, 4), ppt=True, lossy=True)))
    assert np.abs(comps[0] - img.astype(float)).max() <= 1.0


def test_coc_qcc_component_overrides():
    """A.6.2/A.6.5 per-component overrides — the gray+color mix shape
    ordinary encoder output takes. COC changes decomposition levels and
    code-block sizes per component (packets then exist only for
    r <= NL_c, exercising the per-component packet walk in every
    progression order); QCC carries the component's own quantization.
    Reversible stays bit-exact through RCT + the mixed-level inverse."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (33, 21, 3)).astype(np.uint8)
    for kw in [
        dict(overrides={1: {"nl": 1, "cb": (3, 3)}, 2: {"nl": 2}}),
        dict(overrides={0: {"nl": 4}}, nl=1),
        dict(overrides={1: {"cb": (3, 4)}}, sop=True, eph=True),
        dict(overrides={2: {"nl": 0}}),  # chroma with no decomposition
    ]:
        for prog in range(5):
            comps, _ = _decode_j2k_components(_unbox(
                encode_jpeg2000(rgb, cb=(4, 4), prog=prog, **kw)))
            for i in range(3):
                assert np.array_equal(comps[i], rgb[..., i]), (kw, prog)
    # tiled + COC, and multi-layer termall + COC
    for kw in [dict(tile=(16, 16)), dict(termall=True, layers=2)]:
        comps, _ = _decode_j2k_components(_unbox(encode_jpeg2000(
            rgb, nl=2, cb=(4, 4),
            overrides={1: {"nl": 1}, 2: {"nl": 3}}, **kw)))
        for i in range(3):
            assert np.array_equal(comps[i], rgb[..., i]), kw


def test_qcc_lossy_per_component_quantization():
    """Lossy per-component step sizes: a coarser chroma quantizer (the
    classic visual-coding layout) decodes with error bounded by ITS OWN
    step, while luma keeps the fine default."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(22)
    rgb = np.kron(rng.integers(0, 256, (6, 5, 3)),
                  np.ones((5, 5, 1))).astype(np.uint8)
    data = encode_jpeg2000(rgb, nl=2, lossy=True, qexp_extra=6,
                           overrides={1: {"qexp_extra": 2},
                                      2: {"nl": 1, "qexp_extra": 2}})
    comps, _ = _decode_j2k_components(_unbox(data))
    # exact luma/chroma errors depend on the ICT mix; bound loosely but
    # meaningfully: everything within a few steps of the coarsest grid
    for i in range(3):
        err = np.abs(comps[i] - rgb[..., i].astype(float)).max()
        assert err <= 4.0, (i, err)


def test_coc_without_matching_qcc_is_loud():
    """A COC that changes the decomposition count invalidates the QCD
    entry alignment; a stream without the covering QCC must raise, not
    dequantize with the wrong exponents."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, (17, 13, 3)).astype(np.uint8)
    data = bytearray(_unbox(encode_jpeg2000(
        rgb, nl=2, cb=(4, 4), overrides={1: {"nl": 1}})))
    # strip the QCC segment (marker 0xFF5D) out of the main header
    i = data.find(b"\xff\x5d")
    assert i > 0
    ln = int.from_bytes(data[i + 2 : i + 4], "big")
    del data[i : i + 2 + ln]
    with pytest.raises(ValueError, match="QCC"):
        _decode_j2k_components(bytes(data))


def test_pdf_jpx_coc_qcc_image():
    """PDF integration: a JPX image XObject whose codestream carries
    COC/QCC per-component overrides decodes through the ingest path."""
    from ai_invoice_ocr_engine_spark.kernels import decode_image, rgb_to_gray
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    rng = np.random.default_rng(24)
    rgb = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
    payload = encode_jpeg2000(rgb, nl=2, cb=(4, 4), jp2=True,
                              overrides={1: {"nl": 1, "cb": (3, 3)},
                                         2: {"nl": 3}})
    obj = (
        "<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
        "/BitsPerComponent 8 /ColorSpace /DeviceRGB "
        "/Filter /JPXDecode "
        f"/Length {len(payload)} >>\nstream\n"
        + payload.decode("latin-1")
        + "\nendstream"
    )
    content = b"q 40 0 0 30 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=obj,
                    font="/XObject << /Im0 5 0 R >>")
    _spans, media = pdf_spans(blob)
    assert np.array_equal(decode_image(next(iter(media.values()))),
                          rgb_to_gray(rgb))


# -- lossy 9/7 path --------------------------------------------------------------


def test_97_1d_inverts_exactly():
    from ai_invoice_ocr_engine_spark.jpeg2000 import _sd97_1d, _sr97_1d

    rng = np.random.default_rng(1)
    for i0, i1 in [(0, 8), (1, 8), (0, 7), (3, 4), (2, 3), (0, 1), (5, 16)]:
        x = rng.standard_normal(i1 - i0) * 100
        assert np.allclose(_sr97_1d(_sd97_1d(x, i0, i1), i0, i1), x,
                           atol=1e-9)
    y = _sd97_1d(np.full(10, 50.0), 0, 10)
    assert np.allclose(y[1::2], 0, atol=1e-9)  # constant -> zero detail


def test_lossy_gray_quantizer_bites_and_bounds():
    """qexp_extra=3 (step 1/8): midpoint reconstruction rounds back to
    the exact pixels; qexp_extra=0 (step 1): a strictly smaller stream
    with small bounded error — the quantizer is real, not a no-op."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    fine = encode_jpeg2000(img, nl=2, cb=(4, 4), lossy=True, qexp_extra=3)
    coarse = encode_jpeg2000(img, nl=2, cb=(4, 4), lossy=True, qexp_extra=0)
    assert len(coarse) < len(fine)
    comps, _ = _decode_j2k_components(_unbox(fine))
    assert np.array_equal(np.clip(np.rint(comps[0]), 0, 255), img)
    comps, _ = _decode_j2k_components(_unbox(coarse))
    err = np.abs(np.clip(np.rint(comps[0]), 0, 255) - img.astype(float))
    assert err.max() <= 4
    mse = float(np.mean(err ** 2))
    assert 10 * np.log10(255 ** 2 / max(mse, 1e-12)) > 40


def test_lossy_rgb_ict():
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(13)
    rgb = np.kron(rng.integers(0, 256, (6, 6, 3)),
                  np.ones((5, 5, 1))).astype(np.uint8)[:27, :29]
    data = encode_jpeg2000(rgb, nl=2, cb=(4, 4), lossy=True)
    comps, _ = _decode_j2k_components(_unbox(data))
    for i, c in enumerate(comps):
        err = np.abs(np.clip(np.rint(c), 0, 255) - rgb[..., i].astype(float))
        assert err.max() <= 4, i
    assert decode_jpeg2000(data).shape == (27, 29)


def test_lossy_tiled_and_derived_quantization():
    """Tiling under 9/7, and the scalar-DERIVED QCD style (one entry,
    per-level step derivation) hand-built from the expounded stream."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(14)
    img = np.kron(rng.integers(0, 256, (10, 10)),
                  np.ones((5, 5))).astype(np.uint8)[:47, :43]
    data = encode_jpeg2000(img, nl=2, cb=(4, 4), lossy=True, tile=(32, 32))
    comps, _ = _decode_j2k_components(_unbox(data))
    err = np.abs(np.clip(np.rint(comps[0]), 0, 255) - img.astype(float))
    assert err.max() <= 1


# -- termall + multi-layer -------------------------------------------------------


def test_termall_and_multilayer_lossless():
    """termall style (0x04): every pass its own terminated MQ segment
    with per-segment lengths; quality layers split the segments. Exact
    reconstruction for 1/2/3/5 layers, every progression order, RGB,
    tiling, and the lossy transform."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (37, 29)).astype(np.uint8)
    for layers in (1, 2, 3, 5):
        d = encode_jpeg2000(img, nl=2, cb=(4, 4), termall=True,
                            layers=layers)
        comps, _ = _decode_j2k_components(_unbox(d))
        assert np.array_equal(comps[0], img), layers
    for prog in range(5):
        d = encode_jpeg2000(img, nl=1, cb=(4, 4), termall=True, layers=3,
                            prog=prog)
        comps, _ = _decode_j2k_components(_unbox(d))
        assert np.array_equal(comps[0], img), prog
    rgb = rng.integers(0, 256, (33, 21, 3)).astype(np.uint8)
    d = encode_jpeg2000(rgb, nl=2, cb=(4, 4), termall=True, layers=2)
    comps, _ = _decode_j2k_components(_unbox(d))
    for i in range(3):
        assert np.array_equal(comps[i], rgb[..., i])
    d = encode_jpeg2000(img, nl=2, cb=(4, 4), termall=True, layers=2,
                        tile=(16, 20))
    comps, _ = _decode_j2k_components(_unbox(d))
    assert np.array_equal(comps[0], img)


def test_multilayer_requires_termall():
    with pytest.raises(ValueError, match="termall"):
        encode_jpeg2000(np.zeros((8, 8), np.uint8), layers=2)


def test_predictable_termination_bit_accepted():
    """0x10 constrains only the encoder's flush so decoders MAY verify;
    decoding is identical — the bit must be accepted, not refused."""
    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_jpeg2000(img, nl=1, cb=(4, 4)))
    cod_at = bytes(data).find(b"\xff\x52")
    lcod = int.from_bytes(data[cod_at + 2 : cod_at + 4], "big")
    data[cod_at + 2 + lcod - 2] = 0x10  # predictable termination
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    comps, _ = _decode_j2k_components(_unbox(bytes(data)))
    assert np.array_equal(comps[0], img)


def test_cb_styles_causal_reset_segsym():
    """Remaining implemented code-block styles: vertically-causal
    contexts (0x08 — next-stripe neighbors read insignificant), context
    reset per pass (0x02), and segmentation symbols (0x20 — 1010
    through UNIFORM at each cleanup end, verified on decode). Exact
    round-trips alone and combined, with termall+layers on top."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _decode_j2k_components, _unbox,
    )

    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, (29, 33)).astype(np.uint8)
    for kw in [dict(causal=True), dict(reset=True), dict(segsym=True),
               dict(causal=True, reset=True, segsym=True),
               dict(causal=True, segsym=True, termall=True, layers=3)]:
        comps, _ = _decode_j2k_components(
            _unbox(encode_jpeg2000(img, nl=2, cb=(4, 4), **kw)))
        assert np.array_equal(comps[0], img), kw


def test_segsym_detects_stream_corruption():
    """The segmentation symbol is real error DETECTION: corrupting a
    packet-body byte of a segsym stream must raise, not decode wrong."""
    rng = np.random.default_rng(52)
    img = rng.integers(0, 256, (29, 33)).astype(np.uint8)
    base = bytearray(encode_jpeg2000(img, nl=2, cb=(4, 4), segsym=True))
    detected = 0
    for off in range(8, min(180, len(base) - 1), 7):
        d = bytearray(base)
        d[-off] ^= 0x55
        try:
            decode_jpeg2000(bytes(d))
        except (ValueError, NotImplementedError):
            detected += 1
    assert detected >= 5, detected  # a single flip can land past the
    # last checked symbol, but across many positions detection must fire


def test_selective_bypass_style():
    """Selective arithmetic bypass (0x01, 'lazy'): SPP/MRP of every
    plane below the first four are raw-coded in their own terminated
    segments — the [10 MQ][2 raw][1 MQ]... codeword-segment pattern,
    per-segment lengths in the packet header. Exact round-trips alone,
    with termall+layers, with other styles + lossy, and for RGB."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import (
        _bypass_boundaries, _decode_j2k_components, _unbox,
    )

    assert _bypass_boundaries(25) == [10, 12, 13, 15, 16, 18, 19, 21,
                                      22, 24, 25]
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (41, 37)).astype(np.uint8)
    for kw in [dict(bypass=True),
               dict(bypass=True, termall=True, layers=3),
               dict(bypass=True, causal=True, segsym=True)]:
        comps, _ = _decode_j2k_components(
            _unbox(encode_jpeg2000(img, nl=2, cb=(4, 4), **kw)))
        assert np.array_equal(comps[0], img), kw
    rgb = rng.integers(0, 256, (23, 19, 3)).astype(np.uint8)
    comps, _ = _decode_j2k_components(
        _unbox(encode_jpeg2000(rgb, nl=2, cb=(4, 4), bypass=True)))
    for i in range(3):
        assert np.array_equal(comps[i], rgb[..., i])


def test_raw_bit_io_stuffing():
    from ai_invoice_ocr_engine_spark.jpeg2000 import _RawDec, _RawEnc

    rng = np.random.default_rng(72)
    bits = [int(b) for b in rng.integers(0, 2, 300)]
    bits[16:40] = [1] * 24  # force 0xFF runs -> stuffing
    enc = _RawEnc()
    for b in bits:
        enc.put(b)
    data = enc.flush()
    dec = _RawDec(data)
    assert [dec.read() for _ in range(len(bits))] == bits


def test_pdf_jpx_lossy_multilayer_image():
    """The realistic scanned-page JPX shape — lossy 9/7, quality
    layers, bypass — inside a PDF image XObject, decoded through the
    full ingest path with bounded error."""
    from ai_invoice_ocr_engine_spark.kernels import decode_image
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    rng = np.random.default_rng(11)
    img = np.kron(rng.integers(0, 256, (6, 8)),
                  np.ones((5, 5))).astype(np.uint8)
    payload = encode_jpeg2000(img, nl=2, cb=(4, 4), jp2=True, lossy=True,
                              termall=True, layers=3, bypass=True)
    obj = (
        "<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
        "/BitsPerComponent 8 /ColorSpace /DeviceGray "
        "/Filter /JPXDecode "
        f"/Length {len(payload)} >>\nstream\n"
        + payload.decode("latin-1")
        + "\nendstream"
    )
    content = b"q 40 0 0 30 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=obj,
                    font="/XObject << /Im0 5 0 R >>")
    _spans, media = pdf_spans(blob)
    out = decode_image(next(iter(media.values())))
    assert np.abs(out.astype(float) - img.astype(float)).max() <= 1


def test_signed_component_roundtrip_and_display():
    """Ssiz bit 7 (A.5.1): signed samples skip the DC level shift
    (G.1.2) and decode bit-exactly on the reversible path; the display
    path maps them to offset binary."""
    rng = np.random.default_rng(201)
    a = rng.integers(-128, 128, (21, 17), np.int64)
    bs = encode_jpeg2000(None, nl=2, components=[{"data": a,
                                                  "signed": True}])
    comps, cinfo = _decode_j2k_components(_unbox(bs))
    assert cinfo == [(8, True, 1, 1)]
    assert np.array_equal(comps[0], a)
    out = decode_jpeg2000(bs)
    assert np.array_equal(out, (a + 128).astype(np.uint8))


def test_mixed_depth_components_roundtrip():
    """Per-component Ssiz precision: 12/4-bit unsigned + 10-bit signed
    in one tiled stream, each reconstructed bit-exactly (per-component
    Rb drives Mb; reversible path)."""
    rng = np.random.default_rng(202)
    c0 = rng.integers(0, 4096, (33, 29), np.int64)
    c1 = rng.integers(0, 16, (33, 29), np.int64)
    c2 = rng.integers(-512, 512, (33, 29), np.int64)
    bs = encode_jpeg2000(None, nl=2, tile=(16, 16), components=[
        {"data": c0, "depth": 12},
        {"data": c1, "depth": 4},
        {"data": c2, "depth": 10, "signed": True}])
    comps, cinfo = _decode_j2k_components(_unbox(bs))
    assert cinfo == [(12, False, 1, 1), (4, False, 1, 1), (10, True, 1, 1)]
    for got, want in zip(comps, (c0, c1, c2)):
        assert np.array_equal(got, want)


def test_mixed_depth_lossy_error_bound():
    """Lossy per-component quantization with non-8-bit depths: eps
    rides each component's Rb (E.1, via auto-emitted QCCs), so the
    reconstruction error stays below one step regardless of depth."""
    rng = np.random.default_rng(203)
    c0 = rng.integers(0, 4096, (24, 24), np.int64)
    c1 = rng.integers(-512, 512, (24, 24), np.int64)
    bs = encode_jpeg2000(None, nl=2, lossy=True, qexp_extra=6,
                         components=[
                             {"data": c0, "depth": 12},
                             {"data": c1, "depth": 10, "signed": True}])
    comps, cinfo = _decode_j2k_components(_unbox(bs))
    assert cinfo == [(12, False, 1, 1), (10, True, 1, 1)]
    assert np.abs(comps[0] - c0).max() < 1.0
    assert np.abs(comps[1] - c1).max() < 1.0


def test_component_depth_out_of_range_is_corrupt():
    """Ssiz depths above 16 are outside this decoder's contract and
    raise ValueError (corrupt), not a silent wrap."""
    rng = np.random.default_rng(204)
    a = rng.integers(0, 256, (8, 8), np.int64)
    bs = bytearray(encode_jpeg2000(None, nl=1, components=[{"data": a}]))
    # SIZ body starts after SOC(2)+marker(2)+len(2): Ssiz of comp 0 sits
    # at offset 2+2+2+36 = 42 in the raw codestream
    assert bs[42] == 7
    bs[42] = 24  # claim a 25-bit component
    with pytest.raises(ValueError):
        _decode_j2k_components(_unbox(bytes(bs)))


def test_per_tile_cod_qcd_overrides():
    """Per-tile COD/QCD in the first tile-part header (A.4.2/Table
    A.1): tiles with their own decomposition count / code-block size /
    step size decode alongside default tiles — reversible bit-exact,
    lossy error-bounded, and composing with PPT + SOP/EPH + tile-part
    splits."""
    rng = np.random.default_rng(211)
    img = rng.integers(0, 256, (40, 56), np.uint8)
    bs = encode_jpeg2000(img, nl=2, tile=(28, 20), cb=(5, 5),
                         tile_overrides={1: {"nl": 3, "cb": (4, 4)},
                                         2: {"nl": 1}})
    assert np.array_equal(decode_jpeg2000(bs), img)

    rgb = rng.integers(0, 256, (33, 41, 3), np.uint8)
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray
    bs = encode_jpeg2000(rgb, nl=2, tile=(16, 16),
                         tile_overrides={3: {"nl": 4, "cb": (4, 5)}})
    assert np.array_equal(decode_jpeg2000(bs), rgb_to_gray(rgb))

    bs = encode_jpeg2000(img, nl=2, tile=(28, 20), lossy=True,
                         qexp_extra=5,
                         tile_overrides={0: {"qexp_extra": 7, "nl": 3}})
    out = decode_jpeg2000(bs)
    assert np.abs(out.astype(float) - img.astype(float)).max() <= 1

    bs = encode_jpeg2000(img, nl=2, tile=(28, 20), ppt=True, sop=True,
                         eph=True, split_parts=2,
                         tile_overrides={1: {"nl": 3}})
    assert np.array_equal(decode_jpeg2000(bs), img)


def test_tile_cod_outside_first_tile_part_is_loud():
    """Coding markers are legal in the FIRST tile-part header only
    (Table A.1); a COD injected into a later tile-part raises."""
    import struct as _s

    rng = np.random.default_rng(212)
    img = rng.integers(0, 256, (40, 56), np.uint8)
    d = encode_jpeg2000(img, nl=1, tile=(28, 20), split_parts=2)
    # grab the main-header COD segment bytes
    i = d.index(b"\xff\x52")
    cod_seg = d[i : i + 2 + _s.unpack(">H", d[i + 2 : i + 4])[0]]
    # find a SOT with TPsot == 1 and splice the COD in after its header
    pos = d.index(b"\xff\x90")
    while True:
        psot = _s.unpack(">I", d[pos + 6 : pos + 10])[0]
        if d[pos + 10] == 1:
            break
        pos = d.index(b"\xff\x90", pos + psot)
    patched = (d[: pos + 6]
               + _s.pack(">I", psot + len(cod_seg))
               + d[pos + 10 : pos + 12]
               + cod_seg + d[pos + 12 :])
    with pytest.raises(ValueError, match="first tile-part"):
        _decode_j2k_components(patched)


def test_pdf_jpx_per_tile_override_image():
    """A tiled JPX with a per-tile COD/QCD override inside a PDF image
    XObject, decoded through the full ingest path."""
    from ai_invoice_ocr_engine_spark.kernels import decode_image
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    rng = np.random.default_rng(213)
    img = rng.integers(0, 256, (30, 40), np.uint8)
    payload = encode_jpeg2000(img, nl=2, cb=(4, 4), tile=(20, 16),
                              jp2=True,
                              tile_overrides={1: {"nl": 3},
                                              2: {"cb": (5, 4)}})
    obj = (
        "<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
        "/BitsPerComponent 8 /ColorSpace /DeviceGray "
        "/Filter /JPXDecode "
        f"/Length {len(payload)} >>\nstream\n"
        + payload.decode("latin-1")
        + "\nendstream"
    )
    content = b"q 40 0 0 30 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=obj,
                    font="/XObject << /Im0 5 0 R >>")
    _spans, media = pdf_spans(blob)
    assert np.array_equal(decode_image(next(iter(media.values()))), img)


def test_subsampled_components_420_roundtrip():
    """XRsiz/YRsiz component separations (A.5.1/B.3): the scanner-JPX
    4:2:0 shape — full-res luma + 2x2-subsampled chroma, mct=0 — each
    component reconstructed bit-exactly on ITS OWN grid, untiled and
    with tile boundaries that fall oddly against the chroma grid."""
    rng = np.random.default_rng(221)
    w, h = 41, 30
    y = rng.integers(0, 256, (h, w), np.int64)
    cb = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), np.int64)
    cr = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), np.int64)
    sub = [{"data": y}, {"data": cb, "xr": 2, "yr": 2},
           {"data": cr, "xr": 2, "yr": 2}]
    bs = encode_jpeg2000(None, nl=2, size=(w, h), components=sub)
    comps, cinfo = _decode_j2k_components(_unbox(bs))
    assert cinfo == [(8, False, 1, 1), (8, False, 2, 2), (8, False, 2, 2)]
    for got, want in zip(comps, (y, cb, cr)):
        assert np.array_equal(got, want)
    bs = encode_jpeg2000(None, nl=2, size=(w, h), tile=(17, 13),
                         components=sub)
    comps, _ = _decode_j2k_components(_unbox(bs))
    for got, want in zip(comps, (y, cb, cr)):
        assert np.array_equal(got, want)
    # display path: chroma replicated up to the luma grid
    out = decode_jpeg2000(bs)
    assert out.shape == (h, w)


def test_subsampled_all_progressions_and_lossy():
    """4:2:2 across every progression order — the B.12.1.3-5 position
    keys carry the XRsiz/YRsiz factors, so mixed-separation components
    interleave consistently — plus the lossy error bound."""
    rng = np.random.default_rng(222)
    w, h = 41, 30
    y = rng.integers(0, 256, (h, w), np.int64)
    cb = rng.integers(0, 256, (h, (w + 1) // 2), np.int64)
    cr = rng.integers(0, 256, (h, (w + 1) // 2), np.int64)
    for prog in range(5):
        bs = encode_jpeg2000(None, nl=1, size=(w, h), prog=prog,
                             components=[{"data": y},
                                         {"data": cb, "xr": 2},
                                         {"data": cr, "xr": 2}])
        comps, _ = _decode_j2k_components(_unbox(bs))
        for got, want in zip(comps, (y, cb, cr)):
            assert np.array_equal(got, want), prog
    cb0 = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), np.int64)
    bs = encode_jpeg2000(None, nl=2, size=(w, h), lossy=True,
                         qexp_extra=6,
                         components=[{"data": y},
                                     {"data": cb0, "xr": 2, "yr": 2},
                                     {"data": cb0, "xr": 2, "yr": 2}])
    comps, _ = _decode_j2k_components(_unbox(bs))
    for got, want in zip(comps, (y, cb0, cb0)):
        assert np.abs(got - want).max() < 1.0


def test_subsampled_edge_shapes_and_precincts():
    """Tiles that are EMPTY for a subsampled component (1-pixel tiles
    against a 2x grid) still carry their empty packets; custom
    precincts + RPCL + PPT compose with mixed separations."""
    rng = np.random.default_rng(223)
    y3 = rng.integers(0, 256, (3, 3), np.int64)
    c2 = rng.integers(0, 256, (2, 2), np.int64)
    bs = encode_jpeg2000(None, nl=1, size=(3, 3), tile=(1, 1),
                         components=[{"data": y3},
                                     {"data": c2, "xr": 2, "yr": 2},
                                     {"data": c2, "xr": 2, "yr": 2}])
    comps, _ = _decode_j2k_components(_unbox(bs))
    assert np.array_equal(comps[0], y3)
    assert np.array_equal(comps[1], c2)
    w, h = 37, 26
    y = rng.integers(0, 256, (h, w), np.int64)
    cs = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), np.int64)
    bs = encode_jpeg2000(None, nl=2, size=(w, h), prog=2,
                         precincts=(3, 3), ppt=True, eph=True,
                         components=[{"data": y},
                                     {"data": cs, "xr": 2, "yr": 2},
                                     {"data": cs, "xr": 2, "yr": 2}])
    comps, _ = _decode_j2k_components(_unbox(bs))
    assert np.array_equal(comps[0], y)
    assert np.array_equal(comps[1], cs)


def test_mct_over_mismatched_grids_is_loud():
    """G.1: MCT is only defined over components on one grid — a stream
    claiming both is corrupt, not silently averaged."""
    import struct as _s

    rng = np.random.default_rng(224)
    rgb = rng.integers(0, 256, (16, 16, 3), np.uint8)
    d = bytearray(encode_jpeg2000(rgb, nl=1))
    # SIZ: Ssiz/XRsiz/YRsiz triples start at offset 42; set comp 1's
    # XRsiz to 2 while COD keeps MCT on
    assert d[42 + 3] == 7 and d[42 + 4] == 1
    d[42 + 4] = 2
    with pytest.raises(ValueError, match="MCT over mismatched"):
        _decode_j2k_components(bytes(d))


def test_per_component_transform_mix():
    """5/3 and 9/7 mixed across components with MCT off: the reversible
    component stays bit-exact while quantized components hold the lossy
    error bound — untiled and tiled, with subsampling composed in."""
    rng = np.random.default_rng(231)
    w, h = 29, 22
    a = rng.integers(0, 256, (h, w), np.int64)
    b = rng.integers(0, 4096, (h, w), np.int64)
    c = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), np.int64)
    bs = encode_jpeg2000(None, nl=2, qexp_extra=6, size=(w, h),
                         components=[
                             {"data": a},
                             {"data": b, "depth": 12, "lossy": True},
                             {"data": c, "xr": 2, "yr": 2,
                              "lossy": True}])
    comps, _ = _decode_j2k_components(_unbox(bs))
    assert np.array_equal(comps[0], a)
    assert np.abs(comps[1] - b).max() < 1.0
    assert np.abs(comps[2] - c).max() < 1.0
    bs = encode_jpeg2000(None, nl=2, tile=(16, 12), qexp_extra=6,
                         size=(w, h),
                         components=[{"data": a},
                                     {"data": b, "depth": 12,
                                      "lossy": True}])
    comps, _ = _decode_j2k_components(_unbox(bs))
    assert np.array_equal(comps[0], a)
    assert np.abs(comps[1] - b).max() < 1.0


def test_mct_over_mixed_transforms_is_corrupt():
    """G.2/G.3: RCT is defined on 5/3 output and ICT on 9/7 — a stream
    asserting MCT across a transform mix raises ValueError."""
    rng = np.random.default_rng(232)
    a = rng.integers(0, 256, (22, 29), np.int64)
    bs = bytearray(encode_jpeg2000(
        None, nl=1, size=(29, 22), qexp_extra=6,
        components=[{"data": a}, {"data": a},
                    {"data": a, "lossy": True}]))
    i = bytes(bs).index(b"\xff\x52")
    bs[i + 8] = 1  # SGcod MCT byte: marker(2)+len(2)+Scod(1)+prog(1)+layers(2)
    with pytest.raises(ValueError, match="MCT over mixed transforms"):
        _decode_j2k_components(_unbox(bytes(bs)))


def test_jp2_colr_sycc_conversion():
    """JP2 colr box (I.5.3.3): an enumerated sYCC stream's components
    are luma/chroma, not RGB — the display path converts before the
    shared luma reduction. Pinned against a hand-computed forward
    sYCC + 4:2:0 downsample + replicate/invert/gray reference; the
    sRGB (16) and greyscale (17) enums keep their existing behavior."""
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    rng = np.random.default_rng(241)
    w, h = 40, 30
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    yq = np.clip(np.rint(y), 0, 255).astype(np.int64)
    cbq = np.clip(np.rint(cb[::2, ::2]), 0, 255).astype(np.int64)
    crq = np.clip(np.rint(cr[::2, ::2]), 0, 255).astype(np.int64)
    bs = encode_jpeg2000(None, nl=2, size=(w, h), jp2=True,
                         colorspace=18,
                         components=[{"data": yq},
                                     {"data": cbq, "xr": 2, "yr": 2},
                                     {"data": crq, "xr": 2, "yr": 2}])
    out = decode_jpeg2000(bs)
    cbu = np.repeat(np.repeat(cbq, 2, 0), 2, 1)[:h, :w].astype(float)
    cru = np.repeat(np.repeat(crq, 2, 0), 2, 1)[:h, :w].astype(float)
    rr = yq + 1.402 * (cru - 128)
    gg = yq - 0.344136 * (cbu - 128) - 0.714136 * (cru - 128)
    bb = yq + 1.772 * (cbu - 128)
    want = rgb_to_gray(np.stack(
        [np.clip(np.rint(c), 0, 255).astype(np.uint8)
         for c in (rr, gg, bb)], -1))
    assert np.array_equal(out, want)
    # the conversion lands near the source image's own gray (the gap
    # is chroma subsampling loss)
    orig = rgb_to_gray(np.clip(np.rint(rgb), 0, 255).astype(np.uint8))
    assert np.abs(out.astype(float) - orig.astype(float)).mean() < 3.0
    img = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg2000(encode_jpeg2000(img, nl=1, jp2=True)),
        rgb_to_gray(img))


def test_pdf_jpx_sycc_420_image():
    """The full real-world scanner shape in one stream: JP2 container,
    sYCC colr box, 4:2:0 subsampled chroma, MCT off — inside a PDF
    JPXDecode image XObject through the ingest path."""
    from ai_invoice_ocr_engine_spark.kernels import decode_image
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    rng = np.random.default_rng(242)
    w, h = 40, 30
    yq = rng.integers(0, 256, (h, w)).astype(np.int64)
    cbq = rng.integers(96, 160, (15, 20)).astype(np.int64)
    crq = rng.integers(96, 160, (15, 20)).astype(np.int64)
    payload = encode_jpeg2000(None, nl=2, size=(w, h), jp2=True,
                              colorspace=18,
                              components=[{"data": yq},
                                          {"data": cbq, "xr": 2,
                                           "yr": 2},
                                          {"data": crq, "xr": 2,
                                           "yr": 2}])
    obj = (
        "<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
        "/BitsPerComponent 8 /ColorSpace /DeviceRGB "
        "/Filter /JPXDecode "
        f"/Length {len(payload)} >>\nstream\n"
        + payload.decode("latin-1")
        + "\nendstream"
    )
    content = b"q 40 0 0 30 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=obj,
                    font="/XObject << /Im0 5 0 R >>")
    _spans, media = pdf_spans(blob)
    out = decode_image(next(iter(media.values())))
    assert out.shape == (h, w)
    assert np.array_equal(out, decode_jpeg2000(payload))


def test_tile_header_poc_overrides():
    """POC in a tile's first tile-part header (A.6.6/Table A.1)
    overrides the main progression for that tile — alone, combined
    with a per-tile COD/QCD, and coexisting with a main-header POC."""
    rng = np.random.default_rng(251)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    bs = encode_jpeg2000(img, nl=2, tile=(28, 20), prog=0,
                         tile_overrides={1: {"poc": [(0, 0, 1, 3, 1,
                                                      1)]}})
    assert np.array_equal(decode_jpeg2000(bs), img)
    bs = encode_jpeg2000(
        img, nl=2, tile=(28, 20), prog=0,
        tile_overrides={1: {"nl": 3, "poc": [(0, 0, 1, 4, 1, 2)]},
                        2: {"poc": [(1, 0, 1, 3, 1, 0)]}})
    assert np.array_equal(decode_jpeg2000(bs), img)
    bs = encode_jpeg2000(img, nl=2, tile=(28, 20), prog=0,
                         poc=[(0, 0, 1, 2, 1, 1)],
                         tile_overrides={0: {"poc": [(0, 0, 1, 3, 1,
                                                      4)]}})
    assert np.array_equal(decode_jpeg2000(bs), img)


def test_tile_header_rgn_equals_main_rgn():
    """RGN in the first tile-part header (Table A.1) scopes the ROI to
    that tile: for a single-tile stream the main-header RGN segment
    moved into the tile header must decode identically."""
    import struct as _s

    rng = np.random.default_rng(252)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    d = encode_jpeg2000(img, nl=2, cb=(4, 4), roi=(8, 8, 24, 20))
    ref = decode_jpeg2000(d)
    assert np.array_equal(ref, img)  # maxshift ROI is still lossless
    i = d.index(b"\xff\x5e")
    ln = _s.unpack(">H", d[i + 2 : i + 4])[0]
    rgn_seg = d[i : i + 2 + ln]
    d2 = d[:i] + d[i + 2 + ln :]
    j = d2.index(b"\xff\x90")
    psot = _s.unpack(">I", d2[j + 6 : j + 10])[0]
    d3 = (d2[: j + 6] + _s.pack(">I", psot + len(rgn_seg))
          + d2[j + 10 : j + 12] + rgn_seg + d2[j + 12 :])
    assert np.array_equal(decode_jpeg2000(d3), ref)


def test_rgn_poc_in_later_tile_part_is_loud():
    """This decoder concatenates tile-parts before the packet walk, so
    RGN/POC in a LATER tile-part is a named seam, not a silent skip."""
    import struct as _s

    rng = np.random.default_rng(253)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    d = encode_jpeg2000(img, nl=1, tile=(28, 20), split_parts=2,
                        poc=[(0, 0, 1, 2, 1, 1)])
    i = d.index(b"\xff\x5f")
    ln = _s.unpack(">H", d[i + 2 : i + 4])[0]
    poc_seg = d[i : i + 2 + ln]
    d2 = d[:i] + d[i + 2 + ln :]
    pos = d2.index(b"\xff\x90")
    while True:
        psot = _s.unpack(">I", d2[pos + 6 : pos + 10])[0]
        if d2[pos + 10] == 1:
            break
        pos = d2.index(b"\xff\x90", pos + psot)
    d3 = (d2[: pos + 6] + _s.pack(">I", psot + len(poc_seg))
          + d2[pos + 10 : pos + 12] + poc_seg + d2[pos + 12 :])
    with pytest.raises(NotImplementedError, match="later tile-part"):
        decode_jpeg2000(d3)


def test_bypass_portions_hand_computed():
    """Pass-range splitting at the absolute bypass boundaries
    (10, 12, 13, 15, 16, ...): portions carry (segment_index, count)
    and a layer boundary inside a segment splits its pass count."""
    from ai_invoice_ocr_engine_spark.jpeg2000 import _bypass_portions

    # all 13 passes in one packet: segments 10 + 2 + 1
    assert _bypass_portions(0, 13) == [(0, 10), (1, 2), (2, 1)]
    # layer boundary at pass 4: segment 0 split 4 + 6
    assert _bypass_portions(0, 4) == [(0, 4)]
    assert _bypass_portions(4, 9) == [(0, 6), (1, 2), (2, 1)]
    # boundary inside the raw pair (segment 1)
    assert _bypass_portions(0, 11) == [(0, 10), (1, 1)]
    assert _bypass_portions(11, 2) == [(1, 1), (2, 1)]
    # resuming exactly at a segment edge
    assert _bypass_portions(12, 4) == [(2, 1), (3, 2), (4, 1)]


def test_multilayer_bypass_without_termall():
    """The former 'bypass segments spanning quality layers' seam: a
    multi-layer lazy stream with NO termall — segments byte-split
    across packets, one length per portion — round-trips bit-exactly,
    alone and composed with tiles/SOP/EPH/RLCP/RGB, while the
    termall+bypass form is unchanged."""
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    rng = np.random.default_rng(261)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for layers in (2, 3, 5):
        bs = encode_jpeg2000(img, nl=2, cb=(4, 4), bypass=True,
                             layers=layers)
        assert np.array_equal(decode_jpeg2000(bs), img), layers
    rgb = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    bs = encode_jpeg2000(rgb, nl=2, tile=(16, 16), bypass=True,
                         layers=3, sop=True, eph=True, prog=1)
    assert np.array_equal(decode_jpeg2000(bs), rgb_to_gray(rgb))
    bs = encode_jpeg2000(img, nl=2, cb=(4, 4), bypass=True,
                         termall=True, layers=3)
    assert np.array_equal(decode_jpeg2000(bs), img)


def test_multilayer_bypass_truncation_is_loud():
    """Cutting a multi-layer bypass stream inside a later layer's
    portion bytes raises instead of decoding silently-wrong pixels."""
    rng = np.random.default_rng(262)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    data = encode_jpeg2000(img, nl=1, cb=(4, 4), bypass=True, layers=3)
    assert data[-2:] == b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg2000(data[:-8] + b"\xff\xd9")


def test_jp2_cmyk_colr_composite():
    """JP2 colr enum 12 (CMYK, 15444-2): four ink-coverage components
    composite over white with the SAME integer arithmetic as the Adobe
    CMYK JPEG path, pinned against a hand-computed reference. The
    reversible 5/3 path decodes components exactly, so the equality is
    bit-level, not a tolerance."""
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    rng = np.random.default_rng(263)
    w, h = 37, 29
    cmyk = rng.integers(0, 256, (h, w, 4)).astype(np.int64)
    bs = encode_jpeg2000(None, nl=2, size=(w, h), jp2=True,
                         colorspace=12,
                         components=[{"data": cmyk[..., i]}
                                     for i in range(4)])
    out = decode_jpeg2000(bs)
    inv_cmy = (255 - cmyk[..., :3]).astype(np.uint16)
    inv_k = (255 - cmyk[..., 3:4]).astype(np.uint16)
    want = rgb_to_gray(((inv_cmy * inv_k + 127) // 255).astype(np.uint8))
    assert np.array_equal(out, want)
    # cross-family pin: the same page through the Adobe CMYK JPEG path
    # (lossless integer arithmetic differs only by DCT loss) lands near
    # the same gray
    from ai_invoice_ocr_engine_spark.jpeg import encode_jpeg_cmyk
    from ai_invoice_ocr_engine_spark.kernels import decode_image

    jp = decode_image(encode_jpeg_cmyk(cmyk.astype(np.uint8), quality=97))
    assert np.abs(jp.astype(float) - want.astype(float)).mean() < 6.0


def test_jp2_cdef_alpha_dropped():
    """Channel-definition box (I.5.3.6): straight opacity channels
    (Typ 1) are dropped before the colour reduction — RGBA greys like
    RGB, gray+alpha like gray — and a cdef that PERMUTES the stored
    channel order is honoured via the colour associations."""
    from ai_invoice_ocr_engine_spark.kernels import rgb_to_gray

    rng = np.random.default_rng(264)
    rgb = rng.integers(0, 256, (22, 31, 3)).astype(np.int64)
    alpha = rng.integers(0, 256, (22, 31)).astype(np.int64)
    comps = [{"data": rgb[..., i]} for i in range(3)]
    bs = encode_jpeg2000(None, nl=1, size=(31, 22), jp2=True,
                         colorspace=16,
                         components=comps + [{"data": alpha}],
                         cdef=[(0, 0, 1), (1, 0, 2), (2, 0, 3),
                               (3, 1, 0)])
    want = rgb_to_gray(rgb.astype(np.uint8))
    assert np.array_equal(decode_jpeg2000(bs), want)
    # gray + alpha
    g = rng.integers(0, 256, (18, 25)).astype(np.int64)
    bs = encode_jpeg2000(None, nl=1, size=(25, 18), jp2=True,
                         colorspace=17,
                         components=[{"data": g}, {"data": alpha[:18, :25]}],
                         cdef=[(0, 0, 1), (1, 1, 0)])
    assert np.array_equal(decode_jpeg2000(bs), g.astype(np.uint8))
    # channels stored alpha-first + BGR: cdef associations restore RGB
    stored = [{"data": alpha}, {"data": rgb[..., 2]},
              {"data": rgb[..., 1]}, {"data": rgb[..., 0]}]
    bs = encode_jpeg2000(None, nl=1, size=(31, 22), jp2=True,
                         colorspace=16, components=stored,
                         cdef=[(0, 1, 0), (1, 0, 3), (2, 0, 2),
                               (3, 0, 1)])
    assert np.array_equal(decode_jpeg2000(bs), want)


def test_jp2_cdef_and_cmyk_loud_cases():
    """Premultiplied alpha (cdef Typ 2) and 4 components with neither a
    CMYK colr nor a cdef stay loud; a cdef that misses a channel is
    malformed (ValueError)."""
    rng = np.random.default_rng(265)
    planes = [
        {"data": rng.integers(0, 256, (12, 14)).astype(np.int64)}
        for _ in range(4)
    ]
    pm = encode_jpeg2000(None, nl=1, size=(14, 12), jp2=True,
                         colorspace=16, components=planes,
                         cdef=[(0, 0, 1), (1, 0, 2), (2, 0, 3),
                               (3, 2, 0)])
    with pytest.raises(NotImplementedError):
        decode_jpeg2000(pm)
    bare = encode_jpeg2000(None, nl=1, size=(14, 12), jp2=True,
                           colorspace=16, components=planes)
    with pytest.raises(NotImplementedError):
        decode_jpeg2000(bare)
    short = encode_jpeg2000(None, nl=1, size=(14, 12), jp2=True,
                            colorspace=16, components=planes,
                            cdef=[(0, 0, 1), (1, 0, 2), (2, 0, 3)])
    with pytest.raises(ValueError):
        decode_jpeg2000(short)


def test_pdf_jpx_cmyk_image():
    """A CMYK JPX (colr enum 12) inside a PDF JPXDecode image XObject —
    the print-pipeline scan shape — decodes through the ingest path."""
    from ai_invoice_ocr_engine_spark.kernels import decode_image
    from ai_invoice_ocr_engine_spark.pdf import pdf_spans

    from .test_pdf import _raw_pdf

    rng = np.random.default_rng(266)
    w, h = 24, 18
    cmyk = rng.integers(0, 256, (h, w, 4)).astype(np.int64)
    payload = encode_jpeg2000(None, nl=1, size=(w, h), jp2=True,
                              colorspace=12,
                              components=[{"data": cmyk[..., i]}
                                          for i in range(4)])
    obj = (
        f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
        "/BitsPerComponent 8 /ColorSpace /DeviceCMYK "
        "/Filter /JPXDecode "
        f"/Length {len(payload)} >>\nstream\n"
        + payload.decode("latin-1")
        + "\nendstream"
    )
    content = b"q 24 0 0 18 50 600 cm /Im0 Do Q"
    blob = _raw_pdf(content, extra_objs=obj,
                    font="/XObject << /Im0 5 0 R >>")
    _spans, media = pdf_spans(blob)
    out = decode_image(next(iter(media.values())))
    assert out.shape == (h, w)
    assert np.array_equal(out, decode_jpeg2000(payload))


def test_random_knob_matrix_soak():
    """Randomized cross-knob soak (tiles x precincts x POC-free
    progressions x layers x bypass x ROI x split-parts x component
    domain): 45 seeded combinations per run; tools/jpx_soak.py runs the
    same generator at 300+ for release sweeps (1,600+ clean on record)."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, ".")
    soak = importlib.import_module("tools.jpx_soak")
    rng = __import__("numpy").random.default_rng(20260820)
    for i in range(45):
        if i % 3 == 2:
            soak.component_case(rng, i)
        else:
            soak.one_case(rng, i)
