"""BMP and TIFF codecs, pure numpy + stdlib — completing the reference's
accepted-format list (/root/reference/engine.py:46: png/jpg/jpeg/bmp/tiff;
polymorphic imread at /root/reference/utils/image.py:4-11).

Scope mirrors what a scanner/export pipeline actually emits:
  BMP: uncompressed BI_RGB (1/2/4/8-bit paletted, 16-bit 555, 24-bit,
       32-bit, bottom-up or top-down rows), BI_BITFIELDS with ANY valid
       mask triple (contiguous, non-overlapping, in-range — 565/555,
       4-4-4, 2-10-10-10, byte-reversed 32-bit, ...; invalid masks are
       corrupt → ValueError), BI_RLE8 and BI_RLE4.
  TIFF: uncompressed, LZW (early-change), Deflate (zlib strips),
        PackBits, new-style JPEG (compression 7, strip- or tile-organized,
        with or without a shared JPEGTables tag) and old-style JPEG
        (compression 6 via JPEGInterchangeFormat — the form real writers
        emit), CCITT fax G4/T.6 (compression 4) + MH (compression 2) and
        1-bit packed bilevel via fax.py, chunky planar, 8-bit grayscale
        (white/black-is-zero) or RGB(A), strip- OR tile-organized, either
        byte order, horizontal-differencing predictor. The CCITT fax
        family (MH / G3 1D+2D / G4) is fully covered. Sample layouts:
        4-bit gray (packed nibbles), 8-bit gray, 16-bit gray/RGB (high
        byte kept, predictor-2 aware), 4/8-bit palette via ColorMap,
        and planar configuration 2 for 8/16-bit strip-organized RGB.
Malformed containers raise ValueError (same contract as decode_png).
Color goes through kernels.rgb_to_gray — one grayscale definition for
every codec in the engine.
"""

from __future__ import annotations

import struct

import numpy as np


#: the 32-bit BGRA byte layout BI_RGB implies (fast slice path)
_BMP32_STD = (0x00FF0000, 0x0000FF00, 0x000000FF)


def _check_masks(masks: tuple, bpp: int) -> None:
    """Validate a BI_BITFIELDS RGB mask triple: each mask non-zero,
    within the pixel width, a single contiguous bit run, and pairwise
    non-overlapping. Anything else is a corrupt header (the spec allows
    no such file), so the error is ValueError, not a seam."""
    limit = (1 << bpp) - 1
    seen = 0
    for m in masks:
        if m == 0 or m > limit:
            raise ValueError(f"BMP bitfields mask {m:#x} out of range for {bpp}-bit")
        if m & seen:
            raise ValueError("overlapping BMP bitfields masks")
        seen |= m
        mx = m >> ((m & -m).bit_length() - 1)
        if mx & (mx + 1):
            raise ValueError(f"non-contiguous BMP bitfields mask {m:#x}")


def _mask_channel(vals: np.ndarray, mask: int) -> np.ndarray:
    """Extract a masked channel and scale to 0..255 (v*255/maxv)."""
    if mask == 0:
        return np.zeros(vals.shape, np.uint8)
    shift = (mask & -mask).bit_length() - 1
    mx = mask >> shift
    ch = (vals >> shift) & mx
    return ((ch.astype(np.uint64) * 255) // mx).astype(np.uint8)


def decode_bmp(data: bytes) -> np.ndarray:
    from .kernels import rgb_to_gray

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    try:
        pix_off = struct.unpack_from("<I", data, 10)[0]
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        core = hdr_size == 12
        if core:
            # OS/2 BITMAPCOREHEADER: 16-bit unsigned dims (always
            # bottom-up), no compression field, 3-byte palette entries
            w, h_signed = struct.unpack_from("<HH", data, 18)
            planes, bpp = struct.unpack_from("<HH", data, 22)
            compression = 0
            if bpp not in (1, 4, 8, 24):
                raise ValueError(f"{bpp}-bit core-header BMP is malformed")
        elif hdr_size < 40:
            raise NotImplementedError("BMP core-header variant unsupported")
        else:
            w, h_signed = struct.unpack_from("<ii", data, 18)
            planes, bpp = struct.unpack_from("<HH", data, 26)
            compression = struct.unpack_from("<I", data, 30)[0]
        if compression not in (0, 1, 2, 3):
            # BI_RGB / BI_RLE8 / BI_RLE4 / BI_BITFIELDS
            raise NotImplementedError(f"BMP compression {compression} unsupported")
        masks = None
        if compression == 3:
            # the mask triple sits right after the 40-byte info header
            # (BITMAPV4/V5 embed it at the same offset inside the header)
            masks = struct.unpack_from("<III", data, 14 + 40)
            if bpp not in (16, 32):
                raise ValueError(f"BI_BITFIELDS with {bpp}-bit pixels is malformed")
            _check_masks(masks, bpp)
        if compression == 1 and bpp != 8:
            raise ValueError("BI_RLE8 requires 8-bit BMP")
        if compression == 2 and bpp != 4:
            raise ValueError("BI_RLE4 requires 4-bit BMP")
        if bpp not in (1, 2, 4, 8, 16, 24, 32):
            raise NotImplementedError(f"{bpp}-bit BMP unsupported")
        if w <= 0 or h_signed == 0:
            raise ValueError("BMP has empty dimensions")
        top_down = h_signed < 0
        h = abs(h_signed)
        from .kernels import _check_dims

        _check_dims(w, h, "BMP")
        pal = None
        if bpp <= 8 and core:
            n_colors = 1 << bpp
            raw_pal = np.frombuffer(
                data, np.uint8, count=n_colors * 3, offset=26
            ).reshape(n_colors, 3)  # BGR triples
            pal = np.concatenate(
                [raw_pal, np.zeros((n_colors, 1), np.uint8)], axis=1
            )
        elif bpp <= 8:
            n_colors = struct.unpack_from("<I", data, 46)[0] or (1 << bpp)
            # the 12 mask bytes precede the palette only for the plain
            # 40-byte header; V4/V5 headers already contain them
            pal_off = 14 + hdr_size + (
                12 if (compression == 3 and hdr_size == 40) else 0
            )
            pal = np.frombuffer(
                data, np.uint8, count=n_colors * 4, offset=pal_off
            ).reshape(n_colors, 4)  # BGRA
        if compression == 1:
            rows = _decode_rle8(data, pix_off, w, h)
        elif compression == 2:
            rows = _decode_rle4(data, pix_off, w, h)
        else:
            row_bytes = ((w * bpp + 31) // 32) * 4
            need = row_bytes * h
            raw = np.frombuffer(data, np.uint8, count=need, offset=pix_off)
            rows = raw.reshape(h, row_bytes)
    except struct.error as e:
        raise ValueError(f"corrupt BMP: {e}") from e
    except IndexError as e:
        raise ValueError(f"corrupt BMP: {e}") from e
    if not top_down:
        rows = rows[::-1]
    if bpp in (1, 2, 4) and compression == 0:
        # sub-byte palette indices, MSB-first within each byte
        bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
        if bpp == 1:
            idx = bits
        else:
            g = bits.reshape(h, w, bpp)
            idx = g[..., 0]
            for k in range(1, bpp):
                idx = (idx << 1) | g[..., k]
        idx = idx.astype(np.uint8)
    elif bpp <= 8:
        idx = rows[:, :w]
    if bpp <= 8:
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP pixel index outside the palette")
        rgb = pal[idx][:, :, [2, 1, 0]]  # BGRA -> RGB
        return rgb_to_gray(np.ascontiguousarray(rgb))
    if bpp == 16:
        if masks is None:
            masks = (0x7C00, 0x03E0, 0x001F)  # BI_RGB 16-bit default is 555
        vals = rows[:, : w * 2].reshape(h, w, 2)
        v16 = vals[..., 0].astype(np.uint16) | (vals[..., 1].astype(np.uint16) << 8)
        rgb = np.stack([_mask_channel(v16, m) for m in masks], axis=2)
        return rgb_to_gray(np.ascontiguousarray(rgb))
    nch = bpp // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    if bpp == 32 and masks is not None and masks != _BMP32_STD:
        v32 = (
            px[..., 0].astype(np.uint32)
            | (px[..., 1].astype(np.uint32) << 8)
            | (px[..., 2].astype(np.uint32) << 16)
            | (px[..., 3].astype(np.uint32) << 24)
        )
        rgb = np.stack([_mask_channel(v32, m) for m in masks], axis=2)
        return rgb_to_gray(np.ascontiguousarray(rgb))
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    return rgb_to_gray(np.ascontiguousarray(rgb))


def _decode_rle4(data: bytes, pos: int, w: int, h: int) -> np.ndarray:
    """BI_RLE4 → (h, w) index rows, bottom-up order as stored: encoded runs
    alternate two nibbles; escapes 0=EOL, 1=EOD, 2=delta, n>=3 absolute
    (nibbles packed high-first, padded to a word boundary)."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    n = len(data)
    while pos + 1 < n:
        b0 = data[pos]
        b1 = data[pos + 1]
        pos += 2
        if b0 > 0:  # encoded run: alternate high/low nibble of b1
            hi, lo = b1 >> 4, b1 & 0xF
            end = min(x + b0, w)
            for k in range(end - x):
                out[y, x + k] = hi if k % 2 == 0 else lo
            x = end
        elif b1 == 0:  # end of line
            x = 0
            y += 1
            if y >= h:
                break
        elif b1 == 1:  # end of data
            return out
        elif b1 == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("BMP RLE4 delta truncated")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
            if y >= h:
                raise ValueError("BMP RLE4 delta out of bounds")
        else:  # absolute run of b1 nibbles
            cnt = b1
            nbytes = (cnt + 1) // 2
            if pos + nbytes > n:
                raise ValueError("BMP RLE4 absolute run truncated")
            end = min(x + cnt, w)
            for k in range(end - x):
                byte = data[pos + k // 2]
                out[y, x + k] = (byte >> 4) if k % 2 == 0 else (byte & 0xF)
            x = end
            pos += nbytes + (nbytes & 1)
    return out


def _decode_rle8(data: bytes, pos: int, w: int, h: int) -> np.ndarray:
    """BI_RLE8 → (h, w) index rows, bottom-up order as stored: encoded runs,
    escapes 0=EOL, 1=EOD, 2=delta(dx,dy), n>=3 absolute (word-aligned)."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    n = len(data)
    while pos + 1 < n:
        b0 = data[pos]
        b1 = data[pos + 1]
        pos += 2
        if b0 > 0:  # encoded run
            end = min(x + b0, w)
            out[y, x:end] = b1
            x = end
        elif b1 == 0:  # end of line
            x = 0
            y += 1
            if y >= h:
                break
        elif b1 == 1:  # end of data
            return out
        elif b1 == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("BMP RLE8 delta truncated")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
            if y >= h:
                raise ValueError("BMP RLE8 delta out of bounds")
        else:  # absolute run of b1 pixels, padded to a word boundary
            cnt = b1
            if pos + cnt > n:
                raise ValueError("BMP RLE8 absolute run truncated")
            end = min(x + cnt, w)
            out[y, x:end] = np.frombuffer(data, np.uint8, count=end - x, offset=pos)
            x = end
            pos += cnt + (cnt & 1)
    return out


def encode_bmp_rle8(img: np.ndarray) -> bytes:
    """8-bit grayscale-palette BI_RLE8 BMP (fixture writer): encoded runs
    for repeats >=2, absolute packets otherwise, EOL per row, EOD at end."""
    assert img.ndim == 2 and img.dtype == np.uint8
    h, w = img.shape
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 2 or w - x == 1:
                body += bytes([run, int(row[x])])
                x += run
                continue
            j = x + 1
            while j < w and (j - x) < 255:
                if j + 1 < w and row[j] == row[j + 1]:
                    break
                j += 1
            cnt = j - x
            if cnt < 3:  # absolute packets need >= 3; emit encoded singles
                for k in range(cnt):
                    body += bytes([1, int(row[x + k])])
            else:
                body += bytes([0, cnt]) + row[x:j].tobytes()
                if cnt & 1:
                    body += b"\x00"
            x = j
        body += b"\x00\x00"  # end of line
    body += b"\x00\x01"  # end of data
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    pix_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack(
        "<IHHI", pix_off + len(body), 0, 0, pix_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body), 2835, 2835, 256, 0)
    return bytes(hdr) + pal + bytes(body)


def encode_bmp(img: np.ndarray) -> bytes:
    """8-bit grayscale-palette bottom-up BI_RGB BMP (fixture writer)."""
    assert img.ndim == 2 and img.dtype == np.uint8
    h, w = img.shape
    row_bytes = (w + 3) & ~3
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    pix_off = 14 + 40 + len(pal)
    body = bytearray()
    pad = bytes(row_bytes - w)
    for y in range(h - 1, -1, -1):
        body += img[y].tobytes() + pad
    hdr = b"BM" + struct.pack(
        "<IHHI", pix_off + len(body), 0, 0, pix_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0)
    return bytes(hdr) + pal + bytes(body)


def _bmp_header(w: int, h: int, bpp: int, compression: int, body_len: int,
                pal: bytes, masks: tuple | None = None) -> bytes:
    extra = struct.pack("<III", *masks) if masks else b""
    pix_off = 14 + 40 + len(extra) + len(pal)
    n_colors = len(pal) // 4
    hdr = b"BM" + struct.pack("<IHHI", pix_off + body_len, 0, 0, pix_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                       body_len, 2835, 2835, n_colors, 0)
    return hdr + extra + pal


def encode_bmp_lowbit(idx: np.ndarray, bpp: int,
                      palette: np.ndarray | None = None) -> bytes:
    """1-, 2- or 4-bit paletted bottom-up BMP (fixture writer). ``idx``:
    (h, w) palette indices < 2^bpp; default palette is the gray ramp."""
    assert bpp in (1, 2, 4) and idx.ndim == 2
    h, w = idx.shape
    n = 1 << bpp
    assert int(idx.max(initial=0)) < n
    if palette is None:
        step = 255 // (n - 1)
        palette = np.stack([np.arange(n) * step] * 3, axis=1).astype(np.uint8)
    pal = b"".join(bytes([int(b), int(g), int(r), 0]) for r, g, b in palette)
    row_bytes = ((w * bpp + 31) // 32) * 4
    body = bytearray()
    per_byte = 8 // bpp
    for y in range(h - 1, -1, -1):
        vals = np.zeros(row_bytes * per_byte, np.uint8)
        vals[:w] = idx[y]
        packed = np.zeros(row_bytes, np.uint8)
        for k in range(per_byte):
            packed |= vals[k::per_byte] << (8 - bpp * (k + 1))
        body += packed.tobytes()
    return _bmp_header(w, h, bpp, 0, len(body), pal) + bytes(body)


def encode_bmp_bitfields(img_rgb: np.ndarray, bpp: int,
                         masks: tuple) -> bytes:
    """BI_BITFIELDS BMP with an arbitrary valid mask triple, 16- or
    32-bit pixels (fixture writer). Each 8-bit source channel is mapped
    into its mask's bit width by truncation (nbits<=8) or left shift
    (nbits>8) — the analytic inverse of decode's v*255//maxv scaling."""
    assert img_rgb.ndim == 3 and img_rgb.shape[2] == 3 and bpp in (16, 32)
    _check_masks(masks, bpp)
    h, w = img_rgb.shape[:2]
    v = np.zeros((h, w), np.uint32)
    for ch, mask in zip(range(3), masks):
        shift = (mask & -mask).bit_length() - 1
        nbits = (mask >> shift).bit_length()
        c = img_rgb[..., ch].astype(np.uint32)
        c = (c >> (8 - nbits)) if nbits <= 8 else (c << (nbits - 8))
        v |= c << shift
    nch = bpp // 8
    row_bytes = ((w * nch + 3) // 4) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = np.zeros(row_bytes, np.uint8)
        for k in range(nch):
            row[k : w * nch : nch] = (v[y] >> (8 * k)) & 0xFF
        body += row.tobytes()
    return _bmp_header(w, h, bpp, 3, len(body), b"", masks) + bytes(body)


def encode_bmp16(img_rgb: np.ndarray, fmt: str = "565") -> bytes:
    """16-bit BMP (fixture writer): '565' via BI_BITFIELDS masks, '555'
    via plain BI_RGB. ``img_rgb``: (h, w, 3) uint8 — channel low bits are
    truncated by the format."""
    assert img_rgb.ndim == 3 and img_rgb.shape[2] == 3
    h, w = img_rgb.shape[:2]
    r = img_rgb[..., 0].astype(np.uint16)
    g = img_rgb[..., 1].astype(np.uint16)
    b = img_rgb[..., 2].astype(np.uint16)
    if fmt == "565":
        v = ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
        masks = (0xF800, 0x07E0, 0x001F)
        comp = 3
    elif fmt == "555":
        v = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
        masks = None
        comp = 0
    else:
        raise ValueError(f"unknown 16-bit format {fmt!r}")
    row_bytes = ((w * 16 + 31) // 32) * 4
    body = bytearray()
    pad = bytes(row_bytes - w * 2)
    for y in range(h - 1, -1, -1):
        body += v[y].astype("<u2").tobytes() + pad
    return _bmp_header(w, h, 16, comp, len(body), b"", masks) + bytes(body)


def encode_bmp_rle4(idx: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """4-bit BI_RLE4 BMP (fixture writer): encoded nibble-pair runs for
    repeats, absolute packets otherwise; EOL per row, EOD at end."""
    assert idx.ndim == 2 and int(idx.max(initial=0)) < 16
    h, w = idx.shape
    if palette is None:
        palette = np.stack([np.arange(16) * 17] * 3, axis=1).astype(np.uint8)
    pal = b"".join(bytes([int(b), int(g), int(r), 0]) for r, g, b in palette)
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = idx[y]
        x = 0
        while x < w:
            a = int(row[x])
            b = int(row[x + 1]) if x + 1 < w else a
            # encoded run = alternating a,b,a,b,... pattern
            run = 1
            while (
                x + run < w and run < 254
                and int(row[x + run]) == (a if run % 2 == 0 else b)
            ):
                run += 1
            if run >= 3 or w - x <= 2:
                run = min(run, w - x)
                body += bytes([run, (a << 4) | (b if run > 1 else a)])
                x += run
                continue
            # absolute packet up to the next >=3 alternating repeat
            j = x + 1
            while j < w and (j - x) < 254:
                if j + 2 < w and int(row[j + 2]) == int(row[j]):
                    break
                j += 1
            cnt = j - x
            if cnt < 3:  # absolute packets need >= 3; emit encoded singles
                for k in range(cnt):
                    body += bytes([1, int(row[x + k]) << 4])
                x = j
                continue
            body += bytes([0, cnt])
            nib = np.zeros(((cnt + 1) // 2) * 2, np.uint8)
            nib[:cnt] = row[x:j]
            packed = ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8).tobytes()
            body += packed
            if len(packed) & 1:
                body += b"\x00"
            x = j
        body += b"\x00\x00"  # end of line
    body += b"\x00\x01"  # end of data
    return _bmp_header(w, h, 4, 2, len(body), pal) + bytes(body)


_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 284: "planar",
    317: "predictor", 322: "tile_w", 323: "tile_h",
    324: "tile_offsets", 325: "tile_counts",
    292: "t4_options", 320: "colormap",
    347: "jpeg_tables", 513: "jpeg_if", 514: "jpeg_if_len",
}


def _lzw_decode(src: bytes, early: int = 1) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first code packing, 9→12-bit codes,
    Clear=256, EOI=257, with the de-facto-standard 'early change' (the code
    width bumps one code early — the libtiff convention every real writer
    follows). ``early=0`` is the PDF LZWDecode /EarlyChange 0 layout where
    the width bumps exactly when the table fills the current width."""
    out = bytearray()
    nbits_total = len(src) * 8
    bitpos = 0

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits_total:
            return 257  # ran off the end: treat as EOI
        bi = bitpos >> 3
        chunk = int.from_bytes(src[bi : bi + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        return code

    CLEAR, EOI = 256, 257
    table: list[bytes] = []
    width = 9
    prev = b""
    while True:
        code = read_code(width)
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            code = read_code(width)
            if code == EOI:
                break
            if code >= 256:
                raise ValueError("corrupt LZW: entry code after Clear")
            prev = table[code]
            out += prev
            continue
        if code == EOI:
            break
        if not table:
            raise ValueError("LZW stream missing Clear code")
        if code < len(table):
            entry = table[code]
            if not entry:
                raise ValueError("corrupt LZW code")
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        table.append(prev + entry[:1])
        # early change, adjusted for the decoder's one-entry lag behind the
        # encoder (the encoder bumps when ITS next code hits (1<<w)-early)
        if len(table) == (1 << width) - 1 - early and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(raw: bytes, early: int = 1) -> bytes:
    """TIFF-variant LZW writer (fixture side), mirroring _lzw_decode's
    early-change convention (``early=0`` = PDF /EarlyChange 0)."""
    out = bytearray()
    buf = 0
    nb = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nb
        buf = (buf << width) | code
        nb += width
        while nb >= 8:
            nb -= 8
            out.append((buf >> nb) & 0xFF)

    CLEAR, EOI = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for byte in raw:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - early and width < 12:  # early change
            width += 1
        if next_code == 4094:  # table nearly full: reset
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
        # the decoder appends a table entry for this final code too, which
        # can cross the early-change boundary — EOI must be written at the
        # width the decoder will read it with (review finding r3: streams
        # ending exactly at a width boundary were undecodable)
        next_code += 1
        if next_code == (1 << width) - early and width < 12:
            width += 1
    emit(EOI, width)
    if nb:
        out.append((buf << (8 - nb)) & 0xFF)
    return bytes(out)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}


def _tiff_values(data, bo, typ, count, value_field):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF field type {typ} unsupported")
    fmt = {1: "B", 3: "H", 4: "I", 7: "B"}.get(typ)
    if fmt is None:
        raise NotImplementedError(f"TIFF field type {typ} unsupported here")
    total = size * count
    if total <= 4:
        buf = value_field[:total]
    else:
        off = struct.unpack(bo + "I", value_field)[0]
        buf = data[off : off + total]
        if len(buf) != total:
            raise ValueError("TIFF value block truncated")
    return list(struct.unpack(bo + fmt * count, buf))


def decode_tiff(data: bytes) -> np.ndarray:
    from .kernels import rgb_to_gray

    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    try:
        ifd_off = struct.unpack_from(bo + "I", data, 4)[0]
        n_entries = struct.unpack_from(bo + "H", data, ifd_off)[0]
        tags: dict[str, list[int]] = {}
        for i in range(n_entries):
            base = ifd_off + 2 + i * 12
            tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
            name = _TIFF_TAGS.get(tag)
            if name is None:
                continue
            vals = _tiff_values(data, bo, typ, count, data[base + 8 : base + 12])
            if not vals:  # count=0 tags are malformed noise; ignore them
                continue
            tags[name] = vals
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt TIFF: {e}") from e
    comp = tags.get("compression", [1])[0]
    if comp not in (1, 2, 3, 4, 5, 6, 7, 8, 32946, 32773):
        # 1=uncompressed, 2=CCITT MH, 3=G3/T.4 with EOLs, 4=CCITT G4,
        # 5=LZW, 6=old-JPEG, 7=JPEG, 8/32946=Deflate, 32773=PackBits
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
    predictor = tags.get("predictor", [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    jpeg_mode = comp in (6, 7)
    bits = tags.get("bits", [8])
    bilevel = bits == [1]
    sbits = bits[0]
    spp = tags.get("spp", [1])[0]
    if not jpeg_mode:
        # JPEG chunks carry their own precision/color model in the stream
        if bilevel:
            if comp not in (1, 2, 3, 4):
                raise NotImplementedError(
                    f"1-bit TIFF with compression {comp} unsupported"
                )
        elif any(b != sbits for b in bits) or sbits not in (4, 8, 16):
            raise NotImplementedError(f"TIFF bit depths {bits} unsupported")
        if sbits == 4 and spp != 1:
            raise NotImplementedError("4-bit TIFF requires 1 sample per pixel")
    if comp in (2, 3, 4) and not bilevel:
        raise ValueError(f"CCITT compression {comp} requires 1-bit samples")
    photometric = tags.get("photometric", [1])[0]
    ok_photo = (0, 1, 2, 6) if jpeg_mode else (0, 1, 2, 3)
    if photometric not in ok_photo or spp not in (1, 3, 4):
        raise NotImplementedError(
            f"TIFF photometric {photometric} / spp {spp} unsupported"
        )
    if photometric == 3:
        # palette: sub-16-bit single-sample indices into a ColorMap
        if bilevel or jpeg_mode or sbits == 16 or spp != 1:
            raise NotImplementedError("TIFF palette variant unsupported")
        if "colormap" not in tags:
            raise ValueError("palette TIFF missing ColorMap")
        if len(tags["colormap"]) < 3 * (1 << sbits):
            raise ValueError("palette TIFF ColorMap truncated")
    if bilevel and spp != 1:
        raise NotImplementedError("1-bit TIFF requires 1 sample per pixel")
    planar = tags.get("planar", [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar} unsupported")
    if spp == 1:
        planar = 1  # planar layout is meaningless for one sample per pixel
    if planar == 2 and (jpeg_mode or "tile_offsets" in tags or sbits == 4):
        raise NotImplementedError(
            "TIFF planar configuration 2 only for 8/16-bit strip-organized samples"
        )
    try:
        w = tags["width"][0]
        h = tags["height"][0]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag: {e}") from e
    from .kernels import _check_dims

    _check_dims(w, h, "TIFF")

    if comp == 6:
        # Old-style JPEG (TIFF 6.0 §22) in its one sane incarnation: the
        # whole interchange-format stream at JPEGInterchangeFormat (513) —
        # what every real old-style writer emits. Per-strip old-style
        # (JPEGProc/Q-table tags) stays a loud seam.
        from .jpeg import decode_jpeg

        if "jpeg_if" not in tags:
            raise NotImplementedError(
                "old-style JPEG TIFF without JPEGInterchangeFormat unsupported"
            )
        off = tags["jpeg_if"][0]
        ln = tags.get("jpeg_if_len", [len(data) - off])[0]
        g = decode_jpeg(data[off : off + ln])
        if g.shape != (h, w):
            raise ValueError("TIFF JPEGInterchangeFormat dimensions mismatch")
        return g

    tiled = "tile_offsets" in tags
    if tiled:
        try:
            tw = tags["tile_w"][0]
            tl = tags["tile_h"][0]
            offsets = tags["tile_offsets"]
            counts = tags["tile_counts"]
        except KeyError as e:
            raise ValueError(f"tiled TIFF missing required tag: {e}") from e
        if tw % 16 or tl % 16 or tw == 0 or tl == 0:
            raise ValueError("TIFF tile dimensions must be positive multiples of 16")
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + tl - 1) // tl
        if min(len(offsets), len(counts)) < tiles_across * tiles_down:
            raise ValueError("TIFF tile index truncated")
    else:
        try:
            offsets = tags["strip_offsets"]
            counts = tags["strip_counts"]
        except KeyError as e:
            raise ValueError(f"TIFF missing required tag: {e}") from e
        rps = tags.get("rows_per_strip", [h])[0] or h

    jpeg_tables = None
    if jpeg_mode and "jpeg_tables" in tags:
        jpeg_tables = bytes(bytearray(tags["jpeg_tables"]))

    def decode_chunk(off: int, cnt: int, cw: int, ch: int,
                     spp_c: int = spp) -> np.ndarray:
        """One strip/tile → (ch, cw, spp_c) uint8 samples (JPEG chunks →
        spp=1 gray; 4-bit → raw 0..15 indices; 16-bit → high byte)."""
        chunk = data[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF chunk truncated")
        if comp == 7:
            from .jpeg import decode_jpeg

            g = decode_jpeg(_merge_jpeg_tables(jpeg_tables, chunk))
            if g.shape != (ch, cw):
                raise ValueError("TIFF JPEG chunk dimensions mismatch")
            return g[:, :, None]
        if comp in (2, 3, 4):  # CCITT fax, 1 = black ("min" under photometric 0)
            from .fax import decode_g4, decode_mh, decode_t4

            if comp == 4:
                mask = decode_g4(chunk, cw, ch)
            elif comp == 3:
                t4opts = tags.get("t4_options", [0])[0]
                mask = decode_t4(chunk, cw, ch, two_d=bool(t4opts & 1))
            else:
                mask = decode_mh(chunk, cw, ch)
            return (mask * 255).astype(np.uint8)[:, :, None]
        if comp in (8, 32946):  # Deflate (zlib-wrapped)
            import zlib

            try:
                chunk = zlib.decompress(chunk)
            except zlib.error as e:
                raise ValueError(f"corrupt deflate TIFF chunk: {e}") from e
        elif comp == 32773:  # PackBits RLE
            chunk = _unpackbits(chunk)
        elif comp == 5:  # LZW
            chunk = _lzw_decode(chunk)
        if bilevel:  # comp 1, 1-bit packed rows (MSB first, rows byte-padded)
            row_bytes = (cw + 7) // 8
            need = ch * row_bytes
            if len(chunk) < need:
                raise ValueError("TIFF pixel data truncated")
            packed = np.frombuffer(bytes(chunk), np.uint8, count=need)
            unpacked = np.unpackbits(packed.reshape(ch, row_bytes), axis=1)[:, :cw]
            return (unpacked * 255).astype(np.uint8)[:, :, None]
        if sbits == 4:  # packed nibbles, MSB first, rows byte-padded
            row_bytes = (cw + 1) // 2
            need = ch * row_bytes
            if len(chunk) < need:
                raise ValueError("TIFF pixel data truncated")
            packed = np.frombuffer(bytes(chunk), np.uint8, count=need).reshape(
                ch, row_bytes
            )
            nib = np.empty((ch, row_bytes * 2), np.uint8)
            nib[:, 0::2] = packed >> 4
            nib[:, 1::2] = packed & 0xF
            px = nib[:, :cw][:, :, None]
            if predictor == 2:
                px = (np.cumsum(px.astype(np.int64), axis=1) & 0xF).astype(np.uint8)
            return px
        if sbits == 16:  # file byte order; downscale to the high byte
            cnt16 = ch * cw * spp_c
            if len(chunk) < cnt16 * 2:
                raise ValueError("TIFF pixel data truncated")
            arr = np.frombuffer(
                bytes(chunk), np.dtype(bo + "u2"), count=cnt16
            ).reshape(ch, cw, spp_c)
            if predictor == 2:
                arr = np.cumsum(arr.astype(np.int64), axis=1) & 0xFFFF
            return (arr >> 8).astype(np.uint8)
        need = ch * cw * spp_c
        if len(chunk) < need:
            raise ValueError("TIFF pixel data truncated")
        px = np.frombuffer(bytes(chunk), np.uint8, count=need).reshape(ch, cw, spp_c)
        if predictor == 2:  # horizontal differencing per scanline
            px = (np.cumsum(px.astype(np.int64), axis=1) & 0xFF).astype(np.uint8)
        return px

    out_spp = 1 if comp == 7 else spp
    if tiled:
        px = np.zeros((tiles_down * tl, tiles_across * tw, out_spp), np.uint8)
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                k = ty * tiles_across + tx
                tile = decode_chunk(offsets[k], counts[k], tw, tl)
                px[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = tile
        px = px[:h, :w]
    elif planar == 2:
        # planar strips: all of plane 0's strips, then plane 1's, ...
        strips_per_plane = (h + rps - 1) // rps
        if min(len(offsets), len(counts)) < spp * strips_per_plane:
            raise ValueError("TIFF planar strip index truncated")
        planes = []
        for p in range(spp):
            parts = []
            remaining = h
            for k in range(strips_per_plane):
                ch = min(rps, remaining)
                if ch <= 0:
                    break
                i = p * strips_per_plane + k
                parts.append(decode_chunk(offsets[i], counts[i], w, ch, spp_c=1))
                remaining -= ch
            if remaining > 0:
                raise ValueError("TIFF pixel data truncated")
            planes.append(parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0))
        px = np.concatenate(planes, axis=2)
    else:
        parts = []
        remaining = h
        for off, cnt in zip(offsets, counts):
            ch = min(rps, remaining)
            if ch <= 0:
                break
            parts.append(decode_chunk(off, cnt, w, ch))
            remaining -= ch
        if remaining > 0:
            raise ValueError("TIFF pixel data truncated")
        px = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
    if photometric == 3:
        n = 1 << sbits
        cm = np.array(tags["colormap"][: 3 * n], np.uint32)
        pal = (cm >> 8).astype(np.uint8).reshape(3, n).T  # 16-bit RGB → 8-bit
        return rgb_to_gray(np.ascontiguousarray(pal[px[:, :, 0]]))
    if out_spp == 1:
        g = px[:, :, 0]
        if sbits == 4 and comp != 7:
            g = (g.astype(np.uint16) * 17).astype(np.uint8)  # 0..15 → 0..255
        if photometric == 0 and comp != 7:  # white-is-zero
            g = 255 - g
        return np.ascontiguousarray(g)
    return rgb_to_gray(np.ascontiguousarray(px[:, :, :3]))


def _merge_jpeg_tables(tables: bytes | None, stream: bytes) -> bytes:
    """Assemble a standalone JPEG from a JPEGTables blob (TIFF tag 347,
    abbreviated table-specification stream: SOI, DQT/DHT segments, EOI) and
    an abbreviated per-chunk stream (SOI, frame/scan without the shared
    tables). Writers that embed full streams pass through unchanged when no
    tables blob exists; with one, the tables are spliced after the chunk's
    SOI (the decoder reads tables in order, so chunk-local tables still
    override the shared ones — TIFF-EP's prescribed semantics)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("TIFF JPEG chunk missing SOI")
    if not tables:
        return stream
    if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
        raise ValueError("corrupt JPEGTables blob")
    return stream[:2] + tables[2:-2] + stream[2:]


def _packbits(raw: bytes, row_bytes: int) -> bytes:
    """PackBits encoder (fixture side): runs of >=3 equal bytes become
    repeat packets, everything else literal packets; rows packed
    independently (the common writer convention)."""
    out = bytearray()
    for r0 in range(0, len(raw), row_bytes):
        row = raw[r0 : r0 + row_bytes]
        i = 0
        n = len(row)
        while i < n:
            run = 1
            while i + run < n and run < 128 and row[i + run] == row[i]:
                run += 1
            if run >= 3:
                out.append(257 - run)
                out.append(row[i])
                i += run
                continue
            # literal run up to the next >=3 repeat (or 128 bytes)
            j = i + 1
            while j < n and (j - i) < 128:
                if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += row[i:j]
            i = j
    return bytes(out)


def _unpackbits(src: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): n in 0..127 → copy n+1 literal
    bytes; n in -127..-1 → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    ln = len(src)
    while i < ln:
        n = src[i]
        i += 1
        if n < 128:
            if i + n + 1 > ln:
                raise ValueError("PackBits literal run truncated")
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= ln:
                raise ValueError("PackBits repeat run truncated")
            out += src[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _encode_ifd(bo: str, entries, ext_start: int) -> tuple[bytes, bytes]:
    """Serialize IFD entries (tag, typ, values) with out-of-line value
    blocks at ext_start (fixture writer shared by the strip/tile/JPEG
    encoders). values: list[int] or raw bytes for typ 7."""
    ext = bytearray()
    recs = []
    for tag, typ, vals in sorted(entries):
        if isinstance(vals, (bytes, bytearray)):
            count = len(vals)
            raw = bytes(vals)
        else:
            fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
            count = len(vals)
            raw = b"".join(struct.pack(bo + fmt, v) for v in vals)
        if len(raw) <= 4:
            vf = raw.ljust(4, b"\x00")
        else:
            vf = struct.pack(bo + "I", ext_start + len(ext))
            ext += raw
            if len(ext) & 1:
                ext += b"\x00"
        recs.append(struct.pack(bo + "HHI", tag, typ, count) + vf)
    ifd = struct.pack(bo + "H", len(recs)) + b"".join(recs) + struct.pack(bo + "I", 0)
    return ifd, bytes(ext)


def _assemble_tiff(bo: str, chunks: list[bytes], entries) -> bytes:
    """Lay out header + chunk payloads + value blocks + IFD; chunk offsets
    are appended to `entries` by the caller via the returned offset list —
    so this computes offsets first, then builds."""
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    offs = []
    pos = 8
    for c in chunks:
        offs.append(pos)
        pos += len(c) + (len(c) & 1)
    ifd, ext = _encode_ifd(bo, entries(offs), pos)
    out = bytearray(magic)
    out += struct.pack(bo + "I", pos + len(ext))  # IFD after value blocks
    for c in chunks:
        out += c
        if len(c) & 1:
            out += b"\x00"
    out += ext + ifd
    return bytes(out)


def _compress_chunk(raw: bytes, compression: int, row_bytes: int) -> bytes:
    if compression == 8:
        import zlib

        return zlib.compress(raw)
    if compression == 32773:
        return _packbits(raw, row_bytes)
    if compression == 5:
        return _lzw_encode(raw)
    if compression == 1:
        return raw
    raise ValueError(f"encode compression {compression} unsupported")


def encode_tiff_tiled(img: np.ndarray, tile: int = 64, compression: int = 1,
                      big_endian: bool = False) -> bytes:
    """Tile-organized 8-bit grayscale TIFF (fixture writer): tags 322-325,
    edge tiles zero-padded to the tile grid per TIFF 6.0 §15."""
    assert img.ndim == 2 and img.dtype == np.uint8
    assert tile % 16 == 0
    bo = ">" if big_endian else "<"
    h, w = img.shape
    ta = (w + tile - 1) // tile
    td = (h + tile - 1) // tile
    chunks = []
    for ty in range(td):
        for tx in range(ta):
            t = np.zeros((tile, tile), np.uint8)
            blk = img[ty * tile : ty * tile + tile, tx * tile : tx * tile + tile]
            t[: blk.shape[0], : blk.shape[1]] = blk
            chunks.append(_compress_chunk(t.tobytes(), compression, tile))

    def entries(offs):
        return [
            (256, 3, [w]), (257, 3, [h]), (258, 3, [8]),
            (259, 3, [compression]), (262, 3, [1]), (277, 3, [1]),
            (284, 3, [1]), (322, 3, [tile]), (323, 3, [tile]),
            (324, 4, offs), (325, 4, [len(c) for c in chunks]),
        ]

    return _assemble_tiff(bo, chunks, entries)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG stream into (JPEGTables blob, abbreviated stream):
    DQT/DHT segments move to the tables blob (SOI..EOI), the rest keeps its
    order. Inverse of _merge_jpeg_tables up to segment order."""
    assert stream[:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    body = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows, copy the rest
            body += stream[pos:]
            break
        seg_len = 2 + struct.unpack_from(">H", stream, pos + 2)[0]
        seg = stream[pos : pos + seg_len]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            body += seg
        pos += seg_len
    tables += b"\xff\xd9"
    return bytes(tables), bytes(body)


def encode_tiff_jpeg(img: np.ndarray, quality: int = 90, tile: int | None = None,
                     shared_tables: bool = False, big_endian: bool = False) -> bytes:
    """New-style JPEG-in-TIFF (compression 7, fixture writer): one JPEG
    stream per strip (single full-height strip) or per tile; with
    shared_tables the DQT/DHT segments move to tag 347 (JPEGTables) and the
    chunks become abbreviated streams — the TIFF-EP layout scanners emit."""
    from .jpeg import encode_jpeg

    assert img.ndim == 2 and img.dtype == np.uint8
    bo = ">" if big_endian else "<"
    h, w = img.shape
    if tile is None:
        chunks = [encode_jpeg(img, quality=quality)]
    else:
        assert tile % 16 == 0
        ta = (w + tile - 1) // tile
        td = (h + tile - 1) // tile
        chunks = []
        for ty in range(td):
            for tx in range(ta):
                t = np.zeros((tile, tile), np.uint8)
                blk = img[ty * tile : ty * tile + tile, tx * tile : tx * tile + tile]
                t[: blk.shape[0], : blk.shape[1]] = blk
                chunks.append(encode_jpeg(t, quality=quality))
    tables_blob = None
    if shared_tables:
        tables_blob, first = _split_jpeg_tables(chunks[0])
        chunks = [first] + [_split_jpeg_tables(c)[1] for c in chunks[1:]]

    def entries(offs):
        es = [
            (256, 3, [w]), (257, 3, [h]), (258, 3, [8]), (259, 3, [7]),
            (262, 3, [1]), (277, 3, [1]), (284, 3, [1]),
        ]
        if tile is None:
            es += [(273, 4, offs), (278, 3, [h]),
                   (279, 4, [len(c) for c in chunks])]
        else:
            es += [(322, 3, [tile]), (323, 3, [tile]), (324, 4, offs),
                   (325, 4, [len(c) for c in chunks])]
        if tables_blob is not None:
            es.append((347, 7, tables_blob))
        return es

    return _assemble_tiff(bo, chunks, entries)


def encode_tiff_fax(mask: np.ndarray, compression: int = 4,
                    big_endian: bool = False, two_d: bool = False) -> bytes:
    """Bilevel fax TIFF (fixture writer): 1-bit, photometric 0 (white-is-
    zero, the fax convention — stored 1 = black), single strip, CCITT G4
    (compression 4), MH (compression 2), G3/T.4-with-EOLs (compression 3), or packed
    uncompressed (1). ``mask``: (h, w), nonzero = black."""
    from . import fax

    assert mask.ndim == 2
    m = (np.asarray(mask) != 0).astype(np.uint8)
    bo = ">" if big_endian else "<"
    h, w = m.shape
    if compression == 4:
        pix = fax.encode_g4(m)
    elif compression == 3:
        pix = fax.encode_t4(m, two_d=two_d)
    elif compression == 2:
        pix = fax.encode_mh(m)
    elif compression == 1:
        pix = np.packbits(m, axis=1).tobytes()
    else:
        raise ValueError(f"encode_tiff_fax compression {compression} unsupported")

    def entries(offs):
        es = [
            (256, 3, [w]), (257, 3, [h]), (258, 3, [1]),
            (259, 3, [compression]), (262, 3, [0]), (273, 4, offs),
            (277, 3, [1]), (278, 3, [h]), (279, 4, [len(pix)]),
            (284, 3, [1]),
        ]
        if compression == 3 and two_d:
            es.append((292, 4, [1]))  # T4Options: bit 0 = 2D coding
        return es

    return _assemble_tiff(bo, [pix], entries)


def encode_tiff_oldjpeg(img: np.ndarray, quality: int = 90,
                        big_endian: bool = False) -> bytes:
    """Old-style JPEG-in-TIFF (compression 6, fixture writer): the whole
    interchange stream referenced by JPEGInterchangeFormat(513)/Length(514)."""
    from .jpeg import encode_jpeg

    assert img.ndim == 2 and img.dtype == np.uint8
    bo = ">" if big_endian else "<"
    h, w = img.shape
    stream = encode_jpeg(img, quality=quality)

    def entries(offs):
        return [
            (256, 3, [w]), (257, 3, [h]), (258, 3, [8]), (259, 3, [6]),
            (262, 3, [1]), (277, 3, [1]), (284, 3, [1]),
            (513, 4, offs), (514, 4, [len(stream)]),
        ]

    return _assemble_tiff(bo, [stream], entries)


def _tiff_container(bo: str, entries: list, pix: bytes) -> bytes:
    """Assemble magic + pixel data + one IFD. ``entries``: (tag, typ,
    values) with typ 3 (SHORT) or 4 (LONG); multi-value fields spill to
    an out-of-line value area after the IFD."""
    size = {3: 2, 4: 4}
    pix_off = 8
    ifd_off = pix_off + len(pix)
    n = len(entries)
    extra_off = ifd_off + 2 + n * 12 + 4
    extra = bytearray()
    ifd = struct.pack(bo + "H", n)
    for tag, typ, vals in sorted(entries):
        fmt = bo + ("H" if typ == 3 else "I")
        if len(vals) * size[typ] <= 4:
            vf = b"".join(struct.pack(fmt, v) for v in vals).ljust(4, b"\x00")
        else:
            vf = struct.pack(bo + "I", extra_off + len(extra))
            extra += b"".join(struct.pack(fmt, v) for v in vals)
        ifd += struct.pack(bo + "HHI", tag, typ, len(vals)) + vf
    ifd += struct.pack(bo + "I", 0)
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    return magic + struct.pack(bo + "I", ifd_off) + pix + ifd + bytes(extra)


def encode_tiff_ext(img: np.ndarray, *, bits: int = 8,
                    photometric: int | None = None,
                    colormap: np.ndarray | None = None,
                    planar: int = 1, rows_per_strip: int | None = None,
                    big_endian: bool = False, predictor: int = 1) -> bytes:
    """Extended-layout TIFF fixture writer (uncompressed): 4-bit gray,
    16-bit gray/RGB (optionally predictor 2), 4/8-bit palette
    (``colormap``: (n, 3) uint8, widened to the tag's 16-bit entries),
    planar-configuration-2 RGB, multi-strip, either byte order. ``img``:
    (h, w) sample values or (h, w, 3)."""
    bo = ">" if big_endian else "<"
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    assert predictor == 1 or (bits == 16 and (spp == 1 or planar == 2))
    samples = img if img.ndim == 3 else img[:, :, None]
    rps = rows_per_strip or h
    n_strips = (h + rps - 1) // rps

    def pack_rows(rows: np.ndarray) -> bytes:  # (ch, cw) single-plane
        if bits == 4:
            rb = (rows.shape[1] + 1) // 2
            nib = np.zeros((rows.shape[0], rb * 2), np.uint8)
            nib[:, : rows.shape[1]] = rows
            return ((nib[:, 0::2] << 4) | nib[:, 1::2]).tobytes()
        if bits == 16:
            v = rows.astype(np.int64) * 257  # widen 0..255 to 0..65535
            if predictor == 2:
                v = np.diff(v, axis=1, prepend=0) & 0xFFFF
            return v.astype(np.dtype(bo + "u2")).tobytes()
        return rows.astype(np.uint8).tobytes()

    chunks = []
    for p in range(spp) if planar == 2 else [None]:
        for s in range(n_strips):
            rows = samples[s * rps : min((s + 1) * rps, h)]
            if planar == 2:
                chunks.append(pack_rows(rows[:, :, p]))
            elif spp == 1:
                chunks.append(pack_rows(rows[:, :, 0]))
            else:  # chunky multi-sample, 8/16-bit only
                flat = rows.reshape(rows.shape[0], -1)
                chunks.append(pack_rows(flat))
    pix = b"".join(chunks)
    offsets, pos = [], 8
    for c in chunks:
        offsets.append(pos)
        pos += len(c)
    if photometric is None:
        photometric = 3 if colormap is not None else (1 if spp == 1 else 2)
    entries = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, [bits] * spp),
        (259, 3, [1]), (262, 3, [photometric]), (273, 4, offsets),
        (277, 3, [spp]), (278, 3, [rps]),
        (279, 4, [len(c) for c in chunks]), (284, 3, [planar]),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    if colormap is not None:
        n = 1 << bits
        assert colormap.shape == (n, 3)
        cm16 = colormap.astype(np.uint16) << 8 | colormap
        entries.append((320, 3, [int(v) for v in cm16.T.reshape(-1)]))
    return _tiff_container(bo, entries, pix)


def encode_tiff(img: np.ndarray, big_endian: bool = False,
                compression: int = 1) -> bytes:
    """Single-strip 8-bit grayscale TIFF (fixture writer); compression 1
    (none), 5 (LZW), 8 (Deflate) or 32773 (PackBits)."""
    assert img.ndim == 2 and img.dtype == np.uint8
    bo = ">" if big_endian else "<"
    h, w = img.shape
    pix = img.tobytes()
    if compression == 8:
        import zlib

        pix = zlib.compress(pix)
    elif compression == 32773:
        pix = _packbits(img.tobytes(), w)
    elif compression == 5:
        pix = _lzw_encode(pix)
    elif compression != 1:
        raise ValueError(f"encode_tiff compression {compression} unsupported")
    pix_off = 8
    ifd_off = pix_off + len(pix)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, compression),
        (262, 3, 1, 1), (273, 4, 1, pix_off), (277, 3, 1, 1),
        (278, 3, 1, h), (279, 4, 1, len(pix)), (284, 3, 1, 1),
    ]
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, count, val in entries:
        if typ == 3:
            # in-line values are LEFT-justified in the 4-byte field, in
            # file byte order, for either endianness (TIFF 6.0 §2)
            vf = struct.pack(bo + "H", val) + b"\x00\x00"
        else:
            vf = struct.pack(bo + "I", val)
        ifd += struct.pack(bo + "HHI", tag, typ, count) + vf
    ifd += struct.pack(bo + "I", 0)  # next IFD
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    return magic + struct.pack(bo + "I", ifd_off) + pix + ifd
