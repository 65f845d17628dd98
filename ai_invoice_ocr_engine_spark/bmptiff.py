"""BMP and TIFF codecs, pure numpy + stdlib — completing the reference's
accepted-format list (/root/reference/engine.py:46: png/jpg/jpeg/bmp/tiff;
polymorphic imread at /root/reference/utils/image.py:4-11).

Scope mirrors what a scanner/export pipeline actually emits:
  BMP: uncompressed BI_RGB (8-bit paletted / 24-bit / 32-bit, bottom-up
       or top-down rows) and BI_RLE8. RLE4 and 1/4/16-bit raise
       NotImplementedError.
  TIFF: uncompressed, LZW (early-change), Deflate (zlib strips) and
        PackBits compression,
        chunky planar, 8-bit grayscale (white/black-is-zero) or RGB(A),
        strip-organized, either byte order, horizontal-differencing
        predictor. JPEG-in-TIFF, fax codecs and tiles raise
        NotImplementedError.
Malformed containers raise ValueError (same contract as decode_png).
Color goes through kernels.rgb_to_gray — one grayscale definition for
every codec in the engine.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    from .kernels import rgb_to_gray

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    try:
        pix_off = struct.unpack_from("<I", data, 10)[0]
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        if hdr_size < 40:
            raise NotImplementedError("BMP core-header variant unsupported")
        w, h_signed = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
        if compression not in (0, 1, 3):  # BI_RGB / BI_RLE8 / BI_BITFIELDS
            raise NotImplementedError(f"BMP compression {compression} unsupported")
        if compression == 3:
            # bitfields accepted ONLY when the masks declare the standard
            # BGRA layout the fast path assumes — anything else is a loud
            # seam, not silently swapped channels
            masks = struct.unpack_from("<III", data, 14 + 40)
            if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
                raise NotImplementedError(
                    f"BMP bitfields masks {tuple(hex(m) for m in masks)} unsupported"
                )
        if compression == 1 and bpp != 8:
            raise ValueError("BI_RLE8 requires 8-bit BMP")
        if bpp not in (8, 24, 32):
            raise NotImplementedError(f"{bpp}-bit BMP unsupported")
        if w <= 0 or h_signed == 0:
            raise ValueError("BMP has empty dimensions")
        top_down = h_signed < 0
        h = abs(h_signed)
        if bpp == 8:
            n_colors = struct.unpack_from("<I", data, 46)[0] or 256
            pal_off = 14 + hdr_size
            pal = np.frombuffer(
                data, np.uint8, count=n_colors * 4, offset=pal_off
            ).reshape(n_colors, 4)  # BGRA
        if compression == 1:
            rows = _decode_rle8(data, pix_off, w, h)
        else:
            row_bytes = (w * bpp // 8 + 3) & ~3
            need = row_bytes * h
            raw = np.frombuffer(data, np.uint8, count=need, offset=pix_off)
            rows = raw.reshape(h, row_bytes)
    except struct.error as e:
        raise ValueError(f"corrupt BMP: {e}") from e
    except IndexError as e:
        raise ValueError(f"corrupt BMP: {e}") from e
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP pixel index outside the palette")
        rgb = pal[idx][:, :, [2, 1, 0]]  # BGRA -> RGB
        return rgb_to_gray(np.ascontiguousarray(rgb))
    nch = bpp // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    return rgb_to_gray(np.ascontiguousarray(rgb))


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


_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 284: "planar",
    317: "predictor", 322: "tile_w",
}


def _lzw_decode(src: bytes) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first code packing, 9→12-bit codes,
    Clear=256, EOI=257, with the de-facto-standard 'early change' (the code
    width bumps one code early — the libtiff convention every real writer
    follows)."""
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
        # encoder (the encoder bumps when ITS next code hits (1<<w)-1)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF-variant LZW writer (fixture side), mirroring _lzw_decode's
    early-change convention."""
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
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code == 4094:  # table nearly full: reset
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nb:
        out.append((buf << (8 - nb)) & 0xFF)
    return bytes(out)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _tiff_values(data, bo, typ, count, value_field):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF field type {typ} unsupported")
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
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
            tags[name] = _tiff_values(data, bo, typ, count, data[base + 8 : base + 12])
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt TIFF: {e}") from e
    if "tile_w" in tags:
        raise NotImplementedError("tiled TIFF unsupported")
    comp = tags.get("compression", [1])[0]
    if comp not in (1, 5, 8, 32946, 32773):
        # 1=uncompressed, 5=LZW, 8/32946=Deflate, 32773=PackBits;
        # JPEG-in-TIFF and fax codecs remain seams
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
    predictor = tags.get("predictor", [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if tags.get("planar", [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2 unsupported")
    bits = tags.get("bits", [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bit depths {bits} unsupported")
    photometric = tags.get("photometric", [1])[0]
    spp = tags.get("spp", [1])[0]
    if photometric not in (0, 1, 2) or spp not in (1, 3, 4):
        raise NotImplementedError(
            f"TIFF photometric {photometric} / spp {spp} unsupported"
        )
    try:
        w = tags["width"][0]
        h = tags["height"][0]
        offsets = tags["strip_offsets"]
        counts = tags["strip_counts"]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag: {e}") from e
    buf = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = data[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF strip truncated")
        if comp in (8, 32946):  # Deflate (zlib-wrapped) per strip
            import zlib

            try:
                chunk = zlib.decompress(chunk)
            except zlib.error as e:
                raise ValueError(f"corrupt deflate TIFF strip: {e}") from e
        elif comp == 32773:  # PackBits RLE per strip
            chunk = _unpackbits(chunk)
        elif comp == 5:  # LZW per strip
            chunk = _lzw_decode(chunk)
        buf += chunk
    need = h * w * spp
    if len(buf) < need:
        raise ValueError("TIFF pixel data truncated")
    px = np.frombuffer(bytes(buf), np.uint8, count=need).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: undo via modular cumsum
        px = (np.cumsum(px.astype(np.int64), axis=1) & 0xFF).astype(np.uint8)
    if spp == 1:
        g = px[:, :, 0]
        if photometric == 0:  # white-is-zero
            g = 255 - g
        return g.copy()
    return rgb_to_gray(np.ascontiguousarray(px[:, :, :3]))


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
