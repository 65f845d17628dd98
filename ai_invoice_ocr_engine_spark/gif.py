"""GIF87a/GIF89a decode (+ fixture encoder) in pure numpy/stdlib.

Beyond-reference web-corpus surface: the reference engine accepts only
png/jpg/jpeg/bmp/tiff (/root/reference/engine.py:46), but a web-scale
interleaved corpus is full of GIFs, so the polymorphic reader
(kernels.decode_image) routes them here. Everything is public spec: the
GIF89a specification (CompuServe, 1990) defines the layout; GIF-LZW is
the LSB-first variable-width variant (codes grow AFTER the table fills
the current width, clear = 2^min, EOI = clear+1, 12-bit cap with
deferred-clear tolerated).

Covered: global/local color tables, interlace (4-pass), transparency,
multi-frame animations with disposal methods 0/1 (leave), 2 (restore
background) and 3 (restore previous), Graphic Control / Comment /
Application / Plain Text extensions. The encoder exists so tests can
round-trip fixtures without external tools (same strategy as the
PNG/JPEG/TIFF/BMP codecs in this repo); a hand-assembled spec fixture in
tests/test_gif.py pins the decoder independently of the encoder.
"""

from __future__ import annotations

import struct

import numpy as np

from .kernels import _check_dims, rgb_to_gray

# --------------------------------------------------------------------------
# GIF-variant LZW: LSB-first bit packing, variable 3..12-bit codes
# --------------------------------------------------------------------------


def _gif_lzw_decode(src: bytes, min_code: int, max_pixels: int) -> bytearray:
    """Decode a GIF LZW stream (sub-blocks already concatenated) into
    palette indices. Stops at EOI or when max_pixels are produced."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"GIF LZW min code size {min_code} out of range")
    clear = 1 << min_code
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(src)
    while len(out) < max_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            bitbuf |= src[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        # width grows once the table fills the current code space; at the
        # 4096 cap it stays 12-bit until the encoder sends a clear
        # (deferred clear), which the loop above already tolerates.
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    if len(out) < max_pixels:
        raise ValueError("GIF pixel data truncated")
    return out[:max_pixels]


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """GIF LZW encoder (fixture side): emits clear up front, resets the
    table when it hits 4096, mirrors the decoder's width schedule."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    width = min_code + 1
    emit(clear, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        # width bump mirrors the decoder exactly: both sides compare the
        # next-free code against 1<<width at the point where the decoder
        # has just added its entry for the code above — i.e. BEFORE this
        # side inserts the new entry
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
        # the decoder appends an entry for this final code too, and may
        # widen before it reads the EOI
        if next_code >= (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# Container decode
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        cnt = len(range(start, h, step))
        out[start::step] = rows[src : src + cnt]
        src += cnt
    return out


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > len(data):
            raise ValueError("GIF sub-blocks truncated")
        parts.append(data[pos : pos + ln])
        pos += ln


def gif_frames(data: bytes) -> list[np.ndarray]:
    """Decode every frame of a (possibly animated) GIF, fully composited
    onto the logical screen, as grayscale uint8 arrays."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    try:
        w, h = struct.unpack_from("<HH", data, 6)
        packed, bg = data[10], data[11]
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF header: {e}") from e
    _check_dims(w, h, "GIF")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(data):
            raise ValueError("GIF global color table truncated")
        gct = rgb_to_gray(
            np.frombuffer(data, np.uint8, 3 * n, pos).reshape(1, n, 3)
        )[0]
        pos += 3 * n
    bg_gray = int(gct[bg]) if gct is not None and bg < len(gct) else 0
    canvas = np.full((h, w), bg_gray, np.uint8)
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    try:
        while True:
            if pos >= len(data):
                raise ValueError("GIF missing trailer")
            block = data[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                label = data[pos]
                pos += 1
                body, pos = _read_subblocks(data, pos)
                if label == 0xF9 and len(body) >= 4:  # graphic control
                    gpacked = body[0]
                    disposal = (gpacked >> 2) & 7
                    transparent = body[3] if gpacked & 1 else -1
                continue
            if block != 0x2C:
                raise ValueError(f"unknown GIF block 0x{block:02x}")
            left, top, iw, ih = struct.unpack_from("<HHHH", data, pos)
            ipacked = data[pos + 8]
            pos += 9
            _check_dims(iw, ih, "GIF frame")
            if left + iw > w or top + ih > h:
                raise ValueError("GIF frame exceeds logical screen")
            pal = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 7)
                if pos + 3 * n > len(data):
                    raise ValueError("GIF local color table truncated")
                pal = rgb_to_gray(
                    np.frombuffer(data, np.uint8, 3 * n, pos).reshape(1, n, 3)
                )[0]
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code = data[pos]
            pos += 1
            stream, pos = _read_subblocks(data, pos)
            idx = np.frombuffer(
                _gif_lzw_decode(stream, min_code, iw * ih), np.uint8
            ).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("GIF pixel index outside the color table")
            region = canvas[top : top + ih, left : left + iw]
            saved = region.copy() if disposal == 3 else None
            gray = pal[idx]
            if transparent >= 0:
                mask = idx != transparent
                region[mask] = gray[mask]
            else:
                region[:] = gray
            frames.append(canvas.copy())
            if disposal == 2:
                region[:] = bg_gray
            elif disposal == 3 and saved is not None:
                region[:] = saved
            transparent, disposal = -1, 0
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF: {e}") from e
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as grayscale — the still-image view used by
    the polymorphic reader (animations route through gif_frames)."""
    return gif_frames(data)[0]


# --------------------------------------------------------------------------
# Fixture encoder
# --------------------------------------------------------------------------


def _color_table(pal: np.ndarray) -> tuple[bytes, int]:
    """Pad an (n,3) palette to the next power of two ≥2; returns
    (raw bytes, size exponent-1 for the packed field)."""
    n = len(pal)
    size = 2
    exp = 0
    while size < n:
        size *= 2
        exp += 1
    padded = np.zeros((size, 3), np.uint8)
    padded[:n] = pal
    return padded.tobytes(), exp


def encode_gif(
    frames: "np.ndarray | list[np.ndarray]",
    interlace: bool = False,
    transparent: int | None = None,
    disposals: list[int] | None = None,
    local_palettes: bool = False,
    offsets: list[tuple[int, int]] | None = None,
    screen: tuple[int, int] | None = None,
    background: int = 0,
) -> bytes:
    """Fixture-side GIF writer over grayscale uint8 frames (identity
    256-gray palette, so decode(encode(x)) == x exactly). Multi-frame
    input produces a GIF89a animation with per-frame Graphic Control
    blocks; ``offsets``/``screen`` place sub-rectangle frames for
    disposal tests."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    assert frames and all(f.dtype == np.uint8 and f.ndim == 2 for f in frames)
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [0] * len(frames)
    if screen is None:
        sh = max(t + f.shape[0] for (_, t), f in zip(offsets, frames))
        sw = max(l + f.shape[1] for (l, _), f in zip(offsets, frames))
    else:
        sw, sh = screen
    gray_pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    animated = len(frames) > 1 or transparent is not None or any(disposals)
    out = [b"GIF89a" if animated or local_palettes else b"GIF87a"]
    gct_raw, gct_exp = _color_table(gray_pal)
    gct_flag = 0 if local_palettes else 1
    out.append(
        struct.pack(
            "<HHBBB", sw, sh, (gct_flag << 7) | (7 << 4) | gct_exp,
            background, 0,
        )
    )
    if gct_flag:
        out.append(gct_raw)
    if animated:
        # NETSCAPE2.0 looping application extension (public de-facto spec)
        out.append(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for f, (left, top), disp in zip(frames, offsets, disposals):
        if animated:
            gpacked = (disp & 7) << 2 | (1 if transparent is not None else 0)
            out.append(
                struct.pack(
                    "<BBBBHBB", 0x21, 0xF9, 4, gpacked, 2,
                    transparent if transparent is not None else 0, 0,
                )
            )
        fh, fw = f.shape
        ipacked = (0x40 if interlace else 0)
        if local_palettes:
            ipacked |= 0x80 | gct_exp
        out.append(struct.pack("<BHHHHB", 0x2C, left, top, fw, fh, ipacked))
        if local_palettes:
            out.append(gct_raw)
        rows = f
        if interlace:
            rows = np.concatenate(
                [f[start::step] for start, step in _INTERLACE_PASSES]
            )
        out.append(b"\x08")  # min code size: 256-entry palette
        stream = _gif_lzw_encode(rows.tobytes(), 8)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(bytes([len(chunk)]) + chunk)
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)
