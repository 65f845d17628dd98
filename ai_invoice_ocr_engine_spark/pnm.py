"""Netpbm (PBM/PGM/PPM) decoder — pure numpy + stdlib.

Covers all six classic formats: P1/P2/P3 (ASCII) and P4/P5/P6 (binary)
bitmap/graymap/pixmap, 8- and 16-bit maxval, `#` comments anywhere in
the header. Netpbm is the interchange format OCR tooling (djvu, sane,
tesseract pipelines) writes between stages, so web-scraped document
corpora carry it even though the reference engine's own accepted list
(/root/reference/engine.py:46) does not — beyond-reference, same
polymorphic-decode policy as GIF.

Error contract (same as decode_image): corrupt input raises ValueError;
there are no NotImplementedError seams — the format family is complete.
"""

from __future__ import annotations

import re

import numpy as np

_MAGICS = {b"P1": 1, b"P2": 2, b"P3": 3, b"P4": 4, b"P5": 5, b"P6": 6}


def _header_tokens(data: bytes, n_fields: int) -> tuple[list[int], int]:
    """First n_fields decimal header tokens after the magic, skipping
    whitespace and `#` comments; returns (values, offset past the single
    whitespace byte that terminates the header)."""
    pos = 2
    vals: list[int] = []
    while len(vals) < n_fields:
        if pos >= len(data):
            raise ValueError("PNM header truncated")
        c = data[pos : pos + 1]
        if c == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("PNM comment unterminated")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            m = re.match(rb"\d+", data[pos:])
            if not m:
                raise ValueError("PNM header: expected integer")
            vals.append(int(m.group()))
            pos += m.end()
    if len(data) <= pos or not data[pos : pos + 1].isspace():
        raise ValueError("PNM header missing terminator")
    return vals, pos + 1


def decode_pnm(data: bytes) -> np.ndarray:
    """PBM/PGM/PPM bytes → grayscale uint8 (h, w); RGB reduces through
    the engine's shared luma (kernels.rgb_to_gray); 16-bit maxval scales
    with rounding; PBM convention 1 = black → gray 0."""
    kind = _MAGICS.get(data[:2])
    if kind is None:
        raise ValueError("unknown PNM magic")
    from .kernels import rgb_to_gray

    if kind in (1, 4):  # bitmap: no maxval field
        (w, h), pos = _header_tokens(data, 2)
    else:
        (w, h, maxval), pos = _header_tokens(data, 3)
        if maxval < 1 or maxval > 65535:
            raise ValueError("PNM maxval out of range")
    if w < 1 or h < 1 or w * h > 100_000_000:
        raise ValueError("PNM implausible dimensions")
    nch = 3 if kind in (3, 6) else 1

    if kind in (1, 2, 3):  # ASCII sample formats
        toks = re.split(rb"(?:\s|#[^\n]*\n)+", data[pos - 1 :].strip())
        need = w * h * nch
        if kind == 1:
            # P1 allows unseparated digits ("0110"): flatten per character
            bits = b"".join(t for t in toks if t)
            if len(bits) < need or not re.fullmatch(rb"[01]+", bits[:need]):
                raise ValueError("PBM ASCII data corrupt")
            vals = np.frombuffer(bits[:need], np.uint8) - ord("0")
        else:
            nums = [t for t in toks if t]
            if len(nums) < need:
                raise ValueError("PNM ASCII data truncated")
            try:
                vals = np.array([int(t) for t in nums[:need]], np.int64)
            except ValueError as e:
                raise ValueError(f"PNM ASCII data corrupt: {e}") from e
    elif kind == 4:  # packed bits, rows padded to byte boundaries
        row_bytes = (w + 7) // 8
        need = h * row_bytes
        if len(data) - pos < need:
            raise ValueError("PBM data truncated")
        packed = np.frombuffer(data[pos : pos + need], np.uint8)
        vals = np.unpackbits(packed.reshape(h, row_bytes), axis=1)[:, :w]
        vals = vals.reshape(-1).astype(np.int64)
    else:  # P5/P6 binary, 1 or 2 bytes per sample
        two = maxval > 255
        need = w * h * nch * (2 if two else 1)
        if len(data) - pos < need:
            raise ValueError("PNM data truncated")
        raw = data[pos : pos + need]
        vals = np.frombuffer(raw, ">u2" if two else np.uint8).astype(np.int64)

    if kind in (1, 4):
        px = ((1 - vals) * 255).astype(np.uint8)  # 1 = black
        maxval = 255
    else:
        if vals.min(initial=0) < 0 or vals.max(initial=0) > maxval:
            raise ValueError("PNM sample exceeds maxval")
        px = ((vals * 255 + maxval // 2) // maxval).astype(np.uint8)
    if nch == 3:
        return rgb_to_gray(np.ascontiguousarray(px.reshape(h, w, 3)))
    return px.reshape(h, w)


def encode_pnm(gray: np.ndarray, kind: int = 5) -> bytes:
    """Fixture writer: grayscale → P2 (ASCII) or P5 (binary) PGM."""
    h, w = gray.shape
    if kind == 5:
        return b"P5\n%d %d\n255\n" % (w, h) + gray.astype(np.uint8).tobytes()
    if kind == 2:
        body = b"\n".join(
            b" ".join(b"%d" % v for v in row) for row in gray.astype(int)
        )
        return b"P2\n# fixture\n%d %d\n255\n" % (w, h) + body + b"\n"
    raise ValueError("encode_pnm writes P2 or P5")
