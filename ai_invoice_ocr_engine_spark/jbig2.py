"""JBIG2 (ITU-T T.88) generic-region decoder, pure numpy + stdlib.

Covers the PDF ``JBIG2Decode`` embedded stream organization that generic-
mode encoders (e.g. jbig2enc without symbol coding) produce for scanned
bilevel invoices: page information segments plus immediate (lossless)
generic region segments, decoded with either the MQ arithmetic coder
(templates 0-3, optional TPGDON typical-prediction) or MMR (T.6 — routed
to this repo's fax.py G4 decoder). Symbol/text/halftone/refinement
segments raise NotImplementedError loudly — the same policy as every
other codec seam (arithmetic JPEG, mp3, ...): fail with the feature
named rather than guess.

The MQ coder follows T.88 Annex E software conventions; the Qe state
table and the coder are shared with JPEG2000 (ITU T.800). The encoder
below exists to build fixtures; the decoder is additionally pinned by
hand-built single-pixel/known-context streams in the tests so an
encoder-mirrored bug cannot hide.

Reference parity note: the reference engine accepts whatever its external
image readers decode (/root/reference/engine.py:46); scanned-PDF JBIG2 is
part of making the raw-PDF ingest path (sources/ingest.py) real.
"""

from __future__ import annotations

import struct

import numpy as np

# T.88 Table E.1 — Qe, NMPS, NLPS, SWITCH
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 E.3 software-convention arithmetic decoder."""

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        self.bp = 0
        b = data[0] if self.n else 0xFF
        self.c = b << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self):
        d, bp, n = self.d, self.bp, self.n
        b = d[bp] if bp < n else 0xFF
        if b == 0xFF:
            b1 = d[bp + 1] if bp + 1 < n else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            self.c += (d[self.bp] if self.bp < n else 0xFF) << 8
            self.ct = 8

    def decode(self, cx: list) -> int:
        """cx is a [index, mps] two-element list (one per context)."""
        icx, mps = cx
        qe, nmps, nlps, switch = _QE[icx]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:
                d = mps
                cx[0] = nmps
            else:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            else:
                d = mps
                cx[0] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 E.4 software-convention arithmetic encoder (fixture side).

    ``b`` holds the one pending byte the carry can still reach (the spec's
    BP-pointed byte); earlier bytes are final — carry never propagates
    past one byte because C is masked below 2^19/2^20 at every BYTEOUT."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b = None  # pending byte; None = nothing emitted yet
        self.out = bytearray()

    def _start_byte(self, shift: int, mask: int, ct: int) -> None:
        if self.b is not None:
            self.out.append(self.b)
        self.b = (self.c >> shift) & 0xFF
        self.c &= mask
        self.ct = ct

    def _byteout(self):
        if self.b == 0xFF:
            self._start_byte(20, 0xFFFFF, 7)  # stuff: next byte gets 7 bits
        elif self.c < 0x8000000:
            self._start_byte(19, 0x7FFFF, 8)
        else:
            self.b = 1 if self.b is None else self.b + 1  # carry
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self._start_byte(20, 0xFFFFF, 7)
            else:
                self._start_byte(19, 0x7FFFF, 8)

    def encode(self, cx: list, bit: int) -> None:
        icx, mps = cx
        qe, nmps, nlps, switch = _QE[icx]
        if bit == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - mps
            cx[0] = nlps
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS: fill the low 16 bits with 1s (the decoder reads an
        # infinite 1-tail past end-of-data, which then adds < 1 ulp and
        # stays inside [C, C+A)); back off half a quantum if that
        # overshoots the interval
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.b is not None:
            self.out.append(self.b)
            self.b = None
        return bytes(self.out)


# -- generic region ----------------------------------------------------------

# fixed template pixels (dx, dy), spec nominal AT positions appended;
# context bits are MSB-first in (row, column) sorted order (T.88 fig. 4-7)
_TEMPLATES = {
    0: ([(-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [(3, -1), (-3, -1), (2, -2), (-2, -2)]),
    1: ([(-1, -2), (0, -2), (1, -2), (2, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-3, 0), (-2, 0), (-1, 0)],
        [(3, -1)]),
    2: ([(-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-2, 0), (-1, 0)],
        [(2, -1)]),
    3: ([(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
        [(2, -1)]),
}

# SLTP (typical prediction) pseudo-pixel contexts per template
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _template_pixels(template: int, at: list) -> list:
    fixed, nominal_at = _TEMPLATES[template]
    at = list(at) if at else list(nominal_at)
    if len(at) != len(nominal_at):
        raise ValueError("JBIG2 AT pixel count mismatch")
    pixels = fixed + at
    pixels.sort(key=lambda p: (p[1], p[0]))
    return pixels


def _region_bits(w: int, h: int, template: int, at: list, tpgdon: bool,
                 coder, bitmap=None):
    """Shared decode/encode walk. With ``bitmap`` None, decodes into a
    new array; otherwise encodes ``bitmap``. Rows are plain python lists
    (scalar numpy indexing in a per-pixel loop is ~4x slower). Pixels
    outside the region read as 0 per T.88 6.2.5.2."""
    pixels = _template_pixels(template, at)
    decode = bitmap is None
    if decode:
        rows = [[0] * w for _ in range(h)]
    else:
        rows = np.asarray(bitmap, np.uint8).tolist()
    zero_row = [0] * w
    cx = {}
    ltp = 0
    sltp_label = _TPGDON_CTX[template]
    for y in range(h):
        if tpgdon:
            c = cx.setdefault(sltp_label, [0, 0])
            if decode:
                ltp ^= coder.decode(c)
            else:
                # typical row = identical to the previous row (all-zero at y=0)
                typical = rows[y] == (rows[y - 1] if y > 0 else zero_row)
                sltp = 1 if (typical != bool(ltp)) else 0
                coder.encode(c, sltp)
                ltp ^= sltp
            if ltp:
                if decode:
                    rows[y] = list(rows[y - 1]) if y > 0 else [0] * w
                continue
        row = rows[y]
        for x in range(w):
            label = 0
            for dx, dy in pixels:
                px = x + dx
                py = y + dy
                v = rows[py][px] if (0 <= px < w and py >= 0) else 0
                label = (label << 1) | v
            c = cx.setdefault(label, [0, 0])
            if decode:
                row[x] = coder.decode(c)
            else:
                coder.encode(c, row[x])
    return np.array(rows, np.uint8)


def decode_generic_region(data: bytes, w: int, h: int, template: int,
                          at: list, tpgdon: bool) -> np.ndarray:
    return _region_bits(w, h, template, at, tpgdon, MQDecoder(data))


def encode_generic_region(bitmap: np.ndarray, template: int = 0,
                          at: list | None = None,
                          tpgdon: bool = False) -> bytes:
    enc = MQEncoder()
    _region_bits(bitmap.shape[1], bitmap.shape[0], template, at, tpgdon,
                 enc, bitmap)
    return enc.flush()


# -- segment layer (embedded / PDF organization) ------------------------------


def _parse_segment_header(d: bytes, pos: int):
    if pos + 11 > len(d):
        raise ValueError("JBIG2 segment header truncated")
    num = struct.unpack(">I", d[pos : pos + 4])[0]
    flags = d[pos + 4]
    styp = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    pos += 5
    rts = d[pos]
    count = rts >> 5
    if count == 7:
        count = struct.unpack(">I", d[pos : pos + 4])[0] & 0x1FFFFFFF
        pos += 4 + (count + 8) // 8  # long form + retain bits
    else:
        pos += 1
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    refs = []
    for _ in range(count):
        refs.append(int.from_bytes(d[pos : pos + ref_size], "big"))
        pos += ref_size
    if page_assoc_4:
        page = struct.unpack(">I", d[pos : pos + 4])[0]
        pos += 4
    else:
        page = d[pos]
        pos += 1
    length = struct.unpack(">I", d[pos : pos + 4])[0]
    pos += 4
    if length == 0xFFFFFFFF:
        raise NotImplementedError("JBIG2 unknown-length segment")
    return {"num": num, "type": styp, "refs": refs, "page": page,
            "length": length, "data_pos": pos}


_UNSUPPORTED = {
    0: "symbol dictionary", 4: "intermediate text region",
    6: "immediate text region", 7: "immediate lossless text region",
    16: "pattern dictionary", 20: "intermediate halftone region",
    22: "immediate halftone region", 23: "immediate lossless halftone region",
    40: "intermediate refinement region", 42: "immediate refinement region",
    43: "immediate lossless refinement region",
    53: "tables", 64: "extension",
}


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded-organization JBIG2 (PDF JBIG2Decode payload, with the
    optional JBIG2Globals stream prepended) → uint8 bitmap, 1 = black
    (the JBIG2 wire convention; PDF callers invert for DeviceGray)."""
    if data[:8] == b"\x97JB2\r\n\x1a\n":
        # standalone file header: flags byte + optional page count
        flags = data[8]
        pos = 9 if flags & 2 else 13
        data = data[pos:]
    d = globals_data + data
    page = None
    pos = 0
    while pos < len(d):
        seg = _parse_segment_header(d, pos)
        body = d[seg["data_pos"] : seg["data_pos"] + seg["length"]]
        if len(body) < seg["length"]:
            raise ValueError("JBIG2 segment data truncated")
        pos = seg["data_pos"] + seg["length"]
        styp = seg["type"]
        if styp == 48:  # page information
            if len(body) < 19:
                raise ValueError("JBIG2 page info truncated")
            w, h = struct.unpack(">II", body[:8])
            pflags = body[16]
            if h == 0xFFFFFFFF:
                raise NotImplementedError("JBIG2 unknown page height")
            page = np.full((h, w), (pflags >> 2) & 1, np.uint8)
        elif styp in (36, 38, 39):  # generic region (intermediate/immediate)
            if page is None:
                raise ValueError("JBIG2 region before page information")
            if len(body) < 18:
                raise ValueError("JBIG2 region segment truncated")
            rw, rh, rx, ry = struct.unpack(">IIII", body[:16])
            comb_op = body[16] & 7
            gflags = body[17]
            mmr = gflags & 1
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            bp = 18
            at = []
            if not mmr:
                n_at = 4 if template == 0 else 1
                for _ in range(n_at):
                    ax = int.from_bytes(body[bp : bp + 1], "big", signed=True)
                    ay = int.from_bytes(body[bp + 1 : bp + 2], "big", signed=True)
                    at.append((ax, ay))
                    bp += 2
            payload = body[bp:]
            if mmr:
                if tpgdon:
                    raise ValueError("JBIG2 MMR with TPGDON is invalid")
                from .fax import decode_g4

                bm = decode_g4(payload, rw, rh).astype(np.uint8)
            else:
                bm = decode_generic_region(payload, rw, rh, template, at,
                                           tpgdon)
            if ry + rh > page.shape[0] or rx + rw > page.shape[1]:
                raise ValueError("JBIG2 region exceeds page bounds")
            win = page[ry : ry + rh, rx : rx + rw]
            if comb_op == 0:  # OR
                win |= bm
            elif comb_op == 1:  # AND
                win &= bm
            elif comb_op == 2:  # XOR
                win ^= bm
            elif comb_op == 4:  # REPLACE
                win[:] = bm
            else:
                raise NotImplementedError(f"JBIG2 combine op {comb_op}")
        elif styp in (49, 50, 51, 62):  # end of page/stripe/file, extension
            continue
        elif styp in _UNSUPPORTED:
            raise NotImplementedError(
                f"JBIG2 {_UNSUPPORTED[styp]} segments unsupported"
            )
        else:
            raise ValueError(f"JBIG2 unknown segment type {styp}")
    if page is None:
        raise ValueError("JBIG2 stream has no page")
    return page


def encode_jbig2(bitmap: np.ndarray, template: int = 0,
                 tpgdon: bool = False, standalone: bool = False) -> bytes:
    """Fixture encoder: page info + one immediate lossless generic
    region, embedded organization (PDF JBIG2Decode payload); with
    ``standalone`` a sequential-organization file header is prepended."""
    bm = np.asarray(bitmap, np.uint8)
    h, w = bm.shape

    def seg(num: int, styp: int, page: int, body: bytes) -> bytes:
        return (struct.pack(">IB", num, styp) + b"\x00"
                + bytes([page]) + struct.pack(">I", len(body)) + body)

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    out = seg(0, 48, 1, page_info)
    at = _TEMPLATES[template][1]
    region = struct.pack(">IIII", w, h, 0, 0) + bytes([0])  # combine OR
    gflags = (template << 1) | (8 if tpgdon else 0)
    region += bytes([gflags])
    for ax, ay in at:
        region += struct.pack(">bb", ax, ay)
    region += encode_generic_region(bm, template, list(at), tpgdon)
    out += seg(1, 39, 1, region)
    out += seg(2, 49, 1, b"")  # end of page
    if standalone:
        # file header: magic + flags (bit0 sequential, bit1 pages known)
        out = b"\x97JB2\r\n\x1a\n" + bytes([0x01]) + struct.pack(">I", 1) + out
    return out
