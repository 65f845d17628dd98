"""JBIG2 (ITU-T T.88) decoder, pure numpy + stdlib.

Covers the PDF ``JBIG2Decode`` embedded stream organization scanned
bilevel invoices actually use: page information segments, immediate
(lossless) generic region segments — MQ arithmetic coder, templates 0-3,
optional TPGDON typical-prediction, or MMR (T.6, routed to this repo's
fax.py G4 decoder) — AND the symbol-coded path jbig2enc-style encoders
emit by default: symbol dictionaries (arithmetic, height classes,
IADH/IADW/IAEX integer procedures) plus text regions (strip-based
IADT/IAFS/IADS/IAIT placement, IAID symbol selection, all four reference
corners, any SBSTRIPS, TRANSPOSED regions with S running vertically),
refinement coding (SDREFAGG=1 refined dictionaries — both the
single-instance path and REFAGGNINST>1 aggregates decoded as embedded
one-strip text regions per 6.5.8.2.2 — SBREFINE per-instance
refinement, generic refinement templates 0/1 with TPGRON typical
prediction, standalone refinement region segments 40/42/43 against the
page or an intermediate region, and intermediate generic/text/halftone
regions retained for later reference per 8.2),
and halftone coding (pattern dictionaries sliced from one collective
generic region; gray-coded bitplane grayscale images both MQ-coded and
MMR — consecutive T.6 planes in one bitstream per Annex C.5; 1/256-pixel
grid vectors). HUFFMAN coding (T.88 Annex B) is complete: custom table
segments (type 53 — self-describing, zero transcription risk), ALL
fifteen standard tables B.1-B.15 (B.1-B.5 pinned against the spec's own
code columns; B.6-B.15 pinned by the structural properties the spec's
columns jointly satisfy — exact Kraft completeness, range contiguity,
adjoining 32-bit extensions — plus hand-derived canonical codewords and
hand-packed bitstream fixtures, tests/test_jbig2.py), symbol
dictionaries with SDHUFF=1 (height-class collective bitmaps both
uncompressed and MMR), and text regions with EITHER referred custom
tables (selector 3) OR the standard defaults (FS=B.6/B.7, DS=B.8-B.10,
DT=B.11-B.13 — the shape default-configured scanner/jbig2enc output
takes) — including the runcode-coded symbol-ID lengths of 7.4.3.1.7 and
SBREFINE per-instance refinement (6.4.11: RI as one raw bit, then a
byte-aligned standalone MQ refinement of BMSIZE bytes) with
RDW/RDH/RDX/RDY on custom tables or B.14/B.15 and RSIZE on B.1/custom.
SDHUFF symbol DICTIONARIES with refinement decode in BOTH shapes:
SDREFAGG=1 with REFAGGNINST=1 (reference ID in SBSYMCODELEN raw bits,
RDX/RDY via the mandated B.15, size via B.1, byte-aligned standalone
MQ refinement) and REFAGGNINST>1 — the symbol's bitmap as an EMBEDDED
Huffman text region (6.5.8.2.2: Table-17 fixed tables FS=B.6 DS=B.8
DT=B.11 RDW-RDY=B.15 RSIZE=B.1, raw symbol IDs, BMSIZE via
SDHUFFBMSIZE, window byte-aligned). No named Huffman seam remains.

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
                 coder, bitmap=None, cx=None, skip=None):
    """Shared decode/encode walk. With ``bitmap`` None, decodes into a
    new array; otherwise encodes ``bitmap``. Rows are plain python lists
    (scalar numpy indexing in a per-pixel loop is ~4x slower). Pixels
    outside the region read as 0 per T.88 6.2.5.2. ``cx`` lets a symbol
    dictionary share one generic-region context set (and one coder)
    across every symbol bitmap, per 6.5.8.2.1. ``skip`` (row lists of
    0/1, USESKIP per 6.2.5.7): marked pixels are set 0 and NOT coded —
    on encode they are zeroed too so neighbor contexts match decode."""
    pixels = _template_pixels(template, at)
    decode = bitmap is None
    if decode:
        rows = [[0] * w for _ in range(h)]
    else:
        rows = np.asarray(bitmap, np.uint8).tolist()
    zero_row = [0] * w
    if cx is None:
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
        skip_row = skip[y] if skip is not None else None
        for x in range(w):
            if skip_row is not None and skip_row[x]:
                row[x] = 0
                continue
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


# -- generic refinement region (T.88 6.3) --------------------------------------

# fixed template pixels as (current-bitmap list, reference-bitmap list);
# template 0 additionally takes AT1 on the current and AT2 on the reference
_REFINE_TEMPLATES = {
    0: ([(0, -1), (1, -1), (-1, 0)],
        [(0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]),
    1: ([(-1, -1), (0, -1), (1, -1), (-1, 0)],
        [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)]),
}


# SLTP pseudo-pixel contexts for TPGRON (T.88 fig. 14/15), expressed in
# this module's bit order (coding pixels MSB-first then reference pixels,
# AT appended to each group): only the reference CENTER pixel is set —
# template 0: bit 9 of 13 → 0x0020; template 1: bit 3 of 10 → 0x0008.
_TPGRON_CTX = {0: 0x0020, 1: 0x0008}


def _refine_bits(w: int, h: int, template: int, at: list, ref,
                 dx: int, dy: int, coder, cx, bitmap=None,
                 tpgron: bool = False):
    """Generic refinement decode/encode walk: each pixel's context mixes
    already-coded current-bitmap neighbors with a 3x3 window of the
    reference bitmap displaced by (dx, dy). With ``tpgron`` (6.3.5.6) an
    SLTP bit per row toggles typical-prediction mode: while LTP is on,
    pixels whose displaced 3x3 reference neighborhood is uniform take
    that uniform value WITHOUT being coded (the encode side only raises
    LTP for rows where every such pixel matches its prediction)."""
    coding, reference = _REFINE_TEMPLATES[template]
    if template == 0:
        if len(at) != 2:
            raise ValueError("refinement template 0 needs 2 AT pixels")
        coding = coding + [at[0]]
        reference = reference + [at[1]]
    ref_rows = np.asarray(ref, np.uint8).tolist()
    rh = len(ref_rows)
    rw = len(ref_rows[0]) if rh else 0
    decode = bitmap is None
    rows = [[0] * w for _ in range(h)] if decode else np.asarray(
        bitmap, np.uint8).tolist()

    def typical(x, y):
        """All-0 → 0, all-1 → 1, mixed → None over the 3x3 reference
        window centered at the displaced position (outside reads 0, so
        a total of 9 implies every cell was in-bounds and set)."""
        total = 0
        for ty in (y - dy - 1, y - dy, y - dy + 1):
            for tx in (x - dx - 1, x - dx, x - dx + 1):
                if 0 <= tx < rw and 0 <= ty < rh:
                    total += ref_rows[ty][tx]
        if total == 0:
            return 0
        return 1 if total == 9 else None

    ltp = 0
    sltp_label = _TPGRON_CTX[template]
    for y in range(h):
        if tpgron:
            c = cx.setdefault(sltp_label, [0, 0])
            if decode:
                ltp ^= coder.decode(c)
            else:
                # raise LTP only when every typical pixel in this row
                # already equals its prediction (else the row can't be
                # represented with prediction on)
                want = 1
                for x in range(w):
                    t = typical(x, y)
                    if t is not None and rows[y][x] != t:
                        want = 0
                        break
                sltp = want ^ ltp
                coder.encode(c, sltp)
                ltp ^= sltp
        row = rows[y]
        for x in range(w):
            if tpgron and ltp:
                t = typical(x, y)
                if t is not None:
                    if decode:
                        row[x] = t
                    continue
            label = 0
            for cdx, cdy in coding:
                # coding neighbors are always above/left — already coded
                px, py = x + cdx, y + cdy
                v = rows[py][px] if (0 <= px < w and 0 <= py < h) else 0
                label = (label << 1) | v
            for rdx, rdy in reference:
                px, py = x - dx + rdx, y - dy + rdy
                v = ref_rows[py][px] if (0 <= px < rw and 0 <= py < rh) else 0
                label = (label << 1) | v
            c = cx.setdefault(label, [0, 0])
            if decode:
                row[x] = coder.decode(c)
            else:
                coder.encode(c, row[x])
    return np.array(rows, np.uint8) if decode else None


# -- arithmetic integer decoding (T.88 Annex A) --------------------------------

_OOB = object()  # out-of-band marker (end of a width class / strip)

# (prefix-selected value ranges: offset, number of value bits)
_INT_RANGES = [(0, 2), (4, 4), (20, 6), (84, 8), (340, 12), (4436, 32)]


class _IntCtx:
    """One IAx decoding procedure: a 512-entry context set addressed by
    the PREV prefix register (A.2)."""

    __slots__ = ("cx",)

    def __init__(self):
        self.cx = {}

    def _bit_dec(self, coder, prev: int) -> int:
        return coder.decode(self.cx.setdefault(prev, [0, 0]))

    def _bit_enc(self, coder, prev: int, bit: int) -> None:
        coder.encode(self.cx.setdefault(prev, [0, 0]), bit)

    def decode(self, coder):
        prev = 1

        def bit():
            nonlocal prev
            b = self._bit_dec(coder, prev)
            prev = ((prev << 1) | b) if prev < 256 else (
                ((((prev << 1) | b) & 511) | 256)
            )
            return b

        s = bit()
        for i, (offset, nbits) in enumerate(_INT_RANGES):
            if i == len(_INT_RANGES) - 1 or not bit():
                v = 0
                for _ in range(nbits):
                    v = (v << 1) | bit()
                v += offset
                break
        if s and v == 0:
            return _OOB
        return -v if s else v

    def encode(self, coder, value) -> None:
        prev = 1

        def bit(b):
            nonlocal prev
            self._bit_enc(coder, prev, b)
            prev = ((prev << 1) | b) if prev < 256 else (
                ((((prev << 1) | b) & 511) | 256)
            )

        if value is _OOB:
            s, v = 1, 0
        else:
            s, v = (1, -value) if value < 0 else (0, value)
        bit(s)
        for i, (offset, nbits) in enumerate(_INT_RANGES):
            last = i == len(_INT_RANGES) - 1
            nxt = _INT_RANGES[i + 1][0] if not last else None
            if last or v < nxt:
                if not last:
                    bit(0)
                for k in range(nbits - 1, -1, -1):
                    bit((v - offset) >> k & 1)
                return
            bit(1)


class _IDCtx:
    """IAID: SYMCODELEN-bit symbol-ID tree decoding (A.3)."""

    __slots__ = ("cx", "n")

    def __init__(self, symcodelen: int):
        self.cx = {}
        self.n = symcodelen

    def decode(self, coder) -> int:
        prev = 1
        for _ in range(self.n):
            b = coder.decode(self.cx.setdefault(prev, [0, 0]))
            prev = (prev << 1) | b
        return prev - (1 << self.n)

    def encode(self, coder, value: int) -> None:
        prev = 1
        for k in range(self.n - 1, -1, -1):
            b = (value >> k) & 1
            coder.encode(self.cx.setdefault(prev, [0, 0]), b)
            prev = (prev << 1) | b


# -- Huffman machinery (T.88 Annex B) ----------------------------------------
#
# Scope: custom table segments (type 53 — fully self-describing, B.2) and
# ALL fifteen standard tables. B.1-B.5 (symbol-dictionary selectors — DH:
# B.4/B.5, DW: B.2/B.3, BMSIZE/AGG/EX: B.1) are pinned against the spec's
# own code columns. B.6-B.15 (text-region FS/DS/DT/RD* defaults) are
# pinned without an external decoder by the structural properties the
# spec's columns jointly satisfy — exact Kraft completeness (B.10 is the
# one published incomplete code, 121/128), range contiguity, adjoining
# lower/upper extensions — plus hand-derived canonical codewords and
# hand-packed bitstream fixtures per table (tests/test_jbig2.py), the
# same recipe that pinned B.1-B.5.


class _HBits:
    """MSB-first bit reader with byte-boundary access (collective bitmaps
    and MMR payloads start byte-aligned)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, k: int) -> int:
        v = 0
        for _ in range(k):
            p = self.pos
            if p >= len(self.data) * 8:
                raise ValueError("JBIG2 Huffman bitstream exhausted")
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            self.pos += 1
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        if self.pos & 7:
            raise ValueError("JBIG2 bit position not byte-aligned")
        return self.pos >> 3


class _HuffTable:
    """Prefix-code table per T.88 Annex B: lines of (PREFLEN, RANGELEN,
    RANGELOW, kind) in the spec's printed order; kind 'n' normal,
    'l' lower range (VAL = RANGELOW - offset32), 'u' upper range
    (VAL = RANGELOW + offset32), 'o' OOB. Codes assigned canonically by
    (prefix length, printed order) — B.3."""

    def __init__(self, lines):
        self.lines = [ln for ln in lines if ln[0] > 0]
        self.codes = {}
        code = 0
        for length in range(1, 33):
            for ln in self.lines:
                if ln[0] == length:
                    self.codes[(length, code)] = ln
                    code += 1
            code <<= 1

    def decode(self, b: _HBits):
        code = 0
        for length in range(1, 33):
            code = (code << 1) | b.read(1)
            ln = self.codes.get((length, code))
            if ln is not None:
                pref, rlen, rlow, kind = ln
                if kind == "o":
                    return _OOB
                if kind == "l":
                    return rlow - b.read(32)
                if kind == "u":
                    return rlow + b.read(32)
                return rlow + b.read(rlen)
        raise ValueError("JBIG2 Huffman: no code matched in 32 bits")

    # fixture-encoder side -------------------------------------------------
    def _inv(self):
        return {id(ln): key for key, ln in self.codes.items()}

    def encode(self, bw, value) -> None:
        inv = self._inv()
        if value is _OOB:
            for ln in self.lines:
                if ln[3] == "o":
                    length, code = inv[id(ln)]
                    bw.put(code, length)
                    return
            raise ValueError("table has no OOB code")
        best = None
        for ln in self.lines:
            pref, rlen, rlow, kind = ln
            if kind == "n" and rlow <= value < rlow + (1 << rlen):
                best = ln
                break
        if best is None:
            for ln in self.lines:
                pref, rlen, rlow, kind = ln
                if (kind == "u" and value >= rlow) or (
                    kind == "l" and value <= rlow
                ):
                    best = ln
                    break
        if best is None:
            raise ValueError(f"value {value} outside table range")
        length, code = inv[id(best)]
        bw.put(code, length)
        pref, rlen, rlow, kind = best
        if kind == "n":
            bw.put(value - rlow, rlen)
        elif kind == "u":
            bw.put(value - rlow, 32)
        else:
            bw.put(rlow - value, 32)


class _HBitW:
    """MSB-first bit writer (fixture side)."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.put(0, 1)

    def put_bytes(self, data: bytes) -> None:
        if self.n:
            raise ValueError("put_bytes requires byte alignment")
        self.out += data

    def done(self) -> bytes:
        self.align()
        return bytes(self.out)


def _std_table(n: int) -> _HuffTable:
    """Standard tables B.1-B.15 (transcribed from T.88 Annex B in the
    spec's printed RANGELOW-ascending order, which the canonical B.3 code
    assignment depends on). B.1-B.5 are cross-checked against the spec's
    printed code columns; B.6-B.15 against the structural pins described
    in the section comment above."""
    if n == 1:
        return _HuffTable([
            (1, 4, 0, "n"), (2, 8, 16, "n"), (3, 16, 272, "n"),
            (3, 32, 65808, "u"),
        ])
    if n == 2:
        return _HuffTable([
            (1, 0, 0, "n"), (2, 0, 1, "n"), (3, 0, 2, "n"),
            (4, 3, 3, "n"), (5, 6, 11, "n"), (6, 32, 75, "u"),
            (6, 0, 0, "o"),
        ])
    if n == 3:
        return _HuffTable([
            (8, 8, -256, "n"), (1, 0, 0, "n"), (2, 0, 1, "n"),
            (3, 0, 2, "n"), (4, 3, 3, "n"), (5, 6, 11, "n"),
            (8, 32, -257, "l"), (7, 32, 75, "u"), (6, 0, 0, "o"),
        ])
    if n == 4:
        return _HuffTable([
            (1, 0, 1, "n"), (2, 0, 2, "n"), (3, 0, 3, "n"),
            (4, 3, 4, "n"), (5, 6, 12, "n"), (5, 32, 76, "u"),
        ])
    if n == 5:
        return _HuffTable([
            (1, 0, 1, "n"), (2, 0, 2, "n"), (3, 0, 3, "n"),
            (4, 3, 4, "n"), (5, 6, 12, "n"), (7, 8, -255, "n"),
            (7, 32, -256, "l"), (6, 32, 76, "u"),
        ])
    # B.6-B.15: the text-region FS/DS/DT/RD* standard defaults. Transcribed
    # from T.88 Annex B in the spec's printed (RANGELOW-ascending) order,
    # which the canonical B.3 assignment depends on. Pinned WITHOUT an
    # external decoder by the structural properties the spec's columns
    # must jointly satisfy — exact Kraft equality (B.10 is the one
    # deliberately incomplete code, 121/128), range contiguity
    # (every line starts where the previous one ends; lower/upper
    # extensions adjoin the ends), and hand-derived canonical codewords —
    # all asserted in tests/test_jbig2.py, plus hand-packed byte-level
    # bitstream fixtures per table (the same recipe that pinned B.1-B.5).
    if n == 6:
        return _HuffTable([
            (5, 10, -2048, "n"), (4, 9, -1024, "n"), (4, 8, -512, "n"),
            (4, 7, -256, "n"), (5, 6, -128, "n"), (5, 5, -64, "n"),
            (4, 5, -32, "n"), (2, 7, 0, "n"), (3, 7, 128, "n"),
            (3, 8, 256, "n"), (4, 9, 512, "n"), (4, 10, 1024, "n"),
            (6, 32, -2049, "l"), (6, 32, 2048, "u"),
        ])
    if n == 7:
        return _HuffTable([
            (4, 9, -1024, "n"), (3, 8, -512, "n"), (4, 7, -256, "n"),
            (5, 6, -128, "n"), (5, 5, -64, "n"), (4, 5, -32, "n"),
            (4, 5, 0, "n"), (5, 5, 32, "n"), (5, 6, 64, "n"),
            (4, 7, 128, "n"), (3, 8, 256, "n"), (3, 9, 512, "n"),
            (3, 10, 1024, "n"),
            (5, 32, -1025, "l"), (5, 32, 2048, "u"),
        ])
    if n == 8:
        return _HuffTable([
            (8, 3, -15, "n"), (9, 1, -7, "n"), (8, 1, -5, "n"),
            (9, 0, -3, "n"), (7, 0, -2, "n"), (4, 0, -1, "n"),
            (2, 1, 0, "n"), (5, 0, 2, "n"), (6, 0, 3, "n"),
            (3, 4, 4, "n"), (6, 1, 20, "n"), (4, 4, 22, "n"),
            (4, 5, 38, "n"), (5, 6, 70, "n"), (5, 7, 134, "n"),
            (6, 7, 262, "n"), (7, 8, 390, "n"), (6, 10, 646, "n"),
            (9, 32, -16, "l"), (9, 32, 1670, "u"), (2, 0, 0, "o"),
        ])
    if n == 9:
        return _HuffTable([
            (8, 4, -31, "n"), (9, 2, -15, "n"), (8, 2, -11, "n"),
            (9, 1, -7, "n"), (7, 1, -5, "n"), (4, 1, -3, "n"),
            (3, 1, -1, "n"), (3, 1, 1, "n"), (5, 1, 3, "n"),
            (6, 1, 5, "n"), (3, 5, 7, "n"), (6, 2, 39, "n"),
            (4, 5, 43, "n"), (4, 6, 75, "n"), (5, 7, 139, "n"),
            (5, 8, 267, "n"), (6, 8, 523, "n"), (7, 9, 779, "n"),
            (6, 11, 1291, "n"),
            (9, 32, -32, "l"), (9, 32, 3339, "u"), (2, 0, 0, "o"),
        ])
    if n == 10:
        return _HuffTable([
            (7, 4, -21, "n"), (8, 0, -5, "n"), (7, 0, -4, "n"),
            (5, 0, -3, "n"), (2, 2, -2, "n"), (5, 0, 2, "n"),
            (6, 0, 3, "n"), (7, 0, 4, "n"), (8, 0, 5, "n"),
            (2, 6, 6, "n"), (5, 5, 70, "n"), (6, 5, 102, "n"),
            (7, 6, 134, "n"), (8, 7, 198, "n"), (8, 8, 326, "n"),
            (8, 9, 582, "n"), (8, 10, 1094, "n"), (7, 11, 2118, "n"),
            (8, 32, -22, "l"), (8, 32, 4166, "u"), (2, 0, 0, "o"),
        ])
    if n == 11:
        return _HuffTable([
            (1, 0, 1, "n"), (2, 1, 2, "n"), (4, 0, 4, "n"),
            (4, 1, 5, "n"), (5, 1, 7, "n"), (5, 2, 9, "n"),
            (6, 2, 13, "n"), (7, 2, 17, "n"), (7, 3, 21, "n"),
            (7, 4, 29, "n"), (7, 5, 45, "n"), (7, 6, 77, "n"),
            (7, 32, 141, "u"),
        ])
    if n == 12:
        return _HuffTable([
            (1, 0, 1, "n"), (2, 0, 2, "n"), (3, 1, 3, "n"),
            (5, 0, 5, "n"), (5, 1, 6, "n"), (6, 1, 8, "n"),
            (7, 0, 10, "n"), (7, 1, 11, "n"), (7, 2, 13, "n"),
            (7, 3, 17, "n"), (7, 4, 25, "n"), (8, 5, 41, "n"),
            (8, 32, 73, "u"),
        ])
    if n == 13:
        return _HuffTable([
            (1, 0, 1, "n"), (3, 0, 2, "n"), (4, 0, 3, "n"),
            (5, 0, 4, "n"), (4, 1, 5, "n"), (3, 3, 7, "n"),
            (6, 1, 15, "n"), (6, 2, 17, "n"), (6, 3, 21, "n"),
            (6, 4, 29, "n"), (6, 5, 45, "n"), (7, 6, 77, "n"),
            (7, 32, 141, "u"),
        ])
    if n == 14:
        return _HuffTable([
            (3, 0, -2, "n"), (3, 0, -1, "n"), (1, 0, 0, "n"),
            (3, 0, 1, "n"), (3, 0, 2, "n"),
        ])
    if n == 15:
        return _HuffTable([
            (7, 4, -24, "n"), (6, 2, -8, "n"), (5, 1, -4, "n"),
            (4, 0, -2, "n"), (3, 0, -1, "n"), (1, 0, 0, "n"),
            (3, 0, 1, "n"), (4, 0, 2, "n"), (5, 1, 3, "n"),
            (6, 2, 5, "n"), (7, 4, 9, "n"),
            (7, 32, -25, "l"), (7, 32, 25, "u"),
        ])
    raise ValueError(f"JBIG2 standard Huffman table B.{n} does not exist")


def _parse_table_segment(body: bytes) -> _HuffTable:
    """Type-53 custom table segment (B.2): flags, HTLOW/HTHIGH, then
    (PREFLEN, RANGELEN) pairs covering [HTLOW, HTHIGH), a lower-range
    prefix, an upper-range prefix, and (with HTOOB) an OOB prefix."""
    if len(body) < 9:
        raise ValueError("JBIG2 table segment truncated")
    flags = body[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    low = int.from_bytes(body[1:5], "big", signed=True)
    high = int.from_bytes(body[5:9], "big", signed=True)
    if high <= low:
        raise ValueError("JBIG2 table segment HTHIGH <= HTLOW")
    b = _HBits(body, 9 * 8)
    lines = []
    cur = low
    while cur < high:
        pref = b.read(htps)
        rlen = b.read(htrs)
        if rlen > 32:
            raise ValueError("JBIG2 table range length > 32")
        lines.append((pref, rlen, cur, "n"))
        cur += 1 << rlen
        if len(lines) > 4096:
            raise ValueError("JBIG2 table segment implausibly long")
    lines.append((b.read(htps), 32, low - 1, "l"))
    lines.append((b.read(htps), 32, high, "u"))
    if htoob:
        lines.append((b.read(htps), 0, 0, "o"))
    return _HuffTable(lines)


def _encode_table_segment(
    values, htoob: bool = True, rangelen: int = 0
) -> tuple[bytes, _HuffTable]:
    """Fixture writer: a custom table with one normal line per value
    range step (all PREFLEN equal-ish via a flat assignment). `values`
    is (low, high); lines step by 2^rangelen."""
    low, high = values
    n_lines = -(-(high - low) // (1 << rangelen)) + 2 + (1 if htoob else 0)
    pref = max(1, (n_lines - 1).bit_length() + 1)
    bw = _HBitW()
    htps, htrs = pref, max(1, rangelen.bit_length() + 1)
    flags = (1 if htoob else 0) | ((htps - 1) << 1) | ((htrs - 1) << 4)
    bw.put_bytes(bytes([flags]))
    bw.put_bytes(low.to_bytes(4, "big", signed=True))
    bw.put_bytes(high.to_bytes(4, "big", signed=True))
    cur = low
    while cur < high:
        bw.put(pref, htps)
        bw.put(rangelen, htrs)
        cur += 1 << rangelen
    bw.put(pref, htps)  # lower
    bw.put(pref, htps)  # upper
    if htoob:
        bw.put(pref, htps)
    body = bw.done()
    return body, _parse_table_segment(body)


# -- symbol dictionary + text region (T.88 6.4 / 6.5, arithmetic) --------------


def _decode_symbol_dict(body: bytes, in_syms: list, tables: list | None = None) -> list:
    """Type-0 segment → exported symbol list (numpy bitmaps). Arithmetic
    coding, or Huffman (SDHUFF=1) including SDREFAGG=1 — both the
    single-instance refinement shape and REFAGGNINST>1 aggregates
    (embedded Table-17 Huffman text region, 6.5.8.2.2)."""
    if len(body) < 2:
        raise ValueError("JBIG2 symbol dictionary truncated")
    flags = int.from_bytes(body[:2], "big")
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    if sdhuff:
        return _decode_symbol_dict_huffman(body, flags, in_syms, tables or [])
    bp = 2
    at = []
    for _ in range(4 if template == 0 else 1):
        ax = int.from_bytes(body[bp : bp + 1], "big", signed=True)
        ay = int.from_bytes(body[bp + 1 : bp + 2], "big", signed=True)
        at.append((ax, ay))
        bp += 2
    rat = []
    if sdrefagg and rtemplate == 0:
        for _ in range(2):
            ax = int.from_bytes(body[bp : bp + 1], "big", signed=True)
            ay = int.from_bytes(body[bp + 1 : bp + 2], "big", signed=True)
            rat.append((ax, ay))
            bp += 2
    num_ex = struct.unpack(">I", body[bp : bp + 4])[0]
    num_new = struct.unpack(">I", body[bp + 4 : bp + 8])[0]
    if num_new > (1 << 20) or num_ex > num_new + len(in_syms):
        raise ValueError("JBIG2 implausible symbol dictionary counts")
    bp += 8
    coder = MQDecoder(body[bp:])
    iadh, iadw, iaex, iaai = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    iardx, iardy = _IntCtx(), _IntCtx()
    # text-region contexts for the REFAGGNINST>1 aggregate path — shared
    # across every aggregate in this dictionary per 6.5.8.2.1
    iadt, iafs, iads, iait = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    iari, iardw, iardh = _IntCtx(), _IntCtx(), _IntCtx()
    symcodelen = max(1, (max(len(in_syms) + num_new, 1) - 1).bit_length())
    iaid = _IDCtx(symcodelen)
    gb_cx: dict = {}
    gr_cx: dict = {}
    new_syms: list = []
    hcheight = 0
    while len(new_syms) < num_new:
        dh = iadh.decode(coder)
        if dh is _OOB:
            raise ValueError("JBIG2 OOB height-class delta")
        hcheight += dh
        symwidth = 0
        while True:
            dw = iadw.decode(coder)
            if dw is _OOB:
                break
            symwidth += dw
            if len(new_syms) >= num_new:
                raise ValueError("JBIG2 symbol dictionary overruns NUMNEWSYMS")
            if symwidth <= 0 or hcheight <= 0:
                raise ValueError("JBIG2 non-positive symbol dims")
            from .kernels import _check_dims

            _check_dims(symwidth, hcheight, "JBIG2 symbol")
            if sdrefagg:
                # 6.5.8.2: aggregate instance count, then (for the common
                # single-instance case) a refinement of an earlier symbol
                ninst = iaai.decode(coder)
                if ninst is not _OOB and ninst == 1:
                    ref_id = iaid.decode(coder)
                    rdx = iardx.decode(coder)
                    rdy = iardy.decode(coder)
                    pool = list(in_syms) + new_syms
                    if ref_id >= len(pool):
                        raise ValueError("JBIG2 refinement reference out of range")
                    bm = _refine_bits(symwidth, hcheight, rtemplate, rat,
                                      pool[ref_id], rdx, rdy, coder, gr_cx)
                else:
                    # 6.5.8.2.2: REFAGGNINST>1 — the symbol's bitmap is a
                    # one-strip SBREFINE text region over the full pool
                    # (TOPLEFT corner, no transposition, OR combine,
                    # SBDSOFFSET=0), sharing this dictionary's coder and
                    # integer contexts
                    if ninst is _OOB or ninst <= 0:
                        raise ValueError(
                            "JBIG2 bad aggregate instance count"
                        )
                    if ninst > symwidth * hcheight:
                        raise ValueError(
                            "JBIG2 implausible aggregate instance count"
                        )
                    pool = list(in_syms) + new_syms
                    ctxs = (iadt, iafs, iads, iait, iari, iardw, iardh,
                            iardx, iardy, iaid)
                    bm = _text_region_arith_core(
                        coder, ctxs, gr_cx, pool, ninst, symwidth,
                        hcheight, 1, 1, 0, 0, 0, True, rtemplate, rat,
                    )
            else:
                bm = _region_bits(symwidth, hcheight, template, at, False,
                                  coder, cx=gb_cx)
            new_syms.append(bm)
    # export flags: alternating IAEX run lengths over input+new symbols,
    # starting with a not-exported run (6.5.10)
    all_syms = list(in_syms) + new_syms
    exported = []
    i = 0
    cur_export = 0
    while i < len(all_syms) and len(exported) < num_ex:
        run = iaex.decode(coder)
        if run is _OOB or run < 0:
            raise ValueError("JBIG2 bad export run length")
        if cur_export:
            exported.extend(all_syms[i : i + run])
        i += run
        cur_export ^= 1
    if len(exported) != num_ex:
        raise ValueError("JBIG2 export count mismatch")
    return exported


def _decode_symbol_dict_huffman(
    body: bytes, flags: int, in_syms: list, tables: list
) -> list:
    """SDHUFF=1, SDREFAGG=0 (6.5.5/6.5.9): per height class, DH/DW deltas
    through the selected tables, then ONE byte-aligned collective bitmap
    (uncompressed when BMSIZE=0, else an MMR/T.6 stream of BMSIZE bytes)
    sliced into the class's symbols by width. Export runs ride Table B.1.
    Custom tables are consumed from the referred-segment list in selector
    order: DH, DW, BMSIZE, AGG (7.4.3.1.6 analog).

    SDREFAGG=1 (6.5.8.2 with SDHUFF=1): no collective bitmap — each
    symbol is decoded individually; the common REFAGGNINST=1 case reads
    the reference ID as SBSYMCODELEN raw bits, RDX/RDY through the
    MANDATED Table B.15 and the refinement size through Table B.1
    (Table 20 — not selectable), then a byte-aligned standalone MQ
    refinement of exactly that many bytes. REFAGGNINST>1 decodes the
    symbol as an embedded Huffman text region over the pool so far
    (6.5.8.2.2, Table-17 fixed tables, BMSIZE via SDHUFFBMSIZE)."""
    from .kernels import _check_dims

    sdrefagg = (flags >> 1) & 1
    rtemplate = (flags >> 12) & 1
    sel_dh = (flags >> 2) & 3
    sel_dw = (flags >> 4) & 3
    sel_bm = (flags >> 6) & 1
    sel_ag = (flags >> 7) & 1
    ti = iter(tables)

    def custom():
        try:
            return next(ti)
        except StopIteration:
            raise ValueError(
                "JBIG2 Huffman symbol dictionary missing a referred table"
            ) from None

    if sel_dh == 0:
        t_dh = _std_table(4)
    elif sel_dh == 1:
        t_dh = _std_table(5)
    elif sel_dh == 3:
        t_dh = custom()
    else:
        raise ValueError("JBIG2 SDHUFFDH selector 2 is reserved")
    if sel_dw == 0:
        t_dw = _std_table(2)
    elif sel_dw == 1:
        t_dw = _std_table(3)
    elif sel_dw == 3:
        t_dw = custom()
    else:
        raise ValueError("JBIG2 SDHUFFDW selector 2 is reserved")
    t_bm = custom() if sel_bm else _std_table(1)
    t_agg = custom() if sel_ag else _std_table(1)
    t_ex = _std_table(1)

    bp = 2
    rat: list = []
    if sdrefagg and rtemplate == 0:
        for _ in range(2):
            rat.append((
                int.from_bytes(body[bp : bp + 1], "big", signed=True),
                int.from_bytes(body[bp + 1 : bp + 2], "big", signed=True),
            ))
            bp += 2
    num_ex = struct.unpack(">I", body[bp : bp + 4])[0]
    num_new = struct.unpack(">I", body[bp + 4 : bp + 8])[0]
    if num_new > (1 << 20) or num_ex > num_new + len(in_syms):
        raise ValueError("JBIG2 implausible symbol dictionary counts")
    hb = _HBits(body, (bp + 8) * 8)
    # 6.5.8.2.3: fixed-length symbol IDs inside refinement references
    symcodelen = max(1, (max(len(in_syms) + num_new, 1) - 1).bit_length())
    t_rdxy = _std_table(15)  # Table 20: SBHUFFRDX/RDY = B.15, mandated
    t_rsize = _std_table(1)  # Table 20: SBHUFFRSIZE = B.1, mandated
    new_syms: list = []
    hcheight = 0
    while len(new_syms) < num_new:
        dh = t_dh.decode(hb)
        if dh is _OOB:
            raise ValueError("JBIG2 OOB height-class delta")
        hcheight += dh
        symwidth = 0
        widths: list[int] = []
        totwidth = 0
        while True:
            dw = t_dw.decode(hb)
            if dw is _OOB:
                break
            symwidth += dw
            if symwidth <= 0 or hcheight <= 0:
                raise ValueError("JBIG2 non-positive symbol dims")
            if len(new_syms) + len(widths) >= num_new:
                raise ValueError("JBIG2 symbol dictionary overruns NUMNEWSYMS")
            _check_dims(symwidth, hcheight, "JBIG2 symbol")
            if sdrefagg:
                ninst = t_agg.decode(hb)
                if ninst is _OOB or ninst < 1:
                    raise ValueError("JBIG2 bad aggregate instance count")
                if ninst > 1:
                    # 6.5.8.2.2 under SDHUFF=1: the symbol's bitmap is an
                    # embedded HUFFMAN text region over the pool so far —
                    # Table 17 fixes every table (FS=B.6, DS=B.8, DT=B.11,
                    # RDW/RDH/RDX/RDY=B.15, RSIZE=B.1), SBSTRIPS=1,
                    # TOPLEFT, no transposition, OR, SBDSOFFSET=0,
                    # SBREFINE=1, raw SBSYMCODELEN-bit symbol IDs
                    # (6.5.8.2.3); its size comes from SDHUFFBMSIZE and
                    # the window is byte-aligned (6.5.8.2)
                    if ninst > symwidth * hcheight:
                        raise ValueError(
                            "JBIG2 implausible aggregate instance count")
                    pool = list(in_syms) + new_syms
                    bmsize = t_bm.decode(hb)
                    if bmsize is _OOB or bmsize <= 0:
                        raise ValueError(
                            "JBIG2 bad aggregate text-region size")
                    hb.align()
                    start = hb.byte_pos()
                    if start + bmsize > len(body):
                        raise ValueError(
                            "JBIG2 aggregate text region truncated")
                    window = body[start : start + bmsize]
                    whb = _HBits(window, 0)
                    bm = _text_region_huffman_core(
                        window, whb, pool, ninst, symwidth, hcheight,
                        (1, 0, 0, 0, 0),
                        _std_table(6), _std_table(8), _std_table(11),
                        _std_table(15), _std_table(15), _std_table(15),
                        _std_table(15), _std_table(1), rat, rtemplate,
                        1, lambda: whb.read(symcodelen))
                    hb.pos = (start + bmsize) * 8
                    new_syms.append(bm)
                    continue
                ref_id = hb.read(symcodelen)
                rdx = t_rdxy.decode(hb)
                rdy = t_rdxy.decode(hb)
                bmsize = t_rsize.decode(hb)
                if _OOB in (rdx, rdy, bmsize) or bmsize <= 0:
                    raise ValueError("JBIG2 bad Huffman refinement fields")
                hb.align()
                start = hb.byte_pos()
                if start + bmsize > len(body):
                    raise ValueError("JBIG2 refinement data truncated")
                pool = list(in_syms) + new_syms
                if ref_id >= len(pool):
                    raise ValueError(
                        "JBIG2 refinement reference out of range"
                    )
                bm = _refine_bits(
                    symwidth, hcheight, rtemplate, rat, pool[ref_id],
                    rdx, rdy, MQDecoder(body[start : start + bmsize]), {},
                )
                hb.pos = (start + bmsize) * 8
                new_syms.append(bm)
                continue
            widths.append(symwidth)
            totwidth += symwidth
        if sdrefagg:
            continue  # symbols already decoded individually
        if not widths:
            continue  # empty height class
        _check_dims(totwidth, hcheight, "JBIG2 height-class collective")
        bmsize = t_bm.decode(hb)
        if bmsize is _OOB or bmsize < 0:
            raise ValueError("JBIG2 bad collective bitmap size")
        hb.align()
        start = hb.byte_pos()
        if bmsize == 0:
            # uncompressed: rows padded to byte boundaries (6.5.9)
            row_bytes = (totwidth + 7) // 8
            need = row_bytes * hcheight
            raw = body[start : start + need]
            if len(raw) < need:
                raise ValueError("JBIG2 collective bitmap truncated")
            coll = np.unpackbits(
                np.frombuffer(raw, np.uint8).reshape(hcheight, row_bytes),
                axis=1,
            )[:, :totwidth]
            hb.pos = (start + need) * 8
        else:
            payload = body[start : start + bmsize]
            if len(payload) < bmsize:
                raise ValueError("JBIG2 collective bitmap truncated")
            from .fax import decode_g4

            coll = decode_g4(payload, totwidth, hcheight).astype(np.uint8)
            hb.pos = (start + bmsize) * 8
        x = 0
        for wd in widths:
            new_syms.append(np.ascontiguousarray(coll[:, x : x + wd]))
            x += wd
    all_syms = list(in_syms) + new_syms
    exported: list = []
    i = 0
    cur_export = 0
    while i < len(all_syms) and len(exported) < num_ex:
        run = t_ex.decode(hb)
        if run is _OOB or run < 0:
            raise ValueError("JBIG2 bad export run length")
        if cur_export:
            exported.extend(all_syms[i : i + run])
        i += run
        cur_export ^= 1
    if len(exported) != num_ex:
        raise ValueError("JBIG2 export count mismatch")
    return exported


def _decode_text_region(body: bytes, syms: list, tables: list | None = None):
    """Type 4/6/7 segment → (bitmap, region info). Arithmetic or Huffman
    (SBHUFF=1 without refinement); both strip sizes, all four reference
    corners, TRANSPOSED."""
    if len(body) < 17 + 2 + 4:
        raise ValueError("JBIG2 text region truncated")
    rw, rh, rx, ry = struct.unpack(">IIII", body[:16])
    from .kernels import MAX_DECODE_PIXELS, _check_dims

    _check_dims(rw, rh, "JBIG2 text region")
    comb_op = body[16] & 7
    flags = int.from_bytes(body[17:19], "big")
    sbhuff = flags & 1
    sbrefine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sb_def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32  # signed 5-bit
    rtemplate = (flags >> 15) & 1
    if sbhuff:
        return _decode_text_region_huffman(
            body,
            syms,
            tables or [],
            (rw, rh, rx, ry, comb_op),
            (refcorner, transposed, sb_def_pixel, ds_offset, log_strips),
            sbrefine=sbrefine,
            rtemplate=rtemplate,
        )
    strips = 1 << log_strips
    bp = 19
    rat = []
    if sbrefine and rtemplate == 0:
        for _ in range(2):
            ax = int.from_bytes(body[bp : bp + 1], "big", signed=True)
            ay = int.from_bytes(body[bp + 1 : bp + 2], "big", signed=True)
            rat.append((ax, ay))
            bp += 2
    num_instances = struct.unpack(">I", body[bp : bp + 4])[0]
    if num_instances > MAX_DECODE_PIXELS:
        raise ValueError("JBIG2 implausible text-region instance count")
    coder = MQDecoder(body[bp + 4 :])
    n_syms = max(len(syms), 1)
    symcodelen = max(1, (n_syms - 1).bit_length())
    ctxs = (_IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(),
            _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(), _IDCtx(symcodelen))
    page = _text_region_arith_core(
        coder, ctxs, {}, syms, num_instances, rw, rh, strips, refcorner,
        transposed, sb_def_pixel, ds_offset, sbrefine, rtemplate, rat,
    )
    return page, (rw, rh, rx, ry, comb_op)


def _text_region_arith_core(coder, ctxs, gr_cx, syms, num_instances,
                            rw, rh, strips, refcorner, transposed,
                            sb_def_pixel, ds_offset, sbrefine, rtemplate,
                            rat):
    """Shared instance-placement walk of 6.4.5 for arithmetic text
    regions — called with fresh contexts by _decode_text_region, and with
    the symbol dictionary's OWN coder and integer contexts by the
    REFAGGNINST>1 aggregate path (6.5.8.2.2 decodes a new symbol's bitmap
    as a one-strip TOPLEFT text region over the full symbol pool)."""
    from .kernels import _check_dims

    (iadt, iafs, iads, iait, iari, iardw, iardh, iardx, iardy,
     iaid) = ctxs
    page = np.full((rh, rw), sb_def_pixel, np.uint8)
    stript = iadt.decode(coder)
    if stript is _OOB:
        raise ValueError("JBIG2 OOB initial strip T")
    stript *= -strips
    firsts = 0
    placed = 0
    while placed < num_instances:
        dt = iadt.decode(coder)
        if dt is _OOB:
            raise ValueError("JBIG2 OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = iafs.decode(coder)
                if dfs is _OOB:
                    raise ValueError("JBIG2 OOB first-symbol S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = iads.decode(coder)
                if ids is _OOB:
                    break  # end of strip
                curs += ids + ds_offset
            curt = 0 if strips == 1 else iait.decode(coder)
            t = stript + curt
            sym_id = iaid.decode(coder)
            if sym_id >= len(syms):
                raise ValueError("JBIG2 symbol ID out of range")
            bm = syms[sym_id]
            if sbrefine:
                ri = iari.decode(coder)
                if ri is _OOB:
                    raise ValueError("JBIG2 OOB refinement flag")
                if ri:
                    rdw = iardw.decode(coder)
                    rdh = iardh.decode(coder)
                    rdx = iardx.decode(coder)
                    rdy = iardy.decode(coder)
                    nw, nh = bm.shape[1] + rdw, bm.shape[0] + rdh
                    if nw <= 0 or nh <= 0:
                        raise ValueError("JBIG2 refined instance dims")
                    _check_dims(nw, nh, "JBIG2 refined instance")
                    bm = _refine_bits(
                        nw, nh, rtemplate, rat, bm,
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy, coder, gr_cx,
                    )
            sh, sw = bm.shape
            if transposed:
                # 6.4.5(3)(c)(viii-xi): S runs vertically. The BOTTOM
                # corners advance CURS by H-1 before anchoring the bottom
                # edge at it, which cancels to the same start row as the
                # TOP corners — so only LEFT vs RIGHT changes the column.
                y = curs
                x = t if refcorner in (0, 1) else t - sw + 1
            else:
                # RIGHT corners advance CURS by W-1 before anchoring the
                # right edge — the same cancellation, so only TOP vs
                # BOTTOM changes the row.
                y = t if refcorner in (1, 3) else t - sh + 1
                x = curs
            if y < 0 or x < 0 or y + sh > rh or x + sw > rw:
                raise ValueError("JBIG2 symbol instance out of region")
            win = page[y : y + sh, x : x + sw]
            win |= bm  # per-instance combine: OR (SBCOMBOP subset)
            curs += (sh - 1) if transposed else (sw - 1)
            placed += 1
            if placed > num_instances:
                raise ValueError("JBIG2 text region instance overrun")
    return page


def _decode_text_region_huffman(body, syms, tables, region, opts,
                                sbrefine: int = 0, rtemplate: int = 0):
    """SBHUFF=1 text region (6.4.5 with 7.4.3.1.5-7.4.3.1.7): the 16-bit
    SBHUFFFLAGS select FS/DS/DT — and with SBREFINE also RDW/RDH/RDX/RDY
    plus the RSIZE bit (custom tables consumed in that spec order, or the
    B.6-B.15 standard defaults via selectors 0-2 — see _std_table). Symbol
    IDs ride the runcode-coded per-symbol prefix lengths, CURT is
    ceil(log2(SBSTRIPS)) raw bits, and each refined instance (6.4.11,
    RI read as one raw bit) carries RDW/RDH/RDX/RDY/BMSIZE through its
    tables followed by a BYTE-ALIGNED standalone MQ-coded generic
    refinement region of exactly BMSIZE bytes. Placement/corner/
    TRANSPOSED geometry is shared with the arithmetic path's rules."""
    from .kernels import MAX_DECODE_PIXELS

    rw, rh, rx, ry, comb_op = region
    hflags = int.from_bytes(body[19:21], "big")
    sel_fs = hflags & 3
    sel_ds = (hflags >> 2) & 3
    sel_dt = (hflags >> 4) & 3
    ti = iter(tables)

    def custom(name):
        try:
            return next(ti)
        except StopIteration:
            raise ValueError(
                f"JBIG2 Huffman text region missing referred {name} table"
            ) from None

    def pick(sel, std_ids, name):
        if sel == 3:
            return custom(name)
        if sel < len(std_ids):
            return _std_table(std_ids[sel])
        raise ValueError(f"JBIG2 {name} selector {sel} is reserved")

    t_fs = pick(sel_fs, (6, 7), "FS")
    t_ds = pick(sel_ds, (8, 9, 10), "DS")
    t_dt = pick(sel_dt, (11, 12, 13), "DT")
    bp = 21
    rat: list = []
    t_rdw = t_rdh = t_rdx = t_rdy = t_rsize = None
    if sbrefine:
        # selectors 0/1 are standard tables B.14/B.15, 3 custom
        t_rdw = pick((hflags >> 6) & 3, (14, 15), "RDW")
        t_rdh = pick((hflags >> 8) & 3, (14, 15), "RDH")
        t_rdx = pick((hflags >> 10) & 3, (14, 15), "RDX")
        t_rdy = pick((hflags >> 12) & 3, (14, 15), "RDY")
        t_rsize = custom("RSIZE") if (hflags >> 14) & 1 else _std_table(1)
        if rtemplate == 0:
            for _ in range(2):
                ax = int.from_bytes(body[bp : bp + 1], "big", signed=True)
                ay = int.from_bytes(body[bp + 1 : bp + 2], "big",
                                    signed=True)
                rat.append((ax, ay))
                bp += 2
    num_instances = struct.unpack(">I", body[bp : bp + 4])[0]
    if num_instances > MAX_DECODE_PIXELS:
        raise ValueError("JBIG2 implausible text-region instance count")
    hb = _HBits(body, (bp + 4) * 8)
    # 7.4.3.1.7: 35 five-bit runcode lengths → runcode table → per-symbol
    # code lengths (32: repeat prev 3-6, 33: zeros 3-10, 34: zeros 11-138)
    n_syms = len(syms)
    runtab = _HuffTable(
        [(hb.read(5), 0, i, "n") for i in range(35)]
    )
    symlens: list[int] = []
    prev = 0
    while len(symlens) < n_syms:
        c = runtab.decode(hb)
        if c is _OOB:
            raise ValueError("JBIG2 runcode OOB")
        if c < 32:
            symlens.append(c)
            prev = c
        elif c == 32:
            if not symlens:
                raise ValueError("JBIG2 runcode 32 with no previous length")
            symlens.extend([prev] * (3 + hb.read(2)))
        elif c == 33:
            symlens.extend([0] * (3 + hb.read(3)))
        else:
            symlens.extend([0] * (11 + hb.read(7)))
    if len(symlens) != n_syms:
        raise ValueError("JBIG2 symbol code lengths overrun")
    symtab = _HuffTable(
        [(symlens[i], 0, i, "n") for i in range(n_syms)]
    )
    hb.align()  # 7.4.3.1.7: skip to a byte boundary after the ID codes
    page = _text_region_huffman_core(
        body, hb, syms, num_instances, rw, rh, opts,
        t_fs, t_ds, t_dt, t_rdw, t_rdh, t_rdx, t_rdy, t_rsize,
        rat, rtemplate, sbrefine, lambda: symtab.decode(hb))
    return page, (rw, rh, rx, ry, comb_op)


def _text_region_huffman_core(body, hb, syms, num_instances, rw, rh,
                              opts, t_fs, t_ds, t_dt, t_rdw, t_rdh,
                              t_rdx, t_rdy, t_rsize, rat, rtemplate,
                              sbrefine, read_sym):
    """The 6.4.5 Huffman placement loop over an explicit table set and
    symbol-ID reader. Shared between segment-level text regions (runcode
    symbol-ID Huffman codes) and the embedded aggregate text region of a
    SDHUFF symbol dictionary (6.5.8.2.2: Table-17 fixed tables, raw
    SBSYMCODELEN-bit symbol IDs, window-relative refinement streams).
    ``body`` is the byte window every refinement offset is relative to;
    ``hb`` must be an _HBits positioned inside that window."""
    from .kernels import _check_dims

    refcorner, transposed, sb_def_pixel, ds_offset, log_strips = opts
    strips = 1 << log_strips
    page = np.full((rh, rw), sb_def_pixel, np.uint8)
    stript = t_dt.decode(hb)
    if stript is _OOB:
        raise ValueError("JBIG2 OOB initial strip T")
    stript *= -strips
    firsts = 0
    placed = 0
    while placed < num_instances:
        dt = t_dt.decode(hb)
        if dt is _OOB:
            raise ValueError("JBIG2 OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = t_fs.decode(hb)
                if dfs is _OOB:
                    raise ValueError("JBIG2 OOB first-symbol S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = t_ds.decode(hb)
                if ids is _OOB:
                    break  # end of strip
                curs += ids + ds_offset
            curt = 0 if strips == 1 else hb.read(log_strips)
            t = stript + curt
            sym_id = read_sym()
            if sym_id is _OOB or sym_id >= len(syms):
                raise ValueError("JBIG2 symbol ID out of range")
            bm = syms[sym_id]
            if sbrefine and hb.read(1):
                rdw = t_rdw.decode(hb)
                rdh = t_rdh.decode(hb)
                rdx = t_rdx.decode(hb)
                rdy = t_rdy.decode(hb)
                bmsize = t_rsize.decode(hb)
                if _OOB in (rdw, rdh, rdx, rdy, bmsize) or bmsize <= 0:
                    raise ValueError("JBIG2 bad Huffman refinement fields")
                nw, nh = bm.shape[1] + rdw, bm.shape[0] + rdh
                if nw <= 0 or nh <= 0:
                    raise ValueError("JBIG2 refined instance dims")
                _check_dims(nw, nh, "JBIG2 refined instance")
                hb.align()
                start = hb.byte_pos()
                if start + bmsize > len(body):
                    raise ValueError("JBIG2 refinement data truncated")
                bm = _refine_bits(
                    nw, nh, rtemplate, rat, bm,
                    (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                    MQDecoder(body[start : start + bmsize]), {},
                )
                hb.pos = (start + bmsize) * 8
            sh, sw = bm.shape
            if transposed:
                y = curs
                x = t if refcorner in (0, 1) else t - sw + 1
            else:
                y = t if refcorner in (1, 3) else t - sh + 1
                x = curs
            if y < 0 or x < 0 or y + sh > rh or x + sw > rw:
                raise ValueError("JBIG2 symbol instance out of region")
            page[y : y + sh, x : x + sw] |= bm
            curs += (sh - 1) if transposed else (sw - 1)
            placed += 1
            if placed >= num_instances:
                break
    return page


# -- pattern dictionary + halftone region (T.88 6.6 / 6.7) ---------------------


def _decode_pattern_dict(body: bytes) -> list:
    """Type-16 segment → list of HDPW×HDPH pattern bitmaps, decoded as
    one collective generic region then sliced (6.7.5)."""
    if len(body) < 7:
        raise ValueError("JBIG2 pattern dictionary truncated")
    flags = body[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = body[1], body[2]
    graymax = struct.unpack(">I", body[3:7])[0]
    if hdpw == 0 or hdph == 0:
        raise ValueError("JBIG2 zero pattern dims")
    from .kernels import _check_dims

    total_w = (graymax + 1) * hdpw
    _check_dims(total_w, hdph, "JBIG2 pattern dictionary")
    if hdmmr:
        from .fax import decode_g4

        coll = decode_g4(body[7:], total_w, hdph).astype(np.uint8)
    else:
        at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
        coll = _region_bits(total_w, hdph, template, at[: 4 if template == 0 else 1],
                            False, MQDecoder(body[7:]))
    return [coll[:, k * hdpw : (k + 1) * hdpw] for k in range(graymax + 1)]


def _decode_grayscale(coder, w: int, h: int, bpp: int, template: int,
                      skip=None) -> np.ndarray:
    """Annex C gray-coded bitplane image: planes MSB→LSB, one shared
    decoder + context set; bit_j = plane_j XOR bit_{j+1}. ``skip`` is
    the HSKIP bitmap (HENABLESKIP): those grid cells are never coded in
    any plane and decode to gray value 0."""
    at = [(template <= 1 and 3 or 2, -1), (-3, -1), (2, -2), (-2, -2)]
    at = at[: 4 if template == 0 else 1]
    cx: dict = {}
    val = np.zeros((h, w), np.int64)
    prev = np.zeros((h, w), np.uint8)
    for _j in range(bpp):
        plane = _region_bits(w, h, template, at, False, coder, cx=cx, skip=skip)
        bit = plane ^ prev
        val = (val << 1) | bit
        prev = bit
    return val


def _halftone_skip(hgw: int, hgh: int, hgx: int, hgy: int, hrx: int,
                   hry: int, pw: int, ph: int, rw: int, rh: int) -> list:
    """HSKIP per T.88 6.6.5.1: grid cells whose pattern placement falls
    entirely outside the region are never coded."""
    out = []
    for mg in range(hgh):
        row = []
        for ng in range(hgw):
            x = (hgx + mg * hry + ng * hrx) >> 8
            y = (hgy + mg * hrx - ng * hry) >> 8
            row.append(
                1 if (x + pw <= 0 or x >= rw or y + ph <= 0 or y >= rh) else 0
            )
        out.append(row)
    return out


def _decode_halftone_region(body: bytes, patterns: list):
    """Type 20/22/23 segment → (bitmap, region info)."""
    if len(body) < 18 + 16 + 4:
        raise ValueError("JBIG2 halftone region truncated")
    rw, rh, rx, ry = struct.unpack(">IIII", body[:16])
    comb_op = body[16] & 7
    flags = body[17]
    hmmr = flags & 1
    template = (flags >> 1) & 3
    enable_skip = (flags >> 3) & 1
    hdef = (flags >> 7) & 1
    hgw, hgh = struct.unpack(">II", body[18:26])
    from .kernels import _check_dims

    _check_dims(max(hgw, 1), max(hgh, 1), "JBIG2 halftone grid")
    _check_dims(rw, rh, "JBIG2 halftone region")
    hgx, hgy = struct.unpack(">ii", body[26:34])
    hrx, hry = struct.unpack(">HH", body[34:38])
    if not patterns:
        raise ValueError("JBIG2 halftone region without pattern dictionary")
    graymax = len(patterns) - 1
    bpp = max(1, graymax.bit_length())
    hskip = None
    if enable_skip:
        if hmmr:
            # skipped cells can't be "not coded" in an MMR line (runs span
            # the whole row) — T.88 6.6.5.1 skip applies to arithmetic only
            raise ValueError("JBIG2 MMR halftone with HENABLESKIP")
        p0h, p0w = patterns[0].shape
        hskip = _halftone_skip(hgw, hgh, hgx, hgy, hrx, hry, p0w, p0h, rw, rh)
    if hmmr:
        # T.88 Annex C.5: bpp consecutive MMR planes in ONE bitstream,
        # MSB first, then the same gray-code XOR chain as the MQ path
        from .fax import decode_g4_planes

        planes = decode_g4_planes(body[38:], hgw, hgh, bpp)
        gray = np.zeros((hgh, hgw), np.int64)
        prev = np.zeros((hgh, hgw), np.uint8)
        for plane in planes:
            bit = plane ^ prev
            gray = (gray << 1) | bit
            prev = bit
    else:
        gray = _decode_grayscale(
            MQDecoder(body[38:]), hgw, hgh, bpp, template, skip=hskip
        )
    page = np.full((rh, rw), hdef, np.uint8)
    ph, pw = patterns[0].shape
    for mg in range(hgh):
        for ng in range(hgw):
            x = (hgx + mg * hry + ng * hrx) >> 8
            y = (hgy + mg * hrx - ng * hry) >> 8
            v = int(gray[mg, ng])
            if v > graymax:
                raise ValueError("JBIG2 halftone gray value out of range")
            pat = patterns[v]
            # clip the pattern to the region (grid cells may overhang)
            y0, x0 = max(y, 0), max(x, 0)
            y1, x1 = min(y + ph, rh), min(x + pw, rw)
            if y1 <= y0 or x1 <= x0:
                continue
            win = page[y0:y1, x0:x1]
            win |= pat[y0 - y : y1 - y, x0 - x : x1 - x]
    return page, (rw, rh, rx, ry, comb_op)


def _encode_pattern_dict(patterns: list, template: int = 0) -> bytes:
    pats = [np.asarray(p, np.uint8) for p in patterns]
    hdph, hdpw = pats[0].shape
    if any(p.shape != (hdph, hdpw) for p in pats):
        raise ValueError("patterns must share one shape")
    coll = np.concatenate(pats, axis=1)
    at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
    at = at[: 4 if template == 0 else 1]
    coder = MQEncoder()
    _region_bits(coll.shape[1], hdph, template, at, False, coder, bitmap=coll)
    body = bytes([(template & 3) << 1, hdpw, hdph])
    body += struct.pack(">I", len(pats) - 1)
    return body + coder.flush()


def _encode_halftone_region(gray: np.ndarray, patterns: list, rw: int,
                            rh: int, template: int = 0,
                            enable_skip: bool = False,
                            mmr: bool = False) -> bytes:
    """Fixture side: grid vectors HRX = pattern width << 8, HRY = 0.
    With ``enable_skip``, grid cells placed fully outside the region
    (gray wider/taller than the region allows) are not coded —
    bit-exercising the decoder's HSKIP path."""
    pats = [np.asarray(p, np.uint8) for p in patterns]
    ph, pw = pats[0].shape
    hgh, hgw = gray.shape
    graymax = len(pats) - 1
    bpp = max(1, graymax.bit_length())
    at = [(template <= 1 and 3 or 2, -1), (-3, -1), (2, -2), (-2, -2)]
    at = at[: 4 if template == 0 else 1]
    if enable_skip and mmr:
        raise ValueError("MMR halftone cannot carry a skip bitmap")
    hskip = None
    if enable_skip:
        hskip = _halftone_skip(hgw, hgh, 0, 0, pw << 8, 0, pw, ph, rw, rh)
    if mmr:
        from .fax import encode_g4_planes

        planes = []
        prev = np.zeros_like(gray, np.uint8)
        for j in range(bpp - 1, -1, -1):
            bit = ((gray >> j) & 1).astype(np.uint8)
            planes.append(bit ^ prev)
            prev = bit
        payload = encode_g4_planes(planes)
    else:
        coder = MQEncoder()
        cx: dict = {}
        prev = np.zeros_like(gray, np.uint8)
        for j in range(bpp - 1, -1, -1):
            bit = ((gray >> j) & 1).astype(np.uint8)
            plane = bit ^ prev
            _region_bits(hgw, hgh, template, at, False, coder, bitmap=plane,
                         cx=cx, skip=hskip)
            # the decoder reconstructs 0 at skipped cells in every plane, so
            # its XOR-accumulated bit is 0 there — mirror that in prev
            if hskip is not None:
                bit = bit & (1 - np.array(hskip, np.uint8))
            prev = bit
        payload = coder.flush()
    body = struct.pack(">IIII", rw, rh, 0, 0) + bytes([0])  # combine OR
    body += bytes([(1 if mmr else 0) | ((template & 3) << 1)
                   | (8 if enable_skip else 0)])
    body += struct.pack(">II", hgw, hgh)
    body += struct.pack(">ii", 0, 0)
    body += struct.pack(">HH", pw << 8, 0)
    return body + payload


def encode_jbig2_halftone(gray: np.ndarray, patterns: list, page_w: int,
                          page_h: int, enable_skip: bool = False,
                          mmr: bool = False) -> bytes:
    """Fixture encoder: pattern dictionary + one immediate lossless
    halftone region rendering ``gray`` (values index ``patterns``)."""

    def seg(num: int, styp: int, refs: list, body: bytes) -> bytes:
        hdr = struct.pack(">IB", num, styp) + bytes([(len(refs) << 5)])
        for r in refs:
            hdr += bytes([r])
        hdr += bytes([1]) + struct.pack(">I", len(body))
        return hdr + body

    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x01\x00\x00"
    out = seg(0, 48, [], page_info)
    out += seg(1, 16, [], _encode_pattern_dict(patterns))
    out += seg(2, 23, [1],
               _encode_halftone_region(np.asarray(gray), patterns,
                                       page_w, page_h,
                                       enable_skip=enable_skip, mmr=mmr))
    out += seg(3, 49, [], b"")
    return out


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
    if count * ref_size > len(d) - pos:
        raise ValueError("JBIG2 referred-segment list exceeds data")
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


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded-organization JBIG2 (PDF JBIG2Decode payload, with the
    optional JBIG2Globals stream prepended) → uint8 bitmap, 1 = black
    (the JBIG2 wire convention; PDF callers invert for DeviceGray).

    Error contract (same as decode_image): corrupt bytes raise
    ValueError, unimplemented features NotImplementedError — never a
    bare structural exception, and implausible dims/counts are rejected
    before any large allocation or long decode loop (fuzz-pinned)."""
    try:
        return _decode_jbig2(data, globals_data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, MemoryError,
            RecursionError, struct.error) as e:
        raise ValueError(f"corrupt JBIG2: {type(e).__name__}: {e}") from e


def _decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    if data[:8] == b"\x97JB2\r\n\x1a\n":
        # standalone file header: flags byte + optional page count
        flags = data[8]
        pos = 9 if flags & 2 else 13
        data = data[pos:]
    d = globals_data + data
    page = None
    sym_dicts: dict[int, list] = {}  # segment number → exported symbols
    pat_dicts: dict[int, list] = {}  # segment number → pattern bitmaps
    tab_segs: dict[int, _HuffTable] = {}  # segment number → custom table
    # intermediate region results (8.2: retained for later refinement
    # segments instead of being composed onto the page)
    aux_regions: dict[int, np.ndarray] = {}

    def compose(bm, rw, rh, rx, ry, comb_op, what):
        if ry + rh > page.shape[0] or rx + rw > page.shape[1]:
            raise ValueError(f"JBIG2 {what} exceeds page bounds")
        win = page[ry : ry + rh, rx : rx + rw]
        if comb_op == 0:  # OR
            win |= bm
        elif comb_op == 1:  # AND
            win &= bm
        elif comb_op == 2:  # XOR
            win ^= bm
        elif comb_op == 3:  # XNOR (T.88 Table 32)
            win[:] = 1 - (win ^ bm)
        elif comb_op == 4:  # REPLACE
            win[:] = bm
        else:
            raise ValueError(f"JBIG2 reserved combine op {comb_op}")

    pos = 0
    while pos < len(d):
        seg = _parse_segment_header(d, pos)
        body = d[seg["data_pos"] : seg["data_pos"] + seg["length"]]
        if len(body) < seg["length"]:
            raise ValueError("JBIG2 segment data truncated")
        pos = seg["data_pos"] + seg["length"]
        styp = seg["type"]
        if styp == 0:  # symbol dictionary
            in_syms = []
            for ref in seg["refs"]:
                in_syms.extend(sym_dicts.get(ref, []))
            tables = [tab_segs[r] for r in seg["refs"] if r in tab_segs]
            sym_dicts[seg["num"]] = _decode_symbol_dict(body, in_syms, tables)
        elif styp == 53:  # custom Huffman table
            tab_segs[seg["num"]] = _parse_table_segment(body)
        elif styp == 16:  # pattern dictionary
            pat_dicts[seg["num"]] = _decode_pattern_dict(body)
        elif styp in (20, 22, 23):  # halftone region (intermediate/immediate)
            if page is None:
                raise ValueError("JBIG2 halftone region before page information")
            pats = []
            for ref in seg["refs"]:
                pats.extend(pat_dicts.get(ref, []))
            bm, (rw, rh, rx, ry, comb_op) = _decode_halftone_region(body, pats)
            if styp == 20:
                aux_regions[seg["num"]] = bm
            else:
                compose(bm, rw, rh, rx, ry, comb_op, "halftone region")
        elif styp in (4, 6, 7):  # text region (intermediate/immediate)
            if page is None:
                raise ValueError("JBIG2 text region before page information")
            syms = []
            for ref in seg["refs"]:
                syms.extend(sym_dicts.get(ref, []))
            tables = [tab_segs[r] for r in seg["refs"] if r in tab_segs]
            bm, (rw, rh, rx, ry, comb_op) = _decode_text_region(
                body, syms, tables
            )
            if styp == 4:
                aux_regions[seg["num"]] = bm
            else:
                compose(bm, rw, rh, rx, ry, comb_op, "text region")
        elif styp in (40, 42, 43):  # refinement region (7.4.7)
            if page is None:
                raise ValueError("JBIG2 refinement region before page info")
            if len(body) < 18:
                raise ValueError("JBIG2 refinement segment truncated")
            rw, rh, rx, ry = struct.unpack(">IIII", body[:16])
            from .kernels import _check_dims

            _check_dims(rw, rh, "JBIG2 refinement region")
            comb_op = body[16] & 7
            rflags = body[17]
            rtemplate = rflags & 1
            tpgron = bool(rflags & 2)
            bp = 18
            rat = []
            if rtemplate == 0:
                for _ in range(2):
                    ax = int.from_bytes(body[bp : bp + 1], "big", signed=True)
                    ay = int.from_bytes(body[bp + 1 : bp + 2], "big",
                                        signed=True)
                    rat.append((ax, ay))
                    bp += 2
            # reference: a referred intermediate region if any, else the
            # page area under the region (7.4.7.2, GRREFERENCEDX/DY = 0)
            ref_bm = None
            for r in seg["refs"]:
                if r in aux_regions:
                    ref_bm = aux_regions[r]
                    break
            if ref_bm is None:
                if ry + rh > page.shape[0] or rx + rw > page.shape[1]:
                    raise ValueError(
                        "JBIG2 refinement region exceeds page bounds"
                    )
                ref_bm = page[ry : ry + rh, rx : rx + rw].copy()
            elif ref_bm.shape != (rh, rw):
                raise ValueError(
                    "JBIG2 refinement reference region size mismatch"
                )
            bm = _refine_bits(rw, rh, rtemplate, rat, ref_bm, 0, 0,
                              MQDecoder(body[bp:]), {}, tpgron=tpgron)
            if styp == 40:
                aux_regions[seg["num"]] = bm
            else:
                compose(bm, rw, rh, rx, ry, comb_op, "refinement region")
        elif styp == 48:  # page information
            if len(body) < 19:
                raise ValueError("JBIG2 page info truncated")
            w, h = struct.unpack(">II", body[:8])
            pflags = body[16]
            if h == 0xFFFFFFFF:
                raise NotImplementedError("JBIG2 unknown page height")
            from .kernels import _check_dims

            _check_dims(w, h, "JBIG2 page")
            page = np.full((h, w), (pflags >> 2) & 1, np.uint8)
        elif styp in (36, 38, 39):  # generic region (intermediate/immediate)
            if page is None:
                raise ValueError("JBIG2 region before page information")
            if len(body) < 18:
                raise ValueError("JBIG2 region segment truncated")
            rw, rh, rx, ry = struct.unpack(">IIII", body[:16])
            from .kernels import _check_dims

            _check_dims(rw, rh, "JBIG2 region")
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
            if styp == 36:  # intermediate: retain, don't compose
                aux_regions[seg["num"]] = bm
            else:
                compose(bm, rw, rh, rx, ry, comb_op, "region")
        elif styp == 62:  # extension (7.4.14): the type's bit 31 is the
            # "necessary" bit — a decoder that does not understand a
            # necessary extension cannot decode correctly, so it must be
            # loud; anything else (e.g. 0x20000000/0x20000002 coded
            # comments) is safely skipped
            if len(body) < 4:
                raise ValueError("JBIG2 extension segment truncated")
            ext_type = struct.unpack(">I", body[:4])[0]
            if ext_type & 0x80000000:
                raise NotImplementedError(
                    f"JBIG2 necessary extension 0x{ext_type:08X} unsupported"
                )
            continue
        elif styp in (49, 50, 51):  # end of page/stripe/file
            continue
        else:
            raise ValueError(f"JBIG2 unknown segment type {styp}")
    if page is None:
        raise ValueError("JBIG2 stream has no page")
    return page


def _encode_symbol_dict(symbols: list, template: int = 0) -> bytes:
    """Fixture side of _decode_symbol_dict: all symbols exported."""
    at = list(_TEMPLATES[template][1])
    coder = MQEncoder()
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    gb_cx: dict = {}
    hcheight = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        iadh.encode(coder, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == hcheight:
            w = symbols[i].shape[1]
            iadw.encode(coder, w - symwidth)
            symwidth = w
            _region_bits(w, hcheight, template, at, False, coder,
                         bitmap=symbols[i], cx=gb_cx)
            i += 1
        iadw.encode(coder, _OOB)
    iaex.encode(coder, 0)  # first run: 0 symbols NOT exported
    iaex.encode(coder, len(symbols))  # then: all exported
    flags = (template & 3) << 10
    body = flags.to_bytes(2, "big")
    for ax, ay in at[: 4 if template == 0 else 1]:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">II", len(symbols), len(symbols))
    return body + coder.flush()


def _encode_symbol_dict_huffman(symbols: list, mmr: bool = False) -> bytes:
    """Fixture side of _decode_symbol_dict_huffman: SDHUFF=1, SDREFAGG=0,
    DH via B.5 and DW via B.3 (both sign-capable, so height classes ride
    in input order exactly like the arithmetic fixture encoder), BMSIZE
    via B.1, collective bitmaps uncompressed (``mmr=False``) or T.6
    (``mmr=True``). All symbols exported."""
    from .fax import encode_g4

    t_dh, t_dw, t_bm, t_ex = (
        _std_table(5), _std_table(3), _std_table(1), _std_table(1)
    )
    bw = _HBitW()
    hcheight = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        t_dh.encode(bw, h - hcheight)
        hcheight = h
        symwidth = 0
        cls = []
        while i < len(symbols) and symbols[i].shape[0] == hcheight:
            w = symbols[i].shape[1]
            t_dw.encode(bw, w - symwidth)
            symwidth = w
            cls.append(symbols[i])
            i += 1
        t_dw.encode(bw, _OOB)
        coll = np.concatenate(cls, axis=1).astype(np.uint8)
        if mmr:
            payload = encode_g4(coll)
            t_bm.encode(bw, len(payload))
            bw.align()
            bw.put_bytes(payload)
        else:
            t_bm.encode(bw, 0)
            bw.align()
            bw.put_bytes(np.packbits(coll, axis=1).tobytes())
    t_ex.encode(bw, 0)  # first run: 0 symbols NOT exported
    t_ex.encode(bw, len(symbols))
    # flags: SDHUFF=1, SDHUFFDH=1 (B.5), SDHUFFDW=1 (B.3), BMSIZE/AGG std
    flags = 1 | (1 << 2) | (1 << 4)
    return (
        flags.to_bytes(2, "big")
        + struct.pack(">II", len(symbols), len(symbols))
        + bw.done()
    )


def _encode_agg_text_window(placements: list, pool: list,
                            symcodelen: int, rtemplate: int,
                            rat: list) -> bytes:
    """Fixture side of the 6.5.8.2.2 SDHUFF embedded text region: one
    strip at T=0, TOPLEFT placements (sym_id, x, refined_bm | None) in
    ascending x, the Table-17 fixed tables (FS=B.6, DS=B.8, DT=B.11,
    RDW/RDH/RDX/RDY=B.15, RSIZE=B.1), raw SBSYMCODELEN-bit symbol IDs,
    refinements as window-relative byte-aligned MQ streams."""
    t_fs, t_ds, t_dt = _std_table(6), _std_table(8), _std_table(11)
    t_r15, t_r1 = _std_table(15), _std_table(1)
    bw = _HBitW()
    t_dt.encode(bw, 1)  # initial STRIPT = -1 (B.11 encodes no zero)
    t_dt.encode(bw, 1)  # first strip: T = 0
    curs = 0
    for k, (sym_id, x, rbm) in enumerate(placements):
        if k == 0:
            t_fs.encode(bw, x)
        else:
            t_ds.encode(bw, x - curs)
        bw.put(sym_id, symcodelen)
        base = pool[sym_id]
        if rbm is None:
            bw.put(0, 1)  # RI
            bm = base
        else:
            bw.put(1, 1)
            rdw = rbm.shape[1] - base.shape[1]
            rdh = rbm.shape[0] - base.shape[0]
            for v in (rdw, rdh, 0, 0):
                t_r15.encode(bw, v)
            enc = MQEncoder()
            _refine_bits(rbm.shape[1], rbm.shape[0], rtemplate, rat,
                         base, rdw >> 1, rdh >> 1, enc, {}, bitmap=rbm)
            data = enc.flush()
            t_r1.encode(bw, len(data))
            bw.align()
            bw.put_bytes(data)
            bm = rbm
        curs = x + bm.shape[1] - 1
    return bw.done()


def _encode_symbol_dict_huffman_refined(new_specs: list, in_syms: list,
                                        rtemplate: int = 0) -> bytes:
    """Fixture side of the SDHUFF=1 + SDREFAGG=1 path: every new symbol
    is a single-instance refinement (bitmap, ref_id, rdx, rdy) of a
    symbol already in the pool — or, as a 2-tuple (bitmap, placements),
    a REFAGGNINST>1 AGGREGATE whose bitmap is an embedded Huffman text
    region over the pool (6.5.8.2.2; BMSIZE via B.1). DH via B.5, DW via
    B.3, REFAGGNINST via B.1; single-instance references ride
    SBSYMCODELEN raw bits, RDX/RDY Table B.15 and the size Table B.1
    (both mandated by Table 20), each refinement a byte-aligned
    standalone MQ stream."""
    t_dh, t_dw = _std_table(5), _std_table(3)
    t_agg, t_ex = _std_table(1), _std_table(1)
    t_rdxy, t_rsize = _std_table(15), _std_table(1)
    n_in = len(in_syms)
    symcodelen = max(1, (max(n_in + len(new_specs), 1) - 1).bit_length())
    rat = [(-1, -1), (-1, -1)] if rtemplate == 0 else []
    bw = _HBitW()
    pool = list(in_syms)
    hcheight = 0
    i = 0
    while i < len(new_specs):
        h = new_specs[i][0].shape[0]
        t_dh.encode(bw, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(new_specs) and new_specs[i][0].shape[0] == hcheight:
            if len(new_specs[i]) == 2:
                bm, placements = new_specs[i]
                t_dw.encode(bw, bm.shape[1] - symwidth)
                symwidth = bm.shape[1]
                t_agg.encode(bw, len(placements))
                window = _encode_agg_text_window(
                    placements, pool, symcodelen, rtemplate, rat)
                t_rsize.encode(bw, len(window))
                bw.align()
                bw.put_bytes(window)
                pool.append(bm)
                i += 1
                continue
            bm, ref_id, rdx, rdy = new_specs[i]
            t_dw.encode(bw, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            t_agg.encode(bw, 1)
            bw.put(ref_id, symcodelen)
            t_rdxy.encode(bw, rdx)
            t_rdxy.encode(bw, rdy)
            enc = MQEncoder()
            _refine_bits(bm.shape[1], bm.shape[0], rtemplate, rat,
                         pool[ref_id], rdx, rdy, enc, {}, bitmap=bm)
            data = enc.flush()
            t_rsize.encode(bw, len(data))
            bw.align()
            bw.put_bytes(data)
            pool.append(bm)
            i += 1
        t_dw.encode(bw, _OOB)
    t_ex.encode(bw, n_in)  # imports not re-exported
    t_ex.encode(bw, len(new_specs))
    flags = (1 | (1 << 1) | (1 << 2) | (1 << 4)
             | ((rtemplate & 1) << 12))
    body = flags.to_bytes(2, "big")
    for ax, ay in rat:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">II", len(new_specs), len(new_specs))
    return body + bw.done()


def _encode_text_region_huffman(
    placements: list, n_syms: int, syms: list, rw: int, rh: int,
    strips: int = 1, transposed: bool = False, refcorner: int = 1,
    std_tables: bool = False,
):
    """Fixture side of _decode_text_region_huffman. FS/DS/DT ride CUSTOM
    table segments (returned alongside the body) sized to the placement
    deltas — the shape real jbig2enc output with custom tables takes;
    symbol IDs use a flat equal-length code. With ``std_tables`` the
    region instead selects the STANDARD defaults (FS=B.6, DS=B.8,
    DT=B.11, and for refinement RDW/RDH/RDX/RDY=B.15, RSIZE=B.1 —
    selector values 0/0/0 and 1/1/1/1) and refers no table segments;
    because B.11 has no value 0, the initial strip-T rides the spec's
    negation (initial DT=1 → STRIPT=-SBSTRIPS, 6.4.5). Placements of the
    form (sym_id, x, y, refined_bitmap) turn on SBREFINE: each
    refinement is a byte-aligned standalone MQ stream. Returns
    (body, [table bodies in spec consumption order])."""
    log_strips = strips.bit_length() - 1
    if (1 << log_strips) != strips or strips > 8:
        raise ValueError("strips must be 1, 2, 4 or 8")
    if n_syms < 2:
        raise ValueError("huffman fixture needs >= 2 symbols")
    refine = any(len(p) > 3 for p in placements)
    rat = [(-1, -1), (-1, -1)] if refine else []

    def inst_dims(p):
        bm = np.asarray(p[3], np.uint8) if len(p) > 3 else syms[p[0]]
        return bm.shape  # (h, w)

    def anchors(p):
        sym_id, x, y = p[0], p[1], p[2]
        h, w = inst_dims(p)
        if transposed:
            return (x if refcorner in (0, 1) else x + w - 1), y
        return (y if refcorner in (1, 3) else y + h - 1), x

    order = sorted(placements, key=lambda p: (anchors(p)[0] // strips,
                                              anchors(p)[1]))
    if std_tables:
        t_fs, t_ds, t_dt = _std_table(6), _std_table(8), _std_table(11)
        tab_bodies = []
        if refine:
            t_rd, t_rsize = _std_table(15), _std_table(1)
    else:
        # one wide 13-bit line each keeps the fixture tables tiny and legal
        fs_body, t_fs = _encode_table_segment(
            (-(1 << 12), 1 << 12), htoob=False, rangelen=13
        )
        ds_body, t_ds = _encode_table_segment(
            (-(1 << 12), 1 << 12), htoob=True, rangelen=13
        )
        dt_body, t_dt = _encode_table_segment((0, 1 << 12), htoob=False,
                                              rangelen=12)
        tab_bodies = [fs_body, ds_body, dt_body]
        if refine:
            rd_body, t_rd = _encode_table_segment(
                (-(1 << 12), 1 << 12), htoob=False, rangelen=13
            )
            rs_body, t_rsize = _encode_table_segment(
                (0, 1 << 13), htoob=False, rangelen=14
            )
            # RDW/RDH/RDX/RDY share one table shape; four referred segments
            tab_bodies += [rd_body, rd_body, rd_body, rd_body, rs_body]
    bw = _HBitW()
    symlen = max(1, (n_syms - 1).bit_length())
    # runcode lengths: one 1-bit code for value `symlen`
    for i in range(35):
        bw.put(1 if i == symlen else 0, 5)
    for _ in range(n_syms):
        bw.put(0, 1)  # every symbol: length `symlen`
    bw.align()
    if std_tables:
        # B.11 has no 0 code; 6.4.5 negates the initial DT, so DT=1 puts
        # STRIPT at -strips and the first strip delta stays >= 1
        t_dt.encode(bw, 1)
        stript = -strips
    else:
        t_dt.encode(bw, 0)  # STRIPT starts at 0
        stript = 0
    firsts = 0
    k = 0
    while k < len(order):
        strip_t = anchors(order[k])[0] // strips * strips
        t_dt.encode(bw, (strip_t - stript) // strips)
        stript = strip_t
        first = True
        curs = 0
        while k < len(order) and (
            anchors(order[k])[0] // strips * strips == strip_t
        ):
            p = order[k]
            t_anchor, s_start = anchors(p)
            if first:
                t_fs.encode(bw, s_start - firsts)
                firsts = s_start
                curs = s_start
                first = False
            else:
                t_ds.encode(bw, s_start - curs)
                curs = s_start
            if strips > 1:
                bw.put(t_anchor - strip_t, log_strips)
            bw.put(p[0], symlen)
            bm = syms[p[0]]
            if refine:
                if len(p) > 3:
                    refined = np.asarray(p[3], np.uint8)
                    base = syms[p[0]]
                    rdw = refined.shape[1] - base.shape[1]
                    rdh = refined.shape[0] - base.shape[0]
                    bw.put(1, 1)
                    t_rd.encode(bw, rdw)
                    t_rd.encode(bw, rdh)
                    t_rd.encode(bw, 0)  # RDX
                    t_rd.encode(bw, 0)  # RDY
                    enc = MQEncoder()
                    _refine_bits(refined.shape[1], refined.shape[0], 0,
                                 rat, base, rdw >> 1, rdh >> 1, enc, {},
                                 bitmap=refined)
                    data = enc.flush()
                    t_rsize.encode(bw, len(data))
                    bw.align()
                    bw.put_bytes(data)
                    bm = refined
                else:
                    bw.put(0, 1)
            curs += bm.shape[0 if transposed else 1] - 1
            k += 1
        t_ds.encode(bw, _OOB)
    # region flags: SBHUFF=1 (+ SBREFINE) + corner/strips/transposed;
    # SBHUFFFLAGS: either all custom (selector 3, RSIZE custom bit 14) or
    # the standard defaults (FS/DS/DT selector 0 → B.6/B.8/B.11;
    # RDW/RDH/RDX/RDY selector 1 → B.15; RSIZE bit 14 clear → B.1)
    flags = 1 | (int(transposed) << 6) | (refcorner << 4) | (log_strips << 2)
    if std_tables:
        hflags = 0
        if refine:
            flags |= 1 << 1
            hflags |= (1 << 6) | (1 << 8) | (1 << 10) | (1 << 12)
    else:
        hflags = 3 | (3 << 2) | (3 << 4)
        if refine:
            flags |= 1 << 1
            hflags |= (3 << 6) | (3 << 8) | (3 << 10) | (3 << 12) | (1 << 14)
    body = struct.pack(">IIII", rw, rh, 0, 0) + bytes([0])  # combine OR
    body += flags.to_bytes(2, "big") + hflags.to_bytes(2, "big")
    for ax, ay in rat:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">I", len(placements))
    return body + bw.done(), tab_bodies


def encode_jbig2_text_huffman(
    symbols: list, placements: list, page_w: int, page_h: int,
    strips: int = 1, mmr: bool = False, transposed: bool = False,
    refcorner: int = 1, std_tables: bool = False,
    refined_symbols: list | None = None,
) -> bytes:
    """Fixture encoder for the Huffman-coded symbol path: page info +
    (unless ``std_tables``: three custom FS/DS/DT table segments +) a
    SDHUFF symbol dictionary + one immediate lossless Huffman text region
    referring dict (+ tables). ``std_tables`` selects the B.6/B.8/B.11
    standard defaults — the shape default-configured scanner output
    takes. ``refined_symbols`` adds a SECOND, SDHUFF+SDREFAGG dictionary
    of (bitmap, ref_id, rdx, rdy) entries importing the first — their
    IDs follow the base symbols'."""
    syms = [np.asarray(s, np.uint8) for s in symbols]

    def seg(num: int, styp: int, refs: list, page: int, body: bytes) -> bytes:
        hdr = struct.pack(">IB", num, styp)
        if len(refs) <= 4:
            hdr += bytes([(len(refs) << 5)])
        else:  # long form: 3-bit 0b111 marker + 29-bit count + retain bits
            hdr += struct.pack(">I", 0xE0000000 | len(refs))
            hdr += b"\x00" * ((len(refs) + 8) // 8)
        for r in refs:
            hdr += bytes([r])
        hdr += bytes([page]) + struct.pack(">I", len(body))
        return hdr + body

    all_syms = list(syms)
    specs = None
    if refined_symbols:
        specs = [
            (np.asarray(e[1], np.uint8), e[2])
            if isinstance(e[0], str) and e[0] == "agg"
            else (np.asarray(e[0], np.uint8), e[1], e[2], e[3])
            for e in refined_symbols
        ]
        all_syms += [s[0] for s in specs]
    tr_body, tab_bodies = _encode_text_region_huffman(
        placements, len(all_syms), all_syms, page_w, page_h, strips,
        transposed=transposed, refcorner=refcorner, std_tables=std_tables,
    )
    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x01\x00\x00"
    out = seg(0, 48, [], 1, page_info)
    out += seg(1, 0, [], 1, _encode_symbol_dict_huffman(syms, mmr=mmr))
    dict_refs = [1]
    nxt = 2
    if specs:
        out += seg(nxt, 0, [1], 1,
                   _encode_symbol_dict_huffman_refined(specs, syms))
        dict_refs.append(nxt)
        nxt += 1
    tab_refs = []
    for tb in tab_bodies:
        out += seg(nxt, 53, [], 1, tb)
        tab_refs.append(nxt)
        nxt += 1
    out += seg(nxt, 7, dict_refs + tab_refs, 1, tr_body)
    out += seg(nxt + 1, 49, [], 1, b"")
    return out


def _encode_symbol_dict_refined(new_specs: list, in_syms: list,
                                rtemplate: int = 0) -> bytes:
    """Fixture side of the SDREFAGG=1 path: every new symbol is a
    single-instance refinement (bitmap, ref_id, rdx, rdy) of a symbol
    already in the pool (ref_id indexes imports + earlier news)."""
    n_in = len(in_syms)
    rat = [(-1, -1), (-1, -1)] if rtemplate == 0 else []
    coder = MQEncoder()
    iadh, iadw, iaex, iaai = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    iardx, iardy = _IntCtx(), _IntCtx()
    symcodelen = max(1, (max(n_in + len(new_specs), 1) - 1).bit_length())
    iaid = _IDCtx(symcodelen)
    gr_cx: dict = {}
    pool = list(in_syms)
    hcheight = 0
    i = 0
    while i < len(new_specs):
        h = new_specs[i][0].shape[0]
        iadh.encode(coder, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(new_specs) and new_specs[i][0].shape[0] == hcheight:
            bm, ref_id, rdx, rdy = new_specs[i]
            iadw.encode(coder, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            iaai.encode(coder, 1)
            iaid.encode(coder, ref_id)
            iardx.encode(coder, rdx)
            iardy.encode(coder, rdy)
            _refine_bits(bm.shape[1], bm.shape[0], rtemplate, rat,
                         pool[ref_id], rdx, rdy, coder, gr_cx, bitmap=bm)
            pool.append(bm)
            i += 1
        iadw.encode(coder, _OOB)
    iaex.encode(coder, n_in)  # imports not re-exported
    iaex.encode(coder, len(new_specs))
    flags = (1 << 1) | ((rtemplate & 1) << 12)
    body = flags.to_bytes(2, "big")
    body += struct.pack(">bb", 3, -1) + struct.pack(">bb", -3, -1) \
        + struct.pack(">bb", 2, -2) + struct.pack(">bb", -2, -2)  # SDAT (unused)
    for ax, ay in rat:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">II", len(new_specs), len(new_specs))
    return body + coder.flush()


def _encode_text_region(placements: list, n_syms: int, syms: list,
                        rw: int, rh: int, strips: int = 1,
                        transposed: bool = False, refcorner: int = 1) -> bytes:
    """Fixture side of _decode_text_region: OR combine, any reference
    corner, optionally TRANSPOSED (S runs vertically). ``placements`` is
    [(sym_id, x, y)] with (x, y) always the instance's top-left pixel,
    or, for refined instances, [(sym_id, x, y, refined_bitmap)] (encoded
    with RDX=RDY=0)."""
    log_strips = strips.bit_length() - 1
    if (1 << log_strips) != strips or strips > 8:
        raise ValueError("strips must be 1, 2, 4 or 8")
    refine = any(len(p) > 3 for p in placements)
    rat = [(-1, -1), (-1, -1)] if refine else []
    coder = MQEncoder()
    ctxs = (_IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(),
            _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(),
            _IDCtx(max(1, (max(n_syms, 1) - 1).bit_length())))
    _text_region_encode_core(coder, ctxs, {}, placements, syms, strips,
                             transposed, refcorner, refine, rat)
    flags = (
        (int(transposed) << 6) | (refcorner << 4) | (log_strips << 2)
        | ((1 << 1) if refine else 0)
    )
    body = struct.pack(">IIII", rw, rh, 0, 0) + bytes([0])  # combine OR
    body += flags.to_bytes(2, "big")
    for ax, ay in rat:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">I", len(placements))
    return body + coder.flush()


def _text_region_encode_core(coder, ctxs, gr_cx, placements, syms, strips,
                             transposed, refcorner, refine, rat,
                             rtemplate: int = 0):
    """Instance-placement encode walk shared by _encode_text_region and
    the aggregate symbol-dictionary fixture (mirrors
    _text_region_arith_core)."""
    (iadt, iafs, iads, iait, iari, iardw, iardh, iardx, iardy,
     iaid) = ctxs

    def inst_dims(p):
        bm = np.asarray(p[3], np.uint8) if len(p) > 3 else syms[p[0]]
        return bm.shape  # (h, w)

    def anchors(p):
        """(t_anchor, s_start) for one placement under the current
        corner/transposition — the wire coordinates, from top-left."""
        sym_id, x, y = p[0], p[1], p[2]
        h, w = inst_dims(p)
        if transposed:
            t = x if refcorner in (0, 1) else x + w - 1  # LEFT vs RIGHT
            return t, y
        t = y if refcorner in (1, 3) else y + h - 1  # TOP vs BOTTOM
        return t, x

    order = sorted(placements, key=lambda p: (anchors(p)[0] // strips,
                                              anchors(p)[1]))
    iadt.encode(coder, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    k = 0
    while k < len(order):
        strip_t = anchors(order[k])[0] // strips * strips
        iadt.encode(coder, (strip_t - stript) // strips)
        stript = strip_t
        first = True
        curs = 0
        while k < len(order) and (
            anchors(order[k])[0] // strips * strips == strip_t
        ):
            p = order[k]
            sym_id = p[0]
            t_anchor, s_start = anchors(p)
            if first:
                iafs.encode(coder, s_start - firsts)
                firsts = s_start
                curs = s_start
                first = False
            else:
                iads.encode(coder, s_start - curs)
                curs = s_start
            if strips > 1:
                iait.encode(coder, t_anchor - strip_t)
            iaid.encode(coder, sym_id)
            placed = syms[sym_id]
            if refine:
                if len(p) > 3:
                    placed = np.asarray(p[3], np.uint8)
                    base = syms[sym_id]
                    rdw = placed.shape[1] - base.shape[1]
                    rdh = placed.shape[0] - base.shape[0]
                    iari.encode(coder, 1)
                    iardw.encode(coder, rdw)
                    iardh.encode(coder, rdh)
                    iardx.encode(coder, 0)
                    iardy.encode(coder, 0)
                    _refine_bits(placed.shape[1], placed.shape[0],
                                 rtemplate, rat, base, rdw >> 1, rdh >> 1,
                                 coder, gr_cx, bitmap=placed)
                else:
                    iari.encode(coder, 0)
            curs += placed.shape[0 if transposed else 1] - 1
            k += 1
        iads.encode(coder, _OOB)


def _encode_symbol_dict_aggregate(new_specs: list, in_syms: list,
                                  rtemplate: int = 0) -> bytes:
    """Fixture side of the REFAGGNINST>1 aggregate path (6.5.8.2.2):
    each new symbol is (bitmap, placements) where ``placements`` is
    [(ref_id, x, y)] or [(ref_id, x, y, refined_bitmap)] — ≥2 instances
    of pool symbols composed (OR) into the new symbol's bitmap via the
    one-strip TOPLEFT text-region procedure, sharing the dictionary's
    coder and integer contexts exactly as the decoder does."""
    n_in = len(in_syms)
    rat = [(-1, -1), (-1, -1)] if rtemplate == 0 else []
    coder = MQEncoder()
    iadh, iadw, iaex, iaai = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    iadt, iafs, iads, iait = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    iari, iardw, iardh = _IntCtx(), _IntCtx(), _IntCtx()
    iardx, iardy = _IntCtx(), _IntCtx()
    symcodelen = max(1, (max(n_in + len(new_specs), 1) - 1).bit_length())
    iaid = _IDCtx(symcodelen)
    ctxs = (iadt, iafs, iads, iait, iari, iardw, iardh, iardx, iardy,
            iaid)
    gr_cx: dict = {}
    pool = list(in_syms)
    hcheight = 0
    i = 0
    while i < len(new_specs):
        h = new_specs[i][0].shape[0]
        iadh.encode(coder, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(new_specs) and new_specs[i][0].shape[0] == hcheight:
            bm, places = new_specs[i]
            if len(places) < 2:
                raise ValueError("aggregate fixture needs ≥2 instances")
            iadw.encode(coder, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            iaai.encode(coder, len(places))
            _text_region_encode_core(coder, ctxs, gr_cx, places, pool,
                                     1, False, 1, True, rat, rtemplate)
            pool.append(bm)
            i += 1
        iadw.encode(coder, _OOB)
    iaex.encode(coder, n_in)  # imports not re-exported
    iaex.encode(coder, len(new_specs))
    flags = (1 << 1) | ((rtemplate & 1) << 12)
    body = flags.to_bytes(2, "big")
    body += struct.pack(">bb", 3, -1) + struct.pack(">bb", -3, -1) \
        + struct.pack(">bb", 2, -2) + struct.pack(">bb", -2, -2)  # SDAT (unused)
    for ax, ay in rat:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">II", len(new_specs), len(new_specs))
    return body + coder.flush()


def encode_jbig2_text(symbols: list, placements: list, page_w: int,
                      page_h: int, strips: int = 1,
                      refined_symbols: list | None = None,
                      transposed: bool = False, refcorner: int = 1,
                      aggregate_symbols: list | None = None) -> bytes:
    """Fixture encoder for the symbol-coded path jbig2enc-style scanned
    PDFs take: one symbol dictionary + one immediate lossless text
    region. ``placements`` is [(sym_id, x, y)] with (x, y) the top-left
    corner of each instance, or [(sym_id, x, y, refined_bitmap)] for
    per-instance refinement. ``refined_symbols`` adds a SECOND,
    SDREFAGG=1 dictionary of (bitmap, ref_id, rdx, rdy) entries that
    imports the first — their IDs follow the base symbols'.
    ``aggregate_symbols`` adds an SDREFAGG=1 dictionary of
    REFAGGNINST>1 entries (bitmap, [(ref_id, x, y), ...]) composed from
    the base symbols; their IDs follow all earlier dictionaries'."""
    syms = [np.asarray(s, np.uint8) for s in symbols]

    def seg(num: int, styp: int, refs: list, page: int, body: bytes) -> bytes:
        hdr = struct.pack(">IB", num, styp)
        hdr += bytes([(len(refs) << 5)])  # short-form referred count
        for r in refs:
            hdr += bytes([r])  # segment numbers stay < 256 here
        hdr += bytes([page]) + struct.pack(">I", len(body))
        return hdr + body

    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x01\x00\x00"
    out = seg(0, 48, [], 1, page_info)
    out += seg(1, 0, [], 1, _encode_symbol_dict(syms))
    text_refs = [1]
    all_syms = list(syms)
    nxt = 2
    if refined_symbols:
        specs = [(np.asarray(b, np.uint8), r, dx, dy)
                 for b, r, dx, dy in refined_symbols]
        out += seg(nxt, 0, [1], 1, _encode_symbol_dict_refined(specs, syms))
        all_syms += [s[0] for s in specs]
        text_refs = [1, nxt]
        nxt += 1
    if aggregate_symbols:
        specs = [(np.asarray(b, np.uint8), places)
                 for b, places in aggregate_symbols]
        out += seg(nxt, 0, list(text_refs), 1,
                   _encode_symbol_dict_aggregate(specs, all_syms))
        all_syms += [s[0] for s in specs]
        text_refs = text_refs + [nxt]
        nxt += 1
    out += seg(nxt, 7, text_refs, 1,
               _encode_text_region(placements, len(all_syms), all_syms,
                                   page_w, page_h, strips,
                                   transposed=transposed,
                                   refcorner=refcorner))
    out += seg(nxt + 1, 49, [], 1, b"")
    return out


def encode_jbig2_refinement(base: np.ndarray, target: np.ndarray,
                            tpgron: bool = False, rtemplate: int = 0,
                            intermediate_ref: np.ndarray | None = None,
                            ) -> bytes:
    """Fixture: page info + an immediate generic region painting
    ``base`` + an immediate refinement region (type 42, REPLACE) whose
    decode yields ``target``. With ``intermediate_ref`` the refinement
    is coded against an INTERMEDIATE generic region (type 36) carrying
    that bitmap — retained, never composed — instead of the page area,
    which a decoder that wrongly refines the page cannot reproduce."""
    base = np.asarray(base, np.uint8)
    target = np.asarray(target, np.uint8)
    if base.shape != target.shape:
        raise ValueError("base/target shape mismatch")
    h, w = base.shape

    def seg(num: int, styp: int, refs: list, page: int, body: bytes) -> bytes:
        hdr = struct.pack(">IB", num, styp)
        hdr += bytes([(len(refs) << 5)])
        for r in refs:
            hdr += bytes([r])
        hdr += bytes([page]) + struct.pack(">I", len(body))
        return hdr + body

    def generic_body(bm: np.ndarray) -> bytes:
        at = _TEMPLATES[0][1]
        body = struct.pack(">IIII", bm.shape[1], bm.shape[0], 0, 0)
        body += bytes([0, 0])  # combine OR, gflags template 0
        for ax, ay in at:
            body += struct.pack(">bb", ax, ay)
        return body + encode_generic_region(bm, 0, list(at), False)

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00"
    out = seg(0, 48, [], 1, page_info)
    out += seg(1, 39, [], 1, generic_body(base))
    ref_bm = base if intermediate_ref is None else np.asarray(
        intermediate_ref, np.uint8)
    nxt = 2
    refine_refs: list = []
    if intermediate_ref is not None:
        out += seg(nxt, 36, [], 1, generic_body(ref_bm))
        refine_refs = [nxt]
        nxt += 1
    rat = [(-1, -1), (-1, -1)] if rtemplate == 0 else []
    enc = MQEncoder()
    _refine_bits(w, h, rtemplate, rat, ref_bm, 0, 0, enc, {},
                 bitmap=target, tpgron=tpgron)
    body = struct.pack(">IIII", w, h, 0, 0) + bytes([4])  # REPLACE
    body += bytes([rtemplate | (2 if tpgron else 0)])
    for ax, ay in rat:
        body += struct.pack(">bb", ax, ay)
    body += enc.flush()
    out += seg(nxt, 42, refine_refs, 1, body)
    out += seg(nxt + 1, 49, [], 1, b"")
    return out


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
