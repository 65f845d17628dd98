"""CCITT fax codecs for bilevel TIFF — pure stdlib/numpy.

Implements the two encodings real scanned-document TIFFs carry:

  * G4 / T.6 (TIFF compression 4): 2D MMR coding — every line coded
    against the previous (reference) line with Pass / Horizontal /
    Vertical(±3) modes; run lengths use the published T.4 Huffman tables.
  * MH / T.4 one-dimensional (TIFF compression 2, "CCITTRLE"): each line
    is an independent sequence of alternating white/black run codes,
    rows byte-aligned (the libtiff convention for compression 2).
  * G3 / T.4-with-EOLs (TIFF compression 3): EOL-prefixed lines with
    fill bits; both plain 1D and the 2D mode (T4Options bit 0 — tag bit
    after each EOL, 2D lines share the T.6 mode machinery, K-factor
    alternation). The fax family is seam-free.

Code tables are transcribed from ITU-T T.4 §2.2.2.2 (white/black
terminating + makeup codes, shared extended makeups) and T.6 §2.2.4
(vertical/pass/horizontal mode codes) — public standards text. Encoders
are included for fixtures; decode cost is O(changing elements), which for
text pages is far below pixel count.

The reference accepts .tiff wholesale (/root/reference/engine.py:46);
fax-compressed bilevel is the dominant encoding of archival invoice scans.
"""

from __future__ import annotations

import bisect

import numpy as np

# ---- T.4 run-length code tables: {run: (code, bits)} --------------------

_WHITE_TERM = {
    0: ("00110101"), 1: ("000111"), 2: ("0111"), 3: ("1000"),
    4: ("1011"), 5: ("1100"), 6: ("1110"), 7: ("1111"),
    8: ("10011"), 9: ("10100"), 10: ("00111"), 11: ("01000"),
    12: ("001000"), 13: ("000011"), 14: ("110100"), 15: ("110101"),
    16: ("101010"), 17: ("101011"), 18: ("0100111"), 19: ("0001100"),
    20: ("0001000"), 21: ("0010111"), 22: ("0000011"), 23: ("0000100"),
    24: ("0101000"), 25: ("0101011"), 26: ("0010011"), 27: ("0100100"),
    28: ("0011000"), 29: ("00000010"), 30: ("00000011"), 31: ("00011010"),
    32: ("00011011"), 33: ("00010010"), 34: ("00010011"), 35: ("00010100"),
    36: ("00010101"), 37: ("00010110"), 38: ("00010111"), 39: ("00101000"),
    40: ("00101001"), 41: ("00101010"), 42: ("00101011"), 43: ("00101100"),
    44: ("00101101"), 45: ("00000100"), 46: ("00000101"), 47: ("00001010"),
    48: ("00001011"), 49: ("01010010"), 50: ("01010011"), 51: ("01010100"),
    52: ("01010101"), 53: ("00100100"), 54: ("00100101"), 55: ("01011000"),
    56: ("01011001"), 57: ("01011010"), 58: ("01011011"), 59: ("01001010"),
    60: ("01001011"), 61: ("00110010"), 62: ("00110011"), 63: ("00110100"),
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
_EXT_MAKEUP = {  # shared by both colors (T.4 §2.2.2.3)
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# decode maps: {(length, code_int): run}
def _dec_map(*tables):
    out = {}
    for t in tables:
        for run, code in t.items():
            out[(len(code), int(code, 2))] = run
    return out


_WHITE_DEC = _dec_map(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_DEC = _dec_map(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)
_WHITE_ENC = {**_WHITE_TERM, **_WHITE_MAKEUP, **_EXT_MAKEUP}
_BLACK_ENC = {**_BLACK_TERM, **_BLACK_MAKEUP, **_EXT_MAKEUP}

# T.6 §2.2.4 mode codes
_MODES = {
    (1, 0b1): ("V", 0),
    (3, 0b011): ("V", 1),
    (3, 0b010): ("V", -1),
    (3, 0b001): ("H", 0),
    (4, 0b0001): ("P", 0),
    (6, 0b000011): ("V", 2),
    (6, 0b000010): ("V", -2),
    (7, 0b0000011): ("V", 3),
    (7, 0b0000010): ("V", -3),
}
_MAX_RUN_BITS = 13
_MAX_MODE_BITS = 7


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def peek(self, k: int) -> int:
        v = 0
        for i in range(k):
            p = self.pos + i
            if p >= self.n:
                v <<= 1  # zero-pad past the end
            else:
                v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
        return v

    def skip(self, k: int) -> None:
        self.pos += k

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_mode(b: _Bits):
    for ln in range(1, _MAX_MODE_BITS + 1):
        m = _MODES.get((ln, b.peek(ln)))
        if m is not None:
            b.skip(ln)
            return m
    raise ValueError("corrupt fax stream: unknown mode code")


def _read_run(b: _Bits, black: bool) -> int:
    """One complete run: zero or more makeup codes then a terminating code."""
    table = _BLACK_DEC if black else _WHITE_DEC
    total = 0
    while True:
        for ln in range(2, _MAX_RUN_BITS + 1):
            run = table.get((ln, b.peek(ln)))
            if run is not None:
                b.skip(ln)
                total += run
                if run < 64:
                    return total
                break
        else:
            raise ValueError("corrupt fax stream: unknown run code")


def _fill(row: np.ndarray, changes: list[int], w: int) -> None:
    """changes: positions where color flips, line starts white; black spans
    are [changes[0], changes[1]), [changes[2], changes[3]), ..."""
    for i in range(0, len(changes) - 1, 2):
        row[changes[i] : min(changes[i + 1], w)] = 1
    if len(changes) % 2 == 1:
        row[changes[-1] : w] = 1


def _b1_b2(ref: list[int], a0: int, color: int, w: int) -> tuple[int, int]:
    """First changing element on the reference line right of a0 with color
    opposite to `color` (b1), and the next one (b2). Changes to black sit
    at even indices (lines start white)."""
    i = bisect.bisect_right(ref, a0)
    if (i & 1) != (0 if color == 0 else 1):
        i += 1
    b1 = ref[i] if i < len(ref) else w
    b2 = ref[i + 1] if i + 1 < len(ref) else w
    return b1, b2


def _decode_2d_line(b: _Bits, ref: list[int], w: int) -> list[int]:
    """Decode one 2D-coded line (the shared mode machinery of T.6 and
    G3-2D) against the reference line's changing elements; returns this
    line's changing elements."""
    cur: list[int] = []
    a0 = -1
    color = 0  # white
    while a0 < w:
        b1, b2 = _b1_b2(ref, a0, color, w)
        mode, d = _read_mode(b)
        if mode == "P":
            a0 = b2
        elif mode == "V":
            a1 = b1 + d
            if not (0 <= a1 <= w):
                raise ValueError("corrupt fax stream: vertical out of line")
            cur.append(a1)
            a0 = a1
            color ^= 1
        else:  # Horizontal: two runs, current color then opposite
            start = max(a0, 0)
            r1 = _read_run(b, black=bool(color))
            r2 = _read_run(b, black=not bool(color))
            a1 = start + r1
            a2 = a1 + r2
            if a2 > w and a1 <= w:
                a2 = w
            if a1 > w:
                raise ValueError("corrupt fax stream: run past line end")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
    return cur


def decode_g4(data: bytes, w: int, h: int, byte_align: bool = False) -> np.ndarray:
    """T.6 MMR → (h, w) uint8 mask, 1 = black. ``byte_align`` starts every
    coded line on a byte boundary (PDF CCITTFaxDecode /EncodedByteAlign)."""
    b = _Bits(data)
    out = np.zeros((h, w), np.uint8)
    ref: list[int] = []  # imaginary all-white reference line
    for y in range(h):
        if byte_align:
            b.align()
        cur = _decode_2d_line(b, ref, w)
        _fill(out[y], cur, w)
        ref = cur
    return out


def decode_g4_planes(data: bytes, w: int, h: int, n: int) -> list:
    """n consecutive w×h T.6 planes from ONE bitstream (JBIG2 gray-scale
    images with GSMMR=1, T.88 Annex C.5): each plane restarts from the
    imaginary all-white reference line, but the BIT position carries over
    between planes (no EOFB, no byte alignment between planes)."""
    b = _Bits(data)
    planes = []
    for _ in range(n):
        out = np.zeros((h, w), np.uint8)
        ref: list[int] = []
        for y in range(h):
            cur = _decode_2d_line(b, ref, w)
            _fill(out[y], cur, w)
            ref = cur
        planes.append(out)
    return planes


def encode_g4_planes(planes) -> bytes:
    """Fixture writer for `decode_g4_planes`: planes back-to-back in one
    bitstream, reference line reset per plane, no inter-plane alignment."""
    bw = _BitW()
    for mask in planes:
        _h, w = mask.shape
        ref: list[int] = []
        for y in range(_h):
            cur = _changes_of(mask[y])
            _encode_2d_line(bw, cur, ref, w)
            ref = cur
    return bw.done()


def decode_mh(data: bytes, w: int, h: int, row_align: bool = True) -> np.ndarray:
    """T.4 one-dimensional (modified Huffman) → (h, w) uint8 mask,
    1 = black. ``row_align`` (the default) byte-aligns each row — the
    TIFF compression-2 convention and PDF /EncodedByteAlign true; PDF
    K=0 with EncodedByteAlign false is the same code as one continuous
    bitstream (``row_align=False``)."""
    b = _Bits(data)
    out = np.zeros((h, w), np.uint8)
    for y in range(h):
        pos = 0
        black = False
        changes: list[int] = []
        while pos < w:
            run = _read_run(b, black=black)
            pos += run
            if pos > w:
                raise ValueError("corrupt fax stream: run past line end")
            changes.append(pos)
            black = not black
        _fill(out[y], changes, w)
        if row_align:
            b.align()
    return out


_EOL = "000000000001"


def decode_t4(data: bytes, w: int, h: int, two_d: bool = False) -> np.ndarray:
    """T.4 with EOLs (TIFF compression 3, Group 3): each line is preceded
    by an EOL code (fill bits allowed before it). With ``two_d``
    (T4Options bit 0), every EOL is followed by a tag bit — 1 = the line
    is 1D-coded runs, 0 = 2D-coded against the previous line with the
    shared T.6 mode machinery (the K-factor alternation real G3-2D
    writers emit)."""
    b = _Bits(data)
    out = np.zeros((h, w), np.uint8)

    def expect_eol():
        # EOL = eleven 0-bits + a 1; any extra leading 0s are fill bits
        zeros = 0
        while b.pos < b.n and b.peek(1) == 0:
            b.skip(1)
            zeros += 1
            if zeros > 76:  # 64 fill + 11 code zeros, with headroom
                raise ValueError("corrupt G3 stream: runaway fill")
        if zeros < 11 or b.pos >= b.n:
            raise ValueError("corrupt G3 stream: missing EOL")
        b.skip(1)  # the terminating 1

    ref: list[int] = []
    for y in range(h):
        expect_eol()
        one_d = True
        if two_d:
            one_d = b.peek(1) == 1
            b.skip(1)
        if one_d:
            pos = 0
            black = False
            changes: list[int] = []
            while pos < w:
                run = _read_run(b, black=black)
                pos += run
                if pos > w:
                    raise ValueError("corrupt fax stream: run past line end")
                changes.append(pos)
                black = not black
        else:
            if y == 0:
                raise ValueError("corrupt G3-2D stream: first line must be 1D")
            changes = _decode_2d_line(b, ref, w)
        _fill(out[y], changes, w)
        ref = changes
    return out


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put_str(self, code: str) -> None:
        for c in code:
            self.acc = (self.acc << 1) | (c == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.put_str("0")

    def done(self) -> bytes:
        self.align()
        return bytes(self.out)


def _emit_run(bw: _BitW, run: int, black: bool) -> None:
    enc = _BLACK_ENC if black else _WHITE_ENC
    while run >= 64:
        if run >= 2624:
            mk = 2560
        else:
            mk = (run // 64) * 64
        bw.put_str(enc[mk])
        run -= mk
    bw.put_str(enc[run])


def _changes_of(row: np.ndarray) -> list[int]:
    d = np.diff(np.concatenate(([0], row.astype(np.int8))))
    return list(np.nonzero(d)[0])


_V_CODES = {0: "1", 1: "011", -1: "010", 2: "000011",
            -2: "000010", 3: "0000011", -3: "0000010"}


def _encode_2d_line(bw: _BitW, cur: list[int], ref: list[int], w: int) -> None:
    """Emit one 2D-coded line (shared by the T.6 and G3-2D writers)."""
    a0 = -1
    color = 0
    i = 0  # index into cur of the next change with the right parity
    while a0 < w:
        # a1: next change right of a0 (changes alternate so parity is
        # implicit in the scan order)
        while i < len(cur) and cur[i] <= a0:
            i += 1
        a1 = cur[i] if i < len(cur) else w
        b1, b2 = _b1_b2(ref, a0, color, w)
        if b2 < a1:
            bw.put_str("0001")  # Pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.put_str(_V_CODES[a1 - b1])
            a0 = a1
            color ^= 1
            i += 1
        else:  # Horizontal
            a2 = cur[i + 1] if i + 1 < len(cur) else w
            start = max(a0, 0)
            bw.put_str("001")
            _emit_run(bw, a1 - start, black=bool(color))
            _emit_run(bw, a2 - a1, black=not bool(color))
            a0 = a2
            i += 2


def encode_g4(mask: np.ndarray, byte_align: bool = False) -> bytes:
    """(h, w) mask (nonzero = black) → T.6 stream (fixture writer).
    ``byte_align`` pads each coded line to a byte boundary (the PDF
    /EncodedByteAlign layout)."""
    h, w = mask.shape
    bw = _BitW()
    ref: list[int] = []
    for y in range(h):
        if byte_align:
            bw.align()
        cur = _changes_of(mask[y])
        _encode_2d_line(bw, cur, ref, w)
        ref = cur
    return bw.done()


def encode_t4(
    mask: np.ndarray, two_d: bool = False, k: int = 2, byte_align: bool = False
) -> bytes:
    """(h, w) mask → T.4/G3 stream (fixture writer): EOL before every
    line; 1D run codes, or — with ``two_d`` — the K-factor alternation
    (every k-th line 1D with tag bit 1, the rest 2D with tag bit 0).
    ``byte_align`` inserts fill bits so each EOL ends on a byte boundary
    (the PDF /EncodedByteAlign layout for K>0)."""
    h, w = mask.shape
    bw = _BitW()
    ref: list[int] = []
    for y in range(h):
        if byte_align:
            total = len(bw.out) * 8 + bw.n
            for _ in range((-(total + len(_EOL))) % 8):
                bw.put_str("0")  # fill so the EOL's final 1 ends the byte
        bw.put_str(_EOL)
        cur = _changes_of(mask[y])
        if two_d and y % k != 0:
            bw.put_str("0")  # tag: 2D line
            _encode_2d_line(bw, cur, ref, w)
        else:
            if two_d:
                bw.put_str("1")  # tag: 1D line
            changes = cur + ([w] if not cur or cur[-1] != w else [])
            pos = 0
            black = False
            for c in changes:
                if c == pos and not black and pos != 0:
                    continue
                _emit_run(bw, c - pos, black=black)
                pos = c
                black = not black
                if pos >= w:
                    break
        ref = cur
    return bw.done()


def encode_mh(mask: np.ndarray, row_align: bool = True) -> bytes:
    """(h, w) mask (nonzero = black) → MH rows, byte-aligned by default
    (compression 2 / PDF EncodedByteAlign); ``row_align=False`` writes
    the continuous-bitstream layout of PDF K=0 without EncodedByteAlign."""
    h, w = mask.shape
    bw = _BitW()
    for y in range(h):
        changes = _changes_of(mask[y]) + [w]
        pos = 0
        black = False
        for c in changes:
            if c == pos and not black and pos != 0:
                continue
            _emit_run(bw, c - pos, black=black)
            pos = c
            black = not black
            if pos >= w:
                break
        if row_align:
            bw.align()
    return bw.done()
