"""JPEG 2000 (ITU-T T.800) lossless baseline decoder, pure numpy + stdlib.

Scope: both coding paths scanned-document JPX streams use — raw
codestreams (SOC..EOC) and JP2 containers, single or multiple tiles,
grayscale or RGB, the REVERSIBLE path (5/3 integer wavelet + RCT, no
quantization — bit-exact) AND the IRREVERSIBLE path (9/7 float wavelet
+ ICT + scalar quantization, derived or expounded, midpoint
reconstruction — pinned by PSNR/error bounds, floats cannot be
bit-pinned), any decomposition level count, EBCOT arithmetic coding
with default code-block options, default (full-subband) precincts,
any progression order for single-tile-part streams, one or more
quality layers. The MQ arithmetic coder is SHARED with jbig2.py, where
it is pinned against the ITU T.88 Annex H.2 conformance bitstream —
the same coder the T.800 Annex C tables define (JBIG2 and JPEG 2000
specify the identical coder; only the context initial states differ,
Table D.7 here).

Multi-layer (quality-progressive) streams decode through the termall
code-block style (0x04: every coding pass its own terminated codeword
segment, one length per segment per B.10.7.5) — the segmentation real
layered encoders emit — and all code-block styles (bypass/reset/
causal/segsym; predictable termination accepted, verification not
performed). COC/QCC main-header per-component overrides (decomposition
levels, code-block sizes, style, quantization) decode with the packet
walk skipping resolutions a component lacks (B.12.1). Custom PRECINCTS
(B.6) decode: one packet per (layer, resolution, component, precinct)
with per-precinct tag trees and code-block sizes clamped per B.7,
under ALL FIVE progression orders — the position progressions
(RPCL/PCRL/CPRL, B.12.1.3-5) order precincts by their first in-tile
sample projected onto the reference grid, with the XRsiz/YRsiz
factors the spec's condition terms carry. Multiple
tile-parts (A.4.2, SOT..SOD segments interleaved across tiles) decode
by per-tile concatenation, and PPT packed packet headers (A.7.2 —
headers+EPH in Zppt-ordered tile-part-header segments, bodies alone in
the bitstream) decode via a split header/body cursor — as do PPM
MAIN-header packed headers (A.7.4, one [Nppm][headers] record per
tile-part consumed in codestream order). RGN implicit-maxshift ROI
(A.6.3) decodes: magnitudes at/above 2^SPrgn shift back down and Mb
grows by SPrgn; a stripped-RGN control pins that the machinery is
real. POC progression-order changes (A.6.6) decode as the
concatenation of the marker's progression volumes (first occurrence
wins, COD-order completion for under-covering volumes). Per-component
A.5.1 shapes decode: signed components (no DC level shift, G.1.2),
mixed bit depths (per-component Rb through E.1), and XRsiz/YRsiz
SUBSAMPLED components (per-component grids via ceil(x/XRsiz), B.3 —
the scanner 4:2:0 JPX shape), as do per-TILE COD/COC/QCD/QCC
overrides in the first tile-part header (A.4.2/Table A.1, precedence
per A.6.1) and per-component 5/3 vs 9/7 transform mixes when MCT is
off (MCT over mixed transforms or mismatched grids is corrupt, G.1).
Tile-header RGN and POC markers override their main-header
counterparts per tile (first tile-part only — this decoder
concatenates tile-parts before the packet walk, so later-part
RGN/POC stays a named seam). The JP2 colour surface covers enumerated
sRGB/greyscale/sYCC (I.5.3.3) plus CMYK (15444-2 enum 12, ink
composited over white with the same integer arithmetic as the Adobe
CMYK JPEG path) and the channel-definition box (I.5.3.6): straight
opacity channels drop before the colour reduction, colour
associations reorder permuted channel layouts. Remaining deliberate
loud seams (NotImplementedError with the feature named — the
repo-wide codec policy): RGN styles other than maxshift (Part 2),
RGN/POC in a later tile-part, premultiplied-alpha cdef channels, and
component counts with neither a CMYK colr nor a cdef to interpret
them. Multi-layer BYPASS streams without termall decode
too: a packet signals one length per segment PORTION (lblock +
floor(log2(portion_passes)) bits) and the decoder concatenates
portions by segment index across layers before the T1 run.

Convention notes pinned by tests rather than external fixtures (no
independent JPEG 2000 implementation exists in this container): the
DWT applies the horizontal pass first on synthesis (F.3.4 2D_SR:
interleave -> HOR_SR rows -> VER_SR columns; analysis exactly
mirrored), and tag-tree/packet-header bits follow B.10's incremental
lower-bound queries with bit-stuffing after 0xFF bytes.

Reference parity note: the reference engine does not accept .jp2
(engine.py:46); this decoder serves the raw-PDF ingest path's
JPXDecode filter (pdf.py), previously a loud seam.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .jbig2 import MQDecoder, MQEncoder

# -- tag trees (B.10.2) --------------------------------------------------------


class TagTree:
    """2D tag tree over a w x h leaf grid: answers incremental queries
    "is leaf value < threshold?" while coding each node's lower bound
    once along the root->leaf path. Decode and encode walk identically;
    the encoder is the fixture side (values set before encoding)."""

    __slots__ = ("w", "h", "levels", "low", "value", "known")

    def __init__(self, w: int, h: int):
        if w <= 0 or h <= 0:
            raise ValueError("tag tree dims must be positive")
        self.w, self.h = w, h
        self.levels = []
        lw, lh = w, h
        while True:
            self.levels.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw, lh = (lw + 1) // 2, (lh + 1) // 2
        # per level: current coded lower bound, final value (enc), known
        self.low = [np.zeros((lh, lw), np.int32) for lw, lh in self.levels]
        self.value = [np.full((lh, lw), 1 << 30, np.int32)
                      for lw, lh in self.levels]
        self.known = [np.zeros((lh, lw), bool) for lw, lh in self.levels]

    def set_value(self, i: int, j: int, v: int) -> None:
        """Encoder side: set leaf (i=x, j=y) value; parents become the
        min over their children."""
        self.value[0][j, i] = v
        for lvl in range(1, len(self.levels)):
            i, j = i // 2, j // 2
            if v < self.value[lvl][j, i]:
                self.value[lvl][j, i] = v
            else:
                break

    def _path(self, i: int, j: int):
        path = []
        for lvl in range(len(self.levels) - 1, -1, -1):
            path.append((lvl, i >> lvl, j >> lvl))
        return path

    def decode(self, bits, i: int, j: int, threshold: int) -> bool:
        """True iff leaf (i, j) value < threshold, reading just the bits
        needed to decide; partial knowledge persists across calls."""
        low = 0
        for lvl, x, y in self._path(i, j):
            if self.low[lvl][y, x] < low:
                self.low[lvl][y, x] = low
            while (not self.known[lvl][y, x]
                   and self.low[lvl][y, x] < threshold):
                if bits.read(1):
                    self.known[lvl][y, x] = True
                    self.value[lvl][y, x] = self.low[lvl][y, x]
                else:
                    self.low[lvl][y, x] += 1
            if self.known[lvl][y, x]:
                low = self.value[lvl][y, x]
                if low >= threshold:
                    return False
            else:
                low = self.low[lvl][y, x]
                return False  # bound reached threshold without resolving
        return True

    def encode(self, bits, i: int, j: int, threshold: int) -> None:
        """Emit the bits `decode` will read for this query (values must
        be set beforehand via set_value)."""
        low = 0
        for lvl, x, y in self._path(i, j):
            if self.low[lvl][y, x] < low:
                self.low[lvl][y, x] = low
            v = int(self.value[lvl][y, x])
            while (not self.known[lvl][y, x]
                   and self.low[lvl][y, x] < threshold):
                if self.low[lvl][y, x] == v:
                    bits.put(1, 1)
                    self.known[lvl][y, x] = True
                else:
                    bits.put(0, 1)
                    self.low[lvl][y, x] += 1
            if self.known[lvl][y, x]:
                low = v
                if low >= threshold:
                    return
            else:
                return


# -- packet-header bit IO with 0xFF stuffing (B.10.1) --------------------------


class _PktBitReader:
    """MSB-first reader with the packet-header unstuffing rule: a byte
    following 0xFF carries only 7 payload bits (its MSB is a stuffed 0)."""

    __slots__ = ("data", "pos", "acc", "n", "prev_ff")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.prev_ff = False

    def read(self, k: int) -> int:
        v = 0
        for _ in range(k):
            if self.n == 0:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG2000 packet header exhausted")
                b = self.data[self.pos]
                self.pos += 1
                if self.prev_ff:
                    if b & 0x80:
                        raise ValueError("JPEG2000 invalid stuffing bit")
                    self.acc = b
                    self.n = 7
                else:
                    self.acc = b
                    self.n = 8
                self.prev_ff = b == 0xFF if not self.prev_ff else False
                # note: a stuffed byte (7-bit) can itself not be 0xFF>=0x80
            v = (v << 1) | ((self.acc >> (self.n - 1)) & 1)
            self.n -= 1
        return v

    def align(self) -> int:
        """Finish the header: discard partial bits. B.10.1: a header
        whose last byte is 0xFF is terminated by one stuffed 0x00 byte,
        which belongs to the header — consume it. Returns the byte
        position where the packet body starts."""
        if self.prev_ff:
            if self.pos >= len(self.data) or self.data[self.pos] & 0x80:
                raise ValueError("JPEG2000 missing header stuffing byte")
            self.pos += 1
        self.acc = 0
        self.n = 0
        self.prev_ff = False
        return self.pos


class _PktBitWriter:
    """MSB-first writer emitting the stuffing 0 bit after 0xFF bytes."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def _flush_byte(self) -> None:
        self.out.append(self.acc)
        stuffed = self.acc == 0xFF
        self.acc = 0
        self.n = 1 if stuffed else 0  # stuffed 0 occupies the MSB

    def put(self, code: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self._flush_byte()

    def align(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            # a final 0xFF would need a stuffing byte; padding with zeros
            # cannot produce one unless acc already is 0xFF
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        elif self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


# -- 5/3 reversible DWT (Annex F) ----------------------------------------------


def _sr_1d(y: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """1D_SR (F.3.6): reconstruct interleaved signal y over [i0, i1)
    given its extended lifting-domain representation. `y` holds the
    interleaved coefficients indexed from i0."""
    n = i1 - i0
    if n == 0:
        return y
    if n == 1:
        # F.3.5: single-sample signal — even index: value; odd: value/2
        return y if i0 % 2 == 0 else y // 2
    # work on an extended array so the lifting taps read mirrored values
    idx = np.arange(i0 - 2, i1 + 2)
    buf = _ext_interleaved(y, i0, i1, idx)
    x = buf.copy()
    # even samples: x[2n] = y[2n] - floor((y[2n-1] + y[2n+1] + 2)/4)
    off = idx - (i0 - 2)
    even = np.where(idx % 2 == 0)[0]
    even = even[(idx[even] >= i0 - 1) & (idx[even] <= i1)]
    x[even] = buf[even] - ((buf[even - 1] + buf[even + 1] + 2) >> 2)
    # odd samples: x[2n+1] = y[2n+1] + floor((x[2n] + x[2n+2])/2)
    odd = np.where(idx % 2 == 1)[0]
    odd = odd[(idx[odd] >= i0) & (idx[odd] < i1)]
    x[odd] = buf[odd] + ((x[odd - 1] + x[odd + 1]) >> 1)
    sl = slice(i0 - (i0 - 2), i0 - (i0 - 2) + n)
    return x[sl]


def _ext_interleaved(y: np.ndarray, i0: int, i1: int,
                     idx: np.ndarray) -> np.ndarray:
    """Symmetric extension of the interleaved subband signal defined on
    [i0, i1) to the positions in idx (F.3.7)."""
    n = i1 - i0
    if n == 1:
        return np.full(idx.shape, y[0], y.dtype)
    p = 2 * (n - 1)
    k = np.abs(idx - i0) % p
    k = np.where(k >= n, p - k, k)
    return y[k]


def _sd_1d(x: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """1D_SD (forward, F.4.8): interleaved analysis of x over [i0, i1)."""
    n = i1 - i0
    if n == 0:
        return x
    if n == 1:
        return x if i0 % 2 == 0 else x * 2
    idx = np.arange(i0 - 2, i1 + 2)
    buf = _ext_interleaved(x, i0, i1, idx)
    y = buf.copy()
    # odd (high-pass): y[2n+1] = x[2n+1] - floor((x[2n] + x[2n+2])/2)
    odd = np.where(idx % 2 == 1)[0]
    odd_in = odd[(idx[odd] >= i0 - 1) & (idx[odd] <= i1)]
    y[odd_in] = buf[odd_in] - ((buf[odd_in - 1] + buf[odd_in + 1]) >> 1)
    # even (low-pass): y[2n] = x[2n] + floor((y[2n-1] + y[2n+1] + 2)/4)
    even = np.where(idx % 2 == 0)[0]
    even_in = even[(idx[even] >= i0) & (idx[even] < i1)]
    y[even_in] = buf[even_in] + ((y[even_in - 1] + y[even_in + 1] + 2) >> 2)
    sl = slice(2, 2 + n)
    return y[sl]


def _interleave(ll, hl, lh, hh, u0, v0, u1, v1):
    """2D_INTERLEAVE (F.3.3): place subband coefficients at their
    even/odd positions of the resolution grid [u0,u1) x [v0,v1)."""
    a = np.zeros((v1 - v0, u1 - u0), np.int64)
    # positions are absolute; local array offset by (v0, u0)
    ue = np.arange(_ceil2(u0), u1, 2)    # even columns
    uo = np.arange(u0 | 1, u1, 2)        # odd columns
    ve = np.arange(_ceil2(v0), v1, 2)
    vo = np.arange(v0 | 1, v1, 2)
    if ll.size:
        a[np.ix_(ve - v0, ue - u0)] = ll
    if hl.size:
        a[np.ix_(ve - v0, uo - u0)] = hl
    if lh.size:
        a[np.ix_(vo - v0, ue - u0)] = lh
    if hh.size:
        a[np.ix_(vo - v0, uo - u0)] = hh
    return a


def _deinterleave(a, u0, v0, u1, v1):
    ue = np.arange(_ceil2(u0), u1, 2) - u0
    uo = np.arange(u0 | 1, u1, 2) - u0
    ve = np.arange(_ceil2(v0), v1, 2) - v0
    vo = np.arange(v0 | 1, v1, 2) - v0
    ll = a[np.ix_(ve, ue)]
    hl = a[np.ix_(ve, uo)]
    lh = a[np.ix_(vo, ue)]
    hh = a[np.ix_(vo, uo)]
    return ll, hl, lh, hh


def _ceil2(x: int) -> int:
    return x + (x & 1)


def sr_2d(ll, hl, lh, hh, u0, v0, u1, v1):
    """2D_SR (F.3.4): interleave, then HOR_SR on every row, then VER_SR
    on every column — the synthesis step for one resolution level."""
    a = _interleave(ll, hl, lh, hh, u0, v0, u1, v1)
    for r in range(a.shape[0]):
        a[r, :] = _sr_1d(a[r, :], u0, u1)
    for c in range(a.shape[1]):
        a[:, c] = _sr_1d(a[:, c], v0, v1)
    return a


def sd_2d(a, u0, v0, u1, v1):
    """2D_SD (forward analysis, exact inverse of sr_2d)."""
    a = np.asarray(a, np.int64).copy()
    for c in range(a.shape[1]):
        a[:, c] = _sd_1d(a[:, c], v0, v1)
    for r in range(a.shape[0]):
        a[r, :] = _sd_1d(a[r, :], u0, u1)
    return _deinterleave(a, u0, v0, u1, v1)


def idwt_53(ll, bands, x0, y0, x1, y1):
    """Full multi-level inverse: `bands` is a list of (hl, lh, hh) from
    the coarsest level to the finest; (x0, y0, x1, y1) the tile-component
    region on the reference grid."""
    nl = len(bands)
    a = ll
    for r in range(1, nl + 1):
        d = nl - r  # remaining halvings after this synthesis
        u0, v0 = -(-x0 >> d), -(-y0 >> d)
        u1, v1 = -(-x1 >> d), -(-y1 >> d)
        hl, lh, hh = bands[r - 1]
        a = sr_2d(a, hl, lh, hh, u0, v0, u1, v1)
    return a


def dwt_53(a, nl, x0, y0, x1, y1):
    """Full multi-level forward: returns (ll, [(hl, lh, hh) coarsest
    first])."""
    out = []
    cur = np.asarray(a, np.int64)
    for r in range(nl):
        d = r  # current grid is the original halved r times
        u0, v0 = -(-x0 >> d), -(-y0 >> d)
        u1, v1 = -(-x1 >> d), -(-y1 >> d)
        ll, hl, lh, hh = sd_2d(cur, u0, v0, u1, v1)
        out.append((hl, lh, hh))
        cur = ll
    return cur, out[::-1]


# -- EBCOT Tier-1 code-block coding (Annex D) ----------------------------------

# context numbering: 0-8 significance, 9-13 sign, 14-16 magnitude
# refinement, 17 run-length, 18 UNIFORM
_CTX_RUN = 17
_CTX_UNI = 18

# Table D.7 initial (index, MPS) — everything else starts at (0, 0)
_T1_INIT = {0: 4, _CTX_RUN: 3, _CTX_UNI: 46}


def _t1_contexts() -> list:
    return [[_T1_INIT.get(i, 0), 0] for i in range(19)]


def _sig_ctx(h: int, v: int, d: int, band: int) -> int:
    """Table D.1. band: 0=LL, 1=HL, 2=LH, 3=HH. HL transposes h/v; HH
    keys on the diagonal count."""
    if band == 1:
        h, v = v, h
    if band != 3:
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else (1 if d == 1 else 0)
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else (1 if hv == 1 else 0)


# Table D.1 precomputed: index band*45 + (h*3 + v)*5 + d. The T1 inner
# loops run millions of times per code-block-rich page; a flat-list
# lookup replaces the branch ladder (profiled: the ladder alone was
# ~1.7 s of a 34 s page decode).
_SIG_TAB = [
    _sig_ctx(h, v, d, band)
    for band in range(4) for h in range(3) for v in range(3)
    for d in range(5)
]

# Table D.3: (hc+1, vc+1) -> (context, xor bit)
_SIGN_CTX = {
    (2, 2): (13, 0), (2, 1): (12, 0), (2, 0): (11, 0),
    (1, 2): (10, 0), (1, 1): (9, 0), (1, 0): (10, 1),
    (0, 2): (11, 1), (0, 1): (12, 1), (0, 0): (13, 1),
}


class _T1:
    """One code-block's coding state; `coder` is an MQDecoder or
    MQEncoder and `values` (encode side) the signed coefficients.
    Styles: ``causal`` (0x08) reads samples below the current 4-row
    stripe as insignificant in every context; ``reset`` (0x02) restores
    the Table D.7 context states after every pass; ``segsym`` (0x20)
    codes the 1010 segmentation symbol through UNIFORM at the end of
    each cleanup pass (decode verifies it — error detection)."""

    def __init__(self, w: int, h: int, band: int, coder, values=None,
                 causal=False, reset=False, segsym=False, bypass=False):
        self.w, self.h, self.band = w, h, band
        self.coder = coder
        self.causal = causal
        self.reset = reset
        self.segsym = segsym
        self.bypass = bypass
        self.raw = None  # active raw reader/writer during bypassed passes
        self.cx = _t1_contexts()
        # padded state planes (1-sample border of zeros) as FLAT
        # bytearrays, stride W = w + 2. numpy scalar indexing costs
        # ~200 ns per access and the passes do 8 reads per visited
        # sample millions of times per page (profiled: _hvd alone was
        # 14 s of a 34 s page decode on 2-D uint8 arrays); bytearray
        # indexing is ~10x cheaper with identical semantics.
        self.W = W = w + 2
        n = (h + 2) * W
        self.sig = bytearray(n)
        self.sgn = bytearray(n)
        self.visited = bytearray(n)
        self.refined = bytearray(n)
        self.mag = [0] * (h * w)  # flat ints, row-major
        self.encode = values is not None
        if self.encode:
            v = np.asarray(values, np.int64).ravel()
            self.vmag = [abs(int(x)) for x in v]
            self.vsgn = bytearray(1 if int(x) < 0 else 0 for x in v)

    # -- neighbor counts on the padded planes (x, y are 0-based) --

    def _hvd(self, x: int, y: int):
        s = self.sig
        W = self.W
        o = (y + 1) * W + x + 1
        h = s[o - 1] + s[o + 1]
        if self.causal and y & 3 == 3:  # next stripe reads 0
            return h, s[o - W], s[o - W - 1] + s[o - W + 1]
        return (
            h,
            s[o - W] + s[o + W],
            s[o - W - 1] + s[o - W + 1] + s[o + W - 1] + s[o + W + 1],
        )

    def _bit(self, ctx: int, enc_bit: int | None = None) -> int:
        if self.raw is not None:  # bypassed pass: no context modeling
            if self.encode:
                self.raw.put(enc_bit)
                return enc_bit
            return self.raw.read()
        c = self.cx[ctx]
        if self.encode:
            self.coder.encode(c, enc_bit)
            return enc_bit
        return self.coder.decode(c)

    def _code_sign(self, x: int, y: int) -> None:
        s, g, W = self.sig, self.sgn, self.W
        o = (y + 1) * W + x + 1
        if self.raw is not None:  # raw sign: the plain bit, no xor
            if self.encode:
                b = self.vsgn[y * self.w + x]
                self.raw.put(b)
                g[o] = b
            else:
                g[o] = self.raw.read()
            return
        # sig values are 0/1, so `s[i] and expr` is the spec's 0/±1
        # contribution
        hc = (s[o - 1] and (-1 if g[o - 1] else 1)) + (
            s[o + 1] and (-1 if g[o + 1] else 1))
        vc = s[o - W] and (-1 if g[o - W] else 1)
        if not (self.causal and y & 3 == 3):
            vc += s[o + W] and (-1 if g[o + W] else 1)
        hc = -1 if hc < -1 else (1 if hc > 1 else hc)
        vc = -1 if vc < -1 else (1 if vc > 1 else vc)
        ctx, xor = _SIGN_CTX[(hc + 1, vc + 1)]
        if self.encode:
            b = self.vsgn[y * self.w + x]
            self._bit(ctx, b ^ xor)
            g[o] = b
        else:
            g[o] = self._bit(ctx) ^ xor

    def _set_sig(self, x: int, y: int, plane: int) -> None:
        self.sig[(y + 1) * self.W + x + 1] = 1
        self.mag[y * self.w + x] |= 1 << plane

    # -- the three passes (D.4) --

    def spp(self, plane: int) -> None:
        """Significance propagation: code insignificant samples with a
        non-zero context."""
        sig, vis, W, w = self.sig, self.visited, self.W, self.w
        tab, tb = _SIG_TAB, self.band * 45
        enc = self.encode
        vmag = self.vmag if enc else None
        # direct-decode fast path: plain MQ decode skips _bit's raw/enc
        # dispatch (the passes call it millions of times per page)
        dec = None if (enc or self.raw is not None) else self.coder.decode
        cx = self.cx
        causal = self.causal
        for k0 in range(0, self.h, 4):
            ymax = min(k0 + 4, self.h)
            full = ymax - k0 == 4
            for x in range(w):
                col = (k0 + 1) * W + x + 1
                if full:
                    # blank-window skip: if nothing in the 6x3 padded
                    # window is significant, every row's context is 0 and
                    # the pass codes nothing here (conservative under the
                    # causal style — a below-stripe-only neighbor just
                    # falls through to the exact per-sample path)
                    o = col - W - 1
                    if not (
                        sig[o] or sig[o + 1] or sig[o + 2]
                        or sig[o + W] or sig[o + W + 1] or sig[o + W + 2]
                        or sig[o + 2 * W] or sig[o + 2 * W + 1]
                        or sig[o + 2 * W + 2]
                        or sig[o + 3 * W] or sig[o + 3 * W + 1]
                        or sig[o + 3 * W + 2]
                        or sig[o + 4 * W] or sig[o + 4 * W + 1]
                        or sig[o + 4 * W + 2]
                        or sig[o + 5 * W] or sig[o + 5 * W + 1]
                        or sig[o + 5 * W + 2]
                    ):
                        continue
                for y in range(k0, ymax):
                    o = col + (y - k0) * W
                    if sig[o]:
                        continue
                    h = sig[o - 1] + sig[o + 1]
                    if causal and y & 3 == 3:
                        v = sig[o - W]
                        d = sig[o - W - 1] + sig[o - W + 1]
                    else:
                        v = sig[o - W] + sig[o + W]
                        d = (sig[o - W - 1] + sig[o - W + 1]
                             + sig[o + W - 1] + sig[o + W + 1])
                    ctx = tab[tb + (h * 3 + v) * 5 + d]
                    if ctx == 0:
                        continue
                    if dec is not None:
                        bit = dec(cx[ctx])
                    else:
                        bit = self._bit(
                            ctx,
                            (vmag[y * w + x] >> plane) & 1 if enc else None,
                        )
                    vis[o] = 1
                    if bit:
                        self._set_sig(x, y, plane)
                        self._code_sign(x, y)

    def mrp(self, plane: int) -> None:
        """Magnitude refinement of samples significant before this
        plane (significant and not visited this plane)."""
        sig, vis, ref, W, w = (
            self.sig, self.visited, self.refined, self.W, self.w)
        mag = self.mag
        enc = self.encode
        vmag = self.vmag if enc else None
        dec = None if (enc or self.raw is not None) else self.coder.decode
        cx = self.cx
        for k0 in range(0, self.h, 4):
            ymax = min(k0 + 4, self.h)
            for x in range(w):
                col = (k0 + 1) * W + x + 1
                # refinement only touches significant samples: skip the
                # (common) all-insignificant column without row work
                if not (
                    sig[col]
                    or (ymax - k0 > 1 and sig[col + W])
                    or (ymax - k0 > 2 and sig[col + 2 * W])
                    or (ymax - k0 > 3 and sig[col + 3 * W])
                ):
                    continue
                for y in range(k0, ymax):
                    o = col + (y - k0) * W
                    if not sig[o] or vis[o]:
                        continue
                    if ref[o]:
                        ctx = 16
                    else:
                        h, v, d = self._hvd(x, y)
                        ctx = 15 if h + v + d > 0 else 14
                    if dec is not None:
                        bit = dec(cx[ctx])
                    else:
                        bit = self._bit(
                            ctx,
                            (vmag[y * w + x] >> plane) & 1 if enc else None,
                        )
                    if bit:
                        mag[y * w + x] |= 1 << plane
                    ref[o] = 1

    def cup(self, plane: int) -> None:
        """Cleanup pass with column run-length mode."""
        sig, vis, W, w, h_ = self.sig, self.visited, self.W, self.w, self.h
        tab, tb = _SIG_TAB, self.band * 45
        enc = self.encode
        vmag = self.vmag if enc else None
        # run-mode eligibility window: all four column cells plus every
        # cell any of their contexts can see — 6 padded rows x 3 padded
        # cols (5 rows under the causal style, which never reads the row
        # below the stripe). "Every context zero" is exactly "no
        # significant sample in the window" for all four band tables
        # (_sig_ctx returns 0 only at h=v=d=0).
        nrows = 5 if self.causal else 6
        dec = None if (enc or self.raw is not None) else self.coder.decode
        cx = self.cx
        causal = self.causal
        for k0 in range(0, h_, 4):
            ymax = min(k0 + 4, h_)
            full = ymax - k0 == 4
            for x in range(w):
                col = (k0 + 1) * W + x + 1
                y = k0
                run = False
                if full and not (
                    vis[col] or vis[col + W]
                    or vis[col + 2 * W] or vis[col + 3 * W]
                ):
                    run = True
                    o = col - W - 1
                    for _ in range(nrows):
                        if sig[o] or sig[o + 1] or sig[o + 2]:
                            run = False
                            break
                        o += W
                if run:
                    if enc:
                        r = next(
                            (i for i in range(4)
                             if (vmag[(k0 + i) * w + x] >> plane) & 1), None)
                        if r is None:
                            self._bit(_CTX_RUN, 0)
                            continue
                        self._bit(_CTX_RUN, 1)
                        self._bit(_CTX_UNI, (r >> 1) & 1)
                        self._bit(_CTX_UNI, r & 1)
                    else:
                        if not self._bit(_CTX_RUN):
                            continue
                        r = (self._bit(_CTX_UNI) << 1) | self._bit(_CTX_UNI)
                    y = k0 + r
                    self._set_sig(x, y, plane)
                    self._code_sign(x, y)
                    y += 1
                for yy in range(y, ymax):
                    o = (yy + 1) * W + x + 1
                    if sig[o] or vis[o]:
                        vis[o] = 0
                        continue
                    h = sig[o - 1] + sig[o + 1]
                    if causal and yy & 3 == 3:
                        v = sig[o - W]
                        d = sig[o - W - 1] + sig[o - W + 1]
                    else:
                        v = sig[o - W] + sig[o + W]
                        d = (sig[o - W - 1] + sig[o - W + 1]
                             + sig[o + W - 1] + sig[o + W + 1])
                    ctx = tab[tb + (h * 3 + v) * 5 + d]
                    if dec is not None:
                        bit = dec(cx[ctx])
                    else:
                        bit = self._bit(
                            ctx,
                            (vmag[yy * w + x] >> plane) & 1 if enc else None,
                        )
                    if bit:
                        self._set_sig(x, yy, plane)
                        self._code_sign(x, yy)
                # clear visited for rows already handled above
                for yy in range(k0, ymax):
                    vis[(yy + 1) * W + x + 1] = 0
        if self.segsym:
            # D.4.2 segmentation symbol 1010 through UNIFORM
            sym = 0
            for k in (3, 2, 1, 0):
                sym = (sym << 1) | self._bit(_CTX_UNI, (0xA >> k) & 1
                                             if self.encode else None)
            if not self.encode and sym != 0xA:
                raise ValueError("JPEG2000 segmentation symbol mismatch")

    def _pass_seq(self, start_plane: int, npasses: int):
        """Yield (pass_fn, plane) in coding order: CUP only on the first
        coded plane, then SPP/MRP/CUP per lower plane."""
        plane = start_plane
        done = 0
        first = True
        while done < npasses:
            if plane < 0:
                raise ValueError("JPEG2000 too many coding passes")
            passes = (self.cup,) if first else (self.spp, self.mrp, self.cup)
            for p in passes:
                yield p, plane
                done += 1
                if done >= npasses:
                    break
            first = False
            plane -= 1

    def _exec(self, p, plane) -> None:
        p(plane)
        if self.reset:
            self.cx = _t1_contexts()

    def _is_raw(self, p, plane, start_plane) -> bool:
        """Bypass rule: SPP/MRP of every plane below the first four are
        raw-coded; CUP always rides the MQ coder."""
        return (self.bypass and p in (self.spp, self.mrp)
                and plane <= start_plane - 4)

    def run(self, start_plane: int, npasses: int) -> None:
        """Execute `npasses` coding passes on the single shared coder."""
        for p, plane in self._pass_seq(start_plane, npasses):
            self._exec(p, plane)

    def run_segments(self, segs: list, start_plane: int) -> None:
        """termall decode: one TERMINATED codeword segment per pass —
        a fresh MQ decoder per segment, contexts persisting across
        (unless the reset style restores them per pass)."""
        for (p, plane), seg in zip(self._pass_seq(start_plane, len(segs)),
                                   segs):
            if self._is_raw(p, plane, start_plane):
                self.raw = _RawDec(seg)
            else:
                self.raw = None
                self.coder = MQDecoder(seg)
            self._exec(p, plane)

    def run_bypass(self, segs: list, start_plane: int,
                   npasses: int) -> None:
        """Bypass without termall: segments follow the fixed
        [10 MQ][2 raw][1 MQ]... pattern (_bypass_boundaries)."""
        bounds = _bypass_boundaries(npasses)
        if len(segs) != len(bounds):
            raise ValueError("JPEG2000 bypass segment count mismatch")
        si = 0
        prev = 0
        for i, (p, plane) in enumerate(
            self._pass_seq(start_plane, npasses)
        ):
            if i == prev:  # segment start
                if self._is_raw(p, plane, start_plane):
                    self.raw = _RawDec(segs[si])
                else:
                    self.raw = None
                    self.coder = MQDecoder(segs[si])
                prev = bounds[si]
                si += 1
            self._exec(p, plane)

    def result(self) -> np.ndarray:
        h, w = self.h, self.w
        v = np.asarray(self.mag, np.int64).reshape(h, w)
        g = np.frombuffer(bytes(self.sgn), np.uint8).reshape(h + 2, self.W)
        neg = g[1:-1, 1:-1] == 1
        v[neg] = -v[neg]
        return v


def t1_decode(data: bytes, w: int, h: int, band: int, start_plane: int,
              npasses: int, **styles) -> np.ndarray:
    t = _T1(w, h, band, MQDecoder(data), **styles)
    t.run(start_plane, npasses)
    return t.result()


def t1_decode_segments(segs: list, w: int, h: int, band: int,
                       start_plane: int, **styles) -> np.ndarray:
    t = _T1(w, h, band, None, **styles)
    t.run_segments(segs, start_plane)
    return t.result()


def t1_encode_termall(values: np.ndarray, band: int, **styles):
    """Lossless termall encode: one terminated MQ segment per pass.
    Returns (segments, start_plane); empty block -> ([], -1)."""
    values = np.asarray(values, np.int64)
    vmax = int(np.abs(values).max(initial=0))
    if vmax == 0:
        return [], -1
    start_plane = vmax.bit_length() - 1
    t = _T1(values.shape[1], values.shape[0], band, None, values=values,
            **styles)
    segs = []
    for p, plane in t._pass_seq(start_plane, 1 + 3 * start_plane):
        if t._is_raw(p, plane, start_plane):
            t.raw = _RawEnc()
        else:
            t.raw = None
            t.coder = MQEncoder()
        t._exec(p, plane)
        segs.append((t.raw or t.coder).flush())
    return segs, start_plane


def t1_encode(values: np.ndarray, band: int,
              **styles) -> tuple[bytes, int, int]:
    """Losslessly encode a code-block; returns (data, start_plane,
    npasses). start_plane = highest set magnitude bit."""
    values = np.asarray(values, np.int64)
    vmax = int(np.abs(values).max(initial=0))
    if vmax == 0:
        return b"", -1, 0
    start_plane = vmax.bit_length() - 1
    enc = MQEncoder()
    t = _T1(values.shape[1], values.shape[0], band, enc, values=values,
            **styles)
    npasses = 1 + 3 * start_plane
    t.run(start_plane, npasses)
    return enc.flush(), start_plane, npasses


# -- codestream structures (Annex A/B) -----------------------------------------

def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class _Subband:
    __slots__ = ("band", "x0", "y0", "x1", "y1", "cbs", "exp")

    def __init__(self, band, x0, y0, x1, y1):
        self.band = band  # 0 LL, 1 HL, 2 LH, 3 HH
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.cbs = []  # list of dicts, raster order


def _band_rect(tcx0, tcy0, tcx1, tcy1, nb, xob, yob):
    s = 1 << nb
    h = 1 << (nb - 1) if nb else 0
    return (
        _ceil_div(tcx0 - h * xob, s), _ceil_div(tcy0 - h * yob, s),
        _ceil_div(tcx1 - h * xob, s), _ceil_div(tcy1 - h * yob, s),
    )


def _make_codeblocks(sb: _Subband, xcb: int, ycb: int):
    if sb.x1 <= sb.x0 or sb.y1 <= sb.y0:
        return
    cw, ch = 1 << xcb, 1 << ycb
    for cy in range(sb.y0 // ch, _ceil_div(sb.y1, ch)):
        for cx in range(sb.x0 // cw, _ceil_div(sb.x1, cw)):
            x0 = max(sb.x0, cx * cw)
            y0 = max(sb.y0, cy * ch)
            x1 = min(sb.x1, (cx + 1) * cw)
            y1 = min(sb.y1, (cy + 1) * ch)
            sb.cbs.append({
                "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                "included": False, "zbp": 0, "passes": 0,
                "lblock": 3, "data": b"",
            })


def _eff_cb(xcb, ycb, r, pps):
    """Effective code-block exponents within a precinct (B.7): clamped
    to the precinct size (halved on the subband grid for r > 0)."""
    ppx, ppy = pps[r] if pps else (15, 15)
    off = 1 if r else 0
    return min(xcb, ppx - off), min(ycb, ppy - off)


def _tile_structure(tcx0, tcy0, tcx1, tcy1, nl, xcb, ycb, pps=None):
    """Per resolution r=0..nl: list of subbands with codeblock grids
    (code-block sizes clamped per precinct exponents when given)."""
    res = []
    for r in range(nl + 1):
        exb, eyb = _eff_cb(xcb, ycb, r, pps)
        bands = []
        if r == 0:
            x0, y0, x1, y1 = _band_rect(tcx0, tcy0, tcx1, tcy1, nl, 0, 0)
            bands.append(_Subband(0, x0, y0, x1, y1))
        else:
            nb = nl - r + 1
            for band, (xob, yob) in ((1, (1, 0)), (2, (0, 1)), (3, (1, 1))):
                x0, y0, x1, y1 = _band_rect(tcx0, tcy0, tcx1, tcy1,
                                            nb, xob, yob)
                bands.append(_Subband(band, x0, y0, x1, y1))
        for sb in bands:
            _make_codeblocks(sb, exb, eyb)
        res.append(bands)
    return res


class _PView:
    """One subband's code-blocks inside one precinct, with the tag-tree
    grid dims of their intersection rect."""

    __slots__ = ("band", "cbs", "gw", "gh")

    def __init__(self, band, cbs, gw, gh):
        self.band, self.cbs, self.gw, self.gh = band, cbs, gw, gh


def _precinct_meta(r, nl, tcx0, tcy0, tcx1, tcy1, pps):
    """Precinct grid of resolution r: (pc0, pr0, npx, npy, ppx, ppy)."""
    ppx, ppy = pps[r] if pps else (15, 15)
    s = 1 << (nl - r)
    rx0, ry0 = _ceil_div(tcx0, s), _ceil_div(tcy0, s)
    rx1, ry1 = _ceil_div(tcx1, s), _ceil_div(tcy1, s)
    pc0, pr0 = rx0 >> ppx, ry0 >> ppy
    npx = max(1, _ceil_div(rx1, 1 << ppx) - pc0) if rx1 > rx0 else 1
    npy = max(1, _ceil_div(ry1, 1 << ppy) - pr0) if ry1 > ry0 else 1
    return pc0, pr0, npx, npy, ppx, ppy


def _order_volume(prog, ly0, ly1, r0, r1, c0, c1, cparams,
                  crects, n_prec):
    """Packets of one progression volume (layers [ly0,ly1), resolutions
    [r0,r1), components [c0,c1)) in progression order `prog` as a flat
    (layer, r, c, pi) list. ``crects[c]`` is the tile-component rect +
    separation (tcx0, tcy0, tcx1, tcy1, xr, yr); ``n_prec[c][r]`` gives
    the precinct count. Position progressions (RPCL/PCRL/CPRL) order
    precincts by their first in-tile sample projected onto the
    REFERENCE grid — the B.12.1.3-5 condition terms carry the
    XRsiz/YRsiz factors, which is what makes mixed-separation
    components interleave correctly."""
    comps = [c for c in range(c0, min(c1, len(cparams)))]
    out = []
    if prog == 0:  # LRCP
        for layer in range(ly0, ly1):
            for r in range(r0, r1):
                for c in comps:
                    if r <= cparams[c]["nl"]:
                        for pi in range(n_prec[c][r]):
                            out.append((layer, r, c, pi))
        return out
    if prog == 1:  # RLCP
        for r in range(r0, r1):
            for layer in range(ly0, ly1):
                for c in comps:
                    if r <= cparams[c]["nl"]:
                        for pi in range(n_prec[c][r]):
                            out.append((layer, r, c, pi))
        return out
    # position progressions: key every (c, r, pi) by its projected
    # in-tile position (reference-grid y, x of the precinct's first
    # sample inside the tile)
    keyed = []
    for c in comps:
        nl_c = cparams[c]["nl"]
        pps = cparams[c].get("pps")
        tcx0, tcy0, tcx1, tcy1, xr, yr = crects[c]
        for r in range(r0, min(r1, nl_c + 1)):
            pc0, pr0, npx, npy, ppx, ppy = _precinct_meta(
                r, nl_c, tcx0, tcy0, tcx1, tcy1, pps)
            scale = 1 << (nl_c - r)
            for pi in range(n_prec[c][r]):
                pj, pix = divmod(pi, npx)
                y = max(((pr0 + pj) << ppy) * scale, tcy0) * yr
                x = max(((pc0 + pix) << ppx) * scale, tcx0) * xr
                keyed.append((y, x, c, r, pi))
    if prog == 2:  # RPCL: resolution, position, component, layer
        keyed.sort(key=lambda t: (t[3], t[0], t[1], t[2]))
    elif prog == 3:  # PCRL: position, component, resolution, layer
        keyed.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
    else:  # CPRL: component, position, resolution, layer
        keyed.sort(key=lambda t: (t[2], t[0], t[1], t[3]))
    for y, x, c, r, pi in keyed:
        for layer in range(ly0, ly1):
            out.append((layer, r, c, pi))
    return out


def _packet_order(prog, layers, cparams, crects, n_prec,
                  poc=None):
    """The complete packet sequence (B.12): either the single COD
    progression, or — with ``poc`` entries (RSpoc, CSpoc, LYEpoc, REpoc,
    CEpoc, Ppoc) — the concatenation of the POC progression volumes
    (A.6.6), each packet emitted at its FIRST occurrence, completed with
    any packets the volumes missed in the COD progression."""
    ncomp = len(cparams)
    max_nl = max(cp["nl"] for cp in cparams)
    full = _order_volume(prog, 0, layers, 0, max_nl + 1, 0, ncomp,
                         cparams, crects, n_prec)
    if not poc:
        return full
    out = []
    seen = set()
    for rs, cs, lye, re_, ce, p in poc:
        vol = _order_volume(p, 0, min(lye, layers), rs,
                            min(re_, max_nl + 1), cs, ce, cparams,
                            crects, n_prec)
        for pk in vol:
            if pk not in seen:
                seen.add(pk)
                out.append(pk)
    for pk in full:  # defensive completion: volumes that under-cover
        if pk not in seen:
            seen.add(pk)
            out.append(pk)
    return out


def _precinct_views(bands, r, nl, tcx0, tcy0, tcx1, tcy1, pps, xcb, ycb):
    """Group a resolution's code-blocks into precincts (B.6): returns a
    list over precinct index (raster order on the resolution grid) of
    per-subband _PView lists; each code-block's tag-tree (gi, gj) is set
    relative to its precinct's code-block grid. With the default
    (2^15) precinct size this collapses to one precinct per resolution
    and reproduces the plain per-subband grid."""
    ppx, ppy = pps[r] if pps else (15, 15)
    exb, eyb = _eff_cb(xcb, ycb, r, pps)
    s = 1 << (nl - r)
    rx0, ry0 = _ceil_div(tcx0, s), _ceil_div(tcy0, s)
    rx1, ry1 = _ceil_div(tcx1, s), _ceil_div(tcy1, s)
    pc0, pr0 = rx0 >> ppx, ry0 >> ppy
    npx = max(1, _ceil_div(rx1, 1 << ppx) - pc0) if rx1 > rx0 else 1
    npy = max(1, _ceil_div(ry1, 1 << ppy) - pr0) if ry1 > ry0 else 1
    sx = ppx - (1 if r else 0)
    sy = ppy - (1 if r else 0)
    cw, ch = 1 << exb, 1 << eyb
    # bucket code-blocks by precinct cell (anchored partitions nest, so
    # a code-block's top-left determines its precinct)
    groups: dict = {}
    for bi, sb in enumerate(bands):
        for cb in sb.cbs:
            key = ((cb["y0"] >> sy) - pr0, (cb["x0"] >> sx) - pc0)
            groups.setdefault(key, {}).setdefault(bi, []).append(cb)
    views = []
    for pj in range(npy):
        for pi in range(npx):
            row = []
            got = groups.get((pj, pi), {})
            for bi, sb in enumerate(bands):
                cbs = got.get(bi, [])
                if cbs:
                    px0, py0 = (pc0 + pi) << sx, (pr0 + pj) << sy
                    px1, py1 = px0 + (1 << sx), py0 + (1 << sy)
                    gx0 = max(sb.x0, px0) // cw
                    gy0 = max(sb.y0, py0) // ch
                    gw = _ceil_div(min(sb.x1, px1), cw) - gx0
                    gh = _ceil_div(min(sb.y1, py1), ch) - gy0
                    for cb in cbs:
                        cb["_gi"] = cb["x0"] // cw - gx0
                        cb["_gj"] = cb["y0"] // ch - gy0
                else:
                    gw = gh = 0
                row.append(_PView(sb.band, cbs, gw, gh))
            views.append(row)
    return views


def _npasses_read(br) -> int:
    if not br.read(1):
        return 1
    if not br.read(1):
        return 2
    v = br.read(2)
    if v < 3:
        return 3 + v
    v = br.read(5)
    if v < 31:
        return 6 + v
    return 37 + br.read(7)


def _npasses_write(bw, n: int) -> None:
    if n == 1:
        bw.put(0, 1)
    elif n == 2:
        bw.put(2, 2)
    elif n <= 5:
        bw.put(3, 2)
        bw.put(n - 3, 2)
    elif n <= 36:
        bw.put(0xF, 4)
        bw.put(n - 6, 5)
    elif n <= 164:
        bw.put(0x1FF, 9)
        bw.put(n - 37, 7)
    else:
        raise ValueError("JPEG2000 too many passes")


def _decode_packet(br, res_bands, layer_idx, trees, termall=False,
                   bypass=False):
    """One packet header. Returns [(cb, nbytes)] for the plain single
    codeword segment, or [(cb, [seg_len, ...])] with ``termall`` (each
    pass its own terminated segment, one length each, B.10.7.5)."""
    bodies = []
    if not br.read(1):  # zero-length packet
        br.align()
        return bodies
    for bi, sb in enumerate(res_bands):
        if not sb.cbs:
            continue
        incl_tree, zbp_tree = trees[bi]
        for cb in sb.cbs:
            gi, gj = cb["_gi"], cb["_gj"]
            if not cb["included"]:
                inc = incl_tree.decode(br, gi, gj, layer_idx + 1)
            else:
                inc = bool(br.read(1))
            if not inc:
                continue
            if not cb["included"]:
                cb["included"] = True
                t = 1
                while not zbp_tree.decode(br, gi, gj, t):
                    t += 1
                cb["zbp"] = t - 1
            npasses = _npasses_read(br)
            while br.read(1):
                cb["lblock"] += 1
            if termall:
                lens = [br.read(cb["lblock"]) for _ in range(npasses)]
                cb["passes"] += npasses
                bodies.append((cb, lens))
            elif bypass:
                # one length per segment PORTION in this packet; a
                # segment spanning layers accumulates byte chunks that
                # the body reader concatenates by segment index
                lens = []
                for idx, cnt in _bypass_portions(cb["passes"], npasses):
                    nb = cb["lblock"] + int(math.floor(math.log2(cnt)))
                    lens.append((idx, br.read(nb)))
                cb["passes"] += npasses
                bodies.append((cb, lens))
            else:
                nbits = cb["lblock"] + int(math.floor(math.log2(npasses)))
                nbytes = br.read(nbits)
                cb["passes"] += npasses
                bodies.append((cb, nbytes))
    br.align()
    return bodies


def _encode_packet(bw, res_bands, layer_idx, trees, payload):
    """Encoder: one packet carrying each codeblock's full lossless
    stream in this (single) layer. A resolution whose subbands hold no
    codeblocks emits no packet at all (mirrored by the decoder)."""
    if not any(sb.cbs for sb in res_bands):
        return
    bw.put(1, 1)
    for bi, sb in enumerate(res_bands):
        if not sb.cbs:
            continue
        incl_tree, zbp_tree = trees[bi]
        for cb in sb.cbs:
            gi, gj = cb["_gi"], cb["_gj"]
            incl_tree.encode(bw, gi, gj, layer_idx + 1)
            if not cb["included"]:
                cb["included"] = True
                t = 1
                while True:
                    zbp_tree.encode(bw, gi, gj, t)
                    if cb["zbp"] < t:
                        break
                    t += 1
            npasses = cb["passes"]
            _npasses_write(bw, npasses)
            nbytes = len(cb["data"])
            nbits_needed = max(1, nbytes.bit_length())
            want = cb["lblock"] + int(math.floor(math.log2(npasses)))
            while want < nbits_needed:
                bw.put(1, 1)
                cb["lblock"] += 1
                want += 1
            bw.put(0, 1)
            bw.put(nbytes, want)
            payload.append(cb["data"])


def _encode_packet_termall(bw, res_bands, layer_idx, trees, payload):
    """Encoder: one packet of a termall multi-layer stream — each
    code-block contributes the pass segments of its layer chunk, one
    length per segment (B.10.7.5), first inclusion via the tag tree at
    the chunk's layer, re-inclusion as a raw bit."""
    if not any(sb.cbs for sb in res_bands):
        return
    bw.put(1, 1)
    for bi, sb in enumerate(res_bands):
        if not sb.cbs:
            continue
        incl_tree, zbp_tree = trees[bi]
        for cb in sb.cbs:
            gi, gj = cb["_gi"], cb["_gj"]
            chunk = cb["_chunks"][layer_idx]
            if not cb["included"]:
                incl_tree.encode(bw, gi, gj, layer_idx + 1)
                if not chunk:
                    continue  # first inclusion is in a later layer
                cb["included"] = True
                t = 1
                while True:
                    zbp_tree.encode(bw, gi, gj, t)
                    if cb["zbp"] < t:
                        break
                    t += 1
            else:
                bw.put(1 if chunk else 0, 1)
                if not chunk:
                    continue
            _npasses_write(bw, len(chunk))
            need = max(max(1, len(s).bit_length()) for s in chunk)
            while cb["lblock"] < need:
                bw.put(1, 1)
                cb["lblock"] += 1
            bw.put(0, 1)
            for s in chunk:
                bw.put(len(s), cb["lblock"])
            payload.extend(chunk)


def _encode_packet_bypass_layered(bw, res_bands, layer_idx, trees,
                                  payload):
    """Encoder: one packet of a multi-layer bypass (non-termall)
    stream — each code-block contributes this layer's pass PORTIONS
    (npasses, then one length per portion of lblock +
    floor(log2(portion_passes)) bits); a segment whose passes span
    layers is byte-split across the packets and re-concatenated by
    the decoder."""
    if not any(sb.cbs for sb in res_bands):
        return
    bw.put(1, 1)
    for bi, sb in enumerate(res_bands):
        if not sb.cbs:
            continue
        incl_tree, zbp_tree = trees[bi]
        for cb in sb.cbs:
            gi, gj = cb["_gi"], cb["_gj"]
            np_l, portions = cb["_lchunks"][layer_idx]
            if not cb["included"]:
                incl_tree.encode(bw, gi, gj, layer_idx + 1)
                if not np_l:
                    continue  # first inclusion is in a later layer
                cb["included"] = True
                t = 1
                while True:
                    zbp_tree.encode(bw, gi, gj, t)
                    if cb["zbp"] < t:
                        break
                    t += 1
            else:
                bw.put(1 if np_l else 0, 1)
                if not np_l:
                    continue
            _npasses_write(bw, np_l)
            need = max(
                max(1, len(data).bit_length())
                - int(math.floor(math.log2(cnt)))
                for cnt, data in portions
            )
            while cb["lblock"] < need:
                bw.put(1, 1)
                cb["lblock"] += 1
            bw.put(0, 1)
            for cnt, data in portions:
                bw.put(len(data),
                       cb["lblock"] + int(math.floor(math.log2(cnt))))
            payload.extend(data for _, data in portions)


def _encode_packet_bypass(bw, res_bands, trees, payload):
    """Encoder: single-layer bypass packet — per code-block the
    [10 MQ][2 raw][1 MQ]... segments, one length each with
    lblock + floor(log2(passes_in_segment)) bits."""
    if not any(sb.cbs for sb in res_bands):
        return
    bw.put(1, 1)
    for bi, sb in enumerate(res_bands):
        if not sb.cbs:
            continue
        incl_tree, zbp_tree = trees[bi]
        for cb in sb.cbs:
            gi, gj = cb["_gi"], cb["_gj"]
            incl_tree.encode(bw, gi, gj, 1)
            cb["included"] = True
            t = 1
            while True:
                zbp_tree.encode(bw, gi, gj, t)
                if cb["zbp"] < t:
                    break
                t += 1
            n = cb["passes"]
            _npasses_write(bw, n)
            bounds = _bypass_boundaries(n)
            cnts = [b - a for a, b in zip([0] + bounds[:-1], bounds)]
            need = max(
                max(1, len(seg).bit_length())
                - int(math.floor(math.log2(c)))
                for seg, c in zip(cb["segs"], cnts)
            )
            while cb["lblock"] < need:
                bw.put(1, 1)
                cb["lblock"] += 1
            bw.put(0, 1)
            for seg, c in zip(cb["segs"], cnts):
                bw.put(len(seg),
                       cb["lblock"] + int(math.floor(math.log2(c))))
            payload.extend(cb["segs"])


# -- main codestream decode (A.4) ----------------------------------------------


def _parse_markers(d: bytes):
    """Yield (marker, body, body_pos) for the main header; stops at the
    first SOT. Returns (segments, pos_of_first_SOT)."""
    if d[:2] != b"\xff\x4f":
        raise ValueError("JPEG2000 missing SOC")
    pos = 2
    segs = []
    while True:
        if pos + 2 > len(d):
            raise ValueError("JPEG2000 truncated main header")
        m = struct.unpack(">H", d[pos : pos + 2])[0]
        if m == 0xFF90:  # SOT
            return segs, pos
        if pos + 4 > len(d):
            raise ValueError("JPEG2000 truncated marker segment")
        ln = struct.unpack(">H", d[pos + 2 : pos + 4])[0]
        body = d[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("JPEG2000 marker segment overruns data")
        segs.append((m, body))
        pos += 2 + ln


def _parse_spcod(sp: bytes, layers: int, has_precincts: bool = False):
    """The shared SPcod/SPcoc parameter block (A.6.1/A.6.2): levels,
    code-block exponents, code-block style, transform, and (when the
    Scod/Scoc precinct bit is set) one PPx|PPy<<4 byte per resolution."""
    nl = sp[0]
    xcb = (sp[1] & 0xF) + 2
    ycb = (sp[2] & 0xF) + 2
    if xcb + ycb > 12:
        raise ValueError("JPEG2000 code-block size exceeds 4096")
    cbstyle = sp[3]
    if cbstyle & ~0x3F:
        raise ValueError("JPEG2000 reserved code-block style bits")
    termall = bool(cbstyle & 0x04)
    bypass = bool(cbstyle & 0x01)
    transform = sp[4]
    if transform not in (0, 1):
        raise ValueError("JPEG2000 bad transform byte")
    pps = None
    if has_precincts:
        if len(sp) < 5 + nl + 1:
            raise ValueError("JPEG2000 precinct size list truncated")
        pps = []
        for r in range(nl + 1):
            b = sp[5 + r]
            ppx, ppy = b & 0xF, b >> 4
            if (ppx == 0 or ppy == 0) and r > 0:
                raise ValueError("JPEG2000 zero precinct exponent at r>0")
            pps.append((ppx, ppy))
    return {
        "nl": nl, "xcb": xcb, "ycb": ycb,
        "termall": termall, "bypass": bypass,
        "styles": {"reset": bool(cbstyle & 0x02),
                   "causal": bool(cbstyle & 0x08),
                   "segsym": bool(cbstyle & 0x20)},
        "transform": transform, "pps": pps,
    }


def _TMARKS_EMPTY():
    return {"cod": None, "qcd": None, "cocs": [], "qccs": [],
            "rgns": [], "pocs": []}


def _parse_poc(bodies, ncomp):
    """POC progression-order-change entries (A.6.6): a flat list of
    (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc) tuples from one or more
    marker bodies."""
    poc = []
    csz = 1 if ncomp < 257 else 2
    esz = 5 + 2 * csz
    for body in bodies:
        if len(body) % esz:
            raise ValueError("JPEG2000 POC segment length mismatch")
        for e in range(0, len(body), esz):
            rs = body[e]
            cs = int.from_bytes(body[e + 1 : e + 1 + csz], "big")
            lye = struct.unpack(
                ">H", body[e + 1 + csz : e + 3 + csz])[0]
            re_ = body[e + 3 + csz]
            ce = int.from_bytes(body[e + 4 + csz : e + 4 + 2 * csz], "big")
            ppoc = body[e + 4 + 2 * csz]
            if ppoc > 4:
                raise ValueError("JPEG2000 POC bad progression order")
            if re_ <= rs or ce <= cs or lye == 0:
                raise ValueError("JPEG2000 POC empty progression volume")
            poc.append((rs, cs, lye, re_, ce, ppoc))
    return poc


def _build_cparams(ncomp, comps_info, cod, qcd, cocs, qccs, rgns,
                   tcod=None, tqcd=None, tcocs=(), tqccs=()):
    """Per-component coding + quantization parameters for one scope
    (main header, or one tile when the tile's first tile-part header
    carries COD/COC/QCD/QCC overrides). Precedence per A.6.1: tile COC
    > tile COD > main COC > main COD, and tile QCC > tile QCD > main
    QCC > main QCD. Returns {prog, layers, mct, transform, use_sop,
    use_eph, cparams}."""
    # 0x10 (predictable termination) in the code-block style constrains
    # only the ENCODER's flush pattern so decoders MAY detect corruption;
    # decoding is identical, so the bit is accepted (verification not
    # performed)
    cod_eff = tcod if tcod is not None else cod
    scod = cod_eff[0]
    use_sop = bool(scod & 2)
    use_eph = bool(scod & 4)
    prog = cod_eff[1]
    if prog > 4:
        raise ValueError("JPEG2000 bad progression order")
    layers = struct.unpack(">H", cod_eff[2:4])[0]
    mct = cod_eff[4]
    base = _parse_spcod(cod_eff[5:], layers, has_precincts=bool(scod & 1))
    main_base_nl = base["nl"] if tcod is None else _parse_spcod(
        cod[5:], layers, has_precincts=bool(cod[0] & 1))["nl"]

    def comp_index(body):
        if ncomp < 257:
            return body[0], 1
        return struct.unpack(">H", body[:2])[0], 2

    def coc_map(bodies, kind):
        m = {}
        for body in bodies:
            ci, off = comp_index(body)
            if ci >= ncomp:
                raise ValueError(f"JPEG2000 {kind} component out of range")
            m[ci] = _parse_spcod(body[off + 1 :], layers,
                                 has_precincts=bool(body[off] & 1))
        return m

    def qcc_map(bodies):
        m = {}
        for body in bodies:
            ci, off = comp_index(body)
            if ci >= ncomp:
                raise ValueError("JPEG2000 QCC component out of range")
            m[ci] = body[off:]
        return m

    main_coc, tile_coc = coc_map(cocs, "COC"), coc_map(tcocs, "COC")
    main_qcc, tile_qcc = qcc_map(qccs), qcc_map(tqccs)

    cparams = []
    for c in range(ncomp):
        if c in tile_coc:
            src = tile_coc[c]
        elif tcod is not None or c not in main_coc:
            src = base
        else:
            src = main_coc[c]
        cparams.append(dict(src, styles=dict(src["styles"])))
    transform = base["transform"]
    if mct and ncomp >= 3 and len(
            {cparams[c]["transform"] for c in range(3)}) != 1:
        # RCT is defined on 5/3 output and ICT on 9/7 (G.2/G.3): a
        # stream mixing transforms across the MCT trio is corrupt
        raise ValueError("JPEG2000 MCT over mixed transforms")

    for c, cp in enumerate(cparams):
        # a COC that changes the decomposition count changes the subband
        # count; a QCD's entry list then no longer lines up with this
        # component, so a (tile or main) QCC must cover it
        if c in tile_qcc:
            qbody = tile_qcc[c]
        elif tqcd is not None and cp["nl"] == base["nl"]:
            qbody = tqcd
        elif c in main_qcc:
            qbody = main_qcc[c]
        elif cp["nl"] == main_base_nl and tcod is None:
            qbody = qcd
        elif cp["nl"] == base["nl"] and tqcd is None and tcod is not None:
            # tile COD kept/changed nl uniformly but carried no tile QCD:
            # the main QCD still lines up only if the counts agree
            qbody = qcd if cp["nl"] == main_base_nl else None
        else:
            qbody = None
        if qbody is None:
            raise ValueError(
                "JPEG2000 decomposition-level override but no QCC "
                f"covers component {c}"
            )
        qstyle, guard, cp["quant"] = _qcd_parse(
            qbody, cp["nl"], comps_info[c][0])
        cp["qstyle"] = qstyle
        if (cp["transform"] == 1) != (qstyle == 0):
            raise ValueError("JPEG2000 transform/quantization style mismatch")
        cp["roi"] = 0
    for body in rgns:
        # RGN (A.6.3): implicit maxshift ROI — quantized coefficients
        # with magnitude >= 2^SPrgn were upshifted by SPrgn at encode
        # (every background magnitude stays below the threshold); Mb for
        # the component's subbands grows by SPrgn
        ci, off = comp_index(body)
        if ci >= ncomp:
            raise ValueError("JPEG2000 RGN component out of range")
        if body[off] != 0:
            raise NotImplementedError("JPEG2000 RGN style != maxshift")
        cparams[ci]["roi"] = body[off + 1]
    return {"prog": prog, "layers": layers, "mct": mct,
            "transform": transform, "use_sop": use_sop,
            "use_eph": use_eph, "cparams": cparams}


def decode_jpeg2000(data: bytes) -> np.ndarray:
    """JP2 container or raw codestream → grayscale uint8 (RGB via the
    repo's cv2-exact luma, matching every other decoder here).

    Error contract (decode_image-wide): corrupt bytes raise ValueError,
    valid-but-unsupported features NotImplementedError."""
    try:
        comps, cinfo = _decode_j2k_components(_unbox(data))
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, MemoryError,
            struct.error) as e:
        raise ValueError(f"corrupt JPEG2000: {type(e).__name__}: {e}") from e
    scaled = []
    for c, a in enumerate(comps):
        dep, sg = cinfo[c][:2]
        mx = (1 << dep) - 1
        if sg:
            # signed range [-2^(B-1), 2^(B-1)-1] → display offset binary
            half = 1 << (dep - 1)
            a = np.clip(a, -half, half - 1) + half
        else:
            a = np.clip(a, 0, mx)
        scaled.append(a.astype(np.float64) * (255.0 / mx))
    if len({a.shape for a in scaled}) > 1:
        # subsampled components: replicate up to the least-subsampled
        # grid for display (shape-ratio index mapping — exact nearest-
        # neighbour for the power-of-two separations real encoders use)
        hh = max(a.shape[0] for a in scaled)
        ww = max(a.shape[1] for a in scaled)
        scaled = [
            a if a.shape == (hh, ww) else a[np.ix_(
                np.minimum(np.arange(hh) * a.shape[0] // hh,
                           a.shape[0] - 1),
                np.minimum(np.arange(ww) * a.shape[1] // ww,
                           a.shape[1] - 1),
            )]
            for a in scaled
        ]
    cdef = _jp2_cdef(data)
    if cdef is not None:
        # channel-definition box (I.5.3.6): keep colour channels (Typ 0)
        # ordered by their colour association, drop straight opacity
        # (Typ 1 — same convention as the PNG/GIF alpha paths here);
        # premultiplied opacity (Typ 2) would need un-multiplication by
        # the alpha plane to display — rare enough to keep loud.
        if any(t == 2 for _, t, _ in cdef):
            raise NotImplementedError(
                "JPEG2000 premultiplied-alpha channel (cdef Typ 2) "
                "unsupported")
        if sorted(cn for cn, _, _ in cdef) != list(range(len(scaled))):
            raise ValueError("JPEG2000 cdef does not cover every channel")
        color = [cn for cn, t, a in sorted(
            cdef, key=lambda e: (e[2], e[0])) if t == 0]
        if not color or any(t not in (0, 1) for _, t, _ in cdef):
            raise NotImplementedError(
                "JPEG2000 cdef channel roles unsupported")
        scaled = [scaled[cn] for cn in color]
    if len(scaled) == 3 and _jp2_enum_cs(data) == 18:
        # sYCC (I.5.3.3): the decoded components ARE luma/chroma — the
        # shape scanner JPX takes (subsampled chroma, MCT off) —
        # convert to RGB before the shared luma reduction
        yy, cbs, crs = scaled
        scaled = [
            yy + 1.402 * (crs - 128.0),
            yy - 0.344136 * (cbs - 128.0) - 0.714136 * (crs - 128.0),
            yy + 1.772 * (cbs - 128.0),
        ]
    if len(scaled) == 4 and _jp2_enum_cs(data) == 12:
        # CMYK (the 15444-2 extended enumerated space, value 12 —
        # the shape print-pipeline JPX takes). Samples are ink
        # coverage (0 = no ink): composite over white with the SAME
        # integer arithmetic as the repo's Adobe-CMYK JPEG path
        # (jpeg.py _reconstruct) so a page scanned both ways greys
        # identically.
        c8 = [np.clip(np.rint(a), 0, 255).astype(np.uint16) for a in scaled]
        inv_cmy = np.stack([255 - a for a in c8[:3]], axis=-1)
        inv_k = (255 - c8[3])[..., None]
        rgb = (inv_cmy * inv_k + 127) // 255
        scaled = [rgb[..., i].astype(np.float64) for i in range(3)]
    if len(scaled) == 1:
        return np.clip(np.rint(scaled[0]), 0, 255).astype(np.uint8)
    if len(scaled) == 3:
        from .kernels import rgb_to_gray

        rgb = np.stack(
            [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in scaled],
            axis=-1,
        )
        return rgb_to_gray(rgb)
    raise NotImplementedError(
        f"JPEG2000 {len(scaled)}-component image unsupported"
    )


def _jp2_boxes(buf, pos, end):
    """JP2 box walker: yields (type, body_start, body_end) for the box
    sequence in buf[pos:end], honouring XLBox (length 1) and
    to-end-of-file (length 0) encodings."""
    while pos + 8 <= end:
        ln = struct.unpack(">I", buf[pos : pos + 4])[0]
        typ = buf[pos + 4 : pos + 8]
        off = 8
        if ln == 1:
            ln = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            off = 16
        body_end = end if ln == 0 else min(pos + ln, end)
        yield typ, pos + off, body_end
        pos = body_end


def _jp2_enum_cs(data: bytes) -> int | None:
    """Enumerated colourspace from the JP2 header's colr box (I.5.3.3):
    16 sRGB, 17 greyscale, 18 sYCC, 12 CMYK (15444-2). None for raw
    codestreams, missing colr boxes, or non-enumerated methods (ICC
    profiles)."""
    if data[:2] == b"\xff\x4f":
        return None
    for typ, b0, b1 in _jp2_boxes(data, 0, len(data)):
        if typ == b"jp2h":
            for t2, c0, c1 in _jp2_boxes(data, b0, b1):
                if t2 == b"colr" and data[c0] == 1 and c0 + 7 <= c1:
                    return struct.unpack(">I", data[c0 + 3 : c0 + 7])[0]
            return None
    return None


def _jp2_cdef(data: bytes) -> list | None:
    """Channel-definition box (I.5.3.6) from the JP2 header: a list of
    (Cn, Typ, Asoc) triples — channel index, role (0 colour, 1 opacity,
    2 premultiplied opacity), and colour association — or None when the
    box is absent (raw codestreams included). Malformed boxes raise
    ValueError (never a silent drop: a misread alpha plane must not be
    greyed into the page)."""
    if data[:2] == b"\xff\x4f":
        return None
    for typ, b0, b1 in _jp2_boxes(data, 0, len(data)):
        if typ == b"jp2h":
            for t2, c0, c1 in _jp2_boxes(data, b0, b1):
                if t2 == b"cdef":
                    if c1 - c0 < 2:
                        raise ValueError("JPEG2000 cdef box truncated")
                    n = struct.unpack(">H", data[c0 : c0 + 2])[0]
                    if c1 - c0 < 2 + 6 * n or n == 0:
                        raise ValueError("JPEG2000 cdef box truncated")
                    return [
                        struct.unpack(">HHH", data[c0 + 2 + 6 * i :
                                                   c0 + 8 + 6 * i])
                        for i in range(n)
                    ]
            return None
    return None


def _unbox(data: bytes) -> bytes:
    """Extract the contiguous codestream from a JP2 container, or pass a
    raw codestream through."""
    if data[:2] == b"\xff\x4f":
        return data
    if data[4:8] != b"jP  " or data[:4] != b"\x00\x00\x00\x0c":
        raise ValueError("not a JPEG2000 stream")
    pos = 0
    while pos + 8 <= len(data):
        ln = struct.unpack(">I", data[pos : pos + 4])[0]
        typ = data[pos + 4 : pos + 8]
        if ln == 1:  # extended length
            ln = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body_off = 16
        else:
            body_off = 8
        if ln == 0:
            body_end = len(data)
        else:
            body_end = pos + ln
        if typ == b"jp2c":
            return data[pos + body_off : body_end]
        pos = body_end
    raise ValueError("JP2 container has no jp2c codestream box")


def _decode_j2k_components(d: bytes):
    segs, pos = _parse_markers(d)
    siz = cod = qcd = None
    cocs: list = []
    qccs: list = []
    ppms: list = []
    rgns: list = []
    poc_bodies: list = []
    for m, body in segs:
        if m == 0xFF51:
            siz = body
        elif m == 0xFF52:
            cod = body
        elif m == 0xFF5C:
            qcd = body
        elif m == 0xFF53:
            cocs.append(body)
        elif m == 0xFF5D:
            qccs.append(body)
        elif m == 0xFF60:  # PPM: Zppm index byte + packed-header bytes
            ppms.append((body[0], body[1:]))
        elif m == 0xFF5E:  # RGN: component, Srgn, SPrgn
            rgns.append(body)
        elif m == 0xFF5F:  # POC: progression order changes
            poc_bodies.append(body)
        # COM/TLM/PLM/CRG are informational — skipped
    if siz is None or cod is None or qcd is None:
        raise ValueError("JPEG2000 missing SIZ/COD/QCD")
    pm_stream = None
    pm_off = 0
    if ppms:
        if sorted(z for z, _ in ppms) != list(range(len(ppms))):
            raise ValueError("JPEG2000 PPM Zppm indices not contiguous")
        # concatenation is a sequence of [Nppm][one tile-part's packed
        # headers] records, consumed by tile-parts in codestream order
        pm_stream = b"".join(b for _, b in sorted(ppms, key=lambda t: t[0]))

    (xsiz, ysiz, xo, yo, xt, yt, xto, yto) = struct.unpack(">8I", siz[2:34])
    ncomp = struct.unpack(">H", siz[34:36])[0]
    from .kernels import _check_dims

    _check_dims(xsiz - xo, ysiz - yo, "JPEG2000 image")
    comps_info = []
    for c in range(ncomp):
        ssiz, xr, yr = siz[36 + 3 * c : 39 + 3 * c]
        if xr == 0 or yr == 0:
            raise ValueError("JPEG2000 zero component separation")
        dep = (ssiz & 0x7F) + 1
        if not 1 <= dep <= 16:
            raise ValueError("JPEG2000 component depth out of range")
        # per-component precision, signedness and separation (A.5.1):
        # depth feeds each component's Rb (quantizer ranges, E.1) and
        # its DC level shift; signed components skip the level shift
        # entirely (G.1.2); XRsiz/YRsiz put the component on its own
        # grid — every tile rect maps through ceil(x / XRsiz) (B.3)
        comps_info.append((dep, bool(ssiz & 0x80), xr, yr))

    mh = _build_cparams(ncomp, comps_info, cod, qcd, cocs, qccs, rgns)
    prog, layers = mh["prog"], mh["layers"]
    poc = _parse_poc(poc_bodies, ncomp)

    ntx = _ceil_div(xsiz - xto, xt)
    nty = _ceil_div(ysiz - yto, yt)

    # First pass: collect tile-parts (A.4.2 — a tile's bitstream may be
    # split into several SOT..SOD segments, possibly interleaved with
    # other tiles'; Kakadu-style output splits by resolution). Packets
    # concatenate in tile-part order, so decode runs on the joined body.
    tile_parts: dict[int, list] = {}
    tile_order: list[int] = []
    tile_marks: dict[int, dict] = {}
    while pos + 2 <= len(d):
        m = struct.unpack(">H", d[pos : pos + 2])[0]
        if m == 0xFFD9:  # EOC
            break
        if m != 0xFF90:
            raise ValueError(f"JPEG2000 unexpected marker {m:#06x}")
        lsot, isot, psot, tpsot, tnsot = struct.unpack(
            ">HHIBB", d[pos + 2 : pos + 12]
        )
        if psot == 0:
            psot = len(d) - pos
        tile_end = pos + psot
        tpos = pos + 12
        # tile-part header: SOD, PPT packed packet headers (A.7.2 —
        # Zppt-indexed chunks whose concatenation carries every packet
        # header for the tile), or COD/COC/QCD/QCC overrides for this
        # tile (A.4.2/Table A.1: legal in the FIRST tile-part only)
        ppts: list = []
        while True:
            tm = struct.unpack(">H", d[tpos : tpos + 2])[0]
            if tm == 0xFF93:  # SOD
                tpos += 2
                break
            ln = struct.unpack(">H", d[tpos + 2 : tpos + 4])[0]
            if tm in (0xFF52, 0xFF5C, 0xFF53, 0xFF5D):
                if tpsot != 0:
                    raise ValueError(
                        "JPEG2000 coding marker outside first tile-part")
                ent = tile_marks.setdefault(isot, _TMARKS_EMPTY())
                mbody = d[tpos + 4 : tpos + 2 + ln]
                if tm == 0xFF52:
                    ent["cod"] = mbody
                elif tm == 0xFF5C:
                    ent["qcd"] = mbody
                elif tm == 0xFF53:
                    ent["cocs"].append(mbody)
                else:
                    ent["qccs"].append(mbody)
            elif tm == 0xFF61:  # PPT: Zppt index byte + packed headers
                ppts.append((d[tpos + 4], d[tpos + 5 : tpos + 2 + ln]))
            elif tm in (0xFF5E, 0xFF5F):
                # tile-scoped ROI / progression changes (A.6.3/A.6.6):
                # override the main-header markers for this tile. This
                # decoder concatenates all tile-parts before the packet
                # walk, so they must sit in the FIRST tile-part header
                if tpsot != 0:
                    raise NotImplementedError(
                        "JPEG2000 RGN/POC in a later tile-part")
                ent = tile_marks.setdefault(isot, _TMARKS_EMPTY())
                mbody = d[tpos + 4 : tpos + 2 + ln]
                ent["rgns" if tm == 0xFF5E else "pocs"].append(mbody)
            elif tm not in (0xFF58, 0xFF64):  # PLT/COM are informational
                raise ValueError(
                    f"JPEG2000 unexpected tile-header marker {tm:#06x}")
            tpos += 2 + ln
        pm_rec = None
        if pm_stream is not None:
            if ppts:
                raise ValueError("JPEG2000 PPM and PPT are exclusive")
            if pm_off + 4 > len(pm_stream):
                raise ValueError("JPEG2000 PPM stream exhausted")
            nppm = struct.unpack(">I", pm_stream[pm_off : pm_off + 4])[0]
            pm_rec = pm_stream[pm_off + 4 : pm_off + 4 + nppm]
            if len(pm_rec) < nppm:
                raise ValueError("JPEG2000 PPM record truncated")
            pm_off += 4 + nppm
        if isot not in tile_parts:
            tile_parts[isot] = []
            tile_order.append(isot)
        tile_parts[isot].append((tpsot, d[tpos:tile_end], ppts, pm_rec))
        pos = tile_end

    # per-tile parameter scopes (A.6.1): rebuilt only for tiles whose
    # first tile-part header carried COD/COC/QCD/QCC
    tscope = {
        # tile RGN overrides the main RGN for its component (applied
        # after, so the later assignment wins)
        isot: _build_cparams(ncomp, comps_info, cod, qcd, cocs, qccs,
                             rgns + tm["rgns"], tcod=tm["cod"],
                             tqcd=tm["qcd"], tcocs=tm["cocs"],
                             tqccs=tm["qccs"])
        for isot, tm in tile_marks.items()
    }
    tpoc = {
        isot: _parse_poc(tm["pocs"], ncomp)
        for isot, tm in tile_marks.items() if tm["pocs"]
    }
    lossless_all = all(
        cp["transform"] == 1
        for s in [mh, *tscope.values()] for cp in s["cparams"]
    )
    dt = np.int64 if lossless_all else np.float64
    comps = [
        np.zeros((_ceil_div(ysiz, yr) - _ceil_div(yo, yr),
                  _ceil_div(xsiz, xr) - _ceil_div(xo, xr)), dt)
        for _, _, xr, yr in comps_info
    ]

    for isot in tile_order:
        parts = tile_parts[isot]
        if [t[0] for t in parts] != list(range(len(parts))):
            raise ValueError("JPEG2000 tile-parts out of order")
        body = parts[0][1] if len(parts) == 1 else b"".join(
            t[1] for t in parts
        )
        all_ppts = [z for _, _, ppts, _ in parts for z in ppts]
        pkt_headers = None
        if all_ppts:
            if sorted(z for z, _ in all_ppts) != list(range(len(all_ppts))):
                raise ValueError("JPEG2000 PPT Zppt indices not contiguous")
            pkt_headers = b"".join(
                b for _, b in sorted(all_ppts, key=lambda t: t[0])
            )
        elif pm_stream is not None:
            pkt_headers = b"".join(t[3] for t in parts)
        p, q = isot % ntx, isot // ntx
        tx0 = max(xto + p * xt, xo)
        ty0 = max(yto + q * yt, yo)
        tx1 = min(xto + (p + 1) * xt, xsiz)
        ty1 = min(yto + (q + 1) * yt, ysiz)
        sc = tscope.get(isot, mh)
        tile = _decode_tile(body, tx0, ty0, tx1, ty1, ncomp,
                            sc["cparams"], sc["layers"], sc["prog"],
                            sc["use_sop"], sc["use_eph"], comps_info,
                            sc["mct"], sc["transform"],
                            pkt_headers=pkt_headers,
                            poc=tpoc.get(isot, poc))
        for c in range(ncomp):
            _, _, xr, yr = comps_info[c]
            comps[c][
                _ceil_div(ty0, yr) - _ceil_div(yo, yr)
                : _ceil_div(ty1, yr) - _ceil_div(yo, yr),
                _ceil_div(tx0, xr) - _ceil_div(xo, xr)
                : _ceil_div(tx1, xr) - _ceil_div(xo, xr),
            ] = tile[c]
    return comps, comps_info


def _sb_index(band: int, r: int) -> int:
    """Quantization-table index: LL then (HL, LH, HH) per resolution."""
    return 0 if r == 0 else 1 + 3 * (r - 1) + (band - 1)


def _decode_tile(body, tx0, ty0, tx1, ty1, ncomp, cparams,
                 layers, prog, use_sop, use_eph, cinfo, mct, transform,
                 pkt_headers: bytes | None = None, poc=None):
    # tile-component rects (B.3): each component sees the tile through
    # its own XRsiz/YRsiz separation
    crects = [
        (_ceil_div(tx0, xr), _ceil_div(ty0, yr),
         _ceil_div(tx1, xr), _ceil_div(ty1, yr), xr, yr)
        for _, _, xr, yr in cinfo
    ]
    structs = [
        _tile_structure(*crects[c][:4], cp["nl"], cp["xcb"], cp["ycb"],
                        cp.get("pps"))
        for c, cp in enumerate(cparams)
    ]
    pviews = [
        [
            _precinct_views(structs[c][r], r, cparams[c]["nl"],
                            *crects[c][:4], cparams[c].get("pps"),
                            cparams[c]["xcb"], cparams[c]["ycb"])
            for r in range(cparams[c]["nl"] + 1)
        ]
        for c in range(ncomp)
    ]
    ptrees = [
        [
            [
                [
                    (TagTree(v.gw, v.gh), TagTree(v.gw, v.gh))
                    if v.cbs else None
                    for v in row
                ]
                for row in pviews[c][r]
            ]
            for r in range(cparams[c]["nl"] + 1)
        ]
        for c in range(ncomp)
    ]
    # packet iteration order (B.12); with COC the resolution count
    # differs per component — packets simply do not exist for r > NL_c
    # (B.12.1), so the walk skips those (r, c) pairs entirely
    n_prec = [
        [len(pviews[c][r]) for r in range(cparams[c]["nl"] + 1)]
        for c in range(ncomp)
    ]

    def packet_seq():
        return _packet_order(prog, layers, cparams, crects, n_prec,
                             poc=poc)

    # With PPT (A.7.2) every packet HEADER lives in the packed-header
    # stream (EPH included) while packet BODIES stay in the bitstream;
    # without it both interleave in `body` and the two cursors coincide.
    hsrc = body if pkt_headers is None else pkt_headers
    pos = 0
    hpos = 0
    for layer, r, c, pi in packet_seq():
        termall = cparams[c]["termall"]
        bypass = cparams[c]["bypass"]
        if use_sop and body[pos : pos + 2] == b"\xff\x91":
            pos += 6
        if pkt_headers is None:
            hpos = pos
        br = _PktBitReader(hsrc, hpos)
        row = pviews[c][r][pi]
        tr = [t for t in ptrees[c][r][pi] if t is not None]
        nonempty = [v for v in row if v.cbs]
        if nonempty:
            bodies = _decode_packet(br, nonempty, layer, tr, termall, bypass)
        else:
            # Code-block-less precinct: the stream still carries a packet —
            # the empty packet header, a single 0 bit byte-aligned (T.800
            # B.10.3; OpenJPEG emits exactly this) — so the EPH that follows
            # is real and must be consumed, not demanded out of thin air.
            if br.read(1):
                raise ValueError(
                    "JPEG2000 nonempty packet for code-block-less precinct")
            bodies = []
        hpos = br.align()
        if use_eph:
            if hsrc[hpos : hpos + 2] != b"\xff\x92":
                raise ValueError("JPEG2000 missing EPH")
            hpos += 2
        if pkt_headers is None:
            pos = hpos
        for cb, nbytes in bodies:
            if termall:
                for ln in nbytes:  # one terminated segment per pass
                    seg = body[pos : pos + ln]
                    if len(seg) < ln:
                        raise ValueError("JPEG2000 packet body truncated")
                    cb.setdefault("segs", []).append(seg)
                    pos += ln
            elif bypass:
                segs = cb.setdefault("segs", [])
                for idx, ln in nbytes:
                    chunk = body[pos : pos + ln]
                    if len(chunk) < ln:
                        raise ValueError("JPEG2000 packet body truncated")
                    while len(segs) <= idx:
                        segs.append(b"")
                    segs[idx] += chunk
                    pos += ln
            else:
                chunk = body[pos : pos + nbytes]
                if len(chunk) < nbytes:
                    # check THIS layer's slice, not the accumulated stream —
                    # the accumulated length masks truncation after layer 0
                    raise ValueError("JPEG2000 packet body truncated")
                cb["data"] += chunk
                pos += nbytes

    out = []
    for c in range(ncomp):
        res = structs[c]
        nl = cparams[c]["nl"]
        quant = cparams[c]["quant"]
        termall = cparams[c]["termall"]
        bypass = cparams[c]["bypass"]
        styles = cparams[c]["styles"]
        roi = cparams[c].get("roi", 0)
        # decode codeblocks into subband coefficient arrays
        band_arrays = []
        for r in range(nl + 1):
            arrs = []
            for sb in res[r]:
                a = np.zeros((sb.y1 - sb.y0, sb.x1 - sb.x0), np.int64)
                mb, delta = quant[_sb_index(sb.band, r)]
                mb += roi  # A.6.3: maxshift grows the bitplane count
                for cb in sb.cbs:
                    if cb["passes"] == 0:
                        continue
                    start_plane = mb - 1 - cb["zbp"]
                    if start_plane < 0:
                        raise ValueError("JPEG2000 zero-bitplanes exceed Mb")
                    if termall:
                        v = t1_decode_segments(
                            cb.get("segs", []), cb["x1"] - cb["x0"],
                            cb["y1"] - cb["y0"], sb.band, start_plane,
                            bypass=bypass, **styles,
                        )
                    elif bypass:
                        v = t1_decode_bypass(
                            cb.get("segs", []), cb["x1"] - cb["x0"],
                            cb["y1"] - cb["y0"], sb.band, start_plane,
                            cb["passes"], **styles,
                        )
                    else:
                        v = t1_decode(
                            cb["data"], cb["x1"] - cb["x0"],
                            cb["y1"] - cb["y0"], sb.band, start_plane,
                            cb["passes"], **styles,
                        )
                    if roi:
                        # H.1/maxshift: magnitudes at/above 2^SPrgn are
                        # ROI coefficients — shift them back down; the
                        # rest are background, untouched
                        mag = np.abs(v)
                        v = np.where(mag >= (1 << roi),
                                     np.sign(v) * (mag >> roi), v)
                    a[cb["y0"] - sb.y0 : cb["y1"] - sb.y0,
                      cb["x0"] - sb.x0 : cb["x1"] - sb.x0] = v
                if delta is not None:
                    # E.1 midpoint reconstruction: sign * (|q| + 0.5) * Δ
                    f = np.where(
                        a != 0, (np.abs(a) + 0.5) * delta * np.sign(a), 0.0
                    )
                    arrs.append(f)
                else:
                    arrs.append(a)
            band_arrays.append(arrs)
        ll = band_arrays[0][0]
        bands_fine = [tuple(band_arrays[r]) for r in range(1, nl + 1)]
        if cparams[c]["transform"] == 1:
            out.append(idwt_53(ll, bands_fine, *crects[c][:4]))
        else:
            out.append(idwt_97(ll, bands_fine, *crects[c][:4]))

    if mct:
        if ncomp < 3:
            raise ValueError("JPEG2000 MCT with fewer than 3 components")
        if len({cinfo[c][2:] for c in range(3)}) != 1:
            # G.1: MCT is only defined over components on one grid
            raise ValueError(
                "JPEG2000 MCT over mismatched component separations")
        if len({cinfo[c][:2] for c in range(3)}) != 1:
            # RCT/ICT assume one nominal range across the transformed
            # trio (G.1); a real stream mixing depths under MCT is rare
            # enough to keep loud rather than guess a normalization
            raise NotImplementedError(
                "JPEG2000 MCT over mismatched component depths")
        y, u, v = out[0], out[1], out[2]
        if cparams[0]["transform"] == 1:  # RCT (G.2)
            g = y - ((u + v) >> 2)
            r_ = v + g
            b_ = u + g
        else:  # ICT (G.3): YCbCr floats
            r_ = y + 1.402 * v
            g = y - 0.344136 * u - 0.714136 * v
            b_ = y + 1.772 * u
        out[0], out[1], out[2] = r_, g, b_
    # DC level shift (G.1.2): unsigned components only; signed samples
    # are already centered on zero
    return [
        o if cinfo[c][1] else o + (1 << (cinfo[c][0] - 1))
        for c, o in enumerate(out)
    ]


# -- fixture encoder -----------------------------------------------------------

_ENC_GUARD = 2
_ENC_EXP = 20  # loose reversible exponent: Mb = 21 covers every subband


def _enc_quant_body(nl: int, lossy: bool, qexp_extra: int, depth: int = 8):
    """QCD/QCC payload (after any component index) for `nl` levels:
    returns (body, per-subband Mb list, per-subband delta list or None)."""
    if lossy:
        # scalar expounded: eps = Rb + qexp_extra, mu = 0 -> delta =
        # 2^(Rb-eps) = 2^-qexp_extra for every subband (Rb = component
        # depth + band gain, E.1 — the depth enters eps and Rb alike,
        # so the step size itself is depth-independent)
        entries = b""
        deltas = []
        for i in range(3 * nl + 1):
            gain = 0 if i == 0 else _BAND_GAIN[1 + (i - 1) % 3]
            eps = depth + gain + qexp_extra
            entries += struct.pack(">H", (eps << 11) | 0)
            deltas.append(2.0 ** (-qexp_extra))
        body = bytes([(_ENC_GUARD << 5) | 2]) + entries
        mbs = [_ENC_GUARD + ((struct.unpack(
            ">H", entries[2 * i : 2 * i + 2])[0] >> 11) & 0x1F) - 1
            for i in range(3 * nl + 1)]
        return body, mbs, deltas
    body = bytes([_ENC_GUARD << 5]) + bytes([_ENC_EXP << 3] * (3 * nl + 1))
    return body, [_ENC_GUARD + _ENC_EXP - 1] * (3 * nl + 1), None


def encode_jpeg2000(img: np.ndarray, nl: int = 2, cb: tuple = (6, 6),
                    tile: tuple | None = None, prog: int = 0,
                    jp2: bool = False, sop: bool = False,
                    eph: bool = False, lossy: bool = False,
                    qexp_extra: int = 3, layers: int = 1,
                    termall: bool = False, causal: bool = False,
                    reset: bool = False, segsym: bool = False,
                    bypass: bool = False,
                    overrides: dict | None = None,
                    split_parts: int = 1, ppt: bool = False,
                    ppm: bool = False, precincts=None,
                    roi: tuple | None = None,
                    poc: list | None = None,
                    components: list | None = None,
                    tile_overrides: dict | None = None,
                    size: tuple | None = None,
                    colorspace: int | None = None,
                    cdef: list | None = None) -> bytes:
    """Fixture encoder: 8-bit grayscale (2D) or RGB (3D), ``nl`` wavelet
    levels, code-blocks of 2^cb[0] x 2^cb[1], optional tiling, any
    progression order label, single quality layer, raw codestream or
    JP2 container. Default reversible (5/3 + RCT, bit-exact); with
    ``lossy`` the 9/7 + ICT + scalar-expounded-quantization path, step
    size 2^-qexp_extra of each subband's nominal range (Annex E).
    ``termall`` terminates every coding pass in its own codeword
    segment (style bit 0x04); ``layers > 1`` (quality-progressive)
    splits each code-block's pass segments across layers and REQUIRES
    termall so the segmentation is explicit. ``overrides`` maps a
    component index to {"nl": int, "cb": (xe, ye), "qexp_extra": int} and
    emits the corresponding COC/QCC main-header markers (per-component
    decomposition/code-block/quantization — the gray+color mix shape
    real encoders produce). ``split_parts`` splits every tile's packets
    across that many SOT..SOD tile-parts (A.4.2, the Kakadu-style
    layout). ``ppt`` moves every packet header (EPH included) into PPT
    packed-header segments in the tile-part header (A.7.2); the
    bitstream then carries packet bodies only; ``ppm`` packs them into
    MAIN-header PPM segments instead, one [Nppm][headers] record per
    tile-part (A.7.4 — mutually exclusive with ppt). ``precincts`` — a
    single
    (PPx, PPy) exponent pair applied to every resolution, or a
    per-resolution list — partitions each resolution into 2^PPx x 2^PPy
    precincts with one packet per precinct (B.6; code-block sizes clamp
    per B.7) in any progression order. ``roi`` — an
    (x0, y0, x1, y1) image-pixel rect encoded as a maxshift region of
    interest (A.6.3/H: quantized coefficients whose support touches the
    rect are upshifted by SPrgn = the component's bitplane count, one
    RGN marker per component). ``poc`` — a list of (RSpoc, CSpoc,
    LYEpoc, REpoc, CEpoc, Ppoc) progression-order-change entries
    (A.6.6); packets then follow the concatenated POC volumes.
    ``components`` — a list of {"data": 2-D int array, "depth": int
    (default 8), "signed": bool (default False)} — bypasses the
    gray/RGB path entirely: each component is coded independently
    (mct=0, no color transform) with its own Ssiz precision/signedness,
    the A.5.1 per-component shape (signed samples skip the DC level
    shift; a non-8-bit depth shifts the lossy eps by Rb).
    ``tile_overrides`` maps a tile index (raster order) to {"nl": int,
    "cb": (xe, ye), "qexp_extra": int}: that tile's FIRST tile-part
    header carries its own COD + QCD (A.4.2/Table A.1 — the per-tile
    coding-override shape Kakadu can emit), applied to every component
    of that tile. ``colorspace`` overrides the JP2 colr enum (18 sYCC,
    12 CMYK); ``cdef`` — a list of (Cn, Typ, Asoc) triples — emits the
    I.5.3.6 channel-definition box (alpha channels, permuted layouts)."""
    if layers > 1 and not (termall or bypass):
        raise ValueError(
            "multi-layer fixture requires termall or bypass")
    if tile_overrides:
        if roi is not None or overrides:
            raise ValueError(
                "tile_overrides composes with neither roi nor "
                "per-component overrides in this fixture encoder")
    styles = {"causal": causal, "reset": reset, "segsym": segsym}
    style_byte = ((0x01 if bypass else 0) | (0x02 if reset else 0)
                  | (0x04 if termall else 0) | (0x08 if causal else 0)
                  | (0x20 if segsym else 0))
    if components is not None:
        ncomp = len(components)
        if not ncomp:
            raise ValueError("components list is empty")
        cspecs = [
            (np.asarray(ce["data"], np.int64),
             int(ce.get("depth", 8)), bool(ce.get("signed", False)),
             int(ce.get("xr", 1)), int(ce.get("yr", 1)),
             bool(ce.get("lossy", lossy)))
            for ce in components
        ]
        subsampled = any(
            xr != 1 or yr != 1 for _, _, _, xr, yr, _ in cspecs)
        if subsampled:
            if size is None:
                raise ValueError(
                    "subsampled components need an explicit reference-"
                    "grid size=(w, h)")
            if roi is not None:
                raise ValueError(
                    "roi does not compose with subsampled components "
                    "in this fixture encoder")
            w, h = size
        else:
            h, w = cspecs[0][0].shape if size is None else size[::-1]
        for a, dep, sg, xr, yr, _lc in cspecs:
            # each component's grid is the reference grid through its
            # separation (B.3, with XOsiz = YOsiz = 0)
            if a.shape != (_ceil_div(h, yr), _ceil_div(w, xr)):
                raise ValueError("component shape does not match its "
                                 "separation")
            lo = -(1 << (dep - 1)) if sg else 0
            hi = lo + (1 << dep) - 1
            if a.size and (a.min() < lo or a.max() > hi):
                raise ValueError("component samples out of depth range")
        mct = 0
    else:
        img = np.asarray(img, np.uint8)
        ncomp = 1 if img.ndim == 2 else img.shape[2]
        if ncomp not in (1, 3):
            raise ValueError("encoder supports gray or RGB")
        h, w = img.shape[:2]
        cspecs = [(None, 8, False, 1, 1, lossy)] * ncomp
        mct = 1 if ncomp == 3 else 0
    if tile_overrides and len(
            {lc for *_, lc in cspecs}) > 1:
        raise ValueError("tile_overrides does not compose with a "
                         "per-component transform mix")
    if (tile_overrides and lossy
            and len({dep for _, dep, _, _, _, _ in cspecs}) > 1):
        # a tile QCD is one table for all components; with lossy mixed
        # depths each component needs its own eps (QCC), not emitted here
        raise ValueError("tile_overrides with lossy mixed depths needs "
                         "per-component QCCs")
    xt, yt = tile if tile is not None else (w, h)
    xcb, ycb = cb
    out = bytearray(b"\xff\x4f")  # SOC

    def seg(marker, body):
        out.extend(struct.pack(">HH", marker, len(body) + 2))
        out.extend(body)

    def pps_for(nl_c: int):
        if precincts is None:
            return None
        if isinstance(precincts, tuple):
            return [precincts] * (nl_c + 1)
        if len(precincts) < nl_c + 1:
            raise ValueError("precincts list shorter than nl + 1")
        return [tuple(p) for p in precincts[: nl_c + 1]]

    # per-component encode parameters (COD/QCD defaults + overrides)
    enc_cp = []
    for c in range(ncomp):
        ov = (overrides or {}).get(c, {})
        nl_c = ov.get("nl", nl)
        xcb_c, ycb_c = ov.get("cb", (xcb, ycb))
        qx_c = ov.get("qexp_extra", qexp_extra)
        lossy_c = cspecs[c][5]
        qbody, mbs_c, deltas_c = _enc_quant_body(nl_c, lossy_c, qx_c,
                                                 depth=cspecs[c][1])
        enc_cp.append({
            "nl": nl_c, "xcb": xcb_c, "ycb": ycb_c,
            "mbs": mbs_c, "deltas": deltas_c, "qbody": qbody,
            "pps": pps_for(nl_c), "lossy": lossy_c,
            "transform": 0 if lossy_c else 1,
            "coc": (nl_c != nl or (xcb_c, ycb_c) != (xcb, ycb)
                    or lossy_c != lossy),
        })

    siz = struct.pack(">H8IH", 0, w, h, 0, 0, xt, yt, 0, 0, ncomp)
    for _, dep, sg, xr, yr, _lc in cspecs:
        siz += bytes([(dep - 1) | (0x80 if sg else 0), xr, yr])
    seg(0xFF51, siz)
    has_prec = precincts is not None
    scod = (1 if has_prec else 0) | (2 if sop else 0) | (4 if eph else 0)
    transform = 0 if lossy else 1

    def prec_bytes(pps):
        return bytes([px | (py << 4) for px, py in pps]) if pps else b""

    cod = bytes([scod, prog]) + struct.pack(">H", layers) + bytes(
        [mct, nl, xcb - 2, ycb - 2, style_byte, transform]
    ) + prec_bytes(pps_for(nl))
    seg(0xFF52, cod)
    if poc:
        pb = bytearray()
        for rs, cs, lye, re_, ce, p in poc:
            pb += bytes([rs, cs]) + struct.pack(">H", lye) \
                + bytes([re_, ce, p])
        seg(0xFF5F, bytes(pb))
    for c, cp in enumerate(enc_cp):
        if cp["coc"]:
            seg(0xFF53, bytes([c, 1 if has_prec else 0, cp["nl"],
                               cp["xcb"] - 2, cp["ycb"] - 2, style_byte,
                               cp["transform"]]) + prec_bytes(cp["pps"]))
    qcd_body, _, _ = _enc_quant_body(nl, lossy, qexp_extra,
                                     depth=cspecs[0][1])
    seg(0xFF5C, qcd_body)
    for c, cp in enumerate(enc_cp):
        if cp["qbody"] != qcd_body:
            seg(0xFF5D, bytes([c]) + cp["qbody"])
    for c, cp in enumerate(enc_cp):
        # maxshift: SPrgn = the component's bitplane count, so every
        # background magnitude (< 2^Mb) stays below the 2^SPrgn threshold
        cp["roi"] = max(cp["mbs"]) if roi is not None else 0
        if cp["roi"]:
            seg(0xFF5E, bytes([c, 0, cp["roi"]]))

    if ppm and ppt:
        raise ValueError("ppm and ppt are mutually exclusive (A.7.4)")
    tiles_out = bytearray()
    pm_records: list = []
    ntx, nty = _ceil_div(w, xt), _ceil_div(h, yt)
    for q in range(nty):
        for p in range(ntx):
            tx0, ty0 = p * xt, q * yt
            tx1, ty1 = min((p + 1) * xt, w), min((q + 1) * yt, h)
            tov = (tile_overrides or {}).get(q * ntx + p)
            ecp = enc_cp
            tile_hdr = b""
            poc_t = poc
            if tov is not None and "poc" in tov:
                # per-tile POC (A.6.6/Table A.1): overrides the main
                # progression for this tile
                poc_t = tov["poc"]
                pb = bytearray()
                for rs, cs, lye, re_, ce, pgp in poc_t:
                    pb += bytes([rs, cs]) + struct.pack(">H", lye) \
                        + bytes([re_, ce, pgp])
                tile_hdr += struct.pack(
                    ">HH", 0xFF5F, len(pb) + 2) + bytes(pb)
            if tov is not None and any(
                    k in tov for k in ("nl", "cb", "qexp_extra")):
                # per-tile COD/QCD in the first tile-part header
                # (A.4.2/Table A.1): same prog/layers/mct, this tile's
                # own decomposition count / code-block size / step size
                nl_t = tov.get("nl", nl)
                xcb_t, ycb_t = tov.get("cb", (xcb, ycb))
                qx_t = tov.get("qexp_extra", qexp_extra)
                qbody_t, mbs_t, deltas_t = _enc_quant_body(
                    nl_t, lossy, qx_t, depth=cspecs[0][1])
                ecp = [
                    {"nl": nl_t, "xcb": xcb_t, "ycb": ycb_t,
                     "mbs": mbs_t, "deltas": deltas_t, "qbody": qbody_t,
                     "pps": pps_for(nl_t), "coc": False, "roi": 0}
                    for _ in range(ncomp)
                ]
                cod_t = bytes([scod, prog]) + struct.pack(
                    ">H", layers) + bytes(
                    [mct, nl_t, xcb_t - 2, ycb_t - 2, style_byte,
                     transform]) + prec_bytes(pps_for(nl_t))
                tile_hdr += (
                    struct.pack(">HH", 0xFF52, len(cod_t) + 2) + cod_t
                    + struct.pack(">HH", 0xFF5C, len(qbody_t) + 2)
                    + qbody_t
                )
            # tile-component rects (B.3) for this tile
            enc_crects = [
                (_ceil_div(tx0, xr), _ceil_div(ty0, yr),
                 _ceil_div(tx1, xr), _ceil_div(ty1, yr), xr, yr)
                for _, _, _, xr, yr, _lc in cspecs
            ]
            comps = []
            if components is not None:
                for (a, dep, sg, xr, yr, lc), (cx0, cy0, cx1, cy1, _,
                                               _) in zip(cspecs,
                                                         enc_crects):
                    sub_c = a[cy0:cy1, cx0:cx1].astype(
                        np.float64 if lc else np.int64)
                    if not sg:  # DC level shift (G.1.2), unsigned only
                        sub_c = sub_c - (1 << (dep - 1))
                    comps.append(sub_c)
            elif ncomp == 1:
                sub = img[ty0:ty1, tx0:tx1]
                comps = [sub.astype(np.int64) - 128]
            elif not lossy:
                sub = img[ty0:ty1, tx0:tx1]
                r_ = sub[..., 0].astype(np.int64) - 128
                g_ = sub[..., 1].astype(np.int64) - 128
                b_ = sub[..., 2].astype(np.int64) - 128
                y_ = (r_ + 2 * g_ + b_) >> 2
                u_ = b_ - g_
                v_ = r_ - g_
                comps = [y_, u_, v_]
            else:
                sub = img[ty0:ty1, tx0:tx1]
                r_ = sub[..., 0].astype(np.float64) - 128
                g_ = sub[..., 1].astype(np.float64) - 128
                b_ = sub[..., 2].astype(np.float64) - 128
                y_ = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
                u_ = -0.16875 * r_ - 0.331260 * g_ + 0.5 * b_
                v_ = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
                comps = [y_, u_, v_]
            structs = []
            for c in range(ncomp):
                nl_c = ecp[c]["nl"]
                mbs = ecp[c]["mbs"]
                deltas = ecp[c]["deltas"]
                res = _tile_structure(*enc_crects[c][:4], nl_c,
                                      ecp[c]["xcb"], ecp[c]["ycb"],
                                      ecp[c]["pps"])
                if ecp[c].get("lossy", lossy):
                    ll, bands = dwt_97(comps[c], nl_c, *enc_crects[c][:4])
                else:
                    ll, bands = dwt_53(comps[c], nl_c, *enc_crects[c][:4])
                arrays = [[ll]] + [list(b) for b in bands]
                roi_s = ecp[c]["roi"]
                for r in range(nl_c + 1):
                    for bi, sb in enumerate(res[r]):
                        a = arrays[r][bi]
                        mb = mbs[_sb_index(sb.band, r)] + roi_s
                        if deltas is not None:
                            d = deltas[_sb_index(sb.band, r)]
                            a = (np.sign(a)
                                 * np.floor(np.abs(a) / d)).astype(np.int64)
                        if roi_s and sb.x1 > sb.x0 and sb.y1 > sb.y0:
                            # upshift quantized coefficients whose support
                            # (~2^nb image pixels per coefficient) touches
                            # the ROI rect
                            nb = (nl_c - r + 1) if r else nl_c
                            rx0, ry0, rx1, ry1 = roi
                            xs = np.arange(sb.x0, sb.x1) << nb
                            ys = np.arange(sb.y0, sb.y1) << nb
                            m = (((ys >= ry0) & (ys < ry1))[:, None]
                                 & ((xs >= rx0) & (xs < rx1))[None, :])
                            a = np.where(m, a * (1 << roi_s), a)
                        for cbk in sb.cbs:
                            v = a[cbk["y0"] - sb.y0 : cbk["y1"] - sb.y0,
                                  cbk["x0"] - sb.x0 : cbk["x1"] - sb.x0]
                            if termall:
                                segs, sp = t1_encode_termall(
                                    v, sb.band, bypass=bypass, **styles)
                                if segs and sp >= mb:
                                    raise ValueError(
                                        "JPEG2000 encoder Mb too small")
                                if not segs:
                                    t = _T1(v.shape[1], v.shape[0],
                                            sb.band, MQEncoder(), values=v,
                                            **styles)
                                    t.coder = MQEncoder()
                                    t._exec(t.cup, 0)
                                    segs, sp = [t.coder.flush()], 0
                                cbk["segs"] = segs
                                cbk["passes"] = len(segs)
                                cbk["zbp"] = mb - 1 - sp
                                continue
                            if bypass:
                                segs, sp, np_ = t1_encode_bypass(
                                    v, sb.band, **styles)
                                if not segs:
                                    t = _T1(v.shape[1], v.shape[0],
                                            sb.band, MQEncoder(), values=v,
                                            **styles)
                                    t.coder = MQEncoder()
                                    t._exec(t.cup, 0)
                                    segs, sp, np_ = [t.coder.flush()], 0, 1
                                cbk["segs"] = segs
                                cbk["passes"] = np_
                                cbk["zbp"] = mb - 1 - sp
                                continue
                            data, sp, np_ = t1_encode(v, sb.band, **styles)
                            if np_ and sp >= mb:
                                raise ValueError(
                                    "JPEG2000 encoder Mb too small")
                            cbk["data"] = data
                            cbk["passes"] = np_
                            cbk["zbp"] = mb - 1 - sp if np_ else mb - 1
                            if np_ == 0:
                                # all-zero block: never included is not an
                                # option in a lossless single layer — code
                                # one empty cleanup pass instead
                                enc = MQEncoder()
                                t = _T1(v.shape[1], v.shape[0], sb.band,
                                        enc, values=v, **styles)
                                t.run(0, 1)
                                cbk["data"] = enc.flush()
                                cbk["passes"] = 1
                                cbk["zbp"] = mb - 1
                structs.append(res)
            pviews = [
                [
                    _precinct_views(structs[c][r], r, ecp[c]["nl"],
                                    *enc_crects[c][:4], ecp[c]["pps"],
                                    ecp[c]["xcb"], ecp[c]["ycb"])
                    for r in range(ecp[c]["nl"] + 1)
                ]
                for c in range(ncomp)
            ]
            ptrees = [
                [
                    [
                        [
                            (TagTree(v.gw, v.gh), TagTree(v.gw, v.gh))
                            if v.cbs else None
                            for v in row
                        ]
                        for row in pviews[c][r]
                    ]
                    for r in range(ecp[c]["nl"] + 1)
                ]
                for c in range(ncomp)
            ]
            for c in range(ncomp):
                for r in range(ecp[c]["nl"] + 1):
                    for row, trow in zip(pviews[c][r], ptrees[c][r]):
                        for v, t2 in zip(row, trow):
                            if not v.cbs:
                                continue
                            it, zt = t2
                            for cbk in v.cbs:
                                it.set_value(cbk["_gi"], cbk["_gj"], 0)
                                zt.set_value(cbk["_gi"], cbk["_gj"],
                                             cbk["zbp"])
                                cbk["included"] = False
                                cbk["lblock"] = 3

            # per-cb layer chunks: contiguous pass-segment splits; the
            # inclusion tag value is the first non-empty layer
            if termall:
                for c in range(ncomp):
                    for r in range(ecp[c]["nl"] + 1):
                        for row, trow in zip(pviews[c][r], ptrees[c][r]):
                            for v, t2 in zip(row, trow):
                                if not v.cbs:
                                    continue
                                incl_tree, _zt = t2
                                for cbk in v.cbs:
                                    n = len(cbk["segs"])
                                    bounds = [round(i * n / layers)
                                              for i in range(layers + 1)]
                                    cbk["_chunks"] = [
                                        cbk["segs"][bounds[i] : bounds[i + 1]]
                                        for i in range(layers)
                                    ]
                                    first_l = next(
                                        i for i, ch in
                                        enumerate(cbk["_chunks"]) if ch
                                    )
                                    incl_tree.set_value(
                                        cbk["_gi"], cbk["_gj"], first_l)
            elif bypass and layers > 1:
                # non-termall bypass layering: split each code-block's
                # PASSES across layers; a portion inside a segment takes
                # a proportional byte slice — the decoder concatenates
                # portions by segment index before the T1 run, so only
                # the signalled lengths must match the chunks
                for c in range(ncomp):
                    for r in range(ecp[c]["nl"] + 1):
                        for row, trow in zip(pviews[c][r], ptrees[c][r]):
                            for v, t2 in zip(row, trow):
                                if not v.cbs:
                                    continue
                                incl_tree, _zt = t2
                                for cbk in v.cbs:
                                    n = cbk["passes"]
                                    pb = [round(i * n / layers)
                                          for i in range(layers + 1)]
                                    bnds = _bypass_boundaries(n)
                                    cnts = [b - a for a, b in
                                            zip([0] + bnds[:-1], bnds)]
                                    consumed = [0] * len(bnds)
                                    lch = []
                                    for li in range(layers):
                                        npl = pb[li + 1] - pb[li]
                                        ports = []
                                        for idx, cnt in _bypass_portions(
                                                pb[li], npl) if npl else []:
                                            seg = cbk["segs"][idx]
                                            b0 = consumed[idx]
                                            b1 = b0 + cnt
                                            s0 = round(len(seg) * b0
                                                       / cnts[idx])
                                            s1 = round(len(seg) * b1
                                                       / cnts[idx])
                                            consumed[idx] = b1
                                            ports.append((cnt, seg[s0:s1]))
                                        lch.append((npl, ports))
                                    cbk["_lchunks"] = lch
                                    first_l = next(
                                        i for i, (npl, _p) in
                                        enumerate(lch) if npl)
                                    incl_tree.set_value(
                                        cbk["_gi"], cbk["_gj"], first_l)

            # mirror of the decoder's walk (same shared order function)
            enc_n_prec = [
                [len(pviews[c][r]) for r in range(ecp[c]["nl"] + 1)]
                for c in range(ncomp)
            ]

            def packet_seq():
                return _packet_order(prog, layers, ecp, enc_crects,
                                     enc_n_prec, poc=poc_t)

            body = bytearray()
            hdrs = bytearray()  # PPT/PPM mode: packet headers live here
            boundaries: list[int] = []  # body offset after each packet
            hbounds: list[int] = []  # header offset after each packet
            packed = ppt or ppm
            hsink = hdrs if packed else body
            for layer, r, c, pi in packet_seq():
                nonempty = [v for v in pviews[c][r][pi] if v.cbs]
                if sop:  # SOP markers stay in the bitstream even with PPT
                    body.extend(struct.pack(">HHH", 0xFF91, 4, 0))
                if not nonempty:
                    # code-block-less precinct: emit the spec's empty packet
                    # header — a single 0 bit, byte-aligned (T.800 B.10.3),
                    # matching OpenJPEG — so EPH markers stay consistent
                    hsink.extend(b"\x00")
                    if eph:
                        hsink.extend(b"\xff\x92")
                    boundaries.append(len(body))
                    hbounds.append(len(hdrs))
                    continue
                bw = _PktBitWriter()
                payload = []
                tr = [t for t in ptrees[c][r][pi] if t is not None]
                if termall:
                    _encode_packet_termall(bw, nonempty, layer, tr, payload)
                elif bypass and layers > 1:
                    _encode_packet_bypass_layered(bw, nonempty, layer,
                                                  tr, payload)
                elif bypass:
                    _encode_packet_bypass(bw, nonempty, tr, payload)
                else:
                    _encode_packet(bw, nonempty, layer, tr, payload)
                hsink.extend(bw.align())
                if eph:
                    hsink.extend(b"\xff\x92")
                for pdata in payload:
                    body.extend(pdata)
                boundaries.append(len(body))
                hbounds.append(len(hdrs))
            isot = q * ntx + p
            # optionally split at packet boundaries into several tile-parts
            # (A.4.2 — the Kakadu-style layout real scanner JPX takes)
            n_pk = len(boundaries)
            k = max(1, min(split_parts, n_pk))
            cut_pk = [0] + [(i + 1) * n_pk // k for i in range(k)]
            cuts = [0] + [boundaries[cut_pk[i + 1] - 1] for i in range(k)]
            hcuts = [0] + [hbounds[cut_pk[i + 1] - 1] for i in range(k)]
            for i in range(k):
                chunk = body[cuts[i] : cuts[i + 1]]
                extra = tile_hdr if i == 0 else b""
                if ppt and i == 0:
                    zb = bytearray()
                    for z, off in enumerate(range(0, max(len(hdrs), 1),
                                                  65532)):
                        hchunk = bytes(hdrs[off : off + 65532])
                        zb += struct.pack(">HHB", 0xFF61, 3 + len(hchunk), z)
                        zb += hchunk
                    extra += bytes(zb)
                if ppm:
                    # one PPM record per tile-part: this part's headers
                    pm_records.append(bytes(hdrs[hcuts[i] : hcuts[i + 1]]))
                psot = 12 + len(extra) + 2 + len(chunk)
                tiles_out.extend(struct.pack(">HHHIBB", 0xFF90, 10, isot,
                                             psot, i, k))
                tiles_out.extend(extra)
                tiles_out.extend(b"\xff\x93")
                tiles_out.extend(chunk)
    if ppm:
        # PPM (A.7.4): Zppm-indexed main-header segments whose
        # concatenation is a sequence of [Nppm][one tile-part's packed
        # headers] records, consumed by tile-parts in codestream order
        pm = bytearray()
        for rec in pm_records:
            pm += struct.pack(">I", len(rec)) + rec
        for z, off in enumerate(range(0, max(len(pm), 1), 65532)):
            chunk_m = bytes(pm[off : off + 65532])
            out.extend(struct.pack(">HHB", 0xFF60, 3 + len(chunk_m), z))
            out.extend(chunk_m)
    out.extend(tiles_out)
    out.extend(b"\xff\xd9")  # EOC
    stream = bytes(out)
    if not jp2:
        return stream
    def box(typ, payload):
        return struct.pack(">I", len(payload) + 8) + typ + payload
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    ftyp = box(b"ftyp", b"jp2 \x00\x00\x00\x00jp2 ")
    ihdr = box(b"ihdr", struct.pack(">IIHBBBB", h, w, ncomp, 7, 7, 0, 0))
    enum_cs = colorspace if colorspace is not None else (
        17 if ncomp == 1 else 16)
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", enum_cs))
    extra = b""
    if cdef is not None:
        # channel-definition box (I.5.3.6): (Cn, Typ, Asoc) triples
        extra = box(b"cdef", struct.pack(">H", len(cdef)) + b"".join(
            struct.pack(">HHH", cn, t, a) for cn, t, a in cdef))
    jp2h = box(b"jp2h", ihdr + colr + extra)
    return sig + ftyp + jp2h + box(b"jp2c", stream)


# -- 9/7 irreversible DWT (Annex F, Table F.4) ----------------------------------

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _sd97_1d(x: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """1D 9/7 analysis over [i0, i1), interleaved output; scaling
    convention: low-pass x (1/K), high-pass x K (inverted exactly by
    _sr97_1d — the lossy path is pinned by PSNR, not bit equality)."""
    n = i1 - i0
    if n == 0:
        return x
    if n == 1:
        return x.astype(np.float64)
    idx = np.arange(i0 - 4, i1 + 4)
    y = _ext_interleaved(np.asarray(x, np.float64), i0, i1, idx)
    even = np.where(idx % 2 == 0)[0]
    odd = np.where(idx % 2 == 1)[0]

    def upd(sel, lo, hi, coef):
        s = sel[(idx[sel] >= lo) & (idx[sel] <= hi)]
        y[s] += coef * (y[s - 1] + y[s + 1])

    upd(odd, i0 - 3, i1 + 2, _A97)
    upd(even, i0 - 2, i1 + 1, _B97)
    upd(odd, i0 - 1, i1, _G97)
    upd(even, i0, i1 - 1, _D97)
    out = y[4 : 4 + n].copy()
    loc = np.arange(i0, i1)
    out[loc % 2 == 0] *= 1.0 / _K97
    out[loc % 2 == 1] *= _K97
    return out


def _sr97_1d(y: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """Exact float inverse of _sd97_1d."""
    n = i1 - i0
    if n == 0:
        return y
    if n == 1:
        return y.astype(np.float64)
    loc = np.arange(i0, i1)
    yy = np.asarray(y, np.float64).copy()
    yy[loc % 2 == 0] *= _K97
    yy[loc % 2 == 1] *= 1.0 / _K97
    idx = np.arange(i0 - 4, i1 + 4)
    buf = _ext_interleaved(yy, i0, i1, idx)
    even = np.where(idx % 2 == 0)[0]
    odd = np.where(idx % 2 == 1)[0]

    def upd(sel, lo, hi, coef):
        s = sel[(idx[sel] >= lo) & (idx[sel] <= hi)]
        buf[s] -= coef * (buf[s - 1] + buf[s + 1])

    # windows widen in reverse dependency order (mirror of analysis)
    upd(even, i0 - 3, i1 + 2, _D97)
    upd(odd, i0 - 2, i1 + 1, _G97)
    upd(even, i0 - 1, i1, _B97)
    upd(odd, i0, i1 - 1, _A97)
    return buf[4 : 4 + n]


def sr97_2d(ll, hl, lh, hh, u0, v0, u1, v1):
    a = _interleave_f(ll, hl, lh, hh, u0, v0, u1, v1)
    for r in range(a.shape[0]):
        a[r, :] = _sr97_1d(a[r, :], u0, u1)
    for c in range(a.shape[1]):
        a[:, c] = _sr97_1d(a[:, c], v0, v1)
    return a


def sd97_2d(a, u0, v0, u1, v1):
    a = np.asarray(a, np.float64).copy()
    for c in range(a.shape[1]):
        a[:, c] = _sd97_1d(a[:, c], v0, v1)
    for r in range(a.shape[0]):
        a[r, :] = _sd97_1d(a[r, :], u0, u1)
    return _deinterleave(a, u0, v0, u1, v1)


def _interleave_f(ll, hl, lh, hh, u0, v0, u1, v1):
    a = np.zeros((v1 - v0, u1 - u0), np.float64)
    ue = np.arange(_ceil2(u0), u1, 2)
    uo = np.arange(u0 | 1, u1, 2)
    ve = np.arange(_ceil2(v0), v1, 2)
    vo = np.arange(v0 | 1, v1, 2)
    a[np.ix_(ve - v0, ue - u0)] = ll
    a[np.ix_(ve - v0, uo - u0)] = hl
    a[np.ix_(vo - v0, ue - u0)] = lh
    a[np.ix_(vo - v0, uo - u0)] = hh
    return a


def idwt_97(ll, bands, x0, y0, x1, y1):
    nl = len(bands)
    a = np.asarray(ll, np.float64)
    for r in range(1, nl + 1):
        d = nl - r
        u0, v0 = -(-x0 >> d), -(-y0 >> d)
        u1, v1 = -(-x1 >> d), -(-y1 >> d)
        hl, lh, hh = bands[r - 1]
        a = sr97_2d(a, hl, lh, hh, u0, v0, u1, v1)
    return a


def dwt_97(a, nl, x0, y0, x1, y1):
    out = []
    cur = np.asarray(a, np.float64)
    for r in range(nl):
        d = r
        u0, v0 = -(-x0 >> d), -(-y0 >> d)
        u1, v1 = -(-x1 >> d), -(-y1 >> d)
        ll, hl, lh, hh = sd97_2d(cur, u0, v0, u1, v1)
        out.append((hl, lh, hh))
        cur = ll
    return cur, out[::-1]


# -- quantization (Annex E) ------------------------------------------------------

_BAND_GAIN = {0: 0, 1: 1, 2: 1, 3: 2}


def _qcd_parse(qcd: bytes, nl: int, depth: int):
    """Returns (style, guard, per-subband list of (Mb, delta)) indexed
    LL then (HL, LH, HH) per resolution. Reversible: delta=None."""
    sqcd = qcd[0]
    style = sqcd & 0x1F
    guard = sqcd >> 5
    n_sb = 3 * nl + 1

    def gain_of(i):
        return 0 if i == 0 else _BAND_GAIN[1 + (i - 1) % 3]

    def nb_of(i):
        return nl if i == 0 else nl - (i - 1) // 3

    if style == 0:  # no quantization (reversible)
        exps = [b >> 3 for b in qcd[1:]]
        if len(exps) < n_sb:
            raise ValueError("JPEG2000 QCD too short")
        return 0, guard, [(guard + exps[i] - 1, None) for i in range(n_sb)]
    if style == 2:  # scalar expounded
        if len(qcd) < 1 + 2 * n_sb:
            raise ValueError("JPEG2000 QCD too short")
        out = []
        for i in range(n_sb):
            v = struct.unpack(">H", qcd[1 + 2 * i : 3 + 2 * i])[0]
            eps, mu = v >> 11, v & 0x7FF
            rb = depth + gain_of(i)
            delta = (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)
            out.append((guard + eps - 1, delta))
        return 2, guard, out
    if style == 1:  # scalar derived: one entry, others scaled by level
        v = struct.unpack(">H", qcd[1:3])[0]
        e0, mu = v >> 11, v & 0x7FF
        out = []
        for i in range(n_sb):
            eps = e0 - nl + nb_of(i)
            rb = depth + gain_of(i)
            delta = (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)
            out.append((guard + eps - 1, delta))
        return 1, guard, out
    raise ValueError("JPEG2000 reserved quantization style")


# -- selective arithmetic bypass (style 0x01, "lazy" raw coding) ----------------


class _RawDec:
    """Raw (bypassed) bit reader: MSB-first with the 0xFF stuffing rule
    (a byte after 0xFF carries 7 bits)."""

    __slots__ = ("data", "pos", "acc", "n", "prev_ff")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.prev_ff = False

    def read(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG2000 raw segment exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                if b & 0x80:
                    raise ValueError("JPEG2000 raw stuffing violation")
                self.acc, self.n = b, 7
            else:
                self.acc, self.n = b, 8
            self.prev_ff = (b == 0xFF) if not self.prev_ff else False
        self.n -= 1
        return (self.acc >> self.n) & 1


class _RawEnc:
    """Raw bit writer mirroring _RawDec."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bit: int) -> None:
        self.acc = (self.acc << 1) | (bit & 1)
        self.n += 1
        limit = 7 if (self.out and self.out[-1] == 0xFF) else 8
        if self.n == limit:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0

    def flush(self) -> bytes:
        if self.n:
            limit = 7 if (self.out and self.out[-1] == 0xFF) else 8
            self.out.append(self.acc << (limit - self.n))
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def t1_encode_bypass(values: np.ndarray, band: int, **styles):
    """Lossless bypass encode without termall: returns (segments,
    start_plane, npasses) with the [10 MQ][2 raw][1 MQ]... pattern; MQ
    contexts persist across MQ segments."""
    values = np.asarray(values, np.int64)
    vmax = int(np.abs(values).max(initial=0))
    if vmax == 0:
        return [], -1, 0
    sp = vmax.bit_length() - 1
    n = 1 + 3 * sp
    t = _T1(values.shape[1], values.shape[0], band, None, values=values,
            bypass=True, **styles)
    bounds = _bypass_boundaries(n)
    segs = []
    si = 0
    prev = 0
    for i, (p, plane) in enumerate(t._pass_seq(sp, n)):
        if i == prev:
            if t._is_raw(p, plane, sp):
                t.raw = _RawEnc()
            else:
                t.raw = None
                t.coder = MQEncoder()
            prev = bounds[si]
            si += 1
        t._exec(p, plane)
        if i + 1 == prev:
            segs.append((t.raw or t.coder).flush())
    return segs, sp, n


def t1_decode_bypass(segs: list, w: int, h: int, band: int,
                     start_plane: int, npasses: int, **styles):
    t = _T1(w, h, band, None, bypass=True, **styles)
    t.run_bypass(segs, start_plane, npasses)
    return t.result()


def _bypass_portions(p0: int, n: int) -> list:
    """Split passes [p0, p0+n) at the absolute bypass segment
    boundaries (10, 12, 13, 15, 16, ...): returns [(segment_index,
    passes_in_this_packet)]. Each portion gets ONE signalled length of
    lblock + floor(log2(portion_passes)) bits (B.10.7.5 as real
    encoders implement it), so a segment spanning a quality-layer
    boundary contributes one byte chunk per packet, concatenated by
    the decoder before the T1 run."""
    out = []
    prev = 0
    idx = 0
    b = 10
    raw_next = True
    while prev < p0 + n:
        lo, hi = max(prev, p0), min(b, p0 + n)
        if hi > lo:
            out.append((idx, hi - lo))
        prev = b
        idx += 1
        b += 2 if raw_next else 1
        raw_next = not raw_next
    return out


def _bypass_boundaries(npasses: int) -> list:
    """Cumulative pass counts ending each codeword segment under bypass
    without termall: [10 MQ][2 raw (SPP+MRP)][1 MQ (CUP)][2 raw]...,
    truncated at npasses."""
    out = []
    b = 10
    while b < npasses:
        out.append(b)
        b += 2
        if b < npasses:
            out.append(b)
        b += 1
    out.append(npasses)
    return [x for x in out if x <= npasses]
