"""Hand-packed T.800 codestream fixtures (VERDICT r3 / ADVICE r3 #5).

Every other JPEG 2000 test round-trips through this repo's own
``encode_jpeg2000`` — a shared encoder/decoder convention error would pass
them all. These streams are assembled BYTE BY BYTE in this file straight
from the published spec (ITU-T T.800 Annex A marker layouts, B.10 packet
headers and tag trees, D coefficient-bit modelling), with the expected
pixels derived analytically — ``encode_jpeg2000`` is never imported. The
only reused primitive is the MQ arithmetic coder, which is itself pinned
independently of everything here by the ITU-T T.88 Annex H.2 conformance
vectors (tests/test_jbig2.py) — so these fixtures pin exactly the layers
ABOVE the MQ coder: codestream syntax, packet-header grammar, tag-tree
emission, coding-pass sequencing, context assignment (Tables D-1..D-4),
run-length/UNIFORM conventions, Mb = G + eps - 1 (eq. E-2), the 5/3
lifting rounding (eq. F-5/F-6), subband geometry (eq. B-15), and the DC
level shift.

What each case pins:
  1x1 v=129  — SIZ/COD/QCD/SOT layout, non-empty-packet bit, single-node
               inclusion + zero-bitplane tag trees, npasses codeword "0",
               Lblock length signalling, cleanup ZC context 0 (init state
               4, D.2), neutral sign context 9 XOR 0, exact reversible
               reconstruction, DC shift.
  1x1 v=127  — the sign bit itself (negative = coded 1 under XOR 0).
  1x1 v=200  — 19-pass SPP/MRP/CUP rotation, npasses codeword
               "1111"+5 bits, first-refinement MR context 14 vs
               subsequent 16, multi-bitplane magnitude assembly.
  1x4 column — run-length mode (RL context 17, init state 3), UNIFORM
               (context 18, init 46) 2-bit MSB-first row index, the
               post-RL normal-mode continuation, SPP membership (only
               nonzero-context pixels), ZC context 3 (sumV=1, Table D-1),
               and CUP skipping pass-member pixels.
  1x2 nl=1   — 5/3 inverse lifting with symmetric extension, LL/LH band
               placement, zero-area HL/HH bands skipped in the packet
               walk, per-resolution packet order, per-band QCD exponents.
  8x8 nl=2   — empty-packet bit = 0 for all three resolutions, all-zero
               coefficient inverse DWT, guard-bit handling.
"""

import struct

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark.jbig2 import MQEncoder
from ai_invoice_ocr_engine_spark.jpeg2000 import decode_jpeg2000

# T.800 D.2 (Table D-7): initial context states — every context starts at
# state 0 except ZC context 0 (state 4), run-length (state 3) and UNIFORM
# (state 46). Context numbering used here: 0-8 zero coding, 9-13 sign
# coding, 14-16 magnitude refinement, 17 run-length, 18 UNIFORM.
_INIT = {0: 4, 17: 3, 18: 46}


def _mq_payload(decisions):
    """Encode a hand-derived (context, bit) sequence with the H.2-pinned
    MQ encoder; per-code-block fresh context states per T.800 D.2."""
    enc = MQEncoder()
    states = {}
    for ctx, bit in decisions:
        cx = states.setdefault(ctx, [_INIT.get(ctx, 0), 0])
        enc.encode(cx, bit)
    return enc.flush()


class _HdrBits:
    """Packet-header bit packer: MSB-first, zero-padded to a byte
    (B.10.1). The spec's FF-stuffing rule never triggers for these tiny
    headers — asserted, not implemented."""

    def __init__(self):
        self.bits = []

    def put(self, bitstring):
        self.bits.extend(int(b) for b in bitstring)
        return self

    def done(self):
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(int("".join(map(str, bits[i : i + 8])), 2))
        assert all(b != 0xFF for b in out), "stuffing case not handled"
        return bytes(out)


def _npasses_cw(n):
    """Table B-4 codeword for the number of coding passes."""
    if n == 1:
        return "0"
    if n == 2:
        return "10"
    if n in (3, 4, 5):
        return "11" + format(n - 3, "02b")
    assert 6 <= n <= 36
    return "1111" + format(n - 6, "05b")


def _cb_contribution(npasses, nbytes):
    """Header bits for one first-inclusion code block contributing all its
    passes to the (single) layer: inclusion tag tree "1" (value 0 reached
    at threshold 1, B.10.4), zero-bitplanes tag tree "1" (value 0,
    B.10.5), the pass codeword, Lblock commas, and the chunk length in
    Lblock + floor(log2(npasses)) bits (B.10.7.1)."""
    bits = "1" + "1" + _npasses_cw(npasses)
    lblock, extra = 3, npasses.bit_length() - 1
    commas = 0
    while nbytes >= 1 << (lblock + commas + extra):
        commas += 1
    bits += "1" * commas + "0"
    return bits + format(nbytes, f"0{lblock + commas + extra}b")


def _siz(w, h, depth=8):
    body = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, 1
    ) + bytes([depth - 1, 1, 1])
    return b"\xff\x51" + struct.pack(">H", len(body) + 2) + body


def _cod(nl):
    # Scod=0, SGcod: LRCP, 1 layer, no MCT; SPcod: nl, 64x64 code blocks
    # (stored exponent-2 = 4), style 0, 5/3 reversible transform
    body = bytes([0, 0, 0, 1, 0, nl, 4, 4, 0, 1])
    return b"\xff\x52" + struct.pack(">H", len(body) + 2) + body


def _qcd(guard, exps):
    # Sqcd style 0 = no quantization (reversible), SPqcd = exponent<<3
    body = bytes([guard << 5]) + bytes(e << 3 for e in exps)
    return b"\xff\x5c" + struct.pack(">H", len(body) + 2) + body


def _stream(w, h, nl, guard, exps, packets, depth=8):
    tile = struct.pack(">HHIBB", 10, 0, 12 + 2 + len(packets), 0, 1)
    return (
        b"\xff\x4f" + _siz(w, h, depth) + _cod(nl) + _qcd(guard, exps)
        + b"\xff\x90" + tile + b"\xff\x93" + packets + b"\xff\xd9"
    )


def _single_block_packet(decisions, npasses):
    mq = _mq_payload(decisions)
    hdr = _HdrBits().put("1").put(_cb_contribution(npasses, len(mq))).done()
    return hdr + mq


def test_handpacked_1x1_positive_single_bitplane():
    # v=129, DC shift -> +1: one magnitude bit. Mb = G + eps - 1 = 1
    # (G=1, eps=1). Cleanup at the only plane: ZC context 0 (no
    # significant neighbors, Table D-1) decodes 1, then the sign through
    # context 9 with XOR 0 (H=V=0, Tables D-3/D-4): positive = 0.
    pkt = _single_block_packet([(0, 1), (9, 0)], npasses=1)
    img = decode_jpeg2000(_stream(1, 1, 0, 1, [1], pkt))
    assert img.shape == (1, 1) and img.dtype == np.uint8
    assert img[0, 0] == 129


def test_handpacked_1x1_negative_sign_bit():
    # v=127 -> coefficient -1: identical to the positive case except the
    # sign decision is 1 (negative XOR predicted-positive 0).
    pkt = _single_block_packet([(0, 1), (9, 1)], npasses=1)
    assert decode_jpeg2000(_stream(1, 1, 0, 1, [1], pkt))[0, 0] == 127


def test_handpacked_1x1_multibitplane_refinement():
    # v=200 -> +72 = 1001000b, 7 bitplanes (Mb=7: G=2, eps=6), 19 passes.
    # Plane 6 cleanup: significant (ZC0=1), positive (SC9=0). Planes 5..0
    # magnitude refinement: FIRST refinement with no significant
    # neighbors uses context 14, every later one context 16 (D.3.3);
    # the SPP/CUP passes of those planes code nothing. Bits 5..0 of 72
    # are 0,0,1,0,0,0.
    decisions = [(0, 1), (9, 0), (14, 0), (16, 0), (16, 1), (16, 0),
                 (16, 0), (16, 0)]
    pkt = _single_block_packet(decisions, npasses=19)
    assert decode_jpeg2000(_stream(1, 1, 0, 2, [6], pkt))[0, 0] == 200


def test_handpacked_1x4_runlength_and_spp():
    # Column of 4 pixels [128,128,130,128] -> coefficients [0,0,+2,0],
    # Mb=2 (G=1, eps=2), 4 passes. Plane-1 cleanup: the full 4-row
    # insignificant zero-context column enters RUN-LENGTH mode (D.4.1):
    # RL context 17 decodes 1 (a pixel becomes significant), the row
    # index 2 arrives as two UNIFORM bits MSB-first ("10"), the sign is
    # neutral-context positive, and the REMAINING pixel 3 is coded in
    # normal mode with ZC context 3 (sumV=1 from the fresh neighbor,
    # Table D-1). Plane-0 SPP codes exactly the insignificant pixels
    # with nonzero context — pixels 1 and 3 (ZC ctx 3), NOT pixel 0.
    # Plane-0 MRP refines pixel 2 (first refinement, ctx 14, bit 0).
    # Plane-0 cleanup codes only pixel 0 (ZC ctx 0) — RL needs all four
    # rows insignificant, so no RL here.
    decisions = [
        (17, 1), (18, 1), (18, 0), (9, 0), (3, 0),   # cleanup plane 1
        (3, 0), (3, 0),                               # SPP plane 0
        (14, 0),                                      # MRP plane 0
        (0, 0),                                       # cleanup plane 0
    ]
    pkt = _single_block_packet(decisions, npasses=4)
    img = decode_jpeg2000(_stream(1, 4, 0, 1, [2], pkt))
    assert img.shape == (4, 1)
    assert img[:, 0].tolist() == [128, 128, 130, 128]


def test_handpacked_1x2_53_lifting_and_band_walk():
    # Two-pixel column [100, 120] under one 5/3 level. DC shift first:
    # x = [-28, -8]. Forward lifting with symmetric extension (F.4):
    #   d0 = x1 - floor((x0 + x0)/2)      = 20   -> LH band (1x1)
    #   s0 = x0 + floor((d0 + d0 + 2)/4)  = -18  -> LL band (1x1)
    # HL and HH have zero width at this geometry (eq. B-15: x1 - x0 =
    # ceil((1-1)/2) - ceil((0-1)/2) = 0), so the resolution-1 packet
    # walks ONLY the LH band. Mb=5 for every band (G=2, eps=4); each
    # code block is its own MQ codeword with fresh contexts.
    # |-18| = 10010b -> MRP bits 0,0,1,0 after plane-4 significance;
    # |+20| = 10100b -> MRP bits 0,1,0,0. Signs: -18 -> 1, +20 -> 0.
    ll = [(0, 1), (9, 1), (14, 0), (16, 0), (16, 1), (16, 0)]
    lh = [(0, 1), (9, 0), (14, 0), (16, 1), (16, 0), (16, 0)]
    packets = _single_block_packet(ll, npasses=13) + _single_block_packet(
        lh, npasses=13
    )
    img = decode_jpeg2000(_stream(1, 2, 1, 2, [4, 4, 4, 4], packets))
    assert img.shape == (2, 1)
    assert img[:, 0].tolist() == [100, 120]


def test_handpacked_4x1_hl_swap_and_neighbor_contexts():
    # Row [136,140,134,138] under one horizontal 5/3 level. DC shift:
    # x=[8,12,6,10]; forward lifting (F.4, mirror x4=x2):
    #   d0 = 12 - floor((8+6)/2) = 5,  d1 = 10 - floor((6+6)/2) = 4  -> HL
    #   s0 = 8 + floor((5+5+2)/4) = 11, s1 = 6 + floor((5+4+2)/4) = 8 -> LL
    # LH/HH have zero height, so resolution 1 walks only HL (2x1).
    # LL block [11,8] (Mb=4: G=2, eps=3): after (0,0) turns significant
    # IN THE SAME cleanup pass, (0,1) sees sumH=1 -> LL-table ZC context
    # 5, and its sign rides (H,V)=(+1,0) -> context 12 XOR 0. First
    # refinements with a significant neighbor use MR context 15 (not
    # 14), later ones 16. HL block [5,4] (Mb=3: G=2, eps=2): the HL
    # table SWAPS H and V (Table D-1), so (0,1)'s horizontal neighbor
    # lands it in context 3, not 5 — while its SIGN context does not
    # swap (still 12).
    ll = [(0, 1), (9, 0), (5, 1), (12, 0), (15, 0), (15, 0),
          (16, 1), (16, 0), (16, 1), (16, 0)]
    hl = [(0, 1), (9, 0), (3, 1), (12, 0), (15, 0), (15, 0),
          (16, 1), (16, 0)]
    packets = _single_block_packet(ll, npasses=10) + _single_block_packet(
        hl, npasses=7
    )
    img = decode_jpeg2000(_stream(4, 1, 1, 2, [3, 2, 2, 2], packets))
    assert img.shape == (1, 4)
    assert img[0].tolist() == [136, 140, 134, 138]


def test_handpacked_4x1_negative_neighbor_sign_prediction():
    # Row [136,128,134,138] -> x=[8,0,6,10]: d0 = 0-7 = -7, d1 = 4,
    # s0 = 8 + floor((-12)/4) = 5, s1 = 6 + floor((-1)/4) = 5 (floor
    # toward -inf on negatives — a classic convention trap). In the HL
    # block the NEGATIVE first coefficient flips the sign prediction of
    # its neighbor: (0,1) codes its sign through context 12 with XOR 1,
    # so the positive sign arrives as a CODED 1.
    ll = [(0, 1), (9, 0), (5, 1), (12, 0), (15, 0), (15, 0),
          (16, 1), (16, 1)]
    hl = [(0, 1), (9, 1), (3, 1), (12, 1), (15, 1), (15, 0),
          (16, 1), (16, 0)]
    packets = _single_block_packet(ll, npasses=7) + _single_block_packet(
        hl, npasses=7
    )
    img = decode_jpeg2000(_stream(4, 1, 1, 2, [2, 2, 2, 2], packets))
    assert img[0].tolist() == [136, 128, 134, 138]


def test_handpacked_8x8_empty_packets_all_gray():
    # All-128 image, two 5/3 levels: every coefficient is zero, and the
    # encoder says so with three EMPTY packets (first header bit 0,
    # B.10.2) — one per resolution in LRCP order. The decoder must
    # reconstruct pure 128s through the full two-level inverse DWT.
    packets = b"\x00" * 3
    img = decode_jpeg2000(_stream(8, 8, 2, 2, [8] * 7, packets))
    assert img.shape == (8, 8)
    assert (img == 128).all()
