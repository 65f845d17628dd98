"""Telephony/audio sample codecs for the WAV container: G.711 A-law and
mu-law companding, IMA/DVI ADPCM, IEEE-float and 24/32-bit PCM conversion.

Everything here is public-spec math: G.711 follows ITU-T G.711 via the
widely-published public-domain Sun Microsystems reference (g711.c — the
segment-table compand/expand pair whose defining invariant is
``encode(decode(code)) == code``, exhaustively tested over all 256 codes
with the one spec-inherent exception: mu-law 0x7F ("negative zero")
decodes to 0, which canonically re-encodes positive as 0xFF);
IMA ADPCM follows the IMA Digital Audio Focus Group's published algorithm
(the 89-entry step table + 16-entry index-adjust table) in the Microsoft
WAV block layout (per-channel 4-byte block headers, 4-byte nibble chunks
interleaved per channel). Encoders are included so tests can round-trip
fixtures without external tools, mirroring the repo's PNG/JPEG/TIFF codec
strategy.

Reference parity note: the reference engine (engine.py:46) is image-only;
this module serves the beyond-reference multimodal surface
(functions/multimodal.py decode_wav/decode_audio).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# G.711 mu-law (PCMU) — Sun reference: BIAS 0x84, 14-bit domain
# --------------------------------------------------------------------------

_BIAS = 0x84
_ULAW_CLIP = 8159  # 14-bit domain clip, per the reference encoder

#: upper edge of each mu-law segment in the biased 14-bit domain
_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
#: upper edge of each A-law segment in the 13-bit domain
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 linear samples (vectorized expand)."""
    u = (~np.asarray(codes, np.uint8)).astype(np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + _BIAS) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, _BIAS - t, t - _BIAS).astype(np.int16)


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples -> mu-law bytes (vectorized compand)."""
    pcm = np.asarray(samples, np.int16).astype(np.int32) >> 2  # 16 -> 14 bit
    mask = np.where(pcm < 0, 0x7F, 0xFF)
    mag = np.minimum(np.abs(pcm), _ULAW_CLIP) + (_BIAS >> 2)
    seg = np.searchsorted(_SEG_UEND, mag)  # first edge >= mag
    shifted = mag >> np.minimum(seg + 1, 14)
    uval = (seg << 4) | (shifted & 0x0F)
    out = np.where(seg >= 8, 0x7F ^ mask, uval ^ mask)
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# G.711 A-law (PCMA) — Sun reference: XOR 0x55, 13-bit domain
# --------------------------------------------------------------------------


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear samples (vectorized expand)."""
    a = np.asarray(codes, np.uint8).astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples -> A-law bytes (vectorized compand)."""
    pcm = np.asarray(samples, np.int16).astype(np.int32) >> 3  # 16 -> 13 bit
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    mag = np.where(pcm >= 0, pcm, -pcm - 1)
    seg = np.searchsorted(_SEG_AEND, mag)
    shift = np.where(seg < 1, 1, np.minimum(seg, 14))
    aval = (seg << 4) | ((mag >> shift) & 0x0F)
    out = np.where(seg >= 8, 0x7F ^ mask, aval ^ mask)
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# IMA / DVI ADPCM (WAV format tag 0x11)
# --------------------------------------------------------------------------

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    np.int32,
)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, np.int32)


def _ima_step(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM reconstruction step; returns (predictor, index)."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nibble])))
    return predictor, index


def ima_adpcm_decode(
    data: bytes, n_channels: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM WAV payload -> int16 samples, shape (n_frames, n_channels).

    Block layout per the Microsoft WAV spec: each block starts with one
    4-byte header per channel (int16 predictor = first output sample,
    uint8 step index, reserved byte), then 4-byte chunks of 8 nibbles,
    channel-interleaved chunk by chunk; nibbles are low-first within a
    byte. The final block may be short.
    """
    if n_channels < 1 or block_align < 4 * n_channels:
        raise ValueError("bad IMA ADPCM geometry")
    chans: list[list[int]] = [[] for _ in range(n_channels)]
    for base in range(0, len(data), block_align):
        block = data[base : base + block_align]
        if len(block) < 4 * n_channels:
            break  # trailing garbage shorter than one header set
        pred = [0] * n_channels
        idx = [0] * n_channels
        for c in range(n_channels):
            pred[c] = int.from_bytes(
                block[4 * c : 4 * c + 2], "little", signed=True
            )
            idx[c] = block[4 * c + 2]
            if idx[c] > 88:
                raise ValueError("IMA ADPCM step index out of range")
            chans[c].append(pred[c])
        body = block[4 * n_channels :]
        # channel-interleaved 4-byte chunks
        n_groups = len(body) // (4 * n_channels)
        for g in range(n_groups):
            for c in range(n_channels):
                off = (g * n_channels + c) * 4
                for b in body[off : off + 4]:
                    for nib in (b & 0x0F, b >> 4):
                        pred[c], idx[c] = _ima_step(nib, pred[c], idx[c])
                        chans[c].append(pred[c])
    n = min(len(ch) for ch in chans)
    return np.array([ch[:n] for ch in chans], np.int16).T


def ima_adpcm_encode(
    samples: np.ndarray, samples_per_block: int = 505
) -> tuple[bytes, int, int]:
    """int16 (n_frames,) or (n_frames, n_channels) -> (payload, block_align,
    samples_per_block). Fixture-side encoder (spec quantizer: top-down
    bit-by-bit step subtraction, state carried exactly like the decoder).
    """
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n_frames, n_ch = s.shape
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    block_align = 4 * n_ch + (samples_per_block - 1) // 2 * n_ch
    out = bytearray()
    idx = [0] * n_ch
    for base in range(0, n_frames, samples_per_block):
        blk = s[base : base + samples_per_block]
        pred = [int(blk[0, c]) for c in range(n_ch)]
        for c in range(n_ch):
            out += int(pred[c]).to_bytes(2, "little", signed=True)
            out.append(idx[c])
            out.append(0)
        nibbles: list[list[int]] = [[] for _ in range(n_ch)]
        for c in range(n_ch):
            for v in blk[1:, c]:
                step = int(_IMA_STEPS[idx[c]])
                delta = int(v) - pred[c]
                nib = 8 if delta < 0 else 0
                delta = abs(delta)
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                pred[c], idx[c] = _ima_step(nib, pred[c], idx[c])
                nibbles[c].append(nib)
            # pad the channel to a whole number of 8-nibble chunks
            while len(nibbles[c]) % 8:
                step = int(_IMA_STEPS[idx[c]])
                pred[c], idx[c] = _ima_step(0, pred[c], idx[c])
                nibbles[c].append(0)
        n_groups = len(nibbles[0]) // 8
        for g in range(n_groups):
            for c in range(n_ch):
                for k in range(0, 8, 2):
                    lo = nibbles[c][g * 8 + k]
                    hi = nibbles[c][g * 8 + k + 1]
                    out.append(lo | (hi << 4))
    return bytes(out), block_align, samples_per_block


# --------------------------------------------------------------------------
# Linear PCM width / float conversion helpers (shared by decode_wav)
# --------------------------------------------------------------------------


def pcm24_to_int16(raw: bytes) -> np.ndarray:
    """Packed little-endian signed 24-bit PCM -> int16 (top 16 bits)."""
    n = len(raw) // 3
    b = np.frombuffer(raw[: n * 3], np.uint8).reshape(n, 3).astype(np.int32)
    v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
    v = np.where(v & 0x800000, v - 0x1000000, v)
    return (v >> 8).astype(np.int16)


def float_to_int16(raw: bytes, bits: int, big_endian: bool = False) -> np.ndarray:
    """IEEE-float PCM (32 or 64 bit) in [-1, 1] -> int16 with clipping."""
    dt = (">f4" if bits == 32 else ">f8") if big_endian else (
        "<f4" if bits == 32 else "<f8")
    w = bits // 8
    f = np.frombuffer(raw[: len(raw) // w * w], dt).astype(np.float64)
    # corrupt streams can carry NaN/inf: NaN -> 0 and inf -> full-scale
    # DETERMINISTICALLY (astype on NaN is platform-defined otherwise)
    f = np.nan_to_num(f, nan=0.0, posinf=1.0, neginf=-1.0)
    return np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)


def pcm_be_to_int16(raw: bytes, container_bytes: int) -> np.ndarray:
    """Big-endian signed PCM in 1/2/3/4-byte containers -> int16.

    Samples are left-justified in their container (the AIFF-1.3 rule for
    bit depths that don't fill it), so reducing to int16 is a pure
    top-bits take — exact for any declared depth."""
    w = container_bytes
    n = len(raw) // w
    if w == 1:
        return np.frombuffer(raw[:n], np.int8).astype(np.int16) << 8
    if w == 2:
        return np.frombuffer(raw[: n * 2], ">i2").astype(np.int16)
    if w == 3:
        b = np.frombuffer(raw[: n * 3], np.uint8).reshape(n, 3).astype(np.int32)
        v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        v = np.where(v & 0x800000, v - 0x1000000, v)
        return (v >> 8).astype(np.int16)
    if w == 4:
        return (np.frombuffer(raw[: n * 4], ">i4") >> 16).astype(np.int16)
    raise ValueError(f"unsupported PCM container width {w}")
