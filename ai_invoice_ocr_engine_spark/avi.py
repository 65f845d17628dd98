"""AVI / RIFF video-container demux (+ fixture muxer) in pure stdlib.

Beyond-reference video-container surface, same policy as mp4.py: the
container layer (RIFF chunk walk, hdrl/strl stream headers, movi frame
chunks incl. LIST 'rec ' grouping and odd-size padding, idx1 ignored in
favor of the authoritative movi scan) is implemented for real, and two
frame codings decode END-TO-END with no external libraries:

- ``MJPG`` — Motion JPEG: every '##dc' chunk is a baseline JPEG, decoded
  by the repo's own T.81 decoder; frames that omit DHT (the dominant
  convention — OpenDML spec, ffmpeg default) get the Annex K tables
  injected via jpeg.ensure_jpeg_tables.
- ``BI_RGB`` DIB (biCompression 0) — uncompressed bottom-up device-
  independent bitmaps at 8-bit palette / 24-bit BGR / 32-bit BGRX,
  rows padded to 4 bytes, flattened to grayscale with the shared
  cv2-exact luma and re-packed as SYNF so downstream frame consumers
  stay format-agnostic.

Inter-frame codecs (cvid, DX50, XVID, h264 fourccs ...) raise
NotImplementedError naming the fourcc — loud ffmpeg seam. An AVI PCM
audio stream ('auds' + WAVEFORMATEX) is extracted by synthesizing a RIFF
WAVE from the stream's own strf + concatenated '##wb' chunks and
reusing the fully-pinned WAV decoder (multimodal.decode_wav), so audio
features run over video soundtracks too.

Spec: the public Microsoft AVI RIFF File Reference / OpenDML AVI File
Format Extensions (the container is 'RIFF'//'AVI ' with LIST hdrl
[avih + LIST strl(strh,strf)...] and LIST movi ['##dc'/'##db'/'##wb']).
"""

from __future__ import annotations

import struct

import numpy as np


class AviStream:
    def __init__(self, fcc_type: bytes, handler: bytes, scale: int,
                 rate: int, length: int, strf: bytes):
        self.fcc_type = fcc_type
        self.handler = handler
        self.scale = scale
        self.rate = rate
        self.length = length
        self.strf = strf
        self.chunks: list[tuple[int, int]] = []  # (offset, size) into data


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) honoring word alignment."""
    pos = start
    while pos + 8 <= end:
        fcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("AVI chunk exceeds its parent")
        yield fcc, body, body + size
        pos = body + size + (size & 1)  # odd sizes carry a pad byte


def parse_avi(data: bytes) -> dict:
    """Parse container + stream headers + movi frame map.

    Returns {"width", "height", "n_frames", "usec_per_frame",
    "streams": [AviStream...]} with every stream's movi chunks located.
    Malformed containers raise ValueError (skip-policy contract)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    width = height = n_frames = usec = 0
    streams: list[AviStream] = []
    movi_spans: list[tuple[int, int]] = []
    for fcc, b0, b1 in _riff_chunks(data, 12, end):
        if fcc != b"LIST":
            continue
        ltype = data[b0 : b0 + 4]
        if ltype == b"hdrl":
            for sfcc, s0, s1 in _riff_chunks(data, b0 + 4, b1):
                if sfcc == b"avih":
                    if s1 - s0 < 40:
                        raise ValueError("AVI avih header truncated")
                    usec, _mbps, _pad, _flags, n_frames = struct.unpack_from(
                        "<IIIII", data, s0)
                    width, height = struct.unpack_from("<II", data, s0 + 32)
                elif sfcc == b"LIST" and data[s0 : s0 + 4] == b"strl":
                    strh = strf = None
                    for cfcc, c0, c1 in _riff_chunks(data, s0 + 4, s1):
                        if cfcc == b"strh":
                            strh = data[c0:c1]
                        elif cfcc == b"strf":
                            strf = data[c0:c1]
                    if strh is None or len(strh) < 40 or strf is None:
                        raise ValueError("AVI stream missing strh/strf")
                    scale, rate, _start, length = struct.unpack_from(
                        "<IIII", strh, 20)
                    streams.append(AviStream(
                        strh[0:4], strh[4:8], scale, rate, length, strf))
        elif ltype == b"movi":
            movi_spans.append((b0 + 4, b1))
    if not streams:
        raise ValueError("AVI has no streams")

    def walk_movi(lo: int, hi: int):
        for cfcc, c0, c1 in _riff_chunks(data, lo, hi):
            if cfcc == b"LIST":  # 'rec ' grouping
                walk_movi(c0 + 4, c1)
                continue
            if (cfcc[:2].isdigit() and
                    cfcc[2:] in (b"dc", b"db", b"wb", b"pc")):
                idx = int(cfcc[:2])
                # zero-length '##dc'/'##db'/'##wb' chunks are the standard
                # dropped-frame marker (ffmpeg/VfW) — skip them, or the
                # decoder sees b'' and the skip policy drops the WHOLE video
                if idx < len(streams) and cfcc[2:] != b"pc" and c1 > c0:
                    streams[idx].chunks.append((c0, c1 - c0))

    for lo, hi in movi_spans:
        walk_movi(lo, hi)
    return {"width": width, "height": height, "n_frames": n_frames,
            "usec_per_frame": usec, "streams": streams}


def _dib_to_gray(frame: bytes, strf: bytes) -> np.ndarray:
    """Uncompressed BI_RGB DIB frame → grayscale uint8 (top-down)."""
    if len(strf) < 40:
        raise ValueError("AVI BITMAPINFOHEADER truncated")
    (_sz, w, h, _planes, bits, comp) = struct.unpack_from("<IiiHHI", strf, 0)
    if comp != 0:
        raise ValueError("not a BI_RGB DIB")
    topdown = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("AVI DIB has degenerate dimensions")
    stride = (w * bits // 8 + 3) & ~3
    if len(frame) < stride * h:
        raise ValueError("AVI DIB frame truncated")
    rows = np.frombuffer(frame, np.uint8, stride * h).reshape(h, stride)
    if not topdown:
        rows = rows[::-1]
    if bits == 8:
        (clr_used,) = struct.unpack_from("<I", strf, 32)
        n_pal = clr_used or 256
        if len(strf) < 40 + 4 * n_pal:
            raise ValueError("AVI DIB palette truncated")
        quads = np.frombuffer(strf, np.uint8, 4 * n_pal, 40).reshape(-1, 4)
        # RGBQUAD is B,G,R,reserved
        from .kernels import rgb_to_gray

        pal_gray = rgb_to_gray(quads[:, [2, 1, 0]].reshape(1, -1, 3))[0]
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("AVI DIB pixel index outside the palette")
        return pal_gray[idx]
    if bits in (24, 32):
        nch = bits // 8
        px = rows[:, : w * nch].reshape(h, w, nch)
        from .kernels import rgb_to_gray

        return rgb_to_gray(px[:, :, [2, 1, 0]])  # BGR(X) → RGB
    raise NotImplementedError(f"AVI DIB bit depth {bits} unsupported")


def avi_frame_payloads(data: bytes) -> list[bytes]:
    """First video stream's frames as payloads decodable by
    kernels.decode_image: MJPG chunks become standalone JPEGs (Annex K
    tables injected when absent), BI_RGB DIB chunks flatten to gray and
    re-pack as SYNF; other fourccs raise NotImplementedError naming the
    codec (demux succeeded — the bitstream decoder is the seam)."""
    meta = parse_avi(data)
    vids = [s for s in meta["streams"] if s.fcc_type == b"vids"]
    if not vids:
        raise ValueError("AVI has no video stream")
    stream = vids[0]
    handler = stream.handler.upper()
    comp = struct.unpack_from("<I", stream.strf, 16)[0] if len(stream.strf) >= 20 else 0
    is_mjpg = handler == b"MJPG" or comp == struct.unpack(
        "<I", b"MJPG")[0]
    if is_mjpg:
        from .jpeg import ensure_jpeg_tables

        return [ensure_jpeg_tables(data[o : o + n])
                for o, n in stream.chunks]
    if comp == 0 and handler in (b"DIB ", b"RGB ", b"RAW ", b"\x00\x00\x00\x00", b""):
        from .kernels import encode_synf

        return [encode_synf(_dib_to_gray(data[o : o + n], stream.strf))
                for o, n in stream.chunks]
    name = handler.decode("ascii", "replace").strip() or f"0x{comp:08x}"
    raise NotImplementedError(
        f"AVI codec {name!r} requires an external decoder (ffmpeg seam); "
        f"container demux succeeded with {len(stream.chunks)} frames")


def avi_audio_bytes(data: bytes) -> bytes:
    """First audio stream re-wrapped as a standalone RIFF WAVE (the
    stream's own WAVEFORMATEX strf + concatenated '##wb' chunks), so the
    fully-pinned WAV decoder handles sample decode — soundtrack
    extraction without a second PCM parser."""
    meta = parse_avi(data)
    auds = [s for s in meta["streams"] if s.fcc_type == b"auds"]
    if not auds:
        raise ValueError("AVI has no audio stream")
    s = auds[0]
    body = b"".join(data[o : o + n] for o, n in s.chunks)
    fmt = s.strf
    wav = (b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt + (b"\x00" if len(fmt) & 1 else b"")
           + b"data" + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(wav)) + wav


def avi_metadata(data: bytes) -> dict:
    """Header-level metadata for video_metadata(): dims, frame count,
    codec fourcc, track count, duration from rate/scale."""
    meta = parse_avi(data)
    vids = [s for s in meta["streams"] if s.fcc_type == b"vids"]
    lead = vids[0] if vids else meta["streams"][0]
    # NUL-padded / all-NUL handlers (legal for DIB video) must fall back —
    # strip() alone removes whitespace, not NULs
    codec = (
        lead.handler.decode("ascii", "replace").strip("\x00 \t").lower()
        or "dib"
    )
    dur = -1.0
    if lead.rate:
        dur = lead.length * lead.scale / lead.rate
    elif meta["usec_per_frame"]:
        dur = meta["n_frames"] * meta["usec_per_frame"] / 1e6
    return {"format": "avi", "codec": codec,
            "width": int(meta["width"]), "height": int(meta["height"]),
            "n_frames": int(meta["n_frames"] or len(lead.chunks)),
            "n_tracks": len(meta["streams"]), "duration_s": float(dur)}


# --------------------------------------------------------------------------
# Fixture muxer
# --------------------------------------------------------------------------


def _chunk(fcc: bytes, body: bytes) -> bytes:
    return fcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, *parts: bytes) -> bytes:
    body = ltype + b"".join(parts)
    return _chunk(b"LIST", body)


def encode_avi_dib_frame(gray: np.ndarray) -> bytes:
    """Grayscale array → bottom-up 24-bit BI_RGB DIB frame body."""
    assert gray.dtype == np.uint8 and gray.ndim == 2
    h, w = gray.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    bgr = np.repeat(gray[:, :, None], 3, axis=2)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows[::-1].tobytes()


def encode_avi(frames: list[bytes], codec: bytes, width: int, height: int,
               bits: int = 24, fps: int = 10, rec_groups: bool = False,
               audio: tuple[np.ndarray, int] | None = None,
               palette: np.ndarray | None = None) -> bytes:
    """Fixture-side AVI muxer: one video stream from raw frame chunk
    bodies (+ optional int16-mono PCM audio stream). ``codec`` is the
    strh handler fourcc; BI_RGB DIB streams use b'DIB ' with
    biCompression 0, MJPG uses the fourcc in both handler and
    biCompression. ``rec_groups`` wraps frames in LIST 'rec ' groups to
    exercise the nested movi walk. ``palette`` (n,3) RGB adds RGBQUADs
    for 8-bit DIBs."""
    comp = 0 if codec in (b"DIB ", b"RGB ") else struct.unpack("<I", codec)[0]
    pal = b""
    n_pal = 0
    if palette is not None:
        n_pal = len(palette)
        quads = np.zeros((n_pal, 4), np.uint8)
        quads[:, 0] = palette[:, 2]  # B
        quads[:, 1] = palette[:, 1]  # G
        quads[:, 2] = palette[:, 0]  # R
        pal = quads.tobytes()
    strf_v = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bits, comp,
                         0, 0, 0, n_pal, 0) + pal
    strh_v = (b"vids" + codec + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames), 0, 0, 0)
              + struct.pack("<hhhh", 0, 0, width, height))
    strl = []
    if frames or width:  # audio-only fixtures omit the video stream
        strl.append(_list(b"strl", _chunk(b"strh", strh_v),
                          _chunk(b"strf", strf_v)))
    movi_parts = []
    vid_chunks = [_chunk(b"00dc", f) for f in frames]
    if audio is not None:
        samples, rate = audio
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        strh_a = (b"auds" + b"\x00" * 4
                  + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, rate, 0,
                                len(samples), 0, 0, 0)
                  + struct.pack("<hhhh", 0, 0, 0, 0))
        strl.append(_list(b"strl", _chunk(b"strh", strh_a),
                          _chunk(b"strf", fmt)))
        pcm = np.asarray(samples, np.int16).tobytes()
        half = (len(pcm) // 4) * 2
        aid = b"%02dwb" % (len(strl) - 1)
        aud_chunks = [_chunk(aid, pcm[:half]), _chunk(aid, pcm[half:])]
    else:
        aud_chunks = []
    if rec_groups:
        for i, vc in enumerate(vid_chunks):
            grp = vc + (aud_chunks[i] if i < len(aud_chunks) else b"")
            movi_parts.append(_list(b"rec ", grp))
        # audio chunks beyond the video frame count must still be written
        # (trailing soundtrack) — silently dropping them builds fixtures
        # with a truncated soundtrack
        for ac in aud_chunks[len(vid_chunks):]:
            movi_parts.append(_list(b"rec ", ac))
    else:
        movi_parts = vid_chunks + aud_chunks
    avih = struct.pack("<IIIIIIIIII", 1_000_000 // fps, 0, 0, 0x10,
                       len(frames), 0, len(strl), 0, width, height) + b"\x00" * 16
    hdrl = _list(b"hdrl", _chunk(b"avih", avih), *strl)
    movi = _list(b"movi", *movi_parts)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
