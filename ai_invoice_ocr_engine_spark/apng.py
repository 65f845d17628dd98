"""APNG (Animated PNG) frame extraction — pure numpy + stdlib zlib.

The animation chunks (acTL / fcTL / fdAT) are the public W3C spec (PNG
third edition §11.3.6; previously the Mozilla APNG spec). This module
decodes every animation frame fully composited onto the output buffer,
honoring the spec's dispose and blend ops, and flattens each displayed
frame to grayscale for the format-agnostic video-frame consumers
(functions/multimodal.video_frame_payloads), mirroring gif.gif_frames.

Spec semantics implemented:
- the output buffer starts fully transparent black; frames render into
  their (x, y, w, h) region;
- ``blend_op`` 0 (SOURCE) replaces the region's RGBA, 1 (OVER) performs
  straight-alpha Porter-Duff over;
- ``dispose_op`` applies AFTER a frame is displayed: 0 (NONE) keeps the
  buffer, 1 (BACKGROUND) clears the frame's region to transparent
  black, 2 (PREVIOUS) reverts the region to its pre-render content —
  and PREVIOUS on the first frame degrades to BACKGROUND per spec;
- the static IDAT image participates in the animation only when an
  fcTL precedes IDAT (otherwise it is the non-animated fallback and is
  NOT emitted as a frame);
- fcTL/fdAT sequence numbers must be consecutive from 0 (validated —
  a gap means a malformed or reordered stream);
- each frame's fdAT payloads concatenate to a COMPLETE zlib stream
  (the spec's per-frame compression restart).

Grayscale flattening composites the displayed RGBA buffer over the
bKGD chunk's background when present (else black) with the shared
cv2-exact luma, so animation frames and still PNGs agree on color
handling. Pixel decode reuses kernels' pinned PNG machinery
(_unfilter_png / _png_unpack); interlaced frames (IHDR interlace 1)
stay a loud NotImplementedError — APNG encoders do not emit them in
practice and the spec discourages it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .kernels import (
    PNG_MAGIC,
    _check_dims,
    _png_chunks,
    _png_unpack,
    _unfilter_png,
    rgb_to_gray,
)


def is_apng(data: bytes) -> bool:
    """True when a PNG carries an acTL chunk before IDAT (the spec's
    animation marker)."""
    if data[:8] != PNG_MAGIC:
        return False
    try:
        for typ, _payload in _png_chunks(data):
            if typ == b"acTL":
                return True
            if typ == b"IDAT":
                return False
    except (struct.error, IndexError):
        return False
    return False


def _decode_rgba(raw: bytes, w: int, h: int, depth: int, ctype: int,
                 plte, trns) -> np.ndarray:
    """One frame's decompressed filtered scanlines → (h, w, 4) straight-
    alpha RGBA uint8, sharing decode_png's conventions (16-bit → high
    byte, sub-byte gray scaled to full range)."""
    if ctype not in (0, 2, 3, 4, 6):
        # same contract as kernels.decode_png for the non-animated path —
        # bad media must surface as the pipeline's ValueError/
        # NotImplementedError family, never a bare KeyError
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    rb = (w * nch * depth + 7) // 8
    bpp = max(1, nch * depth // 8)
    buf = np.frombuffer(raw, np.uint8)
    if len(buf) < h * (1 + rb):
        raise ValueError("APNG frame pixel data truncated")
    rows = _unfilter_png(buf[: h * (1 + rb)], h, rb, bpp)
    px = _png_unpack(rows, w, nch, depth)
    out = np.empty((h, w, 4), np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("APNG palette frame missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("APNG pixel index outside the palette")
        out[:, :, :3] = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            out[:, :, 3] = alpha[idx]
        else:
            out[:, :, 3] = 255
        return out
    if depth in (1, 2, 4):  # sub-byte gray
        mx = (1 << depth) - 1
        g = (px[:, :, 0].astype(np.uint16) * 255 // mx).astype(np.uint8)
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = g
        out[:, :, 3] = 255
        if trns is not None and len(trns) >= 2:
            key = struct.unpack(">H", trns[:2])[0] & mx
            out[:, :, 3] = np.where(px[:, :, 0] == key, 0, 255)
        return out
    if ctype == 0:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = px[:, :, 0]
        out[:, :, 3] = 255
        if trns is not None and len(trns) >= 2:
            # tRNS key compares at source depth; 16-bit reduced to high byte
            key = struct.unpack(">H", trns[:2])[0]
            if depth == 16:
                key >>= 8
            out[:, :, 3] = np.where(px[:, :, 0] == key, 0, 255)
        return out
    if ctype == 2:
        out[:, :, :3] = px
        out[:, :, 3] = 255
        if trns is not None and len(trns) >= 6:
            keys = struct.unpack(">HHH", trns[:6])
            shift = 8 if depth == 16 else 0
            kr, kg, kb = (k >> shift for k in keys)
            mask = ((px[:, :, 0] == kr) & (px[:, :, 1] == kg)
                    & (px[:, :, 2] == kb))
            out[:, :, 3] = np.where(mask, 0, 255)
        return out
    if ctype == 4:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = px[:, :, 0]
        out[:, :, 3] = px[:, :, 1]
        return out
    out[:] = px  # ctype 6
    return out


def _blend_over(region: np.ndarray, src: np.ndarray) -> None:
    """Straight-alpha Porter-Duff OVER, in place on ``region`` (RGBA
    uint8). Integer-exact: components scaled by 255*255 before the
    divide, round-half-up — deterministic across platforms."""
    sa = src[:, :, 3].astype(np.int64)
    da = region[:, :, 3].astype(np.int64)
    out_a255 = sa * 255 + da * (255 - sa)  # alpha * 255^2 / 255
    c_num = (src[:, :, :3].astype(np.int64) * sa[:, :, None] * 255
             + region[:, :, :3].astype(np.int64) * da[:, :, None]
             * (255 - sa)[:, :, None])
    safe = np.maximum(out_a255, 1)
    region[:, :, :3] = ((c_num + safe[:, :, None] // 2)
                        // safe[:, :, None]).astype(np.uint8)
    region[:, :, 3] = ((out_a255 + 127) // 255).astype(np.uint8)


def _parse(data: bytes):
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    w = h = None
    depth = ctype = interlace = 0
    plte = trns = None
    bkgd = None
    n_frames_decl = 0
    num_plays = 0
    ctl: list[dict] = []  # per-frame control + data parts
    idat: list[bytes] = []
    pending = None
    seqs: list[int] = []
    try:
        for typ, payload in _png_chunks(data):
            if typ == b"IHDR":
                w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                    ">IIBBBBB", payload)
                _check_dims(w, h, "APNG")
            elif typ == b"PLTE":
                if len(payload) % 3:
                    raise ValueError("PNG PLTE length not a multiple of 3")
                plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
            elif typ == b"tRNS":
                trns = payload
            elif typ == b"bKGD":
                bkgd = payload
            elif typ == b"acTL":
                n_frames_decl, num_plays = struct.unpack(">II", payload)
            elif typ == b"fcTL":
                seq, fw, fh, x, y, dnum, dden, dop, bop = struct.unpack(
                    ">IIIIIHHBB", payload)
                seqs.append(seq)
                pending = {"w": fw, "h": fh, "x": x, "y": y,
                           "dispose": dop, "blend": bop,
                           "delay": (dnum, dden or 100), "parts": [],
                           "from_idat": False}
                ctl.append(pending)
            elif typ == b"IDAT":
                idat.append(payload)
                # the default image joins the animation only when its fcTL
                # came BEFORE IDAT; all IDAT chunks concatenate into frame 0
                if (pending is not None and pending is ctl[0]
                        and (pending["from_idat"] or not pending["parts"])):
                    pending["parts"].append(payload)
                    pending["from_idat"] = True
            elif typ == b"fdAT":
                if len(payload) < 4:
                    raise ValueError("APNG fdAT truncated")
                seqs.append(struct.unpack(">I", payload[:4])[0])
                if pending is None:
                    raise ValueError("APNG fdAT before any fcTL")
                pending["parts"].append(payload[4:])
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt APNG: {e}") from e
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if interlace:
        raise NotImplementedError("interlaced APNG frames unsupported")
    if seqs != list(range(len(seqs))):
        raise ValueError("APNG sequence numbers not consecutive")
    if n_frames_decl != len(ctl):
        raise ValueError(
            f"APNG acTL declares {n_frames_decl} frames, found {len(ctl)}")
    # IDAT-backed first frame: from_idat marks it; an fcTL-after-IDAT
    # stream means the default image is NOT part of the animation
    return {"w": w, "h": h, "depth": depth, "ctype": ctype, "plte": plte,
            "trns": trns, "bkgd": bkgd, "num_plays": num_plays,
            "frames": ctl}


def _bkgd_rgb(meta) -> np.ndarray:
    """bKGD chunk → RGB background for flattening; black when absent."""
    bkgd, ctype, depth, plte = (meta["bkgd"], meta["ctype"],
                                meta["depth"], meta["plte"])
    if bkgd is None:
        return np.zeros(3, np.uint8)
    if ctype == 3 and len(bkgd) >= 1 and plte is not None:
        i = bkgd[0]
        return plte[i] if i < len(plte) else np.zeros(3, np.uint8)
    shift = 8 if depth == 16 else 0
    if ctype in (0, 4) and len(bkgd) >= 2:
        g = (struct.unpack(">H", bkgd[:2])[0] >> shift) & 0xFF
        return np.array([g, g, g], np.uint8)
    if ctype in (2, 6) and len(bkgd) >= 6:
        r, g, b = struct.unpack(">HHH", bkgd[:6])
        return np.array([(r >> shift) & 0xFF, (g >> shift) & 0xFF,
                         (b >> shift) & 0xFF], np.uint8)
    return np.zeros(3, np.uint8)


def apng_frames(data: bytes) -> list[np.ndarray]:
    """Decode every animation frame fully composited, as grayscale uint8
    (canvas-sized) arrays — the gif_frames analog for APNG. A PNG
    without acTL yields its single still image (via kernels.decode_png)
    so the video path accepts stills uniformly."""
    if not is_apng(data):
        from .kernels import decode_png

        return [decode_png(data)]
    meta = _parse(data)
    w, h = meta["w"], meta["h"]
    bg = _bkgd_rgb(meta).astype(np.int64)
    canvas = np.zeros((h, w, 4), np.uint8)  # transparent black
    frames: list[np.ndarray] = []
    try:
        for i, fc in enumerate(meta["frames"]):
            fw, fh, x, y = fc["w"], fc["h"], fc["x"], fc["y"]
            _check_dims(fw, fh, "APNG frame")
            if x + fw > w or y + fh > h:
                raise ValueError("APNG frame region exceeds the canvas")
            if fc["blend"] not in (0, 1):
                raise ValueError(f"APNG blend_op {fc['blend']} invalid")
            if fc["dispose"] not in (0, 1, 2):
                raise ValueError(f"APNG dispose_op {fc['dispose']} invalid")
            if not fc["parts"]:
                raise ValueError("APNG frame has no image data")
            raw = zlib.decompress(b"".join(fc["parts"]))
            src = _decode_rgba(raw, fw, fh, meta["depth"], meta["ctype"],
                               meta["plte"], meta["trns"])
            region = canvas[y : y + fh, x : x + fw]
            saved = region.copy() if fc["dispose"] == 2 else None
            if fc["blend"] == 0 or i == 0:
                # spec: the first frame always renders as SOURCE
                region[:] = src
            else:
                _blend_over(region, src)
            # displayed frame: flatten straight alpha over the background
            a = canvas[:, :, 3].astype(np.int64)
            rgb = ((canvas[:, :, :3].astype(np.int64) * a[:, :, None]
                    + bg[None, None, :] * (255 - a)[:, :, None] + 127)
                   // 255).astype(np.uint8)
            frames.append(rgb_to_gray(rgb))
            dispose = fc["dispose"]
            if dispose == 2 and i == 0:
                dispose = 1  # spec: first-frame PREVIOUS acts as BACKGROUND
            if dispose == 1:
                region[:] = 0
            elif dispose == 2:
                region[:] = saved
    except zlib.error as e:
        raise ValueError(f"corrupt APNG frame stream: {e}") from e
    return frames


def apng_metadata(data: bytes) -> dict:
    """Header-level metadata for video_metadata(): canvas dims, declared
    frame count (acTL — no pixel decode), summed fcTL delays."""
    meta = _parse(data)
    dur = 0.0
    for fc in meta["frames"]:
        num, den = fc["delay"]
        dur += num / den
    return {"format": "apng", "codec": "png_deflate",
            "width": int(meta["w"]), "height": int(meta["h"]),
            "n_frames": len(meta["frames"]), "n_tracks": 1,
            "duration_s": float(dur)}


# --------------------------------------------------------------------------
# Fixture encoder
# --------------------------------------------------------------------------


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload)))


def encode_apng(frames: list[tuple[np.ndarray, int, int, int, int]],
                width: int, height: int,
                first_frame_in_anim: bool = True,
                delays: list[tuple[int, int]] | None = None,
                bkgd: tuple[int, int, int] | None = None) -> bytes:
    """Fixture-side APNG writer. ``frames`` is a list of
    (rgba (h,w,4) uint8, x, y, dispose_op, blend_op). The first frame
    becomes the IDAT default image when ``first_frame_in_anim`` (fcTL
    before IDAT); otherwise the default image is frame[0] rendered
    standalone and the ANIMATION starts at frames[1] (spec's
    fallback-image layout). RGBA 8-bit, filter 0, one zlib stream per
    frame — exactly the shape real APNG encoders emit."""
    out = bytearray(PNG_MAGIC)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 6,
                                       0, 0, 0))
    n_anim = len(frames) if first_frame_in_anim else len(frames) - 1
    out += _chunk(b"acTL", struct.pack(">II", n_anim, 0))
    if bkgd is not None:
        out += _chunk(b"bKGD", struct.pack(">HHH", *bkgd))
    seq = 0

    def raw_stream(img: np.ndarray) -> bytes:
        fh, fw = img.shape[:2]
        rows = np.zeros((fh, 1 + fw * 4), np.uint8)
        rows[:, 1:] = img.reshape(fh, fw * 4)
        return zlib.compress(rows.tobytes())

    def fctl(img, x, y, dop, bop, idx):
        nonlocal seq
        num, den = (delays[idx] if delays else (1, 10))
        c = _chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, img.shape[1], img.shape[0], x, y,
            num, den, dop, bop))
        seq += 1
        return c

    for i, (img, x, y, dop, bop) in enumerate(frames):
        assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 4
        comp = raw_stream(img)
        if i == 0:
            if first_frame_in_anim:
                out += fctl(img, x, y, dop, bop, 0)
            out += _chunk(b"IDAT", comp)
        else:
            out += fctl(img, x, y, dop, bop, i)
            out += _chunk(b"fdAT", struct.pack(">I", seq) + comp)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)
