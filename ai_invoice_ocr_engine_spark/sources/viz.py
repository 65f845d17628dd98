"""S9 viz sink: annotated detection overlays, Spark-distributed.

Reference: ``utils/visualize.py`` ``draw_boxes`` (cv2.polylines per box in a
fixed 10-color cycle, default thickness 2) and the ``cli.py:42`` save loop
that writes one annotated image per input frame. Here the page is grayscale
(the engine's native space), promoted to RGB for the overlay; boxes are the
engine's AABBs ``[x0, y0, x1, y1]`` in original frame coordinates (the
``detect_only`` surface, api.py). Everything runs inside ONE mapInPandas
crossing and each task writes its own PNG files — no driver collect, so the
sink scales with the media table. ``draw_ocr_result``'s text-label overlay
(visualize.py:12-21) needs a font rasterizer (the reference loads a TTF via
PIL); that stays a named seam — boxes and the color cycle are the sink's
algorithmic core.
"""

from __future__ import annotations

import os
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: reference utils/visualize.py:5 _COLORS, verbatim cycle order
_COLORS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255),
    (0, 255, 255), (128, 0, 0), (0, 128, 0), (0, 0, 128), (128, 128, 0),
]

# --------------------------------------------------------------------------
# 5x7 bitmap font (classic public-domain LCD font, column-major, bit 0 = top
# row). Stands in for the reference's PIL ImageFont (visualize.py:14 —
# load_default there is itself a small bitmap font); glyph shapes are not
# parity-relevant, only that draw_ocr_result labels each box with its text.
# --------------------------------------------------------------------------
_FONT_W, _FONT_H = 5, 7
_FONT5x7: dict[str, tuple[int, ...]] = {
    " ": (0x00, 0x00, 0x00, 0x00, 0x00),
    "!": (0x00, 0x00, 0x5F, 0x00, 0x00),
    '"': (0x00, 0x07, 0x00, 0x07, 0x00),
    "#": (0x14, 0x7F, 0x14, 0x7F, 0x14),
    "$": (0x24, 0x2A, 0x7F, 0x2A, 0x12),
    "%": (0x23, 0x13, 0x08, 0x64, 0x62),
    "&": (0x36, 0x49, 0x55, 0x22, 0x50),
    "'": (0x00, 0x05, 0x03, 0x00, 0x00),
    "(": (0x00, 0x1C, 0x22, 0x41, 0x00),
    ")": (0x00, 0x41, 0x22, 0x1C, 0x00),
    "*": (0x14, 0x08, 0x3E, 0x08, 0x14),
    "+": (0x08, 0x08, 0x3E, 0x08, 0x08),
    ",": (0x00, 0x50, 0x30, 0x00, 0x00),
    "-": (0x08, 0x08, 0x08, 0x08, 0x08),
    ".": (0x00, 0x60, 0x60, 0x00, 0x00),
    "/": (0x20, 0x10, 0x08, 0x04, 0x02),
    "0": (0x3E, 0x51, 0x49, 0x45, 0x3E),
    "1": (0x00, 0x42, 0x7F, 0x40, 0x00),
    "2": (0x42, 0x61, 0x51, 0x49, 0x46),
    "3": (0x21, 0x41, 0x45, 0x4B, 0x31),
    "4": (0x18, 0x14, 0x12, 0x7F, 0x10),
    "5": (0x27, 0x45, 0x45, 0x45, 0x39),
    "6": (0x3C, 0x4A, 0x49, 0x49, 0x30),
    "7": (0x01, 0x71, 0x09, 0x05, 0x03),
    "8": (0x36, 0x49, 0x49, 0x49, 0x36),
    "9": (0x06, 0x49, 0x49, 0x29, 0x1E),
    ":": (0x00, 0x36, 0x36, 0x00, 0x00),
    ";": (0x00, 0x56, 0x36, 0x00, 0x00),
    "<": (0x08, 0x14, 0x22, 0x41, 0x00),
    "=": (0x14, 0x14, 0x14, 0x14, 0x14),
    ">": (0x00, 0x41, 0x22, 0x14, 0x08),
    "?": (0x02, 0x01, 0x51, 0x09, 0x06),
    "@": (0x32, 0x49, 0x79, 0x41, 0x3E),
    "A": (0x7E, 0x11, 0x11, 0x11, 0x7E),
    "B": (0x7F, 0x49, 0x49, 0x49, 0x36),
    "C": (0x3E, 0x41, 0x41, 0x41, 0x22),
    "D": (0x7F, 0x41, 0x41, 0x22, 0x1C),
    "E": (0x7F, 0x49, 0x49, 0x49, 0x41),
    "F": (0x7F, 0x09, 0x09, 0x09, 0x01),
    "G": (0x3E, 0x41, 0x49, 0x49, 0x7A),
    "H": (0x7F, 0x08, 0x08, 0x08, 0x7F),
    "I": (0x00, 0x41, 0x7F, 0x41, 0x00),
    "J": (0x20, 0x40, 0x41, 0x3F, 0x01),
    "K": (0x7F, 0x08, 0x14, 0x22, 0x41),
    "L": (0x7F, 0x40, 0x40, 0x40, 0x40),
    "M": (0x7F, 0x02, 0x0C, 0x02, 0x7F),
    "N": (0x7F, 0x04, 0x08, 0x10, 0x7F),
    "O": (0x3E, 0x41, 0x41, 0x41, 0x3E),
    "P": (0x7F, 0x09, 0x09, 0x09, 0x06),
    "Q": (0x3E, 0x41, 0x51, 0x21, 0x5E),
    "R": (0x7F, 0x09, 0x19, 0x29, 0x46),
    "S": (0x46, 0x49, 0x49, 0x49, 0x31),
    "T": (0x01, 0x01, 0x7F, 0x01, 0x01),
    "U": (0x3F, 0x40, 0x40, 0x40, 0x3F),
    "V": (0x1F, 0x20, 0x40, 0x20, 0x1F),
    "W": (0x3F, 0x40, 0x38, 0x40, 0x3F),
    "X": (0x63, 0x14, 0x08, 0x14, 0x63),
    "Y": (0x07, 0x08, 0x70, 0x08, 0x07),
    "Z": (0x61, 0x51, 0x49, 0x45, 0x43),
    "[": (0x00, 0x7F, 0x41, 0x41, 0x00),
    "\\": (0x02, 0x04, 0x08, 0x10, 0x20),
    "]": (0x00, 0x41, 0x41, 0x7F, 0x00),
    "^": (0x04, 0x02, 0x01, 0x02, 0x04),
    "_": (0x40, 0x40, 0x40, 0x40, 0x40),
    "`": (0x00, 0x01, 0x02, 0x04, 0x00),
    "a": (0x20, 0x54, 0x54, 0x54, 0x78),
    "b": (0x7F, 0x48, 0x44, 0x44, 0x38),
    "c": (0x38, 0x44, 0x44, 0x44, 0x20),
    "d": (0x38, 0x44, 0x44, 0x48, 0x7F),
    "e": (0x38, 0x54, 0x54, 0x54, 0x18),
    "f": (0x08, 0x7E, 0x09, 0x01, 0x02),
    "g": (0x0C, 0x52, 0x52, 0x52, 0x3E),
    "h": (0x7F, 0x08, 0x04, 0x04, 0x78),
    "i": (0x00, 0x44, 0x7D, 0x40, 0x00),
    "j": (0x20, 0x40, 0x44, 0x3D, 0x00),
    "k": (0x7F, 0x10, 0x28, 0x44, 0x00),
    "l": (0x00, 0x41, 0x7F, 0x40, 0x00),
    "m": (0x7C, 0x04, 0x18, 0x04, 0x78),
    "n": (0x7C, 0x08, 0x04, 0x04, 0x78),
    "o": (0x38, 0x44, 0x44, 0x44, 0x38),
    "p": (0x7C, 0x14, 0x14, 0x14, 0x08),
    "q": (0x08, 0x14, 0x14, 0x18, 0x7C),
    "r": (0x7C, 0x08, 0x04, 0x04, 0x08),
    "s": (0x48, 0x54, 0x54, 0x54, 0x20),
    "t": (0x04, 0x3F, 0x44, 0x40, 0x20),
    "u": (0x3C, 0x40, 0x40, 0x20, 0x7C),
    "v": (0x1C, 0x20, 0x40, 0x20, 0x1C),
    "w": (0x3C, 0x40, 0x30, 0x40, 0x3C),
    "x": (0x44, 0x28, 0x10, 0x28, 0x44),
    "y": (0x0C, 0x50, 0x50, 0x50, 0x3C),
    "z": (0x44, 0x64, 0x54, 0x4C, 0x44),
    "{": (0x00, 0x08, 0x36, 0x41, 0x00),
    "|": (0x00, 0x00, 0x7F, 0x00, 0x00),
    "}": (0x00, 0x41, 0x36, 0x08, 0x00),
    "~": (0x08, 0x04, 0x08, 0x10, 0x08),
}
#: unknown glyph: hollow box (PIL load_default's tofu equivalent)
_FONT_UNK = (0x7F, 0x41, 0x41, 0x41, 0x7F)


def _glyph_mask(ch: str) -> np.ndarray:
    """(7, 5) bool bitmap for one char."""
    cols = _FONT5x7.get(ch, _FONT_UNK)
    bits = np.array(cols, np.uint8)  # (5,) column bytes
    rows = (bits[None, :] >> np.arange(_FONT_H, dtype=np.uint8)[:, None]) & 1
    return rows.astype(bool)  # (7, 5), row 0 = top


def render_text(
    rgb: np.ndarray,
    x: int,
    y: int,
    text: str,
    color: tuple[int, int, int],
    scale: int = 1,
) -> None:
    """Stamp `text` into an RGB frame at top-left (x, y), in place.

    5x7 glyphs scaled by integer `scale` (nearest-neighbor), one scaled
    column of spacing between glyphs; pixels falling outside the frame are
    clipped, not an error (labels above boxes near the top edge)."""
    h, w = rgb.shape[:2]
    c = np.array(color, np.uint8)
    gw = (_FONT_W + 1) * scale
    for k, ch in enumerate(text):
        m = _glyph_mask(ch)
        if scale > 1:
            m = np.repeat(np.repeat(m, scale, axis=0), scale, axis=1)
        gx = x + k * gw
        if gx >= w or gx + m.shape[1] <= 0 or y >= h or y + m.shape[0] <= 0:
            continue
        sy, sx = max(0, -y), max(0, -gx)
        ey = min(m.shape[0], h - y)
        ex = min(m.shape[1], w - gx)
        sub = m[sy:ey, sx:ex]
        region = rgb[y + sy : y + ey, gx + sx : gx + ex]
        region[sub] = c

_VIZ_SCHEMA = "media_ref string, path string, n_boxes int"


def draw_boxes(
    img: np.ndarray,
    boxes: list,
    color: tuple[int, int, int] | None = None,
    thickness: int = 2,
) -> np.ndarray:
    """Gray (h, w) page + AABBs → RGB (h, w, 3) with rectangle outlines.

    ``color=None`` cycles the reference's 10-color palette per box
    (visualize.py:6-11 with color=None); a fixed color matches its default
    green call shape. Thickness grows inward from the box edge (cv2 grows
    symmetrically; inward keeps the outline inside the frame for boxes that
    touch the border, and the ring's outer edge still sits exactly on the
    box coordinates, which is what the overlay is asserting visually).
    """
    assert img.dtype == np.uint8 and img.ndim == 2
    h, w = img.shape
    rgb = np.repeat(img[:, :, None], 3, axis=2).copy()
    for i, box in enumerate(boxes):
        x0, y0, x1, y1 = (int(round(float(v))) for v in box)
        x0, x1 = max(x0, 0), min(x1, w - 1)
        y0, y1 = max(y0, 0), min(y1, h - 1)
        if x1 <= x0 or y1 <= y0:
            continue
        c = np.array(_COLORS[i % len(_COLORS)] if color is None else color,
                     dtype=np.uint8)
        for t in range(min(thickness, (y1 - y0) // 2 + 1, (x1 - x0) // 2 + 1)):
            rgb[y0 + t, x0:x1 + 1] = c
            rgb[y1 - t, x0:x1 + 1] = c
            rgb[y0:y1 + 1, x0 + t] = c
            rgb[y0:y1 + 1, x1 - t] = c
    return rgb


def _safe_name(ref: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]", "_", ref)


def write_viz(
    media: DataFrame,
    boxes: DataFrame,
    out_dir: str,
    color: tuple[int, int, int] | None = None,
    thickness: int = 2,
) -> DataFrame:
    """Join media(media_ref, image) with detect_only output
    (media_ref, boxes[, scores]) and write ``{out_dir}/{media_ref}.png``
    overlays from inside the tasks. Returns (media_ref, path, n_boxes) —
    an action on it (count/collect) drives the writes.

    The join is on media_ref — broadcastable when the boxes side is a small
    sample (the usual viz case: a handful of QA frames against the full
    media table → Spark broadcasts the sample and the scan prunes)."""
    from .. import kernels as K

    joined = media.select("media_ref", "image").join(
        boxes.select("media_ref", "boxes"), "media_ref"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            refs, paths, counts = [], [], []
            for ref, blob, bxs in zip(pdf["media_ref"], pdf["image"],
                                      pdf["boxes"]):
                img = K.decode_image(bytes(blob))
                rgb = draw_boxes(img, list(bxs), color=color,
                                 thickness=thickness)
                path = os.path.join(out_dir, _safe_name(str(ref)) + ".png")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(K.encode_png_ext(rgb, depth=8, ctype=2))
                os.replace(tmp, path)  # rerun/retry-safe (atomic publish)
                refs.append(ref)
                paths.append(path)
                counts.append(len(bxs))
            yield pd.DataFrame(
                {"media_ref": refs, "path": paths, "n_boxes": counts}
            )

    return joined.mapInPandas(fn, _VIZ_SCHEMA)


# --------------------------------------------------------------------------
# Labeled overlays + the rest of the reference viz surface
# (utils/visualize.py draw_ocr_result/draw_mask/draw_heatmap/create_grid/
# _Annotator) — all pure numpy, no cv2/PIL.
# --------------------------------------------------------------------------


def _to_rgb(img: np.ndarray) -> np.ndarray:
    """Gray (h, w) or RGB (h, w, 3) uint8 → a fresh RGB copy."""
    assert img.dtype == np.uint8
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2).copy()
    assert img.ndim == 3 and img.shape[2] == 3
    return img.copy()


def _line_px(rgb: np.ndarray, p1, p2, color, thickness: int = 1) -> None:
    """Bresenham segment (the cv2.line core), in place, clipped."""
    h, w = rgb.shape[:2]
    c = np.array(color, np.uint8)
    x0, y0 = int(round(p1[0])), int(round(p1[1]))
    x1, y1 = int(round(p2[0])), int(round(p2[1]))
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
    err = dx + dy
    r = max(0, thickness - 1)
    while True:
        ya, yb = max(0, y0 - r), min(h, y0 + r + 1)
        xa, xb = max(0, x0 - r), min(w, x0 + r + 1)
        if ya < yb and xa < xb:
            rgb[ya:yb, xa:xb] = c
        if x0 == x1 and y0 == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x0 += sx
        if e2 <= dx:
            err += dx
            y0 += sy


def _poly_outline(rgb: np.ndarray, pts: np.ndarray, color, thickness=1) -> None:
    """Closed polygon outline (cv2.polylines(closed=True) shape). AABBs come
    in as [x0, y0, x1, y1]; quads as (4, 2)."""
    pts = np.asarray(pts, np.float64)
    if pts.ndim == 1:  # AABB
        x0, y0, x1, y1 = pts
        pts = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    n = len(pts)
    for i in range(n):
        _line_px(rgb, pts[i], pts[(i + 1) % n], color, thickness)


def draw_ocr_result(
    img: np.ndarray,
    boxes: list,
    texts: list[str],
    scores: list[float] | None = None,
    font_size: int = 18,
) -> np.ndarray:
    """Reference utils/visualize.py:12-21 draw_ocr_result: per-box 1px
    polygon outline in the 10-color cycle, plus a ``text (score)`` label
    anchored at (x0, y0 - font_size - 2). The PIL TTF/load_default font is
    replaced by the embedded 5x7 bitmap font scaled to ~font_size px; the
    BGR<->RGB round-trip is a no-op here (grayscale-native engine)."""
    rgb = _to_rgb(img)
    scale = max(1, round(font_size / (_FONT_H + 2)))
    for i, (box, txt) in enumerate(zip(boxes, texts)):
        c = _COLORS[i % len(_COLORS)]
        pts = np.asarray(box, np.float64)
        _poly_outline(rgb, pts, c, 1)
        if pts.ndim == 1:
            x0, y0 = pts[0], pts[1]
        else:
            x0, y0 = pts[0]  # first point, like the reference's pts[0]
        sc = f" ({scores[i]:.2f})" if scores is not None and i < len(scores) else ""
        render_text(rgb, int(round(x0)), int(round(y0)) - font_size - 2,
                    f"{txt}{sc}", c, scale=scale)
    return rgb


def draw_mask(
    img: np.ndarray,
    mask: np.ndarray,
    alpha: float = 0.5,
    color: tuple[int, int, int] = (0, 255, 0),
) -> np.ndarray:
    """Reference visualize.py:22-24: overlay = img with mask>0 pixels set to
    `color`, result = (1-alpha)*img + alpha*overlay (cv2.addWeighted
    rounding: round-half-away, matched by np.rint on the halves)."""
    rgb = _to_rgb(img)
    overlay = rgb.copy()
    overlay[mask > 0] = np.array(color, np.uint8)
    out = np.rint((1.0 - alpha) * rgb.astype(np.float64)
                  + alpha * overlay.astype(np.float64))
    return np.clip(out, 0, 255).astype(np.uint8)


def _jet(v: np.ndarray) -> np.ndarray:
    """Classic jet colormap on v in [0, 1] → RGB float in [0, 255] (the
    standard piecewise-linear formula behind cv2.COLORMAP_JET)."""
    r = np.clip(1.5 - np.abs(4.0 * v - 3.0), 0.0, 1.0)
    g = np.clip(1.5 - np.abs(4.0 * v - 2.0), 0.0, 1.0)
    b = np.clip(1.5 - np.abs(4.0 * v - 1.0), 0.0, 1.0)
    return np.stack([r, g, b], axis=-1) * 255.0


def draw_heatmap(img: np.ndarray, heatmap: np.ndarray, alpha: float = 0.6) -> np.ndarray:
    """Reference visualize.py:25-28: jet-colorize the heatmap (resized to the
    frame if needed) and alpha-blend over the image."""
    from .. import kernels as K

    rgb = _to_rgb(img)
    hm = np.clip(np.asarray(heatmap, np.float64), 0.0, 1.0)
    if hm.shape != rgb.shape[:2]:
        hm8 = (hm * 255.0).astype(np.uint8)
        hm = K.resize_bilinear(hm8, rgb.shape[0], rgb.shape[1]).astype(np.float64) / 255.0
    out = np.rint((1.0 - alpha) * rgb.astype(np.float64) + alpha * _jet(hm))
    return np.clip(out, 0, 255).astype(np.uint8)


def create_grid(
    imgs: list[np.ndarray],
    cols: int = 4,
    size: tuple[int, int] = (200, 200),
    padding: int = 5,
) -> np.ndarray:
    """Reference visualize.py:29-35: resize every image to `size` (w, h) and
    paste row-major onto a white canvas with `padding` gutters."""
    from .. import kernels as K

    n = len(imgs)
    rows = (n + cols - 1) // cols
    w, h = size
    grid = np.full((rows * (h + padding) + padding,
                    cols * (w + padding) + padding, 3), 255, np.uint8)
    for i, im in enumerate(imgs):
        rgb = _to_rgb(im)
        resized = np.stack(
            [K.resize_bilinear(rgb[:, :, ch], h, w) for ch in range(3)], axis=-1
        )
        r, c = divmod(i, cols)
        y, x = r * (h + padding) + padding, c * (w + padding) + padding
        grid[y : y + h, x : x + w] = resized
    return grid


class Annotator:
    """Reference visualize.py:36-46 _Annotator: chainable box/text/line/
    circle over a copied frame, ``.result()`` returns it."""

    def __init__(self, img: np.ndarray):
        self.img = _to_rgb(img)
        self.h, self.w = self.img.shape[:2]

    def box(self, pts, color=(0, 255, 0), thickness: int = 2) -> "Annotator":
        _poly_outline(self.img, np.asarray(pts, np.float64), color, thickness)
        return self

    def text(self, pos, txt: str, color=(255, 255, 255), scale: float = 0.6,
             thickness: int = 1) -> "Annotator":
        # cv2.putText's scale≈0.6 Hershey ≈ 12px tall → 5x7 integer scale
        render_text(self.img, int(pos[0]), int(pos[1]), txt, color,
                    scale=max(1, round(scale * 2)))
        return self

    def line(self, p1, p2, color=(0, 255, 0), thickness: int = 2) -> "Annotator":
        _line_px(self.img, p1, p2, color, thickness)
        return self

    def circle(self, center, radius: int, color=(0, 0, 255),
               thickness: int = -1) -> "Annotator":
        cx, cy = center
        yy, xx = np.ogrid[: self.h, : self.w]
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        if thickness < 0:  # filled, cv2's -1 convention
            sel = d2 <= radius**2
        else:
            sel = (d2 <= (radius + thickness - 1) ** 2) & (d2 >= (radius - 1) ** 2)
        self.img[sel] = np.array(color, np.uint8)
        return self

    def result(self) -> np.ndarray:
        return self.img


def write_viz_labeled(
    media: DataFrame,
    out_dir: str,
    cfg=None,
    font_size: int = 18,
) -> DataFrame:
    """The reference CLI's --visualize loop (cli.py:40-43: imread → predict →
    draw_ocr_result → imwrite per input), distributed: ONE mapInPandas over
    media(media_ref, image) that decodes, orientation-corrects, detects,
    recognizes, and writes ``{out_dir}/{media_ref}_vis.png`` — no join, no
    shuffle, embarrassingly parallel over frames. Boxes are drawn on the
    corrected frame (the coordinate space they live in). Returns
    (media_ref, path, n_boxes)."""
    from .. import kernels as K
    from ..config import ExtractConfig
    from ..extractor import detect_frame_geom

    cfg = cfg or ExtractConfig()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        weights = K.resolve_weights(cfg.rec)
        for pdf in batches:
            refs, paths, counts = [], [], []
            for ref, blob in zip(pdf["media_ref"], pdf["image"]):
                img = K.decode_image(bytes(blob))
                if cfg.prep.unwarp:
                    img, _ = K.unwarp_page(img, uwth=cfg.prep.uwth)
                if cfg.prep.ori:
                    img, _ = K.correct_orientation(img, oth=cfg.prep.oth)
                boxes, _scores, quads = detect_frame_geom(img, cfg)
                geoms = quads if quads is not None else boxes
                crops = ([K.crop_quad(img, q) for q in quads]
                         if quads is not None
                         else [K.crop_box(img, b) for b in boxes])
                if cfg.cls.en:
                    crops = [K.correct_textline(c, th=cfg.cls.th) for c in crops]
                ts = K.recognize_crops(
                    crops, weights, h=cfg.rec.h, mw=cfg.rec.mw,
                    min_w=cfg.rec.min_w, decode=cfg.rec.decode,
                    beam_width=cfg.rec.beam_width,
                ) if len(crops) else []
                rgb = draw_ocr_result(
                    img, list(geoms), [t for t, _ in ts],
                    [float(s) for _, s in ts], font_size=font_size,
                )
                path = os.path.join(out_dir, _safe_name(str(ref)) + "_vis.png")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(K.encode_png_ext(rgb, depth=8, ctype=2))
                os.replace(tmp, path)
                refs.append(ref)
                paths.append(path)
                counts.append(len(boxes))
            yield pd.DataFrame(
                {"media_ref": refs, "path": paths, "n_boxes": counts}
            )

    return media.select("media_ref", "image").mapInPandas(fn, _VIZ_SCHEMA)
