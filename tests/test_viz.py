"""S9 viz sink: draw_boxes parity semantics + the distributed overlay
writer (reference utils/visualize.py draw_boxes / cli.py:42 save loop)."""

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark import fixtures as FX
from ai_invoice_ocr_engine_spark import kernels as K
from ai_invoice_ocr_engine_spark.sources.viz import _COLORS, draw_boxes, write_viz


def test_draw_boxes_ring_geometry():
    img = np.full((40, 60), 200, np.uint8)
    out = draw_boxes(img, [[10, 5, 30, 20]], color=(0, 255, 0), thickness=2)
    assert out.shape == (40, 60, 3) and out.dtype == np.uint8
    g = np.array([0, 255, 0], np.uint8)
    # outer ring sits exactly on the box coordinates
    assert (out[5, 10:31] == g).all() and (out[20, 10:31] == g).all()
    assert (out[5:21, 10] == g).all() and (out[5:21, 30] == g).all()
    # thickness grows inward: second ring colored, third not
    assert (out[6, 11:30] == g).all()
    assert (out[7, 15] == 200).all()
    # untouched pixels keep the gray value on all three channels
    assert (out[0, 0] == 200).all() and (out[39, 59] == 200).all()


def test_draw_boxes_color_cycle_and_clip():
    img = np.zeros((20, 20), np.uint8)
    boxes = [[0, 0, 5, 5], [8, 8, 40, 40], [-3, 12, 4, 19]]  # 2 need clipping
    out = draw_boxes(img, boxes, color=None, thickness=1)
    # reference _COLORS cycle (visualize.py:5-6), one color per box index
    assert tuple(out[0, 0]) == _COLORS[0]
    assert tuple(out[8, 8]) == _COLORS[1]
    assert tuple(out[19, 19]) == _COLORS[1]  # clipped to the frame corner
    assert tuple(out[12, 0]) == _COLORS[2]
    # degenerate after clipping is skipped, not an error
    assert draw_boxes(img, [[25, 25, 30, 30]]).sum() == 0


def test_write_viz_end_to_end(spark, tmp_path):
    """detect_only → write_viz writes one decodable PNG per frame with the
    outline exactly on each detected box and the page untouched elsewhere."""
    from ai_invoice_ocr_engine_spark.api import OCREngineSpark

    rng = np.random.default_rng(77)
    rows = []
    imgs = {}
    for i in range(3):
        img, _ = FX.render_media(rng, 260, 180, header_footer=False)
        ref = f"m{i}"
        imgs[ref] = img
        rows.append((ref, bytearray(K.encode_synf(img))))
    media = spark.createDataFrame(rows, "media_ref string, image binary")
    eng = OCREngineSpark(spark)
    boxes_df = eng.detect_only(media)
    want_boxes = {r.media_ref: r.boxes for r in boxes_df.collect()}

    out = str(tmp_path / "viz")
    rep = {r.media_ref: r for r in
           write_viz(media, boxes_df, out, color=(255, 0, 0)).collect()}
    assert set(rep) == {"m0", "m1", "m2"}
    red_luma = K.decode_image(
        K.encode_png_ext(np.full((1, 1, 3), (255, 0, 0), np.uint8), ctype=2)
    )[0, 0]
    for ref, r in rep.items():
        assert r.n_boxes == len(want_boxes[ref]) > 0
        got = K.decode_image(open(r.path, "rb").read())  # luma of the RGB png
        img = imgs[ref]
        assert got.shape == img.shape
        for x0, y0, x1, y1 in ((int(round(v)) for v in b)
                               for b in want_boxes[ref]):
            assert (got[y0, x0:x1 + 1] == red_luma).all()
            assert (got[y0:y1 + 1, x0] == red_luma).all()
        # far corner (margin, no text or boxes there) is untouched
        assert got[0, 0] == img[0, 0]


def test_font_glyphs_distinct_and_shaped():
    from ai_invoice_ocr_engine_spark.sources.viz import (
        _FONT5x7, _FONT_H, _FONT_W, _glyph_mask)

    # full printable ASCII, every glyph a distinct 7x5 bitmap
    assert set(_FONT5x7) == {chr(c) for c in range(0x20, 0x7F)}
    seen = {tuple(_glyph_mask(ch).ravel()) for ch in _FONT5x7}
    assert len(seen) == len(_FONT5x7)
    for ch in _FONT5x7:
        assert _glyph_mask(ch).shape == (_FONT_H, _FONT_W)
    # hand-checkable shapes: '-' is the single middle row, '.' sits at the
    # bottom, ' ' is empty, unknown chars render the hollow-box tofu
    dash = _glyph_mask("-")
    assert dash[3].all() and dash.sum() == 5
    dot = _glyph_mask(".")
    assert dot[5:7, 1:3].all() and dot.sum() == 4
    assert _glyph_mask(" ").sum() == 0
    tofu = _glyph_mask("é")
    assert tofu[0].all() and tofu[6].all() and tofu[:, 0].all() and tofu[:, 4].all()


def test_render_text_stamp_and_clip():
    from ai_invoice_ocr_engine_spark.sources.viz import _glyph_mask, render_text

    rgb = np.zeros((20, 40, 3), np.uint8)
    render_text(rgb, 2, 3, "-.", (255, 0, 0), scale=1)
    # first glyph cell at (3:10, 2:7) matches the '-' bitmap on the R channel
    assert (rgb[3:10, 2:7, 0] > 0).tolist() == _glyph_mask("-").tolist()
    # second glyph starts one spacing column later (x = 2 + 6)
    assert (rgb[3:10, 8:13, 0] > 0).tolist() == _glyph_mask(".").tolist()
    assert (rgb[:, :, 1] == 0).all() and (rgb[:, :, 2] == 0).all()
    # scale=2 doubles the cell; off-frame stamps clip instead of raising
    rgb2 = np.zeros((20, 40, 3), np.uint8)
    render_text(rgb2, 0, 0, "X", (0, 255, 0), scale=2)
    assert (rgb2[0:14, 0:10, 1] > 0).tolist() == np.repeat(
        np.repeat(_glyph_mask("X"), 2, 0), 2, 1).tolist()
    render_text(rgb2, -4, -30, "ab", (9, 9, 9))   # fully above: no-op
    render_text(rgb2, 38, 18, "zz", (9, 9, 9))    # bottom-right corner clip
    assert rgb2.shape == (20, 40, 3)


def test_draw_ocr_result_labels_and_outline():
    from ai_invoice_ocr_engine_spark.sources.viz import draw_ocr_result

    img = np.full((60, 120), 220, np.uint8)
    out = draw_ocr_result(img, [[10, 30, 60, 45], [70, 30, 110, 45]],
                          ["inv", "42"], [0.5, 0.25], font_size=9)
    c0, c1 = np.array(_COLORS[0], np.uint8), np.array(_COLORS[1], np.uint8)
    # 1px outline exactly on each box, per-index color cycle
    assert (out[30, 10:61] == c0).all() and (out[45, 10:61] == c0).all()
    assert (out[30:46, 10] == c0).all() and (out[30:46, 60] == c0).all()
    assert (out[30, 70:111] == c1).all()
    # label band above the box (y0 - font_size - 2 .. y0) carries the color
    band0 = out[19:30, 10:60]
    assert (band0 == c0).all(axis=2).any()
    band1 = out[19:30, 70:110]
    assert (band1 == c1).all(axis=2).any()
    # interior pixels between outline and label stay the page gray
    assert (out[37, 35] == 220).all()
    # quad inputs draw their edges (diamond), same color cycle
    quad = np.array([[20.0, 50.0], [30.0, 52.0], [28.0, 58.0], [18.0, 56.0]])
    out2 = draw_ocr_result(img, [quad], ["x"], None, font_size=9)
    assert (out2[50, 20] == c0).all() and (out2[58, 28] == c0).all()


def test_draw_mask_blend_math():
    from ai_invoice_ocr_engine_spark.sources.viz import draw_mask

    img = np.full((4, 4), 100, np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    mask[1:3, 1:3] = 1
    out = draw_mask(img, mask, alpha=0.5, color=(0, 255, 0))
    assert tuple(out[1, 1]) == (50, 178, 50)   # 0.5*100 + 0.5*(0,255,0)
    assert tuple(out[0, 0]) == (100, 100, 100)  # unmasked untouched


def test_draw_heatmap_jet_endpoints():
    from ai_invoice_ocr_engine_spark.sources.viz import draw_heatmap

    img = np.zeros((2, 3), np.uint8)
    hm = np.array([[0.0, 0.5, 1.0], [0.0, 0.5, 1.0]])
    out = draw_heatmap(img, hm, alpha=1.0)  # pure colormap at alpha 1
    assert tuple(out[0, 0]) == (0, 0, 128)      # cold end = blue
    assert tuple(out[0, 1]) == (128, 255, 128)  # middle = green
    assert tuple(out[0, 2]) == (128, 0, 0)      # hot end = red
    # mismatched heatmap shape is resized to the frame
    out2 = draw_heatmap(np.zeros((8, 8), np.uint8), np.ones((2, 2)), alpha=1.0)
    assert out2.shape == (8, 8, 3) and tuple(out2[4, 4]) == (128, 0, 0)


def test_create_grid_layout():
    from ai_invoice_ocr_engine_spark.sources.viz import create_grid

    imgs = [np.full((10, 10), v, np.uint8) for v in (0, 60, 120)]
    grid = create_grid(imgs, cols=2, size=(20, 30), padding=5)
    # 2 rows x 2 cols of 20x30 cells + gutters
    assert grid.shape == (2 * 35 + 5, 2 * 25 + 5, 3)
    assert (grid[5:35, 5:25] == 0).all()        # img 0 at (r0, c0)
    assert (grid[5:35, 30:50] == 60).all()      # img 1 at (r0, c1)
    assert (grid[40:70, 5:25] == 120).all()     # img 2 at (r1, c0)
    assert (grid[40:70, 30:50] == 255).all()    # empty cell stays white
    assert (grid[0:5] == 255).all() and (grid[:, 25:30] == 255).all()


def test_annotator_chain():
    from ai_invoice_ocr_engine_spark.sources.viz import Annotator

    out = (Annotator(np.zeros((30, 30), np.uint8))
           .box([5, 5, 25, 25], color=(0, 255, 0), thickness=1)
           .line((0, 0), (29, 29), color=(255, 0, 0), thickness=1)
           .circle((15, 15), 4, color=(0, 0, 255), thickness=-1)
           .text((6, 26), "ok", color=(255, 255, 0))
           .result())
    assert tuple(out[5, 15]) == (0, 255, 0)     # box top edge
    assert tuple(out[0, 0]) == (255, 0, 0)      # diagonal line endpoints
    assert tuple(out[29, 29]) == (255, 0, 0)
    assert tuple(out[15, 15]) == (0, 0, 255)    # filled circle center
    assert tuple(out[15, 12]) == (0, 0, 255)    # ...and radius-3 interior
    assert (out[26:33, 6:17] == (255, 255, 0)).all(axis=2).any()  # label


def test_write_viz_labeled_end_to_end(spark, tmp_path):
    """CLI --labels path: one _vis.png per frame, decodable, with overlay
    pixels present and page pixels preserved away from boxes/labels."""
    from ai_invoice_ocr_engine_spark.sources.viz import write_viz_labeled

    rng = np.random.default_rng(99)
    rows, imgs = [], {}
    for i in range(2):
        img, _ = FX.render_media(rng, 260, 180, header_footer=False)
        imgs[f"m{i}"] = img
        rows.append((f"m{i}", bytearray(K.encode_synf(img))))
    media = spark.createDataFrame(rows, "media_ref string, image binary")
    out = str(tmp_path / "vizlab")
    rep = {r.media_ref: r for r in write_viz_labeled(media, out).collect()}
    assert set(rep) == {"m0", "m1"}
    for ref, r in rep.items():
        assert r.n_boxes > 0 and r.path.endswith("_vis.png")
        got = K.decode_image(open(r.path, "rb").read())
        assert got.shape == imgs[ref].shape
        assert (got != imgs[ref]).any()          # overlay drew something
        assert got[0, 0] == imgs[ref][0, 0]      # far corner untouched


def test_write_viz_is_single_crossing(spark):
    """Plan shape: the sink is join → ONE MapInPandas, no extra shuffle
    beyond the join itself (broadcast when the boxes side is small)."""
    media = spark.createDataFrame(
        [("m0", bytearray(K.encode_synf(np.full((16, 16), 255, np.uint8))))],
        "media_ref string, image binary",
    )
    boxes = spark.createDataFrame([("m0", [[1.0, 1.0, 8.0, 8.0]])],
                                  "media_ref string, boxes array<array<float>>")
    plan = (write_viz(media, boxes, "/tmp/_viz_plan")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("MapInPandas") == 1
