"""Page unwarp (cfg.prep.unwarp — F6/K19 made real for the reference's own
fallback path: /root/reference/preprocess/unwarp.py _predict_fallback +
preprocess/core.py:18-25, gated at uwth=0.5; the U-Net flow predictor
remains an external-model seam)."""

import dataclasses

import numpy as np

from ai_invoice_ocr_engine_spark import fixtures as FX
from ai_invoice_ocr_engine_spark import kernels as K
from ai_invoice_ocr_engine_spark.config import ExtractConfig
from ai_invoice_ocr_engine_spark.extractor import extract_media_lines


def _photographed_page(page: np.ndarray, quad: np.ndarray, H_: int, W_: int):
    """Embed a rendered page perspectively into a dark canvas (the
    photographed-document fixture)."""
    ph, pw = page.shape
    Hm = K.homography(quad, np.array([[0, 0], [pw, 0], [pw, ph], [0, ph]], float))
    uu, vv = np.meshgrid(np.arange(W_, dtype=float), np.arange(H_, dtype=float))
    den = Hm[2, 0] * uu + Hm[2, 1] * vv + Hm[2, 2]
    xs = (Hm[0, 0] * uu + Hm[0, 1] * vv + Hm[0, 2]) / den
    ys = (Hm[1, 0] * uu + Hm[1, 1] * vv + Hm[1, 2]) / den
    inside = (xs >= 0) & (xs < pw) & (ys >= 0) & (ys < ph)
    canvas = np.full((H_, W_), 25, np.uint8)
    return np.where(inside, K._bilinear_sample(page, xs, ys), canvas).astype(np.uint8)


def test_find_page_quad_recovers_corners():
    page, _ = FX.render_media(np.random.default_rng(7), 400, 300, header_footer=False)
    quad = np.array([[70, 40], [500, 70], [480, 390], [50, 350]], np.float64)
    canvas = _photographed_page(page, quad, 420, 560)
    q, conf = K.find_page_quad(canvas)
    assert q is not None and conf == 0.7
    assert np.abs(q - quad).max() <= 3.0  # corners within a few pixels


def test_find_page_quad_fails_gracefully():
    # uniform dark frame: no dominant light region -> (None, 0.3), the
    # reference's zero-flow outcome
    dark = np.full((100, 150), 20, np.uint8)
    q, conf = K.find_page_quad(dark)
    assert q is None and conf == 0.3
    out, c2 = K.unwarp_page(dark)
    assert np.array_equal(out, dark) and c2 == 0.3


def test_unwarp_recovers_extraction():
    """The capability the flag buys: a perspectively photographed page
    yields ZERO lines through the normal path; with prep.unwarp the full
    line set comes back with near-upright recognition."""
    page, _ = FX.render_media(np.random.default_rng(7), 400, 300, header_footer=False)
    quad = np.array([[70, 40], [500, 70], [480, 390], [50, 350]], np.float64)
    canvas = _photographed_page(page, quad, 420, 560)
    cfg = ExtractConfig()
    cfg_uw = dataclasses.replace(
        cfg, prep=dataclasses.replace(cfg.prep, unwarp=True)
    )
    w = K.crnn_weights(cfg.rec.weight_seed)
    up = [t for l in extract_media_lines(K.encode_synf(page), cfg, w) for t, _ in l]
    plain = [t for l in extract_media_lines(K.encode_synf(canvas), cfg, w) for t, _ in l]
    unw = [t for l in extract_media_lines(K.encode_synf(canvas), cfg_uw, w) for t, _ in l]
    assert len(plain) == 0
    assert len(unw) == len(up) == 5
    sims = [1 - K.edit_distance(a, b) / max(len(a), len(b)) for a, b in zip(up, unw)]
    assert min(sims) >= 0.7 and float(np.mean(sims)) >= 0.85


def test_unwarp_passthrough_on_flat_page():
    """A normal full-frame page must ride through the unwarp stage
    unchanged (the page quad IS the frame -> identity homography), so
    enabling the flag on a flat corpus costs nothing semantically."""
    page, _ = FX.render_media(np.random.default_rng(11), 400, 300, header_footer=False)
    cfg = ExtractConfig()
    cfg_uw = dataclasses.replace(
        cfg, prep=dataclasses.replace(cfg.prep, unwarp=True)
    )
    w = K.crnn_weights(cfg.rec.weight_seed)
    a = extract_media_lines(K.encode_synf(page), cfg, w)
    b = extract_media_lines(K.encode_synf(page), cfg_uw, w)
    assert a == b and len(a) > 0
