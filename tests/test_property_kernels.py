"""Hypothesis property tests for the layout/decode kernels.

The reference's layout semantics (SURVEY.md §2.5 W2/W4) are defined by
invariants, not examples — property tests pin them over arbitrary box
configurations, including the first-y-anchor subtlety the window-lag
formulation would get wrong (/root/reference/postprocess.py:54-68)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ai_invoice_ocr_engine_spark import kernels as K

boxes_strategy = st.lists(
    st.tuples(
        st.floats(0, 500, allow_nan=False, width=32),
        st.floats(0, 500, allow_nan=False, width=32),
        st.floats(1, 200, allow_nan=False, width=32),
        st.floats(1, 40, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=40,
)


def _to_boxes(raw):
    if not raw:
        return np.zeros((0, 4), np.float32)
    a = np.array([(x, y, x + w, y + h) for x, y, w, h in raw], np.float32)
    return a


@settings(max_examples=150, deadline=None)
@given(boxes_strategy)
def test_reading_order_invariants(raw):
    boxes = _to_boxes(raw)
    items = list(range(len(boxes)))
    lines = K.reading_order_lines(boxes, items, line_th=10.0)
    flat = [it for line in lines for (_b, it) in line]
    # 1. permutation: every item exactly once
    assert sorted(flat) == items
    ys = (boxes[:, 1] + boxes[:, 3]) / 2.0 if len(boxes) else np.zeros(0)
    xs = (boxes[:, 0] + boxes[:, 2]) / 2.0 if len(boxes) else np.zeros(0)
    prev_anchor = None
    for line in lines:
        idxs = [it for (_b, it) in line]
        # 2. within a line, left-to-right by x_mean
        lx = [float(xs[i]) for i in idxs]
        assert lx == sorted(lx)
        # 3. first-y anchor: every member within line_th of the line's FIRST
        # item's y (in (y, x) scan order), the reference's exact rule
        scan = sorted(idxs, key=lambda i: (float(ys[i]), float(xs[i])))
        anchor = float(ys[scan[0]])
        assert all(abs(float(ys[i]) - anchor) <= 10.0 for i in idxs)
        # 4. lines advance strictly: next anchor is > prev anchor + th
        if prev_anchor is not None:
            assert anchor > prev_anchor + 10.0
        prev_anchor = anchor


@settings(max_examples=150, deadline=None)
@given(boxes_strategy)
def test_paragraph_grouping_invariants(raw):
    boxes = _to_boxes(raw)
    texts = [f"t{i}" for i in range(len(boxes))]
    paras = K.group_paragraphs(boxes, texts, para_th=30.0)
    flat = [t for p in paras for t in p]
    assert sorted(flat) == sorted(texts)
    assert all(len(p) > 0 for p in paras)


@settings(max_examples=100, deadline=None)
@given(
    boxes_strategy,
    st.lists(st.floats(0, 1, allow_nan=False, width=32), min_size=0, max_size=40),
)
def test_nms_kept_pairwise_below_threshold(raw, scores):
    boxes = _to_boxes(raw)
    n = min(len(boxes), len(scores))
    boxes, sc = boxes[:n], np.array(scores[:n], np.float32)
    keep = K.nms(boxes, sc, th=0.5)
    assert len(set(keep)) == len(keep)
    for i, a in enumerate(keep):
        for b in keep[i + 1 :]:
            assert K.aabb_iou(boxes[a], boxes[b]) < 0.5


@settings(max_examples=150, deadline=None)
@given(
    st.integers(1, 60),
    st.integers(0, 2**32 - 1),
)
def test_ctc_greedy_bounds(t_steps, seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 4, size=(t_steps, K.VOCAB_SIZE)).astype(np.float32)
    text, score = K.ctc_greedy(logits)
    # token count (idx 1 renders as the 5-char '<unk>') is bounded by steps
    assert len(text.replace("<unk>", "?")) <= t_steps
    assert 0.0 <= score <= 1.0
    # determinism
    assert (text, score) == K.ctc_greedy(logits)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(2, 300),
    st.integers(2, 300),
    st.integers(2, 300),
    st.integers(2, 300),
    st.integers(0, 2**32 - 1),
)
def test_resize_bounds_and_identity(h, w, nh, nw, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = K.resize_bilinear(img, nh, nw)
    assert out.shape == (nh, nw) and out.dtype == np.uint8
    # interpolation never exceeds the source value range
    assert out.min() >= img.min() and out.max() <= img.max()
    assert np.array_equal(K.resize_bilinear(img, h, w), img)


def test_fused_r2_morphology_equivalence():
    """_dilate3_r2/_erode3_r2 (one separable radius-2 pass pair) must be
    bit-identical to chaining the radius-1 ops twice — the bandwidth
    optimization in detect_prob must not change a single pixel."""
    import numpy as np

    from ai_invoice_ocr_engine_spark import kernels as K

    rng = np.random.default_rng(0)
    for _ in range(30):
        m = rng.random((int(rng.integers(3, 90)), int(rng.integers(3, 90)))) < 0.3
        assert np.array_equal(K._dilate3_r2(m), K._dilate3(K._dilate3(m)))
        assert np.array_equal(K._erode3_r2(m), K._erode3(K._erode3(m)))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(2, 40),
    st.integers(2, 60),
    st.integers(0, 2**32 - 1),
    st.floats(0.02, 0.95),
)
def test_fax_codecs_roundtrip_property(h, w, seed, density):
    """All three fax encodings are exact inverses over arbitrary bilevel
    masks (shape, density, and seed fuzzed)."""
    from ai_invoice_ocr_engine_spark import fax

    mask = (np.random.default_rng(seed).random((h, w)) < density).astype(np.uint8)
    assert np.array_equal(fax.decode_g4(fax.encode_g4(mask), w, h), mask)
    assert np.array_equal(fax.decode_mh(fax.encode_mh(mask), w, h), mask)
    assert np.array_equal(fax.decode_t4(fax.encode_t4(mask), w, h), mask)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 80), st.integers(0, 60)),
        min_size=1,
        max_size=30,
    )
)
def test_min_area_rect_contains_and_bounds(pts_raw):
    """min_area_rect invariants over arbitrary point sets: (a) every input
    point lies inside the rect (within the half-extent convention), and
    (b) its area never exceeds the axis-aligned extent rect's area (the
    rotating-calipers optimum is at least as tight)."""
    pts = np.array(pts_raw, np.float64)
    quad, w_ext, h_ext = K.min_area_rect(pts)
    # (a) containment: project points onto the rect's axes
    p0 = quad[0].astype(np.float64)
    ux = (quad[1] - quad[0]).astype(np.float64)
    uy = (quad[3] - quad[0]).astype(np.float64)
    nx = np.hypot(*ux)
    ny = np.hypot(*uy)
    if nx > 1e-9 and ny > 1e-9:
        rel = pts - p0
        pu = rel @ (ux / nx)
        pv = rel @ (uy / ny)
        eps = 1e-3  # quad is float32; extents O(100)
        assert (pu >= -eps).all() and (pu <= nx + eps).all()
        assert (pv >= -eps).all() and (pv <= ny + eps).all()
    # (b) optimality vs the axis-aligned candidate (same +1 extent rule)
    x0, y0 = pts.min(axis=0)
    x1, y1 = pts.max(axis=0)
    aabb_area = (x1 - x0 + 1.0) * (y1 - y0 + 1.0)
    assert w_ext * h_ext <= aabb_area + 1e-6


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(5, 40),
    st.integers(5, 60),
)
def test_crop_quad_axis_aligned_slice_property(seed, h, w):
    """Property form of the bit-for-bit judge criterion: any axis-aligned
    quad (integer or fractional corners) crops identically via crop_quad
    and crop_box."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h + 20, w + 30)).astype(np.uint8)
    x0 = float(rng.uniform(0, 20))
    y0 = float(rng.uniform(0, 15))
    x1 = x0 + float(rng.uniform(2, w))
    y1 = y0 + float(rng.uniform(2, h))
    quad = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)
    box = np.array([x0, y0, x1, y1], np.float32)
    assert np.array_equal(K.crop_quad(img, quad), K.crop_box(img, box))
