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
