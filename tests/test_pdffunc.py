"""PDF function objects (ISO 32000-1 §7.10) and Lab conversion — unit
pins for pdffunc.py. Expected values are hand-computed from the spec's
formulas (§7.10.2 sampled interpolation, §7.10.3 exponential, §7.10.4
stitching, §7.10.5 PostScript calculator, §8.6.5.4 Lab)."""

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark.pdffunc import (
    _ps_exec,
    _ps_tokenize,
    lab_to_rgb255,
    make_function,
)

_RES = lambda x: x  # noqa: E731 — identity resolve for direct objects
_FILT = lambda raw, d, r: raw  # noqa: E731


class _S:
    """Minimal stream stand-in (the pdf.py _Stream surface pdffunc uses)."""

    def __init__(self, d, raw):
        self.dict, self.raw = d, raw


def _f(obj):
    return make_function(obj, _RES, _FILT)


def test_type2_exponential():
    f = _f({"FunctionType": 2, "Domain": [0, 1],
            "C0": [0.0, 0.0], "C1": [1.0, 0.5], "N": 2})
    assert f((0.5,)) == (0.25, 0.125)
    assert f((0.0,)) == (0.0, 0.0)
    assert f((1.0,)) == (1.0, 0.5)
    # Domain clamp (§7.10.1): out-of-domain inputs clip, never extrapolate
    assert f((2.0,)) == (1.0, 0.5)
    assert f((-1.0,)) == (0.0, 0.0)


def test_type2_defaults_and_range_clamp():
    # C0 defaults [0], C1 defaults [1], N linear; Range clips outputs
    f = _f({"FunctionType": 2, "Domain": [0, 1], "N": 1,
            "C0": [-0.5], "C1": [1.5], "Range": [0, 1]})
    assert f((0.0,)) == (0.0,)   # -0.5 clamped up
    assert f((1.0,)) == (1.0,)   # 1.5 clamped down
    assert f((0.5,)) == (0.5,)


def test_type3_stitching():
    up = {"FunctionType": 2, "Domain": [0, 1], "C0": [0.0], "C1": [1.0],
          "N": 1}
    down = {"FunctionType": 2, "Domain": [0, 1], "C0": [1.0], "C1": [0.0],
            "N": 1}
    f = _f({"FunctionType": 3, "Domain": [0, 1], "Bounds": [0.5],
            "Encode": [0, 1, 0, 1], "Functions": [up, down]})
    # x=0.25 → first piece, encoded to 0.5 → 0.5; x=0.75 → second, 0.5 → 0.5
    assert f((0.25,)) == (0.5,)
    assert f((0.75,)) == (0.5,)
    # boundary belongs to the RIGHT piece (x >= bound)
    assert f((0.5,)) == (1.0,)
    # piece-reversing Encode
    g = _f({"FunctionType": 3, "Domain": [0, 1], "Bounds": [0.5],
            "Encode": [1, 0, 0, 1], "Functions": [up, down]})
    assert g((0.0,)) == (1.0,)


def test_type0_sampled_1d():
    f = _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
               "Size": [2], "BitsPerSample": 8}, bytes([0, 255])))
    assert f((0.0,)) == (0.0,)
    assert f((1.0,)) == (1.0,)
    assert f((0.5,)) == (0.5,)
    # 3-point table interpolates within the right cell
    g = _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
               "Size": [3], "BitsPerSample": 8}, bytes([0, 255, 0])))
    assert g((0.25,)) == (0.5,)
    assert g((0.5,)) == (1.0,)
    assert g((0.75,)) == (0.5,)


def test_type0_sampled_2d_bilinear():
    # first input dimension varies fastest (§7.10.2):
    # samples are (x0y0, x1y0, x0y1, x1y1)
    f = _f(_S({"FunctionType": 0, "Domain": [0, 1, 0, 1], "Range": [0, 1],
               "Size": [2, 2], "BitsPerSample": 8},
              bytes([0, 100, 200, 255])))
    assert f((0, 0)) == (0.0,)
    assert f((1, 0)) == (100 / 255,)
    assert f((0, 1)) == (200 / 255,)
    assert f((1, 1)) == (1.0,)
    assert f((0.5, 0.5)) == ((0 + 100 + 200 + 255) / 4 / 255,)


def test_type0_subbyte_and_wide_samples():
    # 4-bit samples: 0xF, 0x0 packed in one byte
    f = _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
               "Size": [2], "BitsPerSample": 4}, bytes([0xF0])))
    assert f((0.0,)) == (1.0,)
    assert f((1.0,)) == (0.0,)
    # 16-bit big-endian
    g = _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 2],
               "Size": [2], "BitsPerSample": 16},
              bytes([0, 0, 0xFF, 0xFF])))
    assert g((1.0,)) == (2.0,)
    # 12-bit: two samples = 3 bytes
    h = _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
               "Size": [2], "BitsPerSample": 12},
              bytes([0xFF, 0xF0, 0x00])))
    assert h((0.0,)) == (1.0,)
    assert h((1.0,)) == (0.0,)


def test_type0_encode_decode_arrays():
    # Encode pins both inputs to the SECOND cell; Decode rescales output
    f = _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 100],
               "Size": [3], "BitsPerSample": 8, "Encode": [2, 2],
               "Decode": [0, 100]}, bytes([0, 128, 255])))
    assert f((0.0,)) == (100.0,)
    assert f((1.0,)) == (100.0,)


def test_type0_loud_errors():
    with pytest.raises(ValueError):
        _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
               "Size": [4], "BitsPerSample": 8}, bytes([0])))
    with pytest.raises(NotImplementedError):
        _f(_S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
               "Size": [2], "BitsPerSample": 8, "Order": 3},
              bytes([0, 1])))
    with pytest.raises(ValueError):
        _f({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
            "Size": [2], "BitsPerSample": 8})  # dict, not stream


def _run4(src, args, domain, n_out=1, rng=None):
    f = _f(_S({"FunctionType": 4, "Domain": domain,
               "Range": rng or [-1e9, 1e9] * n_out}, src))
    return f(args)


def test_type4_arithmetic():
    assert _run4(b"{ add 2 div }", (0.2, 0.6), [0, 1, 0, 1]) == (0.4,)
    assert _run4(b"{ 3 mul 1 sub }", (0.5,), [0, 1]) == (0.5,)
    assert _run4(b"{ neg abs sqrt }", (-4.0,), [-10, 10])[0] == 2.0
    assert _run4(b"{ pop 7 3 idiv }", (0.0,), [0, 1]) == (2.0,)
    assert _run4(b"{ pop -7 3 idiv }", (0.0,), [0, 1]) == (-2.0,)
    assert _run4(b"{ pop 7 3 mod }", (0.0,), [0, 1]) == (1.0,)
    assert _run4(b"{ pop 2.5 round }", (0.0,), [0, 1]) == (3.0,)
    assert _run4(b"{ pop -2.5 round }", (0.0,), [0, 1]) == (-3.0,)
    assert _run4(b"{ pop 2.7 truncate }", (0.0,), [0, 1]) == (2.0,)
    assert _run4(b"{ pop 2 3 exp }", (0.0,), [0, 1]) == (8.0,)
    assert _run4(b"{ pop 100 log }", (0.0,), [0, 1]) == (2.0,)
    assert _run4(b"{ pop 90 sin }", (0.0,), [0, 1]) == (1.0,)
    assert _run4(b"{ pop 0 cos }", (0.0,), [0, 1]) == (1.0,)
    # atan: PostScript degrees with quadrant (num den atan)
    assert _run4(b"{ pop 1 1 atan }", (0.0,), [0, 1]) == (45.0,)
    assert _run4(b"{ pop -1 1 atan }", (0.0,), [0, 1]) == (315.0,)


def test_type4_stack_and_conditionals():
    assert _run4(b"{ exch sub }", (0.25, 1.0), [0, 1, 0, 1]) == (0.75,)
    assert _run4(b"{ dup mul }", (0.5,), [0, 1]) == (0.25,)
    assert _run4(b"{ pop 1 2 3 2 copy add add add add }",
                 (0.0,), [0, 1]) == (11.0,)
    assert _run4(b"{ pop 1 2 3 2 index add add add }",
                 (0.0,), [0, 1]) == (7.0,)
    # roll: 3 1 roll rotates top three up by one
    assert _run4(b"{ pop 1 2 3 3 1 roll sub sub }",
                 (0.0,), [0, 1]) == (3.0 - (1.0 - 2.0),)
    assert _run4(b"{ dup 0 lt { neg } if 90 mul }",
                 (-0.5,), [-1, 1]) == (45.0,)
    assert _run4(b"{ 0.5 ge { 1 } { 0 } ifelse }", (0.7,), [0, 1]) == (1.0,)
    assert _run4(b"{ 0.5 ge { 1 } { 0 } ifelse }", (0.3,), [0, 1]) == (0.0,)
    assert _run4(b"{ pop true { 2 } if }", (0.0,), [0, 1]) == (2.0,)
    assert _run4(b"{ pop 6 2 bitshift }", (0.0,), [0, 1]) == (24.0,)
    assert _run4(b"{ pop 6 -1 bitshift }", (0.0,), [0, 1]) == (3.0,)
    assert _run4(b"{ pop 6 3 and }", (0.0,), [0, 1]) == (2.0,)
    assert _run4(b"{ pop true false or { 5 } { 6 } ifelse }",
                 (0.0,), [0, 1]) == (5.0,)


def test_type4_loud_errors():
    with pytest.raises(ValueError):
        _run4(b"{ frobnicate }", (0.0,), [0, 1])
    with pytest.raises(ValueError):
        _run4(b"{ add add add }", (0.0,), [0, 1])  # underflow
    with pytest.raises(ValueError):
        _run4(b"{ pop 1 0 div }", (0.0,), [0, 1])
    with pytest.raises(ValueError):
        _ps_tokenize("{ 1 2 add")  # unbalanced
    with pytest.raises(ValueError):
        # one input on the stack, two outputs demanded
        _run4(b"{ }", (0.5,), [0, 1], n_out=2, rng=[0, 1, 0, 1])
    with pytest.raises(ValueError):
        _run4(b"{ pop { 1 } }", (0.5,), [0, 1])  # procedure as output


def test_type4_comments_and_nesting():
    src = b"{ % tint ramp\n dup 0.5 lt { 2 mul } { pop 1 } ifelse }"
    assert _run4(src, (0.25,), [0, 1]) == (0.5,)
    assert _run4(src, (0.75,), [0, 1]) == (1.0,)


def test_ps_exec_direct():
    st = [2.0, 3.0]
    _ps_exec(_ps_tokenize("{ exch dup mul add }"), st)
    # exch → [3,2]; dup → [3,2,2]; mul → [3,4]; add → [7]
    assert st == [7.0]


def test_lab_anchors():
    wp = [0.9505, 1.0, 1.089]
    assert lab_to_rgb255(np.array([100.0, 0.0, 0.0]), wp).tolist() == [
        255, 255, 255]
    assert lab_to_rgb255(np.array([0.0, 0.0, 0.0]), wp).tolist() == [0, 0, 0]
    # neutral L*=50: Y = ((66/116))^3 = 0.184187…, sRGB-encoded ≈ 119
    assert lab_to_rgb255(np.array([50.0, 0.0, 0.0]), wp).tolist() == [
        119, 119, 119]
    # monotone in L along the neutral axis
    ls = np.stack([np.linspace(0, 100, 21),
                   np.zeros(21), np.zeros(21)], axis=-1)
    out = lab_to_rgb255(ls, wp)[:, 0].astype(int)
    assert (np.diff(out) >= 0).all() and out[0] == 0 and out[-1] == 255
    # positive a* pushes red above green
    c = lab_to_rgb255(np.array([60.0, 40.0, 0.0]), wp)
    assert c[0] > c[1]
    # positive b* pushes yellow (blue drops)
    c = lab_to_rgb255(np.array([60.0, 0.0, 40.0]), wp)
    assert c[2] < c[1]


def test_function_arity_errors():
    f = _f({"FunctionType": 2, "Domain": [0, 1], "C0": [0], "C1": [1],
            "N": 1})
    with pytest.raises(ValueError):
        f((0.5, 0.5))
    with pytest.raises(ValueError):
        _f({"FunctionType": 9, "Domain": [0, 1]})
    with pytest.raises(ValueError):
        _f({"FunctionType": 2, "C0": [0], "C1": [1], "N": 1})  # no Domain
