"""Randomized JPEG 2000 parameter-matrix soak: cross-tests encoder/decoder
knob INTERACTIONS (tiles x precincts x POC x layers x bypass x ROI x ...)
that the per-feature test matrices cover only pairwise.

Reversible streams must round-trip bit-exactly (grayscale via
decode_jpeg2000, RGB at component level); irreversible streams must decode
within a loose error bound. Any exception — including NotImplementedError —
is a failure: every sampled combination is drawn from the supported space.

Usage: python tools/jpx_soak.py [iterations] [master_seed]
Exit 0 = clean; nonzero prints the reproducing kwargs.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from ai_invoice_ocr_engine_spark.jpeg2000 import (  # noqa: E402
    _decode_j2k_components,
    decode_jpeg2000,
    encode_jpeg2000,
)


def _unbox(data: bytes) -> bytes:
    # raw codestream already; jp2 boxing is exercised via decode_jpeg2000
    return data


def random_image(rng, h, w, kind):
    if kind == 0:  # noise
        return rng.integers(0, 256, (h, w), dtype=np.uint8)
    if kind == 1:  # smooth gradient (long zero runs after DWT)
        yy, xx = np.mgrid[0:h, 0:w]
        return ((yy * 3 + xx * 5) % 256).astype(np.uint8)
    # sparse text-like: white page, black strokes
    img = np.full((h, w), 255, dtype=np.uint8)
    for _ in range(max(1, (h * w) // 300)):
        y = int(rng.integers(0, h))
        x = int(rng.integers(0, w))
        img[y, x : min(w, x + int(rng.integers(1, 8)))] = 0
    return img


def random_kwargs(rng, h, w):
    kw: dict = {}
    kw["nl"] = int(rng.integers(1, 5))
    xcb = int(rng.integers(2, 7))
    ycb = int(rng.integers(2, min(7, 13 - xcb)))
    kw["cb"] = (xcb, ycb)
    kw["prog"] = int(rng.integers(0, 5))
    if rng.random() < 0.4:
        kw["tile"] = (int(rng.integers(8, 49)), int(rng.integers(8, 49)))
    if rng.random() < 0.35:
        kw["precincts"] = (int(rng.integers(3, 6)), int(rng.integers(3, 6)))
    kw["sop"] = bool(rng.random() < 0.25)
    kw["eph"] = bool(rng.random() < 0.25)
    kw["layers"] = int(rng.integers(1, 4))
    for flag in ("termall", "causal", "reset", "segsym", "bypass"):
        kw[flag] = bool(rng.random() < 0.25)
    if kw["layers"] > 1 and not (kw["termall"] or kw["bypass"]):
        # fixture-encoder constraint: multi-layer needs per-pass (or
        # bypass-segment) terminations to split codewords across layers
        kw["termall"] = True
    if rng.random() < 0.3:
        kw["split_parts"] = int(rng.integers(2, 5))
    r = rng.random()
    if r < 0.15:
        kw["ppm"] = True
    elif r < 0.3:
        kw["ppt"] = True
    if rng.random() < 0.2 and h >= 8 and w >= 8:
        x0 = int(rng.integers(0, w // 2))
        y0 = int(rng.integers(0, h // 2))
        kw["roi"] = (x0, y0,
                     int(rng.integers(x0 + 1, w + 1)),
                     int(rng.integers(y0 + 1, h + 1)))
    if rng.random() < 0.3:
        kw["lossy"] = True
        kw["qexp_extra"] = int(rng.integers(2, 6))
    kw["jp2"] = bool(rng.random() < 0.3)
    return kw


def one_case(rng, i):
    h = int(rng.integers(1, 71))
    w = int(rng.integers(1, 71))
    kind = int(rng.integers(0, 3))
    rgb = bool(rng.random() < 0.25) and h >= 2 and w >= 2
    kw = random_kwargs(rng, h, w)
    if rgb:
        img = np.stack(
            [random_image(rng, h, w, kind) for _ in range(3)], axis=-1
        )
    else:
        img = random_image(rng, h, w, kind)
    bs = encode_jpeg2000(img, **kw)
    if kw.get("lossy"):
        out = decode_jpeg2000(bs)
        assert out.shape == (h, w), (out.shape, (h, w))
        ref = img if not rgb else None
        if ref is not None:
            err = np.abs(out.astype(int) - ref.astype(int)).mean()
            assert err < 24.0, f"lossy error {err}"
        return
    if rgb:
        if kw.get("jp2"):
            # component access needs the raw codestream; re-encode unboxed
            kw2 = dict(kw)
            kw2["jp2"] = False
            bs = encode_jpeg2000(img, **kw2)
        comps, cinfo = _decode_j2k_components(bs)
        assert len(comps) == 3
        for c in range(3):
            assert np.array_equal(comps[c], img[..., c].astype(np.int64)), (
                f"component {c} mismatch"
            )
    else:
        out = decode_jpeg2000(bs)
        assert np.array_equal(out, img), "reversible gray mismatch"


def component_case(rng, i):
    """Component-domain soak: random subsampling / signed / mixed depths
    through random structural knobs; reversible must round-trip each
    component exactly."""
    h = int(rng.integers(4, 49))
    w = int(rng.integers(4, 49))
    ncomp = int(rng.integers(1, 4))
    comps_in = []
    for _ in range(ncomp):
        depth = int(rng.integers(2, 15))
        signed = bool(rng.random() < 0.4)
        xr = int(rng.integers(1, 3))
        yr = int(rng.integers(1, 3))
        ch = (h + yr - 1) // yr
        cw = (w + xr - 1) // xr
        lo, hi = (-(1 << (depth - 1)), 1 << (depth - 1)) if signed else (
            0, 1 << depth)
        comps_in.append({
            "data": rng.integers(lo, hi, (ch, cw), np.int64),
            "depth": depth, "signed": signed, "xr": xr, "yr": yr,
        })
    kw = {"nl": int(rng.integers(1, 4)),
          "prog": int(rng.integers(0, 5)),
          "size": (w, h)}
    if rng.random() < 0.3:
        kw["tile"] = (int(rng.integers(12, 41)), int(rng.integers(12, 41)))
    if rng.random() < 0.25:
        kw["precincts"] = (int(rng.integers(3, 6)), int(rng.integers(3, 6)))
    if rng.random() < 0.2:
        kw["layers"] = 2
        kw["termall"] = True
    kw["eph"] = bool(rng.random() < 0.2)
    bs = encode_jpeg2000(None, components=comps_in, **kw)
    comps, cinfo = _decode_j2k_components(bs)
    assert len(comps) == ncomp
    for c in range(ncomp):
        spec = comps_in[c]
        assert cinfo[c] == (spec["depth"], spec["signed"],
                            spec["xr"], spec["yr"]), (cinfo[c], spec)
        assert np.array_equal(comps[c], spec["data"]), f"component {c}"


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260820
    rng = np.random.default_rng(seed)
    for i in range(iters):
        state = rng.bit_generator.state
        try:
            if i % 3 == 2:
                component_case(rng, i)
            else:
                one_case(rng, i)
        except Exception as e:
            print(f"FAIL at iteration {i}: {type(e).__name__}: {e}")
            print(f"reproduce: seed state before case = {state}")
            return 1
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{iters} clean")
    print(f"soak clean: {iters} random knob combinations")
    return 0


if __name__ == "__main__":
    sys.exit(main())
