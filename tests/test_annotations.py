"""S3 annotation-file scan: reference data/dataset.py label-file semantics
(Dataset._load / DetDataset._load) reproduced by the Spark source, checked
against an independent pure-python reimplementation of the reference loop."""

import json

import numpy as np

from ai_invoice_ocr_engine_spark.sources.annotations import (
    det_annotations_to_boxes,
    read_det_annotations,
    read_rec_annotations,
    scan_image_dir,
)


def _ref_det_load(lines):
    """data/dataset.py:24-33 verbatim in python (the oracle)."""
    out = []
    for line in lines:
        parts = line.strip().split("\t")
        if len(parts) < 2:
            continue
        try:
            ann = json.loads(parts[1])
            polys = [np.array(a["points"], dtype=np.float32) for a in ann]
            txts = [a.get("transcription", "") for a in ann]
            ign = [a.get("illegibility", False) for a in ann]
            out.append({"path": parts[0], "polys": polys, "texts": txts, "ignore": ign})
        except Exception:
            continue
    return out


DET_LINES = [
    "img1.png\t" + json.dumps(
        [
            {"points": [[0, 0], [10, 0], [10, 5], [0, 5]], "transcription": "inv"},
            {"points": [[2, 8], [20, 8], [20, 14], [2, 14]],
             "transcription": "total", "illegibility": True},
        ]
    ),
    "img2.png\t" + json.dumps([{"points": [[1, 1], [4, 1], [4, 3], [1, 3]]}]),
    "no_tab_line_skipped.png",
    "img3.png\tnot valid json {{{",
    "img4.png\t" + json.dumps([{"transcription": "missing points"}]),
    "img5.png\t" + json.dumps([]),
]


def test_det_annotations_match_reference_loader(spark, tmp_path):
    f = tmp_path / "det_ann.txt"
    f.write_text("\n".join(DET_LINES), encoding="utf-8")
    got = {r.path: r for r in read_det_annotations(spark, str(f)).collect()}
    want = _ref_det_load(DET_LINES)
    assert sorted(got) == sorted(w["path"] for w in want) == [
        "img1.png", "img2.png", "img5.png"]
    for w in want:
        r = got[w["path"]]
        assert [list(map(list, p)) for p in r.polys] == [
            p.tolist() for p in w["polys"]]
        assert list(r.texts) == w["texts"]
        assert list(r.ignore) == w["ignore"]
    # defaults mirrored: missing transcription -> '', missing illegibility -> False
    assert got["img2.png"].texts == [""] and got["img2.png"].ignore == [False]
    assert got["img1.png"].ignore == [False, True]


def test_det_annotations_to_metric_boxes(spark, tmp_path):
    f = tmp_path / "det_ann.txt"
    f.write_text(DET_LINES[0] + "\n" + DET_LINES[1], encoding="utf-8")
    ann = read_det_annotations(spark, str(f))
    boxes = {r.path: r.gt_boxes for r in det_annotations_to_boxes(ann).collect()}
    # illegible region dropped; poly -> AABB
    assert boxes["img1.png"] == [[0.0, 0.0, 10.0, 5.0]]
    assert boxes["img2.png"] == [[1.0, 1.0, 4.0, 3.0]]
    # the shape feeds det_metrics directly: perfect self-match
    from ai_invoice_ocr_engine_spark.metrics import det_metrics

    m = det_metrics(np.array(boxes["img1.png"]), np.array(boxes["img1.png"]))
    # reference keeps eps=1e-6 in the denominators (train/metrics.py)
    assert m["precision"] > 0.999 and m["recall"] > 0.999


def test_rec_annotations_and_dir_fallback(spark, tmp_path):
    f = tmp_path / "rec_ann.txt"
    f.write_text("a.png\thello\nb.png\tworld extra\ttail\nskipped_no_tab\n",
                 encoding="utf-8")
    got = {r.path: r.label for r in read_rec_annotations(spark, str(f)).collect()}
    # split('\t')[1]: the tail after a second tab is ignored, like the reference
    assert got == {"a.png": "hello", "b.png": "world extra"}

    d = tmp_path / "imgs"
    d.mkdir()
    for name in ("x.PNG", "y.jpg", "z.txt", "w.jpeg"):
        (d / name).write_bytes(b"\x00")
    rows = scan_image_dir(spark, str(d)).collect()
    names = sorted(r.path.rsplit("/", 1)[1] for r in rows)
    assert names == ["w.jpeg", "x.PNG", "y.jpg"]  # extension filter, any case
    assert all(r.label == "" for r in rows)
