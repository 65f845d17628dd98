"""Library-API parity tests: the reference engine's object surface
(/root/reference/engine.py:44-91) mirrored over Spark (SURVEY.md §3.2)."""

import numpy as np

from ai_invoice_ocr_engine_spark import kernels as K
from ai_invoice_ocr_engine_spark.api import OCREngineSpark, init
from ai_invoice_ocr_engine_spark.config import ExtractConfig


def test_predict_matches_extract(spark, corpus):
    eng = init(spark)
    docs = spark.read.parquet(corpus["docs_path"])
    media = spark.read.parquet(corpus["media_path"])
    df = eng(docs, media)  # __call__ alias
    assert df.count() == docs.count()
    assert "spans_out" in df.columns


def test_detect_only_matches_kernels(spark, corpus):
    eng = OCREngineSpark(spark)
    media = spark.read.parquet(corpus["media_path"]).limit(5)
    rows = {r.media_ref: r for r in eng.detect_only(media).collect()}
    from ai_invoice_ocr_engine_spark.extractor import detect_frame

    for m in media.collect():
        img = K.decode_image(bytes(m.image))
        boxes, scores = detect_frame(img, eng.cfg)
        got = rows[m.media_ref]
        assert len(got.boxes) == len(boxes)
        for gb, kb in zip(got.boxes, boxes):
            assert np.allclose(gb, kb)


def test_recognize_only_single_line(spark):
    eng = OCREngineSpark(spark)
    from ai_invoice_ocr_engine_spark import fixtures as FX

    rng = np.random.default_rng(13)
    img, _ = FX.render_media(rng, 200, 48, header_footer=False)
    df = spark.createDataFrame(
        [("f0", bytearray(K.encode_synf(img)))], "media_ref string, image binary"
    )
    out = eng.recognize_only(df).collect()
    # whole-frame single-crop recognition: matches the per-crop kernel
    w = K.crnn_weights(eng.cfg.rec.weight_seed)
    want = K.recognize_crop(img, w, h=eng.cfg.rec.h, mw=eng.cfg.rec.mw,
                            min_w=eng.cfg.rec.min_w)
    assert (out[0].text, round(out[0].score, 5)) == (want[0], round(want[1], 5))


def test_stats_and_run(spark, corpus, tmp_path):
    eng = OCREngineSpark(spark)
    assert eng.get_stats() == {"n": 0, "t": 0.0, "avg": 0.0}
    stats = eng.run(
        corpus["docs_path"], corpus["media_path"], str(tmp_path / "out"),
        num_buckets=4,
    )
    s = eng.get_stats()
    assert s["n"] == stats["docs"] > 0 and s["t"] > 0 and s["avg"] > 0
    eng.reset_stats()
    assert eng.get_stats()["n"] == 0


def test_update_config_dotted(spark):
    eng = OCREngineSpark(spark, ExtractConfig())
    eng.update_config(**{"det.th": 0.42, "extract_fields": False})
    assert eng.config.det.th == 0.42
    assert eng.config.extract_fields is False
    eng.update_config(nonexistent=1)  # silently ignored, like the reference
    eng.update_config(**{"extract_fields.x": 1})  # non-dataclass parent: no-op
