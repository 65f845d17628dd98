"""Library API — the reference engine's object surface, Spark-shaped.

Mirrors /root/reference/engine.py's public methods one-for-one (SURVEY.md
§3.2) so a user of the reference can move call-site by call-site:

    reference (per-process)              this engine (per-cluster)
    ---------------------------------    -------------------------------------
    OCREngine(cfg)        engine.py:22   OCREngineSpark(spark, cfg)
    predict(imgs)         engine.py:44   predict(docs_df, media_df) -> DataFrame
    __call__              engine.py:61   __call__
    detect_only(img)      engine.py:64   detect_only(media_df) -> boxes/scores DF
    recognize_only(crops) engine.py:68   recognize_only(media_df) -> text/score DF
    get_stats()           engine.py:72   get_stats()
    reset_stats()         engine.py:75   reset_stats()
    warmup(n)             engine.py:78   warmup(n)
    config property       engine.py:84   config property
    update_config(**kw)   engine.py:87   update_config(**kw)  (dotted keys too)

Stats semantics follow the reference (count + wall seconds + derived avg,
/root/reference/engine.py:26,54,72-74) at job granularity: lazy
DataFrame-returning calls don't tick them; the materializing ``run`` (the
CLI/spark-submit path) does.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

from . import kernels as K
from .config import ExtractConfig
from .pipeline import extract, run_extract

DETECT_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("boxes", ArrayType(ArrayType(FloatType()))),
        StructField("scores", ArrayType(FloatType())),
    ]
)

RECOGNIZE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("text", StringType()),
        StructField("score", FloatType()),
    ]
)


class OCREngineSpark:
    """The reference OCREngine's surface over Spark DataFrames."""

    def __init__(self, spark: SparkSession, cfg: ExtractConfig | None = None):
        self.spark = spark
        self.cfg = cfg or ExtractConfig()
        self._stats = {"n": 0, "t": 0.0}

    # -- full pipeline ----------------------------------------------------

    def predict(
        self, docs: DataFrame, media: DataFrame, **kw
    ) -> DataFrame:
        """Lazy extraction plan (engine.py:44-60's predict). Accepts the
        same keyword options as pipeline.extract."""
        return extract(docs, media, self.cfg, **kw)

    __call__ = predict  # engine.py:61-63

    def run(self, docs_path: str, media_path: str, out_dir: str, **kw) -> dict:
        """Materializing job (read → extract → bucketed write + lineage);
        ticks the stats the way the reference's predict does per image."""
        stats = run_extract(
            self.spark, docs_path, media_path, out_dir, cfg=self.cfg, **kw
        )
        self._stats["n"] += stats["docs"]
        self._stats["t"] += stats["secs"]
        return stats

    # -- partial pipelines (testing seams, engine.py:64-71) ---------------

    def detect_only(self, media: DataFrame) -> DataFrame:
        """media(media_ref, image) → per-frame boxes + scores in original
        coordinates (engine.py:64-67: preprocess → detect → rescale)."""
        cfg = self.cfg

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .extractor import detect_frame

            for pdf in batches:
                refs, bxs, scs = [], [], []
                for ref, blob in zip(pdf["media_ref"], pdf["image"]):
                    boxes, scores = detect_frame(K.decode_image(bytes(blob)), cfg)
                    refs.append(ref)
                    bxs.append([[float(v) for v in b] for b in boxes])
                    scs.append([float(s) for s in scores])
                yield pd.DataFrame({"media_ref": refs, "boxes": bxs, "scores": scs})

        return media.select("media_ref", "image").mapInPandas(fn, DETECT_SCHEMA)

    def recognize_only(self, media: DataFrame) -> DataFrame:
        """media(media_ref, image) → whole-frame single-line recognition
        (engine.py:68-71: recognize each input as one crop, optional
        textline-flip correction)."""
        cfg = self.cfg

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            weights = K.resolve_weights(cfg.rec)
            for pdf in batches:
                refs, txts, scs = [], [], []
                crops = []
                for ref, blob in zip(pdf["media_ref"], pdf["image"]):
                    crop = K.decode_image(bytes(blob))
                    if cfg.cls.en:
                        # same per-crop 0/180 gate as the full pipeline
                        # (extractor.extract_media_lines) so the partial
                        # surface cannot diverge from predict()
                        crop = K.correct_textline(crop, th=cfg.cls.th)
                    crops.append(crop)
                    refs.append(ref)
                for (t, s) in K.recognize_crops(
                    crops, weights, h=cfg.rec.h, mw=cfg.rec.mw,
                    min_w=cfg.rec.min_w, decode=cfg.rec.decode,
                    beam_width=cfg.rec.beam_width,
                ):
                    txts.append(t)
                    scs.append(float(s))
                yield pd.DataFrame({"media_ref": refs, "text": txts, "score": scs})

        return media.select("media_ref", "image").mapInPandas(fn, RECOGNIZE_SCHEMA)

    # -- stats / warmup / config (engine.py:72-91) ------------------------

    def get_stats(self) -> dict:
        return {**self._stats, "avg": self._stats["t"] / max(self._stats["n"], 1)}

    def reset_stats(self) -> None:
        self._stats = {"n": 0, "t": 0.0}

    def warmup(self, n: int = 3) -> None:
        """Run a tiny synthetic corpus through the full plan n times:
        spawns python workers, broadcasts weights, JITs the kernels
        (engine.py:78-82's protocol). Stats reset afterwards, like the
        reference."""
        from .fixtures import gen_corpus

        docs, media = gen_corpus(seed=7, n_docs=8, max_media_side=192)
        ddf = self.spark.createDataFrame(
            [(d["doc_id"], d["spans"]) for d in docs],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        mdf = self.spark.createDataFrame(
            [(m["media_ref"], bytearray(m["image"])) for m in media],
            "media_ref string, image binary",
        )
        from pyspark.sql import functions as F

        for _ in range(n):
            # NOT a bare .count(): Catalyst prunes the OCR left join under
            # count() (no column of the OCR side is needed), so counting
            # would never spawn python workers or broadcast weights. The
            # checksum aggregate forces the spans_out column and therefore
            # the full OCR stage (same trick as bench.run_extract_bench).
            self.predict(ddf, mdf).agg(
                F.bit_xor(F.xxhash64(F.to_json("spans_out")))
            ).collect()
        self.reset_stats()  # reference resets after warmup (engine.py:82)

    @property
    def config(self) -> ExtractConfig:
        return self.cfg

    def update_config(self, **kw) -> None:
        """Live config update, dotted keys for nested fields
        (engine.py:87-91: 'det.th' → cfg.det.th). Our configs are frozen
        dataclasses, so the update rebuilds rather than mutates; unknown
        keys are silently ignored exactly like the reference."""
        import dataclasses

        cfg = self.cfg
        names = {f.name for f in dataclasses.fields(cfg)}
        for k, v in kw.items():
            if "." in k:
                parent, attr = k.rsplit(".", 1)
                sub = getattr(cfg, parent, None)
                if dataclasses.is_dataclass(sub) and any(
                    f.name == attr for f in dataclasses.fields(sub)
                ):
                    cfg = dataclasses.replace(
                        cfg, **{parent: dataclasses.replace(sub, **{attr: v})}
                    )
            elif k in names:
                cfg = dataclasses.replace(cfg, **{k: v})
        self.cfg = cfg


#: per-SparkSession singleton state for init(), mirroring OCREngine._inst/_cfg
_SINGLETON: dict[int, tuple[ExtractConfig | None, OCREngineSpark]] = {}


def init(spark: SparkSession, cfg: ExtractConfig | None = None) -> OCREngineSpark:
    """Module-level constructor mirroring dococr.init
    (/root/reference/__init__.py:5-7) INCLUDING the engine's config-keyed
    singleton contract (/root/reference/engine.py:17-21): repeated init()
    returns the SAME engine — stats accumulate across calls like the
    reference's get_stats — a different cfg replaces the instance, and
    cfg=None never invalidates an existing one. Keyed per SparkSession so
    two sessions never share an engine."""
    key = id(spark)
    prev = _SINGLETON.get(key)
    if prev is None or (cfg is not None and cfg != prev[0]):
        _SINGLETON[key] = (cfg, OCREngineSpark(spark, cfg))
    return _SINGLETON[key][1]
