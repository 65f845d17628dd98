"""S3 annotation-file scan — the reference's label-file readers as Spark
sources (reference data/dataset.py: Dataset._load line format
``path\\tlabel``; DetDataset._load ``path\\tjson([{points, transcription,
illegibility}, ...])``; directory fallback listing image files with empty
labels). The training loop itself stays out of scope; the SCAN is real so
ground-truth labels can be joined against engine output at any scale (the
det_metrics / rec_metrics eval path), parsed entirely by JVM expressions —
split + from_json, no Python per row.

Semantics mirrored from the reference:
* lines without a tab are skipped (``len(parts)>=2``),
* a malformed JSON label skips the LINE (its ``except: continue``) — here
  ``from_json`` yields null, and so does an element missing ``points``
  (``a['points']`` KeyError skips the line there; exists(null points) here),
* ``transcription`` defaults to '' and ``illegibility`` to false (.get),
* extra tabs belong to the label column split only once, like
  ``split('\\t')[1]`` with the tail ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: DetDataset element schema (data/dataset.py:30-32)
DET_ANN_SCHEMA = (
    "array<struct<points:array<array<double>>,"
    "transcription:string,illegibility:boolean>>"
)

#: Dataset._load directory-fallback extensions (data/dataset.py:13-14)
IMAGE_EXTS = (".jpg", ".png", ".jpeg", ".bmp")


def read_rec_annotations(spark: SparkSession, ann_path: str) -> DataFrame:
    """``path\\tlabel`` lines → (path, label). Lines without a tab are
    dropped (reference Dataset._load)."""
    parts = F.split(F.col("value"), "\t")
    return (
        spark.read.text(ann_path)
        .select(
            parts.getItem(0).alias("path"),
            # F.get: null (not an ANSI index error) when the line has no tab
            F.get(parts, 1).alias("label"),
        )
        .filter(F.col("label").isNotNull())
    )


def read_det_annotations(spark: SparkSession, ann_path: str) -> DataFrame:
    """Detection label file → (path, polys, texts, ignore), matching
    DetDataset._load row for row. polys is array<array<array<double>>>
    (one (N, 2) point list per region)."""
    parts = F.split(F.col("value"), "\t")
    ann = F.from_json(F.get(parts, 1), DET_ANN_SCHEMA)
    df = spark.read.text(ann_path).select(
        parts.getItem(0).alias("path"), ann.alias("ann")
    )
    # malformed json -> null; any element missing points -> the reference's
    # KeyError path: the whole line is skipped
    df = df.filter(
        F.col("ann").isNotNull()
        & ~F.exists("ann", lambda a: a.getField("points").isNull())
    )
    return df.select(
        "path",
        F.transform("ann", lambda a: a.getField("points")).alias("polys"),
        F.transform(
            "ann", lambda a: F.coalesce(a.getField("transcription"), F.lit(""))
        ).alias("texts"),
        F.transform(
            "ann", lambda a: F.coalesce(a.getField("illegibility"), F.lit(False))
        ).alias("ignore"),
    )


def scan_image_dir(spark: SparkSession, root: str) -> DataFrame:
    """Directory fallback (no annotation file): list image files under
    ``root`` as (path, label='') — binaryFile listing with the content
    column pruned away, so only the file index is read, not the bytes."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path")
    )
    ext_ok = F.lower(F.col("path")).endswith(IMAGE_EXTS[0])
    for e in IMAGE_EXTS[1:]:
        ext_ok = ext_ok | F.lower(F.col("path")).endswith(e)
    return df.filter(ext_ok).select("path", F.lit("").alias("label"))


def det_annotations_to_boxes(ann: DataFrame) -> DataFrame:
    """Ground-truth polys → AABB boxes [x0, y0, x1, y1] per region (the
    engine's detection geometry), legible regions only — the join-ready
    shape for metrics.det_metrics against detect_only output. Pure
    higher-order array expressions, no Python."""
    legible = F.filter(
        F.arrays_zip("polys", "ignore"), lambda z: ~z.getField("ignore")
    )
    polys = F.transform(legible, lambda z: z.getField("polys"))
    box = lambda p: F.array(  # noqa: E731
        F.array_min(F.transform(p, lambda q: q.getItem(0))),
        F.array_min(F.transform(p, lambda q: q.getItem(1))),
        F.array_max(F.transform(p, lambda q: q.getItem(0))),
        F.array_max(F.transform(p, lambda q: q.getItem(1))),
    )
    return ann.select("path", F.transform(polys, box).alias("gt_boxes"))
