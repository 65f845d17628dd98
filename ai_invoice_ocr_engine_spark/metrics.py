"""Evaluation metrics (test-side) — SURVEY.md §2.4 A4-A7.

Re-expresses /root/reference/train/metrics.py: greedy-IoU detection P/R/F1,
recognition accuracy/NED/CER, classification confusion matrix, and the mAP
sweep — numpy/python versions for oracle-side use plus Spark DataFrame
variants (groupBy aggregations + an Arrow-batched edit-distance UDF) for
corpus-scale evaluation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from . import kernels as K


def det_metrics(
    pred_boxes: np.ndarray,
    gt_boxes: np.ndarray,
    iou_th: float = 0.5,
    gt_ignore: list[bool] | None = None,
) -> dict:
    """Greedy max-IoU matching P/R/F1 — /root/reference/train/metrics.py:4-28
    verbatim (a theta nested-loop join with argmax aggregation, SURVEY §2.3):
    each prediction matches its best unmatched non-ignored gt; TP when best
    IoU >= th. Epsilon 1e-6 in the ratios as in the reference."""
    if gt_ignore is None:
        gt_ignore = [False] * len(gt_boxes)
    matched: set[int] = set()
    tp = fp = 0
    for pb in pred_boxes:
        best_iou, best_idx = 0.0, -1
        for j, (gb, ig) in enumerate(zip(gt_boxes, gt_ignore)):
            if ig or j in matched:
                continue
            iou = K.aabb_iou(pb, gb)
            if iou > best_iou:
                best_iou, best_idx = iou, j
        if best_iou >= iou_th:
            tp += 1
            matched.add(best_idx)
        else:
            fp += 1
    fn = sum(1 for i, ig in enumerate(gt_ignore) if not ig and i not in matched)
    p = tp / (tp + fp + 1e-6)
    r = tp / (tp + fn + 1e-6)
    return {
        "precision": p,
        "recall": r,
        "f1": 2 * p * r / (p + r + 1e-6),
        "tp": tp,
        "fp": fp,
        "fn": fn,
    }


def mean_ap(pred_boxes, gt_boxes, iou_ths=None) -> float:
    """mAP sweep — /root/reference/train/metrics.py:62-68 (mean of precision
    over 10 IoU thresholds)."""
    if iou_ths is None:
        iou_ths = [0.5 + 0.05 * i for i in range(10)]
    return float(
        np.mean([det_metrics(pred_boxes, gt_boxes, th)["precision"] for th in iou_ths])
    )


def rec_metrics(preds: list[str], gts: list[str]) -> dict:
    """accuracy / NED / CER — /root/reference/train/metrics.py:29-49."""
    correct = ed_sum = len_sum = 0
    cer_sum = 0.0
    for p, g in zip(preds, gts):
        if p == g:
            correct += 1
        ed = K.edit_distance(p, g)
        ed_sum += ed
        len_sum += max(len(p), len(g))
        cer_sum += ed / max(len(g), 1)
    total = len(preds)
    return {
        "accuracy": correct / max(total, 1),
        "ned": 1 - ed_sum / max(len_sum, 1),
        "cer": cer_sum / max(total, 1),
        "correct": correct,
        "total": total,
    }


def confusion_matrix(preds: list[int], gts: list[int], n_cls: int = 4) -> np.ndarray:
    """/root/reference/train/metrics.py:50-61 (ClsMetrics update)."""
    cm = np.zeros((n_cls, n_cls), dtype=np.int32)
    for p, g in zip(preds, gts):
        if 0 <= p < n_cls and 0 <= g < n_cls:
            cm[g, p] += 1
    return cm


# ---------------------------------------------------------------------------
# Spark-side corpus evaluation
# ---------------------------------------------------------------------------


def edit_distance_udf():
    """Arrow-batched edit distance (A5 at corpus scale). Built lazily — a
    pandas_udf needs an active SparkSession to parse its return type."""

    @pandas_udf("int")
    def _ed(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [K.edit_distance(x or "", y or "") for x, y in zip(a, b)], dtype="int64"
        )

    return _ed


def rec_metrics_df(pairs: DataFrame, pred_col: str = "pred", gt_col: str = "gt") -> DataFrame:
    """Corpus-level accuracy/NED/CER over a (pred, gt) DataFrame."""
    ed = edit_distance_udf()
    scored = pairs.select(
        F.col(pred_col).alias("p"),
        F.col(gt_col).alias("g"),
        ed(F.col(pred_col), F.col(gt_col)).alias("ed"),
    ).select(
        "ed",
        (F.col("p") == F.col("g")).cast("int").alias("ok"),
        F.greatest(F.length("p"), F.length("g")).alias("mx"),
        (F.col("ed") / F.greatest(F.length("g"), F.lit(1))).alias("cer_i"),
    )
    return scored.agg(
        F.round(F.avg("ok"), 6).alias("accuracy"),
        F.round(1 - F.sum("ed") / F.greatest(F.sum("mx"), F.lit(1)), 6).alias("ned"),
        F.round(F.avg("cer_i"), 6).alias("cer"),
        F.sum("ok").alias("correct"),
        F.count(F.lit(1)).alias("total"),
    )


def confusion_df(pairs: DataFrame, pred_col: str = "pred", gt_col: str = "gt") -> DataFrame:
    """groupBy(gt, pred).count() — the distributed confusion matrix (A6)."""
    return (
        pairs.groupBy(F.col(gt_col).alias("gt"), F.col(pred_col).alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def span_equality_report(result: DataFrame, golden: DataFrame) -> DataFrame:
    """J4 golden-comparison join: per-doc exact span-sequence equality via a
    full outer join on doc_id + canonical JSON comparison; aggregates to
    (n_docs, n_equal, pass_rate)."""
    a = result.select("doc_id", F.to_json("spans_out").alias("a_spans"))
    b = golden.select("doc_id", F.to_json("spans_out").alias("b_spans"))
    j = a.join(b, "doc_id", "full_outer").select(
        (
            F.col("a_spans").isNotNull()
            & F.col("b_spans").isNotNull()
            & (F.col("a_spans") == F.col("b_spans"))
        ).cast("int").alias("eq")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("eq").alias("n_equal"),
        F.round(F.avg("eq"), 6).alias("pass_rate"),
    )
