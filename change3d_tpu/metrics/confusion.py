"""Detection metrics: on-device confusion matrices + score derivations.

The reference computes all detection metrics on the host with numpy bincount
per batch (ref: /root/reference/utils/metric_tool.py:111-128,
/root/reference/model/utils.py:321-328,467-472) — a device->host copy every
step. Here the confusion matrix is accumulated *inside* the jitted step as a
one-hot MXU matmul (classes are tiny: 2/5/7), psum-able across the data mesh,
and only the final KxK matrix ever reaches the host.

Score formulas replicate:
- binary scores (Kappa/IoU/F1/OA/recall/precision):
  /root/reference/utils/metric_tool.py:87-108
- SCD (Fscd, mIoU, SeK): /root/reference/model/utils.py:345-377
- BDA (loc F1, per-damage-class F1, overall):
  /root/reference/model/utils.py:403-423 + /root/reference/scripts/train_BDA.py:140-143
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_EPS32 = float(np.finfo(np.float32).eps)


def confusion_matrix(gt: jax.Array, pred: jax.Array, num_classes: int) -> jax.Array:
    """[K, K] confusion matrix (rows = gt, cols = pred), fp32, on device.

    Pixels with gt outside [0, K) are ignored (reference mask semantics,
    ref: /root/reference/utils/metric_tool.py:120). Implemented as
    onehot(gt)^T @ onehot(pred): an MXU-friendly [K, N] x [N, K] matmul.
    """
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    gt_oh = jax.nn.one_hot(jnp.where(valid, gt, 0), num_classes, dtype=jnp.float32)
    gt_oh = gt_oh * valid[:, None]
    pred_oh = jax.nn.one_hot(jnp.clip(pred, 0, num_classes - 1), num_classes, dtype=jnp.float32)
    return jnp.einsum("ng,np->gp", gt_oh, pred_oh, preferred_element_type=jnp.float32)


def binary_change_scores(cm: np.ndarray) -> Dict[str, float]:
    """ConfuseMatrixMeter.get_scores equivalents (2x2 matrix)."""
    cm = np.asarray(cm, np.float64)
    tp, fn, fp, tn = cm[1, 1], cm[1, 0], cm[0, 1], cm[0, 0]
    oa = (tp + tn) / (tp + fn + fp + tn + _EPS32)
    recall = tp / (tp + fn + _EPS32)
    precision = tp / (tp + fp + _EPS32)
    f1 = 2 * recall * precision / (recall + precision + _EPS32)
    iou = tp / (tp + fp + fn + _EPS32)
    pre = ((tp + fn) * (tp + fp) + (tn + fp) * (tn + fn)) / (tp + fp + tn + fn) ** 2
    kappa = (oa - pre) / (1 - pre)
    return {
        "Kappa": kappa, "IoU": iou, "F1": f1, "OA": oa,
        "recall": recall, "precision": precision, "Pre": pre,
    }


def _cal_kappa(hist: np.ndarray) -> float:
    if hist.sum() == 0:
        return 0.0
    po = np.diag(hist).sum() / hist.sum()
    pe = np.matmul(hist.sum(1), hist.sum(0).T) / hist.sum() ** 2
    if pe == 1:
        return 0.0
    return (po - pe) / (1 - pe)


def scd_scores(hist: np.ndarray) -> Dict[str, float]:
    """Fscd / mIoU / SeK from the KxK semantic-change hist (K=7)."""
    hist = np.asarray(hist, np.float64)
    hist_fg = hist[1:, 1:]
    c2hist = np.zeros((2, 2))
    c2hist[0][0] = hist[0][0]
    c2hist[0][1] = hist.sum(1)[0] - hist[0][0]
    c2hist[1][0] = hist.sum(0)[0] - hist[0][0]
    c2hist[1][1] = hist_fg.sum()
    hist_n0 = hist.copy()
    hist_n0[0][0] = 0
    kappa_n0 = _cal_kappa(hist_n0)
    iu = np.diag(c2hist) / (c2hist.sum(1) + c2hist.sum(0) - np.diag(c2hist))
    iou_fg = iu[1]
    iou_mean = (iu[0] + iu[1]) / 2
    sek = (kappa_n0 * math.exp(iou_fg)) / math.e
    pixel_sum = hist.sum()
    change_pred_sum = pixel_sum - hist.sum(1)[0].sum()
    change_label_sum = pixel_sum - hist.sum(0)[0].sum()
    sc_tp = np.diag(hist[1:, 1:]).sum()
    sc_precision = sc_tp / max(change_pred_sum, 1e-10)
    sc_recall = sc_tp / max(change_label_sum, 1e-10)
    if sc_precision <= 0 or sc_recall <= 0:
        fscd = 0.0
    else:
        fscd = 2.0 / (1.0 / sc_precision + 1.0 / sc_recall)
    return {"Fscd": fscd, "IoU_mean": iou_mean, "Sek": sek}


def bda_scores(loc_cm: np.ndarray, cls_cm: np.ndarray) -> Dict[str, float]:
    """xBD scoring: loc F1 (binary), per-damage-class F1 (classes 1..K-1),
    overall = 0.3*locF1 + 0.7*harmonic_mean(damage F1s)."""
    loc_cm = np.asarray(loc_cm, np.float64)
    cls_cm = np.asarray(cls_cm, np.float64)
    rec = loc_cm[1, 1] / max(loc_cm[1, 0] + loc_cm[1, 1], 1e-10)
    pre = loc_cm[1, 1] / max(loc_cm[0, 1] + loc_cm[1, 1], 1e-10)
    loc_f1 = 2 * rec * pre / max(rec + pre, 1e-10)
    tps = np.diag(cls_cm)[1:]
    fns = cls_cm.sum(1)[1:] - tps
    fps = cls_cm.sum(0)[1:] - tps
    precisions = tps / (tps + fps + 1e-7)
    recalls = tps / (tps + fns + 1e-7)
    f1s = 2 * precisions * recalls / (precisions + recalls + 1e-7)
    # ref: /root/reference/scripts/train_BDA.py:141 — plain harmonic mean.
    harmonic = len(f1s) / np.sum(1.0 / np.maximum(f1s, 1e-12))
    overall = 0.3 * loc_f1 + 0.7 * harmonic
    out = {"loc_f1": loc_f1, "harmonic_mean_f1": harmonic, "overall_f1": overall}
    for i, f in enumerate(f1s):
        out[f"damage_f1_class{i + 1}"] = float(f)
    return out


@dataclass
class BinaryChangeMeter:
    """Host-side accumulator over per-step device confusion matrices."""

    cm: np.ndarray = field(default_factory=lambda: np.zeros((2, 2), np.float64))

    def update(self, cm_step) -> None:
        self.cm += np.asarray(cm_step, np.float64)

    def scores(self) -> Dict[str, float]:
        return binary_change_scores(self.cm)


@dataclass
class SCDMeter:
    num_classes: int = 6  # ref: /root/reference/scripts/train_SCD.py:477-480
    cm: np.ndarray = None  # type: ignore[assignment]
    acc_correct: float = 0.0
    acc_total: float = 0.0

    def __post_init__(self):
        if self.cm is None:
            self.cm = np.zeros((self.num_classes, self.num_classes), np.float64)

    def update(self, cm_step, correct=0.0, total=0.0) -> None:
        self.cm += np.asarray(cm_step, np.float64)
        self.acc_correct += float(correct)
        self.acc_total += float(total)

    def scores(self) -> Dict[str, float]:
        out = scd_scores(self.cm)
        if self.acc_total > 0:
            out["acc"] = self.acc_correct / self.acc_total
        return out


@dataclass
class BDAMeter:
    num_classes: int = 5
    loc_cm: np.ndarray = None  # type: ignore[assignment]
    cls_cm: np.ndarray = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.loc_cm is None:
            self.loc_cm = np.zeros((2, 2), np.float64)
        if self.cls_cm is None:
            self.cls_cm = np.zeros((self.num_classes, self.num_classes), np.float64)

    def update(self, loc_cm_step, cls_cm_step) -> None:
        self.loc_cm += np.asarray(loc_cm_step, np.float64)
        self.cls_cm += np.asarray(cls_cm_step, np.float64)

    def scores(self) -> Dict[str, float]:
        return bda_scores(self.loc_cm, self.cls_cm)
