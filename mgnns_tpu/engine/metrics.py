"""On-device streaming metrics via a confusion matrix.

The reference computes sklearn accuracy / micro / macro / weighted F1 *per
batch on the host* inside the hot loop and averages the batch values per
epoch (``engine/Multi_GCN_Multihead_Att_engine.py:834-838``, ``:131-171``) —
which both stalls the device and biases F1.  Its own "Another Testing" block
recomputes the metrics globally from all predictions (``:430-445``); that
global computation is the ground truth here.

Design: accumulate one [C, C] confusion matrix on device per epoch (a single
scatter-add per step, no D2H sync), then derive every metric from it on host
at epoch end.  For single-label multi-class data the confusion matrix is a
sufficient statistic for accuracy and all F1 averages, so the numbers equal
sklearn's globally-computed values exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_init(num_classes: int) -> jnp.ndarray:
    return jnp.zeros((num_classes, num_classes), jnp.int32)


def confusion_update(cm: jnp.ndarray, preds: jnp.ndarray, labels: jnp.ndarray,
                     weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """cm[true, pred] += 1 for each sample; ``weights`` (0/1) masks padding
    rows in the final ragged batch."""
    if weights is None:
        weights = jnp.ones(labels.shape, jnp.int32)
    return cm.at[labels, preds].add(weights.astype(jnp.int32))


def _prf(cm: np.ndarray):
    tp = np.diag(cm).astype(np.float64)
    support = cm.sum(axis=1).astype(np.float64)      # rows = true
    predicted = cm.sum(axis=0).astype(np.float64)    # cols = predicted
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(predicted > 0, tp / predicted, 0.0)
        recall = np.where(support > 0, tp / support, 0.0)
        f1 = np.where(precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0)
    return precision, recall, f1, support


def metrics_from_confusion(cm) -> dict:
    """accuracy, micro/macro/weighted F1 (sklearn conventions)."""
    cm = np.asarray(cm)
    total = cm.sum()
    correct = np.diag(cm).sum()
    acc = correct / total if total else 0.0
    precision, recall, f1, support = _prf(cm)
    macro_f1 = f1.mean() if cm.shape[0] else 0.0
    weighted_f1 = (f1 * support).sum() / total if total else 0.0
    return {
        "accuracy": float(acc),
        "micro_f1": float(acc),  # == micro F1 for single-label multi-class
        "macro_f1": float(macro_f1),
        "weighted_f1": float(weighted_f1),
    }


def classification_report(cm, label_names: list[str] | None = None) -> str:
    """Text report akin to sklearn's ``classification_report``
    (the reference prints one for the test split, ``engine/...:483``)."""
    cm = np.asarray(cm)
    C = cm.shape[0]
    names = label_names or [str(i) for i in range(C)]
    precision, recall, f1, support = _prf(cm)
    width = max(len(n) for n in names) + 2
    lines = [f"{'':>{width}}  precision  recall  f1-score  support"]
    for i, n in enumerate(names):
        lines.append(
            f"{n:>{width}}  {precision[i]:9.4f}  {recall[i]:6.4f}  {f1[i]:8.4f}  {int(support[i]):7d}"
        )
    m = metrics_from_confusion(cm)
    lines.append(
        f"{'accuracy':>{width}}  {'':9}  {'':6}  {m['accuracy']:8.4f}  {int(cm.sum()):7d}"
    )
    lines.append(
        f"{'macro avg':>{width}}  {precision.mean():9.4f}  {recall.mean():6.4f}  {m['macro_f1']:8.4f}  {int(cm.sum()):7d}"
    )
    w_p = (precision * support).sum() / max(cm.sum(), 1)
    w_r = (recall * support).sum() / max(cm.sum(), 1)
    lines.append(
        f"{'weighted avg':>{width}}  {w_p:9.4f}  {w_r:6.4f}  {m['weighted_f1']:8.4f}  {int(cm.sum()):7d}"
    )
    return "\n".join(lines)
