"""Host-side evaluation metrics, exact sklearn parity with the reference.

The reference computes AUROC/AUPRC with two different probability maps
(SURVEY.md §5.5): train/val use element-wise sigmoid on the raw logits
(reference code/Raindrop.py:327,349) while test uses a proper softmax
(code/Raindrop.py:388-389). PAM (multiclass) always softmaxes and scores
one-hot AUROC/AUPRC (code/Raindrop.py:336-337) plus macro precision/recall/F1
(:399-401). Accuracy is argmax over raw logits in all cases. We reproduce
all of it by calling sklearn on the host — the metrics are off the hot path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from sklearn.metrics import (
    average_precision_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)


def one_hot(y: np.ndarray, n_classes: int) -> np.ndarray:
    """Dense one-hot (reference code/Raindrop.py:27-32)."""
    return np.eye(n_classes)[np.asarray(y).reshape(-1)]


def binary_probs_sigmoid(logits: np.ndarray) -> np.ndarray:
    """Element-wise sigmoid 'probabilities' — the reference's train/val quirk
    (code/Raindrop.py:327,349): NOT a softmax; both columns squashed
    independently."""
    return 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))


def softmax_probs(logits: np.ndarray) -> np.ndarray:
    """Row softmax (reference test path, code/Raindrop.py:388-389)."""
    z = np.asarray(logits, np.float64)
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def confusion_matrix_np(y: np.ndarray, ypred: np.ndarray,
                        labels) -> np.ndarray:
    """Confusion matrix C[i, j] = #samples with true label labels[i]
    predicted labels[j] — sklearn.metrics.confusion_matrix semantics
    (parity-tested), pure numpy so it needs no sklearn on the hot path.

    The reference prints this at the first/last train epoch with hard-coded
    labels=[0, 1] (code/Raindrop.py:341-342) and at test with
    labels=range(n_classes) (code/Raindrop.py:406).
    """
    labels = np.asarray(labels)
    n = len(labels)
    pos = {int(v): i for i, v in enumerate(labels)}
    C = np.zeros((n, n), np.int64)
    for t, p in zip(np.asarray(y).reshape(-1), np.asarray(ypred).reshape(-1)):
        ti, pi = pos.get(int(t)), pos.get(int(p))
        if ti is not None and pi is not None:
            C[ti, pi] += 1
    return C


def classification_report_str(y: np.ndarray, ypred: np.ndarray) -> str:
    """sklearn classification_report text (per-class P/R/F1/support) — the
    reference's test-time diagnostic (code/Raindrop.py:405)."""
    from sklearn.metrics import classification_report

    return classification_report(np.asarray(y).reshape(-1),
                                 np.asarray(ypred).reshape(-1),
                                 zero_division=0)


def classification_metrics(
    logits: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    *,
    prob_mode: str = "softmax",       # 'softmax' (test) | 'sigmoid' (train/val)
) -> Dict[str, float]:
    """AUROC/AUPRC/accuracy (+ macro P/R/F1 when multiclass)."""
    y = np.asarray(y).reshape(-1)
    logits = np.asarray(logits)
    ypred = np.argmax(logits, axis=1)
    probs = softmax_probs(logits) if prob_mode == "softmax" else binary_probs_sigmoid(logits)
    out = {"accuracy": float(np.mean(y == ypred))}
    if n_classes == 2:
        out["auroc"] = float(roc_auc_score(y, probs[:, 1]))
        out["auprc"] = float(average_precision_score(y, probs[:, 1]))
    else:
        oh = one_hot(y, n_classes)
        # Score only classes present in y: on full eval splits this equals
        # the reference's one-hot macro scores (code/Raindrop.py:336-337);
        # on degenerate tiny splits it avoids sklearn's NaN.
        present = np.where(oh.sum(axis=0) > 0)[0]
        out["auroc"] = float(roc_auc_score(oh[:, present], probs[:, present]))
        out["auprc"] = float(average_precision_score(oh[:, present], probs[:, present]))
        out["precision"] = float(precision_score(y, ypred, average="macro", zero_division=0))
        out["recall"] = float(recall_score(y, ypred, average="macro", zero_division=0))
        out["f1"] = float(f1_score(y, ypred, average="macro", zero_division=0))
    return out
