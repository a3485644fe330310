"""Evaluation metrics (reference: NANN_impls/nann/util.py:9-26)."""

from __future__ import annotations

import numpy as np


def fast_argtopk(arr: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest entries, sorted descending by value."""
    k = min(k, arr.shape[-1])
    idx = np.argpartition(arr, -k)[-k:]
    return idx[np.argsort(arr[idx])[::-1]]


def calc_pr(ground_truth, retrieved) -> tuple:
    """Per-query precision / recall / F1 of a retrieved id list against the
    ground-truth id(s). Ground truth may be a scalar id or an id array."""
    gt = np.atleast_1d(np.asarray(ground_truth))
    ret = np.asarray(retrieved)
    hit = np.intersect1d(gt, ret).size
    prec = hit / max(len(ret), 1)
    recall = hit / max(len(gt), 1)
    f1 = 2 * prec * recall / (prec + recall) if (prec + recall) > 0 else 0.0
    return prec, recall, f1
