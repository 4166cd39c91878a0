"""Model-quality metrics (AUC) for the numerical parity harness.

BASELINE.md requires "AUC parity with reference on seeded synthetic data
within run-to-run variance". The reference itself never computes AUC (it
is inference-only with random weights); parity is therefore established
structurally: identical architecture dims (tests/test_config.py), matching
initialization distributions (tests/test_ops.py), and score-distribution /
AUC stability across dtypes and across rounds (tests/test_parity.py).
"""

from __future__ import annotations

import numpy as np


def auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """ROC AUC via the rank-sum (Mann-Whitney U) formulation, ties handled
    by midranks. O(n log n), no sklearn dependency."""
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel().astype(bool)
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    sorted_scores = scores[order]
    # midranks for ties
    i = 0
    r = np.empty(scores.size, dtype=np.float64)
    while i < scores.size:
        j = i
        while j + 1 < scores.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        r[i : j + 1] = (i + j) / 2.0 + 1.0
        i = j + 1
    ranks[order] = r
    rank_sum_pos = ranks[labels].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))
