"""Evaluation metrics — re-design of `utils/general_utils.py:59-99`.

`compute_micro_f1` follows the reference exactly: argmax accuracy for
single-label tasks; micro-F1 over `logits > 0` binarization for
multilabel (yelp/ogbn-proteins). `rocauc` replaces the OGB Evaluator
dependency (`maxk_gnn_integrated.py:60-64`) with a rank-based AUC.
All are jit-friendly (pure jnp, no host sync inside).
"""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(logits, labels, topk=(1,)):
    """Top-k accuracy (reference `accuracy`, `utils/general_utils.py:59-77`)."""
    maxk = max(topk)
    top = jnp.argsort(-logits, axis=-1)[:, :maxk]
    correct = top == labels[:, None]
    return [jnp.mean(jnp.any(correct[:, :k], axis=-1)) * 100.0 for k in topk]


def compute_micro_f1(logits, labels, mask=None) -> jnp.ndarray:
    if mask is None:
        mask = jnp.ones(logits.shape[0], dtype=bool)
    w = mask.astype(jnp.float32)
    if labels.ndim == 1:
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == labels).astype(jnp.float32) * w
        return correct.sum() / jnp.maximum(w.sum(), 1.0)
    # multilabel micro-F1 with pred = logits > 0 (general_utils.py:79-99)
    pred = (logits > 0).astype(jnp.float32) * w[:, None]
    lab = (labels > 0.5).astype(jnp.float32) * w[:, None]
    tp = (pred * lab).sum()
    fp = (pred * (1 - lab)).sum()
    fn = ((1 - pred) * lab * w[:, None]).sum()
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1.0)


def rocauc(logits, labels, mask=None) -> jnp.ndarray:
    """Mean per-class ROC-AUC via the rank-sum (Mann-Whitney) identity —
    the ogbn-proteins metric without the OGB dependency."""
    if mask is None:
        mask = jnp.ones(logits.shape[0], dtype=bool)
    w = mask.astype(jnp.float32)[:, None]
    lab = (labels > 0.5).astype(jnp.float32)
    # rank only masked rows: unmasked scores sink to the bottom ranks
    # (1..n_unmasked), then subtract that constant offset from positives
    scores = jnp.where(mask[:, None], logits, -jnp.inf)
    order = jnp.argsort(scores, axis=0)
    ranks = jnp.zeros_like(logits)
    n = logits.shape[0]
    ranks = ranks.at[order, jnp.arange(logits.shape[1])[None, :]].set(
        jnp.arange(1, n + 1, dtype=logits.dtype)[:, None]
    )
    n_unmasked = (1.0 - mask.astype(jnp.float32)).sum()
    pos = lab * w
    neg = (1 - lab) * w
    npos = pos.sum(0)
    nneg = neg.sum(0)
    rank_pos = (ranks * pos).sum(0) - npos * n_unmasked
    auc = (rank_pos - npos * (npos + 1) / 2) / jnp.maximum(npos * nneg, 1.0)
    valid = (npos > 0) & (nneg > 0)
    return jnp.where(valid, auc, 0.0).sum() / jnp.maximum(valid.sum(), 1)
