"""In-graph training/eval metrics.

Rebuilds the reference metric trio (ref:core/metric.py /
mx.metric.CompositeEvalMetric of Accuracy, TopKAccuracy(5), CrossEntropy)
as pure jnp functions computed INSIDE the jitted step — on TPU the metrics
ride along in the same XLA program instead of syncing outputs to host per
batch like MXNet's CPU-side metric.update.

Accumulation protocol: each step emits sums (correct counts, loss*count,
count); the host divides at log time — exactly how mx.metric accumulates
``sum_metric/num_inst`` between resets.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       label_smooth: float = 0.0,
                       mask: jnp.ndarray = None) -> jnp.ndarray:
    """Mean softmax cross-entropy (ref: mx.sym.SoftmaxOutput semantics).

    labels: int32 class ids, shape (N,). Computed in fp32. ``mask`` (N,)
    excludes padding examples from the mean.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = logits - jnp.max(logits, axis=-1, keepdims=True)
    logp = logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))
    if label_smooth > 0.0:
        on = 1.0 - label_smooth
        off = label_smooth / (num_classes - 1)
        nll = -(on * jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
                + off * (jnp.sum(logp, axis=-1)
                         - jnp.take_along_axis(
                             logp, labels[:, None], axis=-1)[:, 0]))
    else:
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is not None:
        mask = mask.astype(jnp.float32)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(nll)


def metric_sums(logits: jnp.ndarray, labels: jnp.ndarray,
                loss: jnp.ndarray,
                mask: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    """Per-batch metric SUMS (top-1 correct, top-5 correct, loss*n, n).

    ``mask`` (N,) of 0/1 excludes padding examples (last partial val batch —
    the reference's ImageRecordIter pads by wrapping; we mask instead, which
    is strictly more correct).
    """
    logits = logits.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones(labels.shape[0], jnp.float32)
    mask = mask.astype(jnp.float32)
    top1_hit = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    # top-5 without a full sort: count classes strictly above the label's
    # logit; in top-5 iff fewer than 5 (ties resolved optimistically, same
    # as mx.metric.TopKAccuracy on distinct logits).
    label_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)
    rank = jnp.sum(logits > label_logit, axis=-1)
    top5_hit = (rank < 5).astype(jnp.float32)
    n = jnp.sum(mask)
    return {
        "top1_sum": jnp.sum(top1_hit * mask),
        "top5_sum": jnp.sum(top5_hit * mask),
        "loss_sum": loss.astype(jnp.float32) * n,
        "count": n,
    }


class MetricAccumulator:
    """Host-side accumulator with mx.metric reset/get semantics."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._sums = {"top1_sum": 0.0, "top5_sum": 0.0, "loss_sum": 0.0,
                      "count": 0.0}

    def update(self, sums: Dict[str, jnp.ndarray]):
        for k in self._sums:
            self._sums[k] += float(sums[k])

    def get(self) -> Dict[str, float]:
        n = max(self._sums["count"], 1.0)
        return {
            "accuracy": self._sums["top1_sum"] / n,
            "top_k_accuracy_5": self._sums["top5_sum"] / n,
            "cross-entropy": self._sums["loss_sum"] / n,
        }
