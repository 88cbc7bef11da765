"""Task losses.

Reference parity: the loss expressions live inline in the task scripts
(ModelNet/ModelNet.py: softmax xent + weight decay; MCClassH: per-path +
joint losses; MCNorm: angular/cosine distance; ScanNet: class-frequency
weighted xent — SURVEY §2.2/§3.1)."""

from __future__ import annotations

import jax.numpy as jnp
import optax
from jax import Array


def classification_loss(logits: Array, labels: Array) -> Array:
    """Mean softmax cross-entropy over the batch."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def classh_loss(
    logits: tuple[Array, Array, Array],
    labels: Array,
    path_weight: float = 0.5,
) -> Array:
    """Joint + per-path loss for MCClassH (reference trains both paths and the
    combined logits jointly)."""
    joint, a, b = logits
    return classification_loss(joint, labels) + path_weight * (
        classification_loss(a, labels) + classification_loss(b, labels)
    )


def normal_loss(pred: Array, target: Array, mask: Array, eps: float = 1e-8) -> Array:
    """Cosine/angular distance to ground-truth normals, sign-invariant
    (a surface normal estimated from points alone has ambiguous orientation)."""
    p = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + eps)
    t = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + eps)
    cos = jnp.abs(jnp.sum(p * t, axis=-1))
    loss = 1.0 - cos
    m = mask.astype(loss.dtype)
    return (loss * m).sum() / jnp.maximum(m.sum(), 1.0)


def segmentation_loss(
    logits: Array,
    labels: Array,
    mask: Array,
    class_weights: Array | None = None,
) -> Array:
    """Per-point cross-entropy; optional per-class weights (ScanNet uses
    inverse-frequency weighting)."""
    ll = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    w = mask.astype(ll.dtype)
    if class_weights is not None:
        w = w * class_weights[labels]
    return (ll * w).sum() / jnp.maximum(w.sum(), 1.0)


def accuracy(logits: Array, labels: Array) -> Array:
    return (logits.argmax(-1) == labels).mean()


def masked_accuracy(logits: Array, labels: Array, mask: Array) -> Array:
    ok = (logits.argmax(-1) == labels) & mask
    return ok.sum() / jnp.maximum(mask.sum(), 1)


def iou_per_class(
    logits: Array, labels: Array, mask: Array, n_classes: int
) -> tuple[Array, Array]:
    """Returns (intersection, union) histograms per class for mIoU bookkeeping
    (accumulate across batches, divide at the end — the reference's ShapeNet
    per-category IoU pattern)."""
    pred = logits.argmax(-1)
    inter = jnp.zeros((n_classes,), jnp.int32)
    union = jnp.zeros((n_classes,), jnp.int32)
    for c in range(n_classes):  # static unroll; n_classes is small
        p = (pred == c) & mask
        t = (labels == c) & mask
        inter = inter.at[c].set((p & t).sum())
        union = union.at[c].set((p | t).sum())
    return inter, union
