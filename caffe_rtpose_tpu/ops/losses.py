"""Loss ops with Caffe semantics (reference src/caffe/layers/*_loss_layer.cpp).

All losses take physical-layout activations; channel-axis handling is done by
the callers in core.layers.  Shapes are static; every loss is differentiable
under jax.grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euclidean(pred: jax.Array, target: jax.Array) -> jax.Array:
    """EuclideanLoss: sum((a-b)^2) / (2*N) where N = batch (euclidean_loss_layer.cpp)."""
    n = pred.shape[0]
    # subtract in f32: a bf16 subtraction rounds the residual itself,
    # which is the quantity being squared (AMP keeps losses in f32)
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.sum(diff * diff) / (2.0 * n)


def euclidean_masked(pred: jax.Array, target: jax.Array, mask_nc: jax.Array, channel_axis: int) -> jax.Array:
    """EuclideanmaskLoss (reference src/caffe/layers/euclideanmask_loss_layer.cpp):
    per-(sample, channel) 0/1 mask from a third bottom gates the squared
    error; the last ("background") channel is always counted.

    pred/target: activations with a channel axis; mask_nc: (N, C).
    """
    n = pred.shape[0]
    c = pred.shape[channel_axis]
    gate = (mask_nc != 0).astype(jnp.float32)
    gate = gate.at[:, c - 1].set(1.0)  # background channel always on
    shape = [1] * pred.ndim
    shape[0] = n
    shape[channel_axis] = c
    gate_b = gate.reshape(shape)
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) * gate_b
    return jnp.sum(diff * diff) / (2.0 * n)


def softmax_cross_entropy(
    logits2d: jax.Array, labels: jax.Array, ignore_label=None, normalization: str = "VALID",
    batch_size: int = 0,
) -> jax.Array:
    """SoftmaxWithLoss over flattened (M, C) logits and (M,) int labels.
    ``batch_size`` is the ORIGINAL outer N (before spatial flattening) for
    BATCH_SIZE normalization (softmax_loss_layer.cpp: outer_num_)."""
    m = logits2d.shape[0]
    logp = jax.nn.log_softmax(logits2d.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if ignore_label is not None:
        valid = labels != ignore_label
        ll = jnp.where(valid, ll, 0.0)
        count = jnp.sum(valid)
    else:
        count = m
    total = -jnp.sum(ll)
    if normalization == "NONE":
        return total
    if normalization == "FULL":
        return total / m
    if normalization == "BATCH_SIZE":
        return total / (batch_size or m)
    # VALID
    return total / jnp.maximum(count, 1)


def sigmoid_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """SigmoidCrossEntropyLoss: mean over batch of summed per-element BCE."""
    n = logits.shape[0]
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # stable: max(x,0) - x*t + log(1+exp(-|x|))
    per = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(per) / n


def _topk_correct(logits2d: jax.Array, labels: jax.Array, top_k: int) -> jax.Array:
    """Per-row bool: true label within the top-k predictions."""
    if top_k == 1:
        pred = jnp.argmax(logits2d, axis=-1)
        return pred == labels.astype(pred.dtype)
    _, idx = jax.lax.top_k(logits2d, top_k)
    return jnp.any(idx == labels[:, None].astype(idx.dtype), axis=-1)


def accuracy(logits2d: jax.Array, labels: jax.Array, top_k: int = 1, ignore_label=None) -> jax.Array:
    correct = _topk_correct(logits2d, labels, top_k)
    if ignore_label is not None:
        valid = labels != ignore_label
        return jnp.sum(jnp.where(valid, correct, False)) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.mean(correct.astype(jnp.float32))


def accuracy_per_class(logits2d: jax.Array, labels: jax.Array,
                       top_k: int = 1, ignore_label=None) -> jax.Array:
    """Per-class accuracy vector (accuracy_layer.cpp:95-101 second top):
    correct_c / seen_c, 0 for classes never seen."""
    c = logits2d.shape[-1]
    correct = _topk_correct(logits2d, labels, top_k)
    valid = (labels != ignore_label) if ignore_label is not None \
        else jnp.ones_like(labels, bool)
    li = labels.astype(jnp.int32)
    seen = jnp.zeros((c,), jnp.float32).at[li].add(
        valid.astype(jnp.float32))
    hits = jnp.zeros((c,), jnp.float32).at[li].add(
        jnp.where(valid, correct, False).astype(jnp.float32))
    return jnp.where(seen == 0, 0.0, hits / jnp.maximum(seen, 1.0))


def hinge(logits2d: jax.Array, labels: jax.Array, norm: str = "L1") -> jax.Array:
    n, c = logits2d.shape
    x = logits2d.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), c)
    margins = jnp.maximum(0.0, 1.0 + jnp.where(onehot > 0, -x, x))
    if norm == "L2":
        return jnp.sum(margins * margins) / n
    return jnp.sum(margins) / n


def multinomial_logistic(probs2d: jax.Array, labels: jax.Array) -> jax.Array:
    n = probs2d.shape[0]
    p = jnp.take_along_axis(probs2d, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return -jnp.sum(jnp.log(jnp.maximum(p, 1e-20))) / n


def contrastive(a: jax.Array, b: jax.Array, y: jax.Array, margin: float, legacy: bool) -> jax.Array:
    """ContrastiveLoss over (N, D) pairs with (N,) similarity labels."""
    n = a.shape[0]
    d2 = jnp.sum(jnp.square((a - b).astype(jnp.float32)), axis=1)
    if legacy:
        dissim = jnp.maximum(margin - d2, 0.0)
    else:
        dissim = jnp.square(jnp.maximum(margin - jnp.sqrt(jnp.maximum(d2, 1e-20)), 0.0))
    yf = y.astype(jnp.float32).reshape(-1)
    per = yf * d2 + (1 - yf) * dissim
    return jnp.sum(per) / (2.0 * n)


def infogain(probs2d: jax.Array, labels: jax.Array, H: jax.Array) -> jax.Array:
    n = probs2d.shape[0]
    rows = H[labels.astype(jnp.int32)]  # (N, C)
    return -jnp.sum(rows * jnp.log(jnp.maximum(probs2d, 1e-20))) / n
